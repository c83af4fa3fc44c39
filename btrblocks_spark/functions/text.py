"""Text analysis over the ``documents`` table — all JVM-side expressions.

Every function here returns a DataFrame built purely from
``pyspark.sql.functions`` (whole-stage-codegen friendly, no Python in the
hot path) and has a matching DuckDB oracle SQL in ``__spark_entry__.py``.

Ops: token counting (regex), quality scoring (length/alpha/punct/stopword
ratios), language ID (stopword-hit heuristic over 4 languages), document
fingerprinting (normalized-content md5; the rolling-hash/winnowing variant
lives in dedup.simhash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = "[A-Za-z0-9]+"

STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "es": ["el", "la", "los", "y", "es", "en", "por", "que", "una", "con"],
}


def _tokens(col):
    return F.expr(f"filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace/punct-delimited token count + BPE-ish subword estimate."""
    return df.select(
        "doc_id",
        F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).alias("n_tokens"),
        # BPE-ish proxy: ~1 token per 4 chars of compact text, at least word count
        F.greatest(
            F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)),
            (F.length(F.regexp_replace(text_col, r"\s+", "")) / F.lit(4)).cast(
                "long"
            ),
        ).alias("n_subwords_est"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / alpha / stopword-ratio quality features."""
    n = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(text_col, "[^A-Za-z]", ""))
    digits = F.length(F.regexp_replace(text_col, "[^0-9]", ""))
    punct = F.length(F.regexp_replace(text_col, r"[^.,;:!?'\"()-]", ""))
    toks = _tokens(text_col)
    en_stops = ",".join(f"'{w}'" for w in STOPWORDS["en"])
    stop_hits = F.expr(
        f"size(filter(filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != ''),"
        f" x -> x in ({en_stops})))"
    )
    ntok = F.size(toks)
    return df.select(
        "doc_id",
        n.alias("n_chars"),
        ntok.alias("n_tokens"),
        F.round(alpha / F.greatest(n, F.lit(1)), 6).alias("alpha_ratio"),
        F.round(digits / F.greatest(n, F.lit(1)), 6).alias("digit_ratio"),
        F.round(punct / F.greatest(n, F.lit(1)), 6).alias("punct_ratio"),
        F.round(stop_hits / F.greatest(ntok, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(
            (alpha / F.greatest(n, F.lit(1)))
            * F.least(ntok / F.lit(100.0), F.lit(1.0)),
            6,
        ).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID over {en, de, fr, es} with deterministic ties.

    score(lang) = stopword hits; winner = argmax, ties broken by language
    code order; 'und' (undetermined) when no stopword hits at all.
    """
    out = df
    for lang, words in STOPWORDS.items():
        lst = ",".join(f"'{w}'" for w in words)
        out = out.withColumn(
            f"_hits_{lang}",
            F.expr(
                f"size(filter(filter(split(lower({text_col}), '[^a-z0-9]+'),"
                f" x -> x != ''), x -> x in ({lst})))"
            ),
        )
    langs = list(STOPWORDS)
    best = F.greatest(*[F.col(f"_hits_{lang}") for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → build reversed
        pred = F.when(F.col(f"_hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return out.select(
        "doc_id",
        pred.alias("pred_lang"),
        best.alias("best_hits"),
    )


def corpus_features(
    df: DataFrame,
    text_col: str = "text",
    keep: list[str] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """One-pass projection of everything the corpus-curation pipeline
    needs: token count, quality, predicted language, and the exact-dedup
    content hash — a single scan with zero shuffles, so the composite
    filter downstream needs only ONE shuffle (the dedup window on the
    hash) instead of separate scans + joins per feature.

    The token split is materialized ONCE in an inner projection (the
    expensive ``split(lower(text))`` used to be inlined 5x: token count
    plus the four language hit-counts; HOF expressions run interpreted,
    so Catalyst's codegen-level subexpression elimination never merged
    them). CollapseProject keeps the two projections separate because
    the array is referenced many times and is not a cheap expression."""
    n = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(text_col, "[^A-Za-z]", ""))
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    pre = df.select(
        id_col,
        _tokens(text_col).alias("_toks"),
        alpha.alias("_alpha"),
        n.alias("_n"),
        F.md5(norm).alias("content_hash"),
        *[F.col(c) for c in (keep or [])],
    )
    ntok = F.size(F.col("_toks"))
    quality = F.round(
        (F.col("_alpha") / F.greatest(F.col("_n"), F.lit(1)))
        * F.least(ntok / F.lit(100.0), F.lit(1.0)),
        6,
    )
    hits = {}
    for lang, words in STOPWORDS.items():
        lst = ",".join(f"'{w}'" for w in words)
        hits[lang] = F.expr(f"size(filter(_toks, x -> x in ({lst})))")
    langs = list(STOPWORDS)
    best = F.greatest(*[hits[lang] for lang in langs])
    pred = F.lit("und")
    for lang in reversed(langs):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best <= 0, F.lit("und")).otherwise(pred)
    return pre.select(
        id_col,
        ntok.alias("n_tokens"),
        quality.alias("quality"),
        pred.alias("pred_lang"),
        F.col("content_hash"),
        *[F.col(c) for c in (keep or [])],
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalized-content fingerprint: md5 of lowercased, space-collapsed text."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        F.length(norm).alias("norm_len"),
    )


def _word_ngrams(col, n: int):
    """Array of word n-grams of ``col`` (lowered, token-split) — empty
    when the doc has fewer than n tokens. Pure built-ins: the guard
    matters because sequence(0, negative) DESCENDS instead of being
    empty."""
    toks = f"filter(split(lower({col}), '[^a-z0-9]+'), x -> x != '')"
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} THEN "
        f"transform(sequence(1, size({toks}) - {n} + 1), "
        f"i -> concat_ws(' ', slice({toks}, i, {n}))) "
        f"ELSE array() END"
    )


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    n: int = 2,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signal: the fraction of a document's
    word n-gram occurrences that are repeats of an earlier n-gram
    (``1 - distinct/total``). Near-0 for natural prose, near-1 for
    boilerplate/template spam — the standard pretraining quality gate
    alongside length/stopword ratios. One narrow projection, no
    shuffle, no Python."""
    grams = _word_ngrams(text_col, n)
    out = df.select(
        id_col,
        F.size(grams).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
    )
    return out.select(
        id_col,
        "n_grams",
        "n_distinct",
        F.round(
            F.when(
                F.col("n_grams") > 0,
                1.0 - F.col("n_distinct") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rep_frac"),
    )


def decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Remove training docs that share ANY word n-gram with a benchmark
    set (the standard eval-decontamination rule, n=8..13 in practice).

    Shape at 100 TB: explode both sides to (gram) keys, leftsemi join
    marks contaminated ids, anti join removes them — the benchmark side
    is eval-set sized (small), so Catalyst broadcasts it; the corpus
    explode stays a narrow map feeding one shuffle-free broadcast probe.
    """
    def grams_of(frame: DataFrame, cols: list[str]) -> DataFrame:
        return frame.select(
            *cols, F.explode(_word_ngrams(text_col, n)).alias("_gram")
        )

    bench_grams = grams_of(benchmark, []).distinct()
    hits = (
        grams_of(df, [id_col])
        .join(bench_grams, "_gram", "leftsemi")
        .select(id_col)
        .distinct()
    )
    return df.join(hits, id_col, "left_anti")


# PII patterns shared with the DuckDB oracle — RE2/Java-compatible subset
# only (no lookaround, no backrefs), applied in this order so an earlier
# replacement can never manufacture a later pattern's match.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
]


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers from a text column
    (the standard pretraining PII scrub), returning per-category match
    counts plus the scrubbed text.

    Counts are taken on the ORIGINAL text, replacements applied in
    :data:`PII_PATTERNS` order. Pure ``regexp_count``/``regexp_replace``
    built-ins — one narrow JVM-side projection, no shuffle, no Python;
    at 100 TB this fuses into whatever scan feeds it.
    """
    cols = [F.col(id_col)]
    scrubbed = F.col(text_col)
    for name, pat, token in PII_PATTERNS:
        cols.append(
            F.regexp_count(F.col(text_col), F.lit(pat))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return df.select(
        *cols, scrubbed.alias(text_col), *[F.col(c) for c in (keep or [])]
    )


def corpus_report(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-scan corpus curation report over CUBE(lang, source): doc
    counts, exact-duplicate fraction (via distinct content digests),
    token totals and mean length — per language, per source, per
    (lang, source) cell and the grand total, in a single aggregation.

    Spark-first shape: ``cube`` + ``grouping`` are built-in grouping
    sets (one shuffle, partial aggregation map-side); the dup counter
    is ``count(distinct md5(text))`` which AQE expands to the standard
    two-phase distinct. Rollup axes read ``<all>`` (disambiguated from
    real values with ``grouping()``, not null-coalescing).
    """
    toks = F.regexp_count(F.col(text_col), F.lit(TOKEN_RE))
    base = df.select(
        "lang",
        "source",
        toks.alias("_t"),
        F.length(text_col).alias("_c"),
        F.md5(text_col).alias("_d"),
    )
    g = base.cube("lang", "source").agg(
        F.grouping("lang").alias("_gl"),
        F.grouping("source").alias("_gs"),
        F.count("*").alias("n_docs"),
        F.countDistinct("_d").alias("n_unique"),
        F.sum("_t").cast("long").alias("total_tokens"),
        F.round(F.avg("_c"), 4).alias("avg_chars"),
    )
    return g.select(
        F.when(F.col("_gl") == 1, F.lit("<all>"))
        .otherwise(F.col("lang"))
        .alias("lang"),
        F.when(F.col("_gs") == 1, F.lit("<all>"))
        .otherwise(F.col("source"))
        .alias("source"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_unique").cast("long").alias("n_unique"),
        F.round(
            F.lit(1.0) - F.col("n_unique") / F.col("n_docs"), 6
        ).alias("dup_frac"),
        "total_tokens",
        "avg_chars",
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    top_k: int | None = None,
    min_count: int = 1,
) -> DataFrame:
    """Corpus-wide token vocabulary: (token, count, doc_freq), ordered by
    count desc then token — the input a tokenizer/BPE trainer starts
    from. One explode + one shuffle on the token; ``top_k`` turns the
    global order into a TakeOrderedAndProject (no full sort at scale).
    """
    toks = df.select(
        F.col("doc_id"), F.explode(_tokens(text_col)).alias("token")
    )
    agg = toks.groupBy("token").agg(
        F.count("*").alias("count"),
        F.countDistinct("doc_id").alias("doc_freq"),
    ).filter(F.col("count") >= min_count)
    out = agg.orderBy(F.desc("count"), F.asc("token"))
    return out.limit(top_k) if top_k else out
