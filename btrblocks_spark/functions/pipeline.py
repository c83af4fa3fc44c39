"""End-to-end corpus curation: the composed training-data pipeline.

``curate_corpus`` chains the individually-oracle-checked stages into the
single pass a pretraining data pipeline actually runs:

  1. exact dedup        — keep the min-id doc per normalized content hash
  2. lang + quality     — predicted-language allowlist + quality floor
  3. repetition gate    — Gopher-style repeated-n-gram fraction cap
  4. decontamination    — drop docs sharing any word n-gram with an
                          eval/benchmark set (optional)
  5. paragraph dedup    — first corpus-wide occurrence of each paragraph
                          wins; docs reassembled from survivors
  6. PII scrub          — email/IPv4/phone redaction of the final text

Every stage is built-in-expression Spark (the same functions the
standalone operators use), so the whole pipeline is scans + a handful of
digest-keyed shuffles — nothing per-row in Python, nothing on the
driver. The full chain has a DuckDB oracle (`curated_corpus` in
``__spark_entry__``), so the composition — not just each piece — is
hash-verified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from btrblocks_spark.functions.dedup import dedup_paragraphs
from btrblocks_spark.functions.text import (
    corpus_features,
    decontaminate,
    ngram_repetition,
    scrub_pii,
)


def curate_corpus(
    df: DataFrame,
    benchmark: DataFrame | None = None,
    lang: str = "en",
    min_quality: float = 0.3,
    max_rep: float = 1.0,
    rep_n: int = 2,
    decontam_n: int = 4,
    para_sep: str = r"\n\n+",
    para_joiner: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Run the full curation chain; returns (id, text, n_tokens, quality)
    where ``text`` is the deduped-reassembled, PII-scrubbed final form
    and ``n_tokens``/``quality`` are the ORIGINAL document's features
    (what the gates actually saw).

    ``max_rep=1.0`` disables the repetition gate; ``benchmark=None``
    skips decontamination.
    """
    feats = corpus_features(
        df, text_col=text_col, keep=[text_col], id_col=id_col
    )

    # 1. exact dedup (min id per content hash — one digest-keyed window)
    w = Window.partitionBy("content_hash")
    survivors = feats.withColumn("_keep", F.min(id_col).over(w)).filter(
        F.col(id_col) == F.col("_keep")
    )

    # 2. language + quality gates (pure filters on the same projection)
    survivors = survivors.filter(
        (F.col("pred_lang") == lang) & (F.col("quality") >= min_quality)
    )

    # 3. repetition cap
    if max_rep < 1.0:
        rep = ngram_repetition(
            df, text_col=text_col, n=rep_n, id_col=id_col
        ).select(id_col, "rep_frac")
        survivors = survivors.join(rep, id_col).filter(
            F.col("rep_frac") <= max_rep
        )

    # 4. eval-set decontamination
    if benchmark is not None:
        survivors = decontaminate(
            survivors,
            benchmark,
            text_col=text_col,
            n=decontam_n,
            id_col=id_col,
        )

    # 5. paragraph-level dedup + reassembly (among survivors only — the
    # drop order matters and is mirrored in the oracle). The gate
    # features ride THROUGH the stage (keep=...): re-joining survivors
    # at the end would execute the whole gate subtree — including the
    # decontamination explode-joins — a second time.
    paras = dedup_paragraphs(
        survivors.select(id_col, text_col, "n_tokens", "quality"),
        text_col=text_col,
        id_col=id_col,
        sep=para_sep,
        joiner=para_joiner,
        keep=["n_tokens", "quality"],
    ).select(id_col, text_col, "n_tokens", "quality")

    # 6. PII scrub of the final text
    return scrub_pii(
        paras, text_col=text_col, id_col=id_col, keep=["n_tokens", "quality"]
    ).select(
        id_col, text_col, "n_tokens", F.round("quality", 6).alias("quality")
    )
