"""Deduplication operators over the ``documents`` table.

Scale design notes (the point of each variant):

- *exact*       — one shuffle on a 16-byte digest; at 10^12 docs the digest
                  groupBy is the cheapest possible full dedup.
- *n-gram Jaccard* — char-5-gram shingles, inverted-index join on shingle
                  (explode → join on shingle → pair-count); candidate pairs
                  are bounded by shared shingles, never a cross join.
- *MinHash+LSH* — k=16 signatures, b=4 bands of r=4: only band-bucket
                  collisions become candidate pairs; the signature pass is
                  a single explode+groupBy, the banding pass another —
                  two shuffles end-to-end regardless of corpus size.
- *SimHash*     — 64-bit near-dup fingerprint via xxhash64 (JVM-side);
                  hamming-near pairs found by 4x16-bit block buckets
                  (pigeonhole: hamming<=3 ⇒ some block equal).
- *embedding cosine* — see :mod:`similarity`.

The oracle-checkable formulations (shingles, signatures, fingerprints)
use engine-agnostic arithmetic (dictionary ids + (a*x+b) mod p) so DuckDB
reproduces them bit-for-bit; xxhash64 variants are Spark-only fast paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# fixed MinHash parameters (deterministic, shared with the DuckDB oracle).
# Stream i hashes x = shingle_id*K + i + 1 through the PRODUCT of two
# affine congruential streams mod two different primes — the same mixing
# construction as the deterministic LSH planes in similarity.py. A naive
# per-stream multiplier family of 3*2^k-style constants mod the Mersenne
# prime degenerates to bit rotations: all K streams were perfectly
# correlated, so a band collision behaved like a SINGLE minhash match
# (P ~ jaccard, not jaccard^rows_per_band) and the det banding flagged
# ~32% of all pairs as candidates.
MINHASH_K = 16
# LSH band buckets holding more docs than this switch the candidate
# self-join to the salt-split form (~threshold^2/2 = 8M single-task
# pair combinations is where the split's replication cost pays off)
LSH_SALT_THRESHOLD = 4096
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1
MINHASH_P2 = 2_147_483_629
MINHASH_A1 = 48_271
MINHASH_A2 = 69_621
MINHASH_B1 = 11
MINHASH_B2 = 7


def _norm_text(text_col: str):
    return F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized content digest; keeps min doc_id per group."""
    h = F.md5(_norm_text(text_col))
    return (
        df.select("doc_id", h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("dup_count"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", k: int = 5) -> DataFrame:
    """Distinct char-k-gram shingles per doc (engine-agnostic)."""
    norm = _norm_text(text_col)
    base = df.select("doc_id", norm.alias("_norm")).filter(
        F.length("_norm") >= k
    )
    return (
        base.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(_norm) - {k - 1}),"
                    f" i -> substring(_norm, i, {k}))"
                )
            ).alias("shingle"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.6,
    max_doc_freq: int = 100_000,
) -> DataFrame:
    """Near-dup pairs by char-k-gram Jaccard via inverted-index join.

    Shingles with document frequency above ``max_doc_freq`` are dropped
    before the pair join (standard LSH stop-shingle practice): one
    stop-shingle shared by 10^8 docs would otherwise create a quadratic
    bucket. Jaccard is computed consistently over the capped shingle
    space (sizes use the same filtered set), so the oracle SQL mirrors
    the cap exactly.
    """
    sh_all = shingles(df, text_col, k)
    hot = (
        sh_all.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= max_doc_freq)
        .select("shingle")
    )
    sh = sh_all.join(hot, "shingle").cache()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_shingles"))
    pairs = (
        sh.alias("a")
        .join(sh.alias("b"), on="shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("common"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .withColumnRenamed("n_shingles", "size_a")
        .join(
            sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed(
                "n_shingles", "size_b"
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _ordered_dense_ids(
    df: DataFrame, col: str, id_col: str, num_ranges: int = 64
) -> DataFrame:
    """1-based dense ids over sorted distinct values of ``col`` — the
    scale-safe equivalent of ``dense_rank() OVER (ORDER BY col)``.

    Range-partition the distinct values (ordered, non-overlapping ranges),
    rank *within* each partition, and add per-partition offsets computed
    from the tiny (num_ranges-row) partition-count summary. No
    single-partition global sort; the only global window runs over
    ``num_ranges`` rows. Ids are identical to the global dense_rank
    regardless of where the range boundaries land.
    """
    parts = (
        df.select(col)
        .distinct()
        .repartitionByRange(num_ranges, F.col(col))
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    wo = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0))
    ).select("_pid", "_off")
    wl = Window.partitionBy("_pid").orderBy(col)
    return (
        parts.join(F.broadcast(offs), "_pid")
        .withColumn(
            id_col, (F.row_number().over(wl) + F.col("_off")).cast("long")
        )
        .select(col, id_col)
    )


def shingle_dictionary(sh: DataFrame) -> DataFrame:
    """Global dense ids for shingles (sorted order → engine-agnostic).

    Built with :func:`_ordered_dense_ids` — range-partitioned ranking, no
    single-task global sort — so the oracle-checkable variant survives a
    10^12-doc shingle universe; the pure fast path remains
    :func:`minhash_signatures_fast` (xxhash64, no dictionary at all).
    """
    return _ordered_dense_ids(sh, "shingle", "shingle_id")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """(doc_id, hash_idx, minhash) — deterministic, oracle-checkable."""
    sh = shingles(df, text_col, k)
    ids = sh.join(shingle_dictionary(sh), "shingle").select(
        "doc_id", "shingle_id"
    )
    # One explode of the K hash indices — a single scan and a single
    # shuffle, instead of a K-way unionByName re-scan of ids.
    params = F.array(*[F.lit(i) for i in range(MINHASH_K)])
    x = F.col("shingle_id") * MINHASH_K + F.col("hash_idx") + 1
    h = (
        ((x * MINHASH_A1 + MINHASH_B1) % MINHASH_PRIME)
        * ((x * MINHASH_A2 + MINHASH_B2) % MINHASH_P2)
    ) % MINHASH_PRIME
    allh = ids.select(
        "doc_id", "shingle_id", F.explode(params).alias("hash_idx")
    ).select("doc_id", "hash_idx", h.alias("h"))
    return allh.groupBy("doc_id", "hash_idx").agg(F.min("h").alias("minhash"))


def minhash_signatures_fast(
    df: DataFrame, text_col: str = "text", k: int = 5
) -> DataFrame:
    """Production MinHash: xxhash64(shingle, seed_i) — no global dictionary.

    Signatures are computed ROW-LOCALLY: a doc's minhash over its
    distinct shingles equals the min over all shingle occurrences (min
    is duplicate-insensitive), so each signature column is
    ``array_min(transform(shingles, s -> xxhash64(s, i)))`` on the doc's
    own row — ZERO shuffles and no explode (the former explode +
    distinct + groupBy shape paid two full shuffles of the shingle
    stream). ``widen`` buys scan parallelism on low-split inputs; at
    real scale the input is already wide and it is a no-op.
    """
    from btrblocks_spark.functions.util import widen

    # widen BEFORE the norm projection: Catalyst keeps projections where
    # they are written, so norm-then-widen ran the whole regex pass on
    # the single scan task of a one-row-group input. (The length filter
    # is still pushed below the exchange by PushDownPredicates — one
    # serial regex pass remains in its condition — but the projection's
    # pass now runs post-exchange on every core.)
    base = widen(df.select("doc_id", text_col), "doc_id")
    base = base.select(
        "doc_id", _norm_text(text_col).alias("_norm")
    ).filter(F.length("_norm") >= k)
    # array_distinct before hashing: repeated shingles inside one doc
    # (boilerplate, small vocabularies) would be hashed K times each
    # for nothing — min over the distinct set is the same 16 values
    shingle_arr = F.expr(
        f"array_distinct(transform(sequence(1, length(_norm) - {k - 1}),"
        f" i -> substring(_norm, i, {k})))"
    )

    def _mh(i: int):
        return F.array_min(
            F.transform(F.col("_sh"), lambda s: F.xxhash64(s, F.lit(i)))
        ).alias(f"mh_{i}")

    return base.withColumn("_sh", shingle_arr).select(
        "doc_id", *[_mh(i) for i in range(MINHASH_K)]
    )


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 4
) -> DataFrame:
    """Band-bucket join: docs sharing any band of the signature."""
    rows_per_band = MINHASH_K // bands
    sig_cols = [c for c in signatures.columns if c.startswith("mh_")]
    assert len(sig_cols) == MINHASH_K
    band_exprs = []
    for b in range(bands):
        cols = sig_cols[b * rows_per_band : (b + 1) * rows_per_band]
        band_exprs.append(
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(*[F.col(c) for c in cols]).alias("bucket"),
            )
        )
    buckets = signatures.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("bb")
    ).select("doc_id", "bb.band", "bb.bucket")
    # materialize the (tiny: bands rows/doc) bucket table once — the
    # self-join below would otherwise recompute the whole signature
    # pipeline in BOTH branches of the join
    buckets = buckets.localCheckpoint(eager=True)
    # Hot-key skew probe (AQE-style, one bounded-output aggregate over
    # the in-memory checkpoint): a single (band,bucket) value holding H
    # docs emits H^2 ordered combinations through ONE join task, and
    # AQE cannot split skew that lives inside one key. Up to the
    # threshold (~8M single-task combinations) the plain self-join is
    # fastest; past it, switch to the salt-split join below.
    max_bucket = (
        buckets.groupBy("band", "bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
        or 0
    )
    if max_bucket <= LSH_SALT_THRESHOLD:
        return (
            buckets.alias("a")
            .join(buckets.alias("b"), on=["band", "bucket"])
            .filter(F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    # Salt-split self-join: each doc gets a deterministic salt
    # g = hash(doc) mod S; the unordered pair {x,y} is produced exactly
    # once, in the salt combo (min(gx,gy), max(gx,gy)): the left row
    # covers combos (g, j >= g), the right row combos (i <= g, g), and
    # the join key is (band, bucket, i, j), splitting a hot bucket's
    # pair enumeration across S(S+1)/2 join keys. For i == j both
    # orientations meet, so the classic doc_a < doc_b filter dedups
    # them; for i < j exactly one orientation meets and least/greatest
    # restores the ordering. The result SET is provably identical to
    # the plain join (pinned by test + measured exceptAll-equal); the
    # cost is a ~(S+1)/2-fold replication of the (tiny) bucket table,
    # which is why the probe gates it.
    S = 8
    g = F.pmod(F.xxhash64("doc_id"), F.lit(S)).cast("int")
    salted = buckets.withColumn("_g", g)
    a = salted.select(
        "band",
        "bucket",
        F.col("doc_id").alias("_da"),
        F.col("_g").alias("_i"),
        F.explode(F.sequence(F.col("_g"), F.lit(S - 1))).alias("_j"),
    )
    b = salted.select(
        "band",
        "bucket",
        F.col("doc_id").alias("_db"),
        F.explode(F.sequence(F.lit(0), F.col("_g"))).alias("_i"),
        F.col("_g").alias("_j"),
    )
    return (
        a.join(b, on=["band", "bucket", "_i", "_j"])
        .filter((F.col("_i") < F.col("_j")) | (F.col("_da") < F.col("_db")))
        .select(
            F.least("_da", "_db").alias("doc_a"),
            F.greatest("_da", "_db").alias("doc_b"),
        )
        .distinct()
    )


def lsh_candidate_pairs_det(
    sig_long: DataFrame, bands: int = 4
) -> DataFrame:
    """Deterministic LSH banding over the oracle-checkable long-format
    signatures of :func:`minhash_signatures` (doc_id, hash_idx, minhash).

    Bucket per (doc, band) is a base-31 polynomial of the band's minhash
    values mod the Mersenne prime — pure integer arithmetic both Spark
    and DuckDB reproduce bit-for-bit. Same two-shuffle shape as the
    xxhash64 fast path (:func:`lsh_candidate_pairs`).
    """
    rows_per_band = MINHASH_K // bands
    weight = F.pow(F.lit(31.0), (F.col("hash_idx") % rows_per_band)).cast(
        "long"
    )
    buckets = (
        sig_long.withColumn(
            "band", (F.col("hash_idx") / rows_per_band).cast("int")
        )
        .groupBy("doc_id", "band")
        .agg(
            (
                F.sum(F.col("minhash") * weight) % F.lit(MINHASH_PRIME)
            ).alias("bucket")
        )
    )
    # same single-computation trick as lsh_candidate_pairs
    buckets = buckets.localCheckpoint(eager=True)
    return (
        buckets.alias("a")
        .join(buckets.alias("b"), on=["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


SIMHASH_DET_BITS = 31  # (a*id+b) mod 2^31-1 yields 31-bit token hashes
SIMHASH_DET_A = 1_610_612_741
SIMHASH_DET_B = 12_345


def _token_ids(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, token_id) with multiplicity; dense ids over sorted distinct
    tokens (engine-agnostic, same trick as :func:`shingle_dictionary`)."""
    toks = df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
            )
        ).alias("tok"),
    )
    dictionary = _ordered_dense_ids(toks, "tok", "token_id")
    return toks.join(dictionary, "tok").select("doc_id", "token_id")


def simhash_det(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic 31-bit SimHash, oracle-checkable.

    Token hash = (a*token_id + b) mod 2^31-1 over dictionary ids; sim bit
    b = sign of the +-1 sum of token-hash bits. The xxhash64 64-bit
    variant (:func:`simhash64`) is the production fast path (no global
    dictionary sort)."""
    ids = _token_ids(df, text_col).withColumn(
        "h",
        (F.col("token_id") * F.lit(SIMHASH_DET_A) + F.lit(SIMHASH_DET_B))
        % F.lit(MINHASH_PRIME),
    )
    aggs = [
        F.sum(
            F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1
        ).alias(f"s{b}")
        for b in range(SIMHASH_DET_BITS)
    ]
    sums = ids.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_DET_BITS):
        sim = sim + F.when(
            F.col(f"s{b}") > 0, F.lit(2**b).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs_det(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near pairs on the deterministic 31-bit simhash: 4x8-bit block
    pigeonhole (hamming<=3 => some block equal) + exact hamming filter."""
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 8)
                        .bitwiseAND(F.lit(0xFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.blk", "bv.val")
    # materialize once: the self-join would recompute the upstream
    # simhash pipeline in both branches otherwise
    blocks = blocks.localCheckpoint(eager=True)
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), on=["blk", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def simhash64(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash over token xxhash64s — fully JVM-side.

    sim bit b = sign of sum over tokens of (2*bit_b(hash(token)) - 1).
    """
    from btrblocks_spark.functions.util import widen

    df = widen(df.select("doc_id", text_col), "doc_id")
    toks = df.select(
        "doc_id",
        F.explode(
            F.expr(
                f"filter(split(lower({text_col}), '[^a-z0-9]+'), x -> x != '')"
            )
        ).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            (F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        ).alias(f"s{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"s{b}") > 0, F.lit(1).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
            * F.lit(2 ** b if b < 63 else -(2**63)).cast("long")
        )
    return sums.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near pairs by 16-bit block pigeonhole + exact hamming filter."""
    blocks = sim.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftrightunsigned(F.col("simhash"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bv"),
    ).select("doc_id", "simhash", "bv.blk", "bv.val")
    # materialize once: the self-join would recompute the upstream
    # simhash pipeline in both branches otherwise
    blocks = blocks.localCheckpoint(eager=True)
    cand = (
        blocks.alias("a")
        .join(blocks.alias("b"), on=["blk", "val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "doc_a", "doc_b", hamming.alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


def phash_near_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    phash_col: str = "phash",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the multimodal twin of :func:`simhash_near_pairs` (same 16-bit block
    pigeonhole over the 64-bit key; hot phash bands are exactly the skew
    the north rule's salted clustering handles)."""
    sim = df.select(
        F.col(id_col).alias("doc_id"), F.col(phash_col).alias("simhash")
    )
    pairs = simhash_near_pairs(sim, max_hamming=max_hamming)
    return pairs.select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        "hamming",
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = r"\n\n+",
    joiner: str = "\n\n",
    keep: list[str] | None = None,
) -> DataFrame:
    """Cross-corpus paragraph-level exact dedup (the CCNet/RefinedWeb
    sub-document pass): split every document into paragraphs on ``sep``,
    keep only the FIRST occurrence corpus-wide of each normalized
    (lower+trim) paragraph — ordered by (doc, position) — and reassemble
    the surviving paragraphs with ``joiner``.

    Returns (id, text, n_kept, n_total); documents whose every paragraph
    was a repeat disappear (standard boilerplate-removal semantics).

    Shape at 100 TB: posexplode is a narrow map; first-occurrence
    selection is ONE shuffle on the 16-byte paragraph digest (uniform
    key — a hot boilerplate paragraph is still a single digest group
    whose window only ranks, never materializes, its members);
    reassembly is one shuffle back on the doc id. No driver state.
    """
    # trim() strips only ' ' in both Spark and DuckDB — a tab/newline-only
    # paragraph would survive it, so strip all whitespace by regex
    stripped = F.regexp_replace(F.col("para"), r"^\s+|\s+$", "")
    # n_total (non-empty paragraphs per doc) is computable ROW-LOCALLY
    # on the un-exploded document — counting the same stripped!=''
    # survivors the filter below keeps — which removes what used to be
    # a whole extra shuffle+sort (a count window partitioned by doc id
    # over every exploded paragraph)
    n_total_local = F.size(
        F.filter(
            F.split(F.col(text_col), sep),
            lambda p: F.regexp_replace(p, r"^\s+|\s+$", "") != "",
        )
    ).cast("long")
    paras = df.select(
        F.col(id_col),
        *[F.col(c) for c in (keep or [])],
        n_total_local.alias("n_total"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).filter(stripped != "")
    first = Window.partitionBy(F.md5(F.lower(stripped))).orderBy(
        id_col, "pos"
    )
    kept = (
        paras.withColumn("_rk", F.row_number().over(first))
        .filter(F.col("_rk") == 1)
    )
    out = kept.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "para"))).alias("_ps"),
        F.count("*").alias("n_kept"),
        F.first("n_total").alias("n_total"),
        *[F.first(c).alias(c) for c in (keep or [])],
    )
    return out.select(
        F.col(id_col),
        F.concat_ws(
            joiner, F.transform("_ps", lambda s: s.para)
        ).alias(text_col),
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_total").cast("long").alias("n_total"),
        *[F.col(c) for c in (keep or [])],
    )
