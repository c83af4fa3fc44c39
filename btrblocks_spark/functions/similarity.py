"""Similarity search over the ``embeddings`` table (array<float> column).

- :func:`knn_bruteforce` — exact cosine top-k: broadcast the (small) query
  set against all vectors; the dot product is an in-order ``F.aggregate``
  fold over ``zip_with`` (JVM-side, deterministic summation order so the
  DuckDB oracle matches bit patterns after rounding).
- :func:`knn_lsh` — scale path: banded random-hyperplane LSH (seeded
  numpy planes inside a vectorized pandas UDF). OR-construction over
  ``bands`` independent ``nbits``-bit tables plus hamming-distance-1
  multi-probe on the query side; recall@5 >= 0.8 is pytest-gated
  against brute force. At 10^12 vectors the bucket join replaces the
  cross join; recall is tunable via nbits / bands / probes.
- :func:`embedding_near_dup_pairs` — cosine near-dup pairs via bucketed
  self-join (LSH) or full self-join at test scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a: str, b: str):
    dot = F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.col(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.col(b), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x
        )
    )
    return dot / (na * nb)


def knn_bruteforce(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries``: (query_id, query_vec). Broadcast x scan — one pass over
    the vector corpus, no shuffle beyond the final per-query top-k.
    """
    from btrblocks_spark.functions.util import widen

    # the per-row HOF cosine dominates; a single-row-group corpus file
    # would otherwise score every vector on ONE task
    vectors = widen(vectors.select(id_col, vec_col), id_col)
    joined = vectors.crossJoin(F.broadcast(queries))
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def hyperplane_signature_udf(dim: int, nbits: int = 16, seed: int = 42):
    """Vectorized pandas UDF: embedding -> nbits-bit sign signature."""

    @F.pandas_udf("long")
    def sig(col: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, nbits))
        mat = np.vstack(col.to_numpy())  # (n, dim)
        bits = (mat @ planes) > 0  # (n, nbits)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        return pd.Series(bits @ weights)

    return sig


def hyperplane_band_signatures_udf(
    dim: int, nbits: int, bands: int, seed: int = 42
):
    """Vectorized pandas UDF: embedding -> array of ``bands`` independent
    ``nbits``-bit sign signatures (one matmul for all bands)."""

    @F.pandas_udf("array<long>")
    def sigs(col: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, nbits * bands))
        mat = np.vstack(col.to_numpy())  # (n, dim)
        bits = (mat @ planes) > 0  # (n, nbits*bands)
        weights = (1 << np.arange(nbits)).astype(np.int64)
        out = bits.reshape(len(mat), bands, nbits) @ weights  # (n, bands)
        return pd.Series(list(out))

    return sigs


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 4,
    bands: int = 8,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via banded sign-LSH with multi-probe.

    OR-construction over ``bands`` independent ``nbits``-bit tables —
    a corpus vector is a candidate when it collides with the query in
    ANY band — plus multi-probe: each query also probes every bucket at
    hamming distance 1 in each band (``bands * (nbits+1)`` probes), the
    standard recall repair for neighbors that flip one hyperplane sign.
    Candidates are deduped on ids BEFORE the heavy vector columns are
    fetched; corpus side stays one explode + one bucket join. Recall is
    gated in pytest against :func:`knn_bruteforce` (>= 0.8 @ k=5).
    """
    sigs = hyperplane_band_signatures_udf(dim, nbits, bands)
    vb = vectors.select(
        id_col, F.posexplode(sigs(F.col(vec_col))).alias("band", "_sig")
    )
    qb = queries.select(
        "query_id",
        F.posexplode(sigs(F.col("query_vec"))).alias("band", "_sig0"),
    )
    if multiprobe:
        probe = F.explode(
            F.array(
                F.col("_sig0"),
                *[
                    F.col("_sig0").bitwiseXOR(F.lit(1 << j))
                    for j in range(nbits)
                ],
            )
        ).alias("_sig")
        qb = qb.select("query_id", "band", probe)
    else:
        qb = qb.withColumnRenamed("_sig0", "_sig")
    cand = (
        vb.join(F.broadcast(qb), on=["band", "_sig"])
        .select("query_id", id_col)
        .distinct()
    )
    joined = cand.join(vectors, id_col).join(F.broadcast(queries), "query_id")
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


# Deterministic (engine-agnostic) LSH constants. Hyperplane component
# r(idx) = ((A1*idx+B1) mod P1) * ((A2*idx+B2) mod P2) mod P1 - P1//2 —
# the product of two independent affine congruential streams mixes well
# where a single affine (or affine-of-square) stream mod a Mersenne prime
# degenerates (power-of-two-structured multipliers reduce to bit
# rotations mod 2^31-1). Embedding coords are quantized to integers
# (round(x*1e4)) so the dot-product sign is an exact integer predicate —
# bit-identical between Spark and DuckDB regardless of summation order.
DET_P1 = 2_147_483_647
DET_P2 = 2_147_483_629
DET_A1 = 48_271
DET_A2 = 69_621
DET_B1 = 11
DET_B2 = 7
DET_SCALE = 10_000


def lsh_buckets_det(
    vectors: DataFrame,
    dim: int,
    nbits: int = 3,
    bands: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_id: str | None = None,
) -> DataFrame:
    """(id, band, bucket) sign-LSH buckets from deterministic integer
    hyperplanes — the oracle-checkable twin of
    :func:`hyperplane_signature_udf` (DuckDB reproduces it bit-for-bit).

    OR-construction over ``bands`` independent ``nbits``-bit tables: a
    candidate matches if *any* band bucket collides, which is what keeps
    recall high while each band stays selective. All arithmetic runs in
    whole-stage codegen (nested ``aggregate`` over ``sequence``), no UDF.
    """
    idx = f"(cast(l as bigint)*1000 + j)*{dim} + d + 1"
    r = (
        f"((({DET_A1}*({idx}) + {DET_B1}) % {DET_P1})"
        f" * (({DET_A2}*({idx}) + {DET_B2}) % {DET_P2}))"
        f" % {DET_P1} - {DET_P1 // 2}"
    )
    dot = (
        f"aggregate(sequence(0, {dim - 1}), cast(0 as bigint),"
        f" (a, d) -> a + element_at(_xq, d+1) * ({r}))"
    )
    bucket = (
        f"aggregate(sequence(0, {nbits - 1}), cast(0 as bigint),"
        f" (acc, j) -> acc + IF(({dot}) > 0,"
        f" shiftleft(cast(1 as bigint), j), cast(0 as bigint)))"
    )
    buckets = f"transform(sequence(0, {bands - 1}), l -> {bucket})"
    out_id = out_id or id_col
    return (
        vectors.withColumn(
            "_xq",
            F.expr(
                f"transform({vec_col},"
                f" x -> cast(round(cast(x as double) * {DET_SCALE}) as bigint))"
            ),
        )
        .select(
            F.col(id_col).alias(out_id),
            F.posexplode(F.expr(buckets)).alias("band", "bucket"),
        )
    )


def knn_lsh_det(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    nbits: int = 3,
    bands: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k via the deterministic banded LSH — same join
    shape as :func:`knn_lsh` (bucket join replaces the cross join) but
    fully oracle-checkable, which makes :func:`knn_recall` against
    :func:`knn_bruteforce` a DuckDB-verifiable quality gate."""
    vb = lsh_buckets_det(
        vectors, dim, nbits, bands, vec_col=vec_col, id_col=id_col
    )
    qb = lsh_buckets_det(
        queries,
        dim,
        nbits,
        bands,
        vec_col="query_vec",
        id_col="query_id",
    )
    cand = (
        vb.join(F.broadcast(qb), on=["band", "bucket"])
        .select("query_id", id_col)
        .distinct()
    )
    joined = cand.join(vectors, id_col).join(F.broadcast(queries), "query_id")
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _collect_sample(
    vectors: DataFrame, vec_col: str, sample_rows: int, seed: int
) -> np.ndarray:
    """One driver-side training sample shared by the IVF and PQ
    trainers (one count + one sampled collect, not one per trainer)."""
    n_total = vectors.count()
    frac = min(1.0, sample_rows / max(n_total, 1))
    return np.vstack(
        vectors.select(vec_col)
        .sample(fraction=frac, seed=seed)
        .toPandas()[vec_col]
        .to_numpy()
    ).astype(np.float64)


def train_ivf_centroids(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    sample_rows: int = 10_000,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    sample: np.ndarray | None = None,
    distributed: bool = False,
) -> np.ndarray:
    """Mini-kmeans on a driver-side sample → (n_centroids, dim) float64.

    The sample is tiny relative to the corpus (IVF training is always
    sampled — FAISS does the same); the expensive assignment pass stays
    distributed in :func:`knn_ivf`. Pass ``distributed=True`` to train
    on executor-side partial sums over the FULL table instead
    (:func:`train_kmeans_distributed`) — same interface, no driver
    collect of vectors.
    """
    if distributed:
        return train_kmeans_distributed(
            vectors, dim, n_centroids, iters=iters, seed=seed,
            vec_col=vec_col,
        )
    if sample is None:
        sample = _collect_sample(vectors, vec_col, sample_rows, seed)
    rng = np.random.default_rng(seed)
    cents = sample[rng.choice(len(sample), n_centroids, replace=False)]
    for _ in range(iters):
        d = ((sample[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_centroids):
            members = sample[assign == c]
            if len(members):
                cents[c] = members.mean(0)
    return cents


def train_kmeans_distributed(
    vectors: DataFrame,
    dim: int,
    n_centroids: int = 16,
    iters: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Full-table Lloyd's k-means with EXECUTOR-side partial sums —
    the honest trainer for corpora where a 10k driver sample is no
    longer representative (flag-gated; the sampled trainer stays the
    default, matching FAISS practice).

    Initialization seeds from a bounded 4*n_centroids-row sample; each
    Lloyd iteration ships the centroids to executors in the task
    closure (n_centroids x dim floats — tiny), every Arrow batch
    assigns its vectors and emits ONE (cell, count, sum-vector) row per
    centroid, and the driver reduces only n_partitions x n_centroids
    partial rows — the iterations never move a vector. Empty cells keep
    their previous centroid.
    """
    init = _collect_sample(
        vectors, vec_col, max(n_centroids * 4, 256), seed
    )
    rng = np.random.default_rng(seed)
    cents = init[
        rng.choice(len(init), min(n_centroids, len(init)), replace=False)
    ].astype(np.float64)
    if len(cents) < n_centroids:
        raise ValueError(
            f"corpus smaller than n_centroids={n_centroids}"
        )
    src = vectors.select(vec_col)
    for _ in range(iters):
        cb = cents.copy()

        def partials(batches):
            sums = np.zeros((n_centroids, dim), np.float64)
            cnts = np.zeros(n_centroids, np.int64)
            for pdf in batches:
                mat = np.vstack(pdf[vec_col].to_numpy()).astype(
                    np.float64
                )
                d = (
                    (mat**2).sum(1)[:, None]
                    - 2 * mat @ cb.T
                    + (cb**2).sum(1)[None, :]
                )
                a = d.argmin(1)
                np.add.at(sums, a, mat)
                cnts += np.bincount(a, minlength=n_centroids)
            yield pd.DataFrame(
                {
                    "cell": np.arange(n_centroids, dtype=np.int32),
                    "cnt": cnts,
                    "s": list(sums),
                }
            )

        rows = src.mapInPandas(
            partials, "cell int, cnt long, s array<double>"
        ).collect()
        sums = np.zeros((n_centroids, dim), np.float64)
        cnts = np.zeros(n_centroids, np.int64)
        for r in rows:
            sums[r.cell] += np.asarray(r.s, np.float64)
            cnts[r.cell] += r.cnt
        nz = cnts > 0
        cents[nz] = sums[nz] / cnts[nz][:, None]
    return cents


def ivf_assign_udf(centroids: np.ndarray):
    """Vectorized pandas UDF: embedding -> nearest-centroid bucket id."""
    cents = centroids.astype(np.float64)

    @F.pandas_udf("int")
    def assign(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy()).astype(np.float64)
        d = (
            (mat**2).sum(1)[:, None]
            - 2 * mat @ cents.T
            + (cents**2).sum(1)[None, :]
        )
        return pd.Series(d.argmin(1).astype(np.int32))

    return assign


def ivf_probe_udf(centroids: np.ndarray, n_probe: int):
    """Vectorized pandas UDF: embedding -> array of the ``n_probe``
    nearest centroid ids (ascending distance, ties by centroid index —
    same order np.argsort gives). The distributed replacement for
    driver-side probe assignment: a 10^9-query batch computes its probe
    cells in executors, never on the driver."""
    cents = centroids.astype(np.float64)
    n_probe = min(n_probe, len(cents))

    @F.pandas_udf("array<int>")
    def probe(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy()).astype(np.float64)
        d = (
            (mat**2).sum(1)[:, None]
            - 2 * mat @ cents.T
            + (cents**2).sum(1)[None, :]
        )
        top = np.argsort(d, axis=1, kind="stable")[:, :n_probe]
        return pd.Series(list(top.astype(np.int32)))

    return probe


def _probe_cells_df(queries: DataFrame, centroids: np.ndarray, n_probe: int):
    """(query_id, _cell) rows: each query exploded to its probe cells —
    computed distributedly via :func:`ivf_probe_udf`."""
    probe = ivf_probe_udf(centroids, n_probe)
    return queries.select(
        "query_id", F.explode(probe(F.col("query_vec"))).alias("_cell")
    )


def knn_ivf(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF approximate top-k: scan only the query's n_probe nearest cells.

    Corpus side: one narrow map to bucket each vector (in practice the
    assignment is persisted/clustered into the table layout, making the
    probe a stats-pruned file scan). Query side: each query probes
    ``n_probe`` cells — corpus scanned fraction ≈ n_probe/n_centroids.
    """
    if centroids is None:
        centroids = train_ivf_centroids(vectors, dim, n_centroids)
    assign = ivf_assign_udf(centroids)
    v = vectors.withColumn("_cell", assign(F.col(vec_col)))

    # per-query probe cells, computed IN EXECUTORS (a large query batch
    # never collects to the driver; the probes frame is still tiny
    # relative to the corpus and broadcasts)
    probes = _probe_cells_df(queries, centroids, n_probe)
    q = queries.join(F.broadcast(probes), "query_id")

    joined = v.join(F.broadcast(q), on="_cell")
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def build_ivf_table(
    spark,
    vectors: DataFrame,
    root: str,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    job_id: str | None = None,
):
    """Persist IVF cell assignments INTO the table layout.

    Trains centroids on a sample, assigns every vector a ``cell``
    column, and writes a BtrTable partitioned by cell — so an ANN probe
    becomes a stats-pruned file scan (the promise in :func:`knn_ivf`'s
    docstring made concrete). At 10^12 vectors the probe reads
    ~n_probe/n_centroids of the files and nothing else; re-clustering
    after drift is a normal ``cluster()`` maintenance job.

    Returns (BtrTable, centroids).
    """
    from btrblocks_spark.sources.table import BtrTable

    centroids = train_ivf_centroids(
        vectors, dim, n_centroids, seed=seed, vec_col=vec_col
    )
    assign = ivf_assign_udf(centroids)
    dfc = vectors.withColumn("cell", assign(F.col(vec_col)))
    table = BtrTable.create(
        spark,
        root,
        dfc,
        partition_by=["cell"],
        job_id=job_id or "ivf-build",
    )
    return table, centroids


def knn_ivf_scan(
    table,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over a :func:`build_ivf_table` table: probe
    cells resolve to a manifest-stats-pruned scan (only the probed
    cells' files are opened), then the same broadcast-join scoring as
    :func:`knn_ivf`."""
    # probe cells computed in executors; only the DISTINCT cell ids (at
    # most n_centroids values, never the query vectors) reach the driver
    # to parameterize manifest pruning
    probes = _probe_cells_df(queries, centroids, n_probe)
    cells = sorted(
        r._cell for r in probes.select("_cell").distinct().collect()
    )
    # one pruned scan with the SET of probed cells; per-file stats drop
    # every file of an unprobed cell — probing {0, 15} of 16 opens only
    # those two cells' files, not the range in between
    v = table.scan(
        columns=[id_col, vec_col, "cell"],
        prune={"cell": cells},
    ).filter(F.col("cell").isin(cells))
    q = queries.join(F.broadcast(probes), "query_id")
    joined = v.join(
        F.broadcast(q), v.cell == q._cell
    )
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def quantize_embeddings(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """Int8 scalar quantization (SQ8): per-vector scale = max|x|/127,
    q_i = floor(x_i/scale + 0.5). 4x smaller vectors for the ANN scale
    path (FAISS SQ8 analog) — all arithmetic is built-in higher-order
    functions (transform/aggregate), JVM-side and whole-stage-codegen
    friendly, and floor-based rounding is bit-reproducible in DuckDB
    for the oracle."""
    mx = F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )
    scale = F.when(mx > 0, mx / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
    )
    return vectors.select(
        F.col(id_col),
        scale.alias("q_scale"),
        q.alias("q"),
        *[F.col(c) for c in (keep or [])],
    )


def knn_quantized(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k over SQ8-quantized vectors: cosine computed on the
    int8 codes (dot(q_a, q_b) is integer arithmetic; the per-vector
    scales cancel in the cosine). Same broadcast x scan shape as
    :func:`knn_bruteforce` but the scanned corpus is 4x smaller — the
    memory/bandwidth trade a 10^12-vector ANN tier makes. Recall vs
    float cosine is pytest-gated."""
    vq = quantize_embeddings(vectors, vec_col, id_col)
    qq = quantize_embeddings(
        queries, "query_vec", "query_id"
    ).withColumnRenamed("q", "qq").withColumnRenamed("q_scale", "qq_scale")
    joined = vq.crossJoin(F.broadcast(qq))
    return _quantized_topk(joined, id_col, k)


def _quantized_topk(
    joined: DataFrame, id_col: str, k: int, distinct: bool = False
) -> DataFrame:
    """Shared int8-cosine scoring + per-query top-k over a frame with
    columns (query_id, <id_col>, q, qq)."""
    dot = F.aggregate(
        F.zip_with(
            F.col("q"), F.col("qq"), lambda a, b: (a * b).cast("long")
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.col(c),
            F.lit(0).cast("long"),
            lambda acc, x: acc + (x * x).cast("long"),
        ).cast("double")
    )
    # zero-norm guard: an all-zero embedding quantizes to an all-zero
    # code vector (scale falls back to 1.0) — an unguarded denominator
    # would emit NaN/null cosines whose DESC ordering differs between
    # engines; greatest(norm, 1e-12) is mirrored in the oracle SQL
    denom = F.greatest(norm("q") * norm("qq"), F.lit(1e-12))
    scored = joined.select(
        "query_id",
        F.col(id_col),
        F.round(dot / denom, 4).alias("cosine"),
    )
    if distinct:
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def build_ivf_sq8_table(
    spark,
    vectors: DataFrame,
    root: str,
    dim: int,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    job_id: str | None = None,
):
    """IVF-SQ8: persist int8-quantized codes INTO the IVF cell layout —
    the composition a 10^12-vector tier actually runs (FAISS IVF-SQ8
    analog). The table stores (id, q_scale, q[int8 codes], cell),
    partitioned by cell: a probe is a manifest-stats-pruned scan that
    reads 4x fewer bytes than the float layout on 1/n_centroids of the
    files. Returns (BtrTable, centroids)."""
    from btrblocks_spark.sources.table import BtrTable

    centroids = train_ivf_centroids(
        vectors, dim, n_centroids, seed=seed, vec_col=vec_col
    )
    assign = ivf_assign_udf(centroids)
    qdf = quantize_embeddings(
        vectors.withColumn("cell", assign(F.col(vec_col))),
        vec_col,
        id_col,
        keep=["cell"],
    )
    table = BtrTable.create(
        spark,
        root,
        qdf,
        partition_by=["cell"],
        job_id=job_id or "ivf-sq8-build",
    )
    return table, centroids


def knn_ivf_sq8(
    table,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k over a :func:`build_ivf_sq8_table` table:
    distributed probe-cell assignment -> stats-pruned scan of the probed
    cells' int8 codes -> shared quantized cosine scoring. Recall vs the
    float brute force is pytest-gated."""
    probes = _probe_cells_df(queries, centroids, n_probe)
    cells = sorted(
        r._cell for r in probes.select("_cell").distinct().collect()
    )
    v = table.scan(
        columns=[id_col, "q_scale", "q", "cell"],
        prune={"cell": cells},
    ).filter(F.col("cell").isin(cells))
    qq = (
        quantize_embeddings(queries, "query_vec", "query_id")
        .withColumnRenamed("q", "qq")
        .withColumnRenamed("q_scale", "qq_scale")
        .join(F.broadcast(probes), "query_id")
    )
    joined = v.join(F.broadcast(qq), v.cell == qq._cell)
    return _quantized_topk(joined, id_col, k, distinct=True)


def knn_recall(
    ann: "DataFrame", exact: "DataFrame", k: int = 5
) -> "DataFrame":
    """Recall@k of an ANN result against the brute-force ground truth.

    Both inputs are (query_id, vec_id, ...) top-k frames; recall is the
    per-query overlap share, plus a global average row. The standard
    quality gate for the LSH/IVF scale paths."""
    hits = (
        ann.select("query_id", "vec_id")
        .join(exact.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hit"))
    )
    per_query = (
        exact.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(k), 4
            ).alias("recall_at_k"),
        )
    )
    return per_query.orderBy("query_id")


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    use_lsh: bool = False,
    dim: int | None = None,
    nbits: int = 10,
    bands: int = 4,
) -> DataFrame:
    """Pairs with cosine >= threshold (near-duplicate embeddings).

    Exact all-pairs by default (recall 1.0, quadratic — test scale /
    small corpora only). ``use_lsh=True`` opts into the banded LSH
    self-join (OR over ``bands`` independent ``nbits``-bit sign
    signatures — candidates collide in ANY band, the standard
    recall/cost dial), the scale path at 10^12 vectors; approximation
    is an explicit caller decision, never a silent default.
    """
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    )
    if use_lsh:
        if dim is None:
            dim = len(vectors.select(vec_col).first()[0])
        # one explode into (band, sig) rows -> a single self-join on
        # (band, sig) covers the OR-construction in one shuffle
        sigs = [hyperplane_signature_udf(dim, nbits, seed=42 + l)
                for l in range(bands)]
        bexpr = F.explode(
            F.array(*[
                F.struct(F.lit(l).alias("band"), sigs[l](F.col("va")).alias("sig"))
                for l in range(bands)
            ])
        ).alias("bb")
        ab = a.select("id_a", bexpr).select("id_a", "bb.band", "bb.sig")
        bb = ab.select(F.col("id_a").alias("id_b"), "band", "sig")
        cand = (
            ab.join(bb, on=["band", "sig"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # dedup candidates on ids only, THEN fetch vectors — the heavy
        # array columns never ride through the band join or the distinct
        pairs = cand.join(a, "id_a").join(b, "id_b")
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(_cosine("va", "vb"), 4).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


# ---------------------------------------------------------------------------
# Product quantization (PQ / IVF-PQ) — the 10^12-vector memory tier.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    vectors: DataFrame,
    dim: int,
    m: int = 8,
    ksub: int = 32,
    sample_rows: int = 10_000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    sample: np.ndarray | None = None,
) -> np.ndarray:
    """Per-subspace k-means codebooks -> (m, ksub, dim//m) float64.

    Trained on a driver-side sample like :func:`train_ivf_centroids`
    (FAISS trains PQ codebooks on a sample too); encode/score stay
    distributed. ``dim`` must be divisible by ``m``.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    if sample is None:
        sample = _collect_sample(vectors, vec_col, sample_rows, seed)
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        S = sample[:, j * dsub : (j + 1) * dsub]
        cents = S[rng.choice(len(S), min(ksub, len(S)), replace=False)]
        for _ in range(iters):
            d = (
                (S**2).sum(1)[:, None]
                - 2 * S @ cents.T
                + (cents**2).sum(1)[None, :]
            )
            assign = d.argmin(1)
            for c in range(len(cents)):
                members = S[assign == c]
                if len(members):
                    cents[c] = members.mean(0)
        books.append(cents)
    return np.stack(books)


def pq_encode_udf(codebooks: np.ndarray):
    """Vectorized pandas UDF: embedding -> array<int> of m subspace codes
    (one nearest-centroid id per subspace; per-subspace loop, each step a
    (batch x ksub) matmul — never a (batch x m x ksub x dsub) blowup)."""
    cb = codebooks.astype(np.float64)
    m, _, dsub = cb.shape

    @F.pandas_udf("array<int>")
    def encode(col: pd.Series) -> pd.Series:
        mat = np.vstack(col.to_numpy()).astype(np.float64)
        codes = np.empty((len(mat), m), np.int32)
        for j in range(m):
            S = mat[:, j * dsub : (j + 1) * dsub]
            d = (
                (S**2).sum(1)[:, None]
                - 2 * S @ cb[j].T
                + (cb[j] ** 2).sum(1)[None, :]
            )
            codes[:, j] = d.argmin(1)
        return pd.Series(list(codes))

    return encode


def pq_encode(
    vectors: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep: list[str] | None = None,
) -> DataFrame:
    """(id, pq_norm, pq[codes]) — m ints + one float per vector. At
    m=32/ksub=64 over dim=64 floats that is ~10.7x smaller than the raw
    embedding; the true L2 norm is stored so ADC cosine needs no
    reconstruction of magnitudes."""
    norm = F.sqrt(
        F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    encode = pq_encode_udf(codebooks)
    return vectors.select(
        F.col(id_col),
        norm.alias("pq_norm"),
        encode(F.col(vec_col)).alias("pq"),
        *[F.col(c) for c in (keep or [])],
    )


def _adc_score_udf(codebooks: np.ndarray):
    """Asymmetric-distance cosine: float query vs PQ codes. Per batch,
    one gather + one elementwise product per subspace — vectorized over
    all rows regardless of how many distinct queries the batch mixes."""
    cb = codebooks.astype(np.float64)
    m, _, dsub = cb.shape

    @F.pandas_udf("double")
    def score(
        codes: pd.Series, qvec: pd.Series, pq_norm: pd.Series
    ) -> pd.Series:
        C = np.vstack(codes.to_numpy()).astype(np.int64)
        Q = np.vstack(qvec.to_numpy()).astype(np.float64)
        dot = np.zeros(len(C), np.float64)
        for j in range(m):
            dot += (cb[j][C[:, j]] * Q[:, j * dsub : (j + 1) * dsub]).sum(1)
        qn = np.sqrt((Q**2).sum(1))
        denom = np.maximum(pq_norm.to_numpy() * qn, 1e-12)
        return pd.Series(np.round(dot / denom, 4))

    return score


def _pq_topk(joined: DataFrame, codebooks: np.ndarray, id_col: str, k: int,
             distinct: bool = False) -> DataFrame:
    """Shared ADC scoring + per-query top-k over a frame with columns
    (query_id, <id_col>, pq, pq_norm, query_vec)."""
    score = _adc_score_udf(codebooks)
    scored = joined.select(
        "query_id",
        F.col(id_col),
        score(F.col("pq"), F.col("query_vec"), F.col("pq_norm")).alias(
            "cosine"
        ),
    )
    if distinct:
        scored = scored.distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def _rerank_exact(
    cands: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """FAISS-style refine step: exact-cosine re-rank of ADC candidates.

    The candidate list (queries x c*k ids — tiny) is BROADCAST against
    one corpus scan that fetches only the survivors' float vectors, so
    the re-rank costs one narrow probe regardless of corpus size; the
    quantization error of the quantized tier then only has to get the
    true neighbors into the top c*k, not rank them."""
    cand_ids = cands.select("query_id", id_col)
    fetched = vectors.select(id_col, vec_col).join(
        F.broadcast(cand_ids), id_col
    )
    scored = fetched.join(
        F.broadcast(queries.select("query_id", "query_vec")), "query_id"
    ).select(
        "query_id",
        F.col(id_col),
        F.round(_cosine("query_vec", vec_col), 4).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "cosine", "rank")
    )


def knn_pq(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    ksub: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: np.ndarray | None = None,
    refine: int = 0,
) -> DataFrame:
    """Top-k by asymmetric PQ cosine: the corpus is scanned as m-byte
    codes (narrow encode map, no shuffle), queries stay float and
    broadcast. Isotropic random embeddings are PQ's adversarial case —
    recall vs float brute force is pytest-gated on exactly that corpus.

    ``refine=c`` (FAISS IndexRefine analog): take the top ``c*k`` by
    ADC, then exact-cosine re-rank those against the float vectors —
    recall rises from ~0.88 toward ~1.0 at the cost of fetching c*k
    full vectors per query."""
    if codebooks is None:
        codebooks = train_pq_codebooks(
            vectors, dim, m=m, ksub=ksub, vec_col=vec_col
        )
    vq = pq_encode(vectors, codebooks, vec_col, id_col)
    joined = vq.crossJoin(F.broadcast(queries))
    if not refine:
        return _pq_topk(joined, codebooks, id_col, k)
    cands = _pq_topk(joined, codebooks, id_col, k * refine)
    return _rerank_exact(cands, vectors, queries, k, vec_col, id_col)


def build_ivf_pq_table(
    spark,
    vectors: DataFrame,
    root: str,
    dim: int,
    n_centroids: int = 16,
    m: int = 8,
    ksub: int = 32,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    job_id: str | None = None,
):
    """IVF-PQ: PQ codes persisted INTO the IVF cell layout — the FAISS
    IVF-PQ analog and the composition an actual 10^12-vector serving
    tier runs (cells prune files via manifest stats, codes shrink the
    probed bytes ~10-30x). Returns (BtrTable, centroids, codebooks)."""
    from btrblocks_spark.sources.table import BtrTable

    sample = _collect_sample(vectors, vec_col, 10_000, seed)
    centroids = train_ivf_centroids(
        vectors, dim, n_centroids, seed=seed, vec_col=vec_col,
        sample=sample,
    )
    codebooks = train_pq_codebooks(
        vectors, dim, m=m, ksub=ksub, seed=seed, vec_col=vec_col,
        sample=sample,
    )
    assign = ivf_assign_udf(centroids)
    qdf = pq_encode(
        vectors.withColumn("cell", assign(F.col(vec_col))),
        codebooks,
        vec_col,
        id_col,
        keep=["cell"],
    )
    table = BtrTable.create(
        spark,
        root,
        qdf,
        partition_by=["cell"],
        job_id=job_id or "ivf-pq-build",
    )
    return table, centroids, codebooks


def knn_ivf_pq(
    table,
    queries: DataFrame,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    refine: int = 0,
    vectors: DataFrame | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k over a :func:`build_ivf_pq_table` table:
    executor-side probe-cell assignment -> manifest-stats-pruned scan of
    the probed cells' PQ codes -> shared ADC scoring.

    ``refine=c`` re-ranks the top ``c*k`` ADC candidates by exact
    cosine against ``vectors`` (the float corpus — required when
    refining; the IVF-PQ table stores only codes)."""
    probes = _probe_cells_df(queries, centroids, n_probe)
    cells = sorted(
        r._cell for r in probes.select("_cell").distinct().collect()
    )
    v = table.scan(
        columns=[id_col, "pq_norm", "pq", "cell"],
        prune={"cell": cells},
    ).filter(F.col("cell").isin(cells))
    q = queries.join(F.broadcast(probes), "query_id")
    joined = v.join(F.broadcast(q), v.cell == q._cell)
    if not refine:
        return _pq_topk(joined, codebooks, id_col, k, distinct=True)
    if vectors is None:
        raise ValueError("refine needs the float `vectors` frame")
    cands = _pq_topk(joined, codebooks, id_col, k * refine, distinct=True)
    return _rerank_exact(cands, vectors, queries, k, vec_col, id_col)
