"""Scale-shape guarantees for the ANN paths: distributed probe
assignment (no driver collect of query batches) and the IVF-SQ8
composition (int8 codes in the IVF cell layout)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _queries_df(spark, n, dim=8):
    """Deterministic synthetic query batch, generated executor-side."""
    arr = F.array(
        *[((F.col("id") * 7 + i) % 13 - 6).cast("float") for i in range(dim)]
    )
    return spark.range(n).select(
        F.col("id").alias("query_id"), arr.alias("query_vec")
    )


def test_knn_ivf_large_query_batch_never_collects_queries(spark):
    """10^4-query batch: probe-cell assignment happens in executors.
    DataFrame.collect is patched to raise for the whole plan+execute
    window — the old driver-side probe loop would trip it."""
    from pyspark.sql import DataFrame

    from btrblocks_spark.functions.similarity import knn_ivf

    dim = 8
    corpus = _queries_df(spark, 500, dim).select(
        F.col("query_id").alias("vec_id"),
        F.col("query_vec").alias("embedding"),
    )
    rng = np.random.default_rng(7)
    cents = rng.standard_normal((8, dim))
    queries = _queries_df(spark, 10_000, dim)

    real_collect = DataFrame.collect

    def deny(self):
        raise AssertionError("driver-side collect during knn_ivf")

    DataFrame.collect = deny
    try:
        out = knn_ivf(
            corpus, queries, dim=dim, k=1, n_probe=1, centroids=cents
        ).toPandas()
    finally:
        DataFrame.collect = real_collect
    assert len(out) == 10_000
    assert out["rank"].max() == 1


def test_knn_ivf_sq8_recall_gate(spark, tmp_path):
    """IVF-SQ8 with all cells probed isolates the quantization loss:
    recall@5 vs float brute force must stay >= 0.8 (random embeddings,
    SQ8 distortion is tiny)."""
    from btrblocks_spark.functions.similarity import (
        build_ivf_sq8_table,
        knn_bruteforce,
        knn_ivf_sq8,
        knn_recall,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    table, cents = build_ivf_sq8_table(
        spark, emb, str(tmp_path / "sq8tab"), dim=dim, n_centroids=8
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = knn_ivf_sq8(table, q, cents, k=5, n_probe=8)
    exact = knn_bruteforce(emb, q, k=5)
    recalls = [
        r.recall_at_k for r in knn_recall(ann, exact, k=5).collect()
    ]
    assert len(recalls) == 3
    assert sum(recalls) / len(recalls) >= 0.8


def test_knn_ivf_sq8_probe_stays_in_probed_cells(spark, tmp_path):
    from btrblocks_spark.functions.similarity import (
        build_ivf_sq8_table,
        knn_ivf_sq8,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    table, cents = build_ivf_sq8_table(
        spark, emb, str(tmp_path / "sq8p"), dim=dim, n_centroids=8
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = knn_ivf_sq8(table, q, cents, k=5, n_probe=2).toPandas()
    assert len(got) == 15

    # every returned neighbor must live in one of its query's probe cells
    vecs = {
        r.vec_id: np.asarray(r.embedding, np.float64)
        for r in emb.collect()
    }

    def cell_of(v):
        return int(((cents - v) ** 2).sum(1).argmin())

    def probes_of(v, n=2):
        d = ((cents - v) ** 2).sum(1)
        return set(np.argsort(d, kind="stable")[:n].tolist())

    for row in got.itertuples():
        assert cell_of(vecs[row.vec_id]) in probes_of(vecs[row.query_id])


def test_knn_pq_recall_gate(spark):
    """PQ ADC top-k vs float brute force on the random-embedding corpus
    — PQ's adversarial case (isotropic subspaces, nothing for k-means
    to exploit). m=32/ksub=64 over dim=64 measured ~0.88 recall@5 in a
    numpy prototype; gate at 0.7 to absorb sampling seeds."""
    from btrblocks_spark.functions.similarity import (
        knn_bruteforce,
        knn_pq,
        knn_recall,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    ann = knn_pq(emb, q, dim=dim, k=5, m=32, ksub=64)
    exact = knn_bruteforce(emb, q, k=5)
    recalls = [r.recall_at_k for r in knn_recall(ann, exact, k=5).collect()]
    assert len(recalls) == 10
    assert sum(recalls) / len(recalls) >= 0.7


def test_knn_ivf_pq_probe_and_code_width(spark, tmp_path):
    """IVF-PQ composition: codes persisted in the cell layout are m ints
    wide, a 2-cell probe returns only vectors from probed cells, and
    all-cells probing matches plain knn_pq's results exactly (same
    codebooks => same ADC scores)."""
    from btrblocks_spark.functions.similarity import (
        build_ivf_pq_table,
        knn_ivf_pq,
        knn_pq,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    table, cents, books = build_ivf_pq_table(
        spark, emb, str(tmp_path / "pqtab"), dim=dim,
        n_centroids=8, m=16, ksub=32,
    )
    assert books.shape == (16, 32, dim // 16)
    got_codes = table.scan(columns=["pq"]).first()
    assert len(got_codes.pq) == 16

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    # all-cells probe == exhaustive ADC: must equal knn_pq bit-for-bit
    full = knn_ivf_pq(table, q, cents, books, k=5, n_probe=8).toPandas()
    plain = knn_pq(
        emb, q, dim=dim, k=5, codebooks=books
    ).toPandas()
    full = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    plain = plain.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (full["vec_id"] == plain["vec_id"]).all()
    assert np.allclose(full["cosine"], plain["cosine"])

    # narrow probe stays within probed cells
    narrow = knn_ivf_pq(table, q, cents, books, k=5, n_probe=2).toPandas()
    assert len(narrow) == 15
    vecs = {r.vec_id: np.asarray(r.embedding, np.float64) for r in emb.collect()}

    def probes_of(v, n=2):
        d = ((cents - v) ** 2).sum(1)
        return set(np.argsort(d, kind="stable")[:n].tolist())

    for row in narrow.itertuples():
        qp = probes_of(vecs[row.query_id])
        vc = int(((cents - vecs[row.vec_id]) ** 2).sum(1).argmin())
        assert vc in qp


def test_knn_pq_refine_raises_recall(spark):
    """FAISS IndexRefine analog: exact-cosine re-rank of the top c*k
    ADC candidates. On the adversarial random corpus plain PQ sits
    ~0.88; refine=4 must clear 0.9 and dominate the unrefined run."""
    from btrblocks_spark.functions.similarity import (
        knn_bruteforce,
        knn_pq,
        knn_recall,
        train_pq_codebooks,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    books = train_pq_codebooks(emb, dim, m=32, ksub=64)
    exact = knn_bruteforce(emb, q, k=5)

    def mean_recall(ann):
        rs = [r.recall_at_k for r in knn_recall(ann, exact, k=5).collect()]
        assert len(rs) == 10
        return sum(rs) / len(rs)

    plain = mean_recall(knn_pq(emb, q, dim=dim, k=5, codebooks=books))
    refined = mean_recall(
        knn_pq(emb, q, dim=dim, k=5, codebooks=books, refine=4)
    )
    assert refined >= 0.9
    assert refined >= plain


def test_knn_ivf_pq_refine(spark, tmp_path):
    """IVF-PQ + refine: all-cells probe with exact re-rank must equal
    brute force exactly (candidates contain the true top-k; exact
    cosine then ranks them identically)."""
    from btrblocks_spark.functions.similarity import (
        build_ivf_pq_table,
        knn_bruteforce,
        knn_ivf_pq,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    table, cents, books = build_ivf_pq_table(
        spark, emb, str(tmp_path / "pqr"), dim=dim,
        n_centroids=8, m=32, ksub=64,
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="vectors"):
        knn_ivf_pq(table, q, cents, books, k=5, n_probe=8, refine=20)
    got = knn_ivf_pq(
        table, q, cents, books, k=5, n_probe=8, refine=100,
        vectors=emb,
    ).toPandas().sort_values(["query_id", "rank"]).reset_index(drop=True)
    want = knn_bruteforce(emb, q, k=5).toPandas().sort_values(
        ["query_id", "rank"]
    ).reset_index(drop=True)
    assert (got["vec_id"] == want["vec_id"]).all()
    assert np.allclose(got["cosine"], want["cosine"])


def test_distributed_kmeans_trainer(spark):
    """Flag-gated full-table trainer: quantization error within 15% of
    the sampled trainer (here the 'sample' IS the full corpus, so the
    distributed result should be at least as good), and NO vector rows
    cross to the driver — the per-iteration collect carries exactly
    n_partitions x n_centroids partial rows."""
    from btrblocks_spark.functions.similarity import (
        train_ivf_centroids,
        train_kmeans_distributed,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    mat = np.vstack(
        emb.select("embedding").toPandas()["embedding"].to_numpy()
    ).astype(np.float64)

    def qerr(cents):
        d = (
            (mat**2).sum(1)[:, None]
            - 2 * mat @ cents.T
            + (cents**2).sum(1)[None, :]
        )
        return float(d.min(1).mean())

    samp = train_ivf_centroids(emb, dim, n_centroids=8, seed=42)
    dist = train_ivf_centroids(
        emb, dim, n_centroids=8, seed=42, distributed=True
    )
    assert dist.shape == samp.shape == (8, dim)
    assert qerr(dist) <= qerr(samp) * 1.15

    # guard: the trainer's jobs never move a vector column to the
    # driver — its collect rows are (cell, cnt, s) partials only
    from pyspark.sql import DataFrame as _DF

    orig = _DF.collect
    seen = []

    def spy(self):
        seen.append(self.columns)
        return orig(self)

    _DF.collect = spy
    try:
        train_kmeans_distributed(emb, dim, n_centroids=4, iters=2)
    finally:
        _DF.collect = orig
    for cols in seen:
        assert "embedding" not in cols, cols
