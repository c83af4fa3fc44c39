"""Training-data function tests: dedup, text, similarity, images."""

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_exact_dedup_counts(spark, docs):
    from btrblocks_spark.functions.dedup import exact_dedup

    out = exact_dedup(docs)
    total = out.agg(F.sum("dup_count")).collect()[0][0]
    assert total == docs.count()
    assert out.count() <= docs.count()


def test_ngram_jaccard_self_duplicate(spark, docs):
    from btrblocks_spark.functions.dedup import ngram_jaccard_pairs

    # plant an exact duplicate pair with distinct ids
    d = docs.limit(1).select(F.lit(900001).alias("doc_id"), "text")
    d2 = docs.limit(1).select(F.lit(900002).alias("doc_id"), "text")
    planted = docs.select("doc_id", "text").unionByName(d).unionByName(d2)
    pairs = ngram_jaccard_pairs(planted, threshold=0.99)
    hits = pairs.filter(
        (F.col("doc_a") == 900001) & (F.col("doc_b") == 900002)
    ).collect()
    assert len(hits) == 1 and hits[0].jaccard == 1.0


def test_minhash_lsh_finds_planted_dup(spark, docs):
    from btrblocks_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_fast,
    )

    d = docs.limit(1).select(F.lit(900001).alias("doc_id"), "text")
    d2 = docs.limit(1).select(F.lit(900002).alias("doc_id"), "text")
    planted = docs.select("doc_id", "text").unionByName(d).unionByName(d2)
    sigs = minhash_signatures_fast(planted)
    cands = lsh_candidate_pairs(sigs)
    assert (
        cands.filter(
            (F.col("doc_a") == 900001) & (F.col("doc_b") == 900002)
        ).count()
        == 1
    )


def test_simhash_identical_docs_same_hash(spark, docs):
    from btrblocks_spark.functions.dedup import simhash64

    d = docs.limit(1).select(F.lit(900001).alias("doc_id"), "text")
    d2 = docs.limit(1).select(F.lit(900002).alias("doc_id"), "text")
    planted = d.unionByName(d2)
    out = {r.doc_id: r.simhash for r in simhash64(planted).collect()}
    assert out[900001] == out[900002]


def test_lang_id_obvious_cases(spark):
    from btrblocks_spark.functions.text import lang_id

    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in the house that was for it"),
            (2, "der hund und die katze ist von den nicht ein haus mit"),
            (3, "le chat est dans la maison pour les amis et une fois des"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr"
    assert out[4] == "und"


def test_knn_self_is_nearest(spark):
    from btrblocks_spark.functions.similarity import knn_bruteforce

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_bruteforce(emb, q, k=3).collect()
    best = [r for r in out if r.rank == 1][0]
    assert best.vec_id == 0 and best.cosine == 1.0


def test_knn_lsh_subset_of_bruteforce_universe(spark):
    from btrblocks_spark.functions.similarity import knn_lsh

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    out = knn_lsh(emb, q, dim=dim, k=3, nbits=6).collect()
    assert any(r.vec_id == 0 and r.rank == 1 for r in out)


def test_image_roundtrip_and_psnr():
    from btrblocks_spark.functions.images import (
        decode_image,
        encode_image,
        psnr,
    )

    rng = np.random.default_rng(0)
    px = rng.integers(0, 256, (64, 48, 3)).astype(np.uint8)
    for fmt in ("bmp", "png"):
        assert np.array_equal(decode_image(encode_image(px, fmt)), px)
    lossy = decode_image(encode_image(px, "jpeg"))
    assert psnr(px, lossy) >= 40.0


def test_image_decode_stats_kernel(spark):
    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.functions.images import decode_stats_batches

    df = spark.createDataFrame(image_caption_table(50, seed=5))
    out = df.select("image_id", "bytes").mapInArrow(
        decode_stats_batches, "image_id string, pixel_mean double, pixel_std double"
    )
    rows = out.collect()
    assert len(rows) == 50
    assert all(0 <= r.pixel_mean <= 255 for r in rows)


def test_phash_near_pairs(spark):
    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.functions.dedup import phash_near_pairs

    df = spark.createDataFrame(
        image_caption_table(400, seed=21).select(["image_id", "phash"])
    )
    pairs = phash_near_pairs(df, max_hamming=4)
    rows = pairs.collect()
    # the fixture's hot phash band guarantees near-duplicates exist
    assert len(rows) > 0
    assert all(r.hamming <= 4 and r.id_a != r.id_b for r in rows)


def test_ordered_dense_ids_matches_dense_rank(spark):
    from pyspark.sql import Window

    from btrblocks_spark.functions.dedup import _ordered_dense_ids

    vals = [("w%04d" % (i * 7919 % 1000),) for i in range(500)]
    df = spark.createDataFrame(vals, ["tok"]).repartition(8)
    got = _ordered_dense_ids(df, "tok", "tid", num_ranges=16)
    ref = (
        df.select("tok")
        .distinct()
        .withColumn(
            "tid", F.dense_rank().over(Window.orderBy("tok")).cast("long")
        )
    )
    assert got.count() == ref.count()
    assert (
        got.alias("g")
        .join(ref.alias("r"), "tok")
        .filter(F.col("g.tid") != F.col("r.tid"))
        .count()
        == 0
    )


def test_ngram_jaccard_hot_shingle_cap_bounds_buckets(spark):
    """A stop-shingle shared by every doc must not create a quadratic
    bucket: with max_doc_freq below the hot shingle's df, the candidate
    join never sees it, and pairs only arise from genuinely shared rare
    shingles."""
    from btrblocks_spark.functions.dedup import ngram_jaccard_pairs, shingles

    # 200 docs, all sharing the hot prefix "aaaaa..."; the tails are
    # constructed so no 5-gram is shared across docs (every 5-char
    # substring pins the zero-padded doc number)
    rows = [
        (i, "aaaaaaaaaa u%03dv%03dw%03d" % (i, i, i)) for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sh = shingles(df)
    max_df = sh.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert max_df == 200  # the planted hot shingles hit every doc

    capped = ngram_jaccard_pairs(df, threshold=0.1, max_doc_freq=50)
    uncapped = ngram_jaccard_pairs(df, threshold=0.1, max_doc_freq=10**6)
    # uncapped: every doc pair shares the hot shingles -> quadratic pairs
    assert uncapped.count() == 200 * 199 // 2
    # capped: hot shingles dropped; the few remaining shared rare
    # shingles fall below the jaccard threshold -> no pairs
    assert capped.count() == 0


def test_knn_lsh_det_recall_gate(spark):
    """The deterministic banded LSH must reach recall@5 >= 0.8 against
    brute force — the ANN quality gate, mirrored by the DuckDB oracle of
    the knn_recall_lsh query."""
    from btrblocks_spark.functions.similarity import (
        knn_bruteforce,
        knn_lsh_det,
        knn_recall,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn_bruteforce(emb, q, k=5)
    ann = knn_lsh_det(emb, q, dim=dim, k=5, nbits=3, bands=16)
    recalls = [r.recall_at_k for r in knn_recall(ann, exact, k=5).collect()]
    assert len(recalls) == 3
    assert sum(recalls) / len(recalls) >= 0.8


def test_embedding_near_dup_lsh_subset_of_exact(spark):
    """LSH near-dup pairs must be a subset of the exact all-pairs result
    (bucketing can only drop candidates, never invent cosine)."""
    from btrblocks_spark.functions.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = embedding_near_dup_pairs(emb, threshold=0.4, use_lsh=False)
    lsh = embedding_near_dup_pairs(emb, threshold=0.4, use_lsh=True, nbits=6)
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    l = {(r.id_a, r.id_b) for r in lsh.collect()}
    assert len(e) > 0
    assert l.issubset(e)


def test_ivf_table_probe_matches_inmemory_ivf(spark, tmp_path):
    """IVF cells persisted into the table layout: the stats-pruned probe
    scan must return the same top-k as the in-memory knn_ivf with the
    same centroids, and the probe must open fewer files than the table
    holds."""
    from btrblocks_spark.functions.similarity import (
        build_ivf_table,
        knn_ivf,
        knn_ivf_scan,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    dim = len(emb.select("embedding").first()[0])
    root = str(tmp_path / "ivftab")
    table, cents = build_ivf_table(
        spark, emb, root, dim=dim, n_centroids=8
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = knn_ivf_scan(table, q, cents, k=5, n_probe=2)
    want = knn_ivf(
        emb, q, dim=dim, k=5, n_centroids=8, n_probe=2, centroids=cents
    )
    g = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in got.collect()}
    w = {(r.query_id, r.rank): (r.vec_id, r.cosine) for r in want.collect()}
    assert g == w and len(g) == 15

    # pruning actually skips files: per-cell file stats are disjoint
    import json

    rows = table.data_files()
    assert len(rows) >= 8  # one file per cell partition at least
    probed_cells = set()
    for r in rows:
        st = json.loads(r["stats"])
        assert st["cell"]["min"] == st["cell"]["max"]  # partitioned build

    # SET-based pruning: probing cells {0, 7} of 8 must not open any
    # file of the mid-range cells 1..6 (a (0,7) range prune would read
    # every file in between) — checked on both the driver-side matcher
    # and its Catalyst twin
    from btrblocks_spark.sources.table import (
        _file_may_match,
        _prune_predicate,
    )

    survivors = {
        r["file_path"]
        for r in rows
        if _file_may_match(r, {"cell": [0, 7]})
    }
    want_files = {
        r["file_path"]
        for r in rows
        if int(json.loads(r["stats"])["cell"]["min"]) in (0, 7)
    }
    assert survivors == want_files and survivors
    mid = {
        r["file_path"]
        for r in rows
        if 1 <= int(json.loads(r["stats"])["cell"]["min"]) <= 6
    }
    assert not (survivors & mid)
    catalyst = {
        r.file_path
        for r in table.manifest_df()
        .filter(_prune_predicate({"cell": [0, 7]}))
        .select("file_path")
        .collect()
    }
    assert catalyst == survivors


def test_knn_lsh_fast_recall_gate(spark):
    """The production (numpy) LSH path must reach recall@5 >= 0.8
    against brute force on the fixture corpus — the same gate the det
    path has, now covering the fast path (banded OR-construction +
    hamming-1 multi-probe)."""
    from btrblocks_spark.functions.similarity import (
        knn_bruteforce,
        knn_lsh,
        knn_recall,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_bruteforce(emb, q, k=5)
    ann = knn_lsh(emb, q, dim=dim, k=5)
    rec = knn_recall(ann, exact, k=5).agg(
        F.avg("recall_at_k").alias("r")
    ).collect()[0].r
    assert rec >= 0.8, f"fast-path recall@5 {rec}"


def test_minhash_fast_path_recall_vs_exact_jaccard(spark, docs):
    """Quantified recall for the xxhash64 MinHash LSH fast path: its
    candidate set must contain >= 80% of the TRUE near-dup pairs
    (char-5-gram Jaccard >= 0.8, the oracle-checked operator), with
    planted duplicates making the truth set non-vacuous."""
    from btrblocks_spark.functions.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_fast,
        ngram_jaccard_pairs,
    )

    base = docs.select("doc_id", "text")
    planted = base
    for i, r in enumerate(base.limit(8).collect()):
        planted = planted.unionByName(
            spark.createDataFrame(
                [(900001 + i, r.text)], "doc_id long, text string"
            )
        )
    truth = (
        ngram_jaccard_pairs(planted, threshold=0.8)
        .select("doc_a", "doc_b")
        .cache()
    )
    n_truth = truth.count()
    assert n_truth >= 8  # the planted dups at minimum
    cands = lsh_candidate_pairs(minhash_signatures_fast(planted))
    found = truth.join(cands, ["doc_a", "doc_b"]).count()
    assert found / n_truth >= 0.8, (found, n_truth)


def test_knn_quantized_recall_vs_float(spark):
    """SQ8 cosine ranking must track the float ground truth:
    recall@5 >= 0.8 on the fixture corpus (4x-smaller vectors are the
    scale trade, not a quality cliff)."""
    from btrblocks_spark.functions.similarity import (
        knn_bruteforce,
        knn_quantized,
        knn_recall,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn_bruteforce(emb, q, k=5)
    quant = knn_quantized(emb, q, k=5)
    rec = knn_recall(quant, exact, k=5).agg(
        F.avg("recall_at_k").alias("r")
    ).collect()[0].r
    assert rec >= 0.8, f"SQ8 recall@5 {rec}"


def test_quantize_embeddings_codes_bounded(spark):
    from btrblocks_spark.functions.similarity import quantize_embeddings

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qd = quantize_embeddings(emb)
    row = qd.selectExpr(
        "max(array_max(transform(q, x -> abs(x)))) as mx",
        "min(q_scale) as smin",
    ).collect()[0]
    assert row.mx <= 127 and row.smin > 0


def test_ngram_repetition_edges(spark):
    from btrblocks_spark.functions.text import ngram_repetition

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam"),   # one distinct bigram
            (2, "a b c d"),                     # all distinct
            (3, "word"),                        # < n tokens -> 0 grams
            (4, ""),                            # empty
            (5, "A  b!a B"),                    # case/punct normalization
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_grams, r.n_distinct, r.rep_frac)
           for r in ngram_repetition(docs, n=2).collect()}
    assert got[1] == (4, 1, 0.75)
    assert got[2] == (3, 3, 0.0)
    assert got[3] == (0, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
    # "a b", "b a", "a b" -> 3 grams, 2 distinct
    assert got[5] == (3, 2, round(1 - 2 / 3, 6))


def test_decontaminate_removes_sharing_docs(spark):
    from btrblocks_spark.functions.text import decontaminate

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
            (3, "prefix quick brown fox jumps suffix tail words"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "xx quick brown fox jumps yy")], "doc_id long, text string"
    )
    kept = sorted(
        r.doc_id for r in decontaminate(corpus, bench, n=4).collect()
    )
    assert kept == [2]  # docs 1 and 3 share the 4-gram "quick brown fox jumps"


def test_dedup_paragraphs_first_occurrence_wins(spark):
    from btrblocks_spark.functions.dedup import dedup_paragraphs

    docs = spark.createDataFrame(
        [
            (1, "alpha beta\n\nshared boilerplate\n\ngamma"),
            (2, "shared boilerplate\n\ndelta"),      # para 0 is a repeat
            (3, "SHARED BOILERPLATE"),               # normalized repeat only
            (4, "\n\n\n\n"),                          # all empty -> drops
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in dedup_paragraphs(docs).collect()}
    assert got[1].text == "alpha beta\n\nshared boilerplate\n\ngamma"
    assert (got[1].n_kept, got[1].n_total) == (3, 3)
    assert got[2].text == "delta"
    assert (got[2].n_kept, got[2].n_total) == (1, 2)
    assert 3 not in got      # lost its only (normalized-dup) paragraph
    assert 4 not in got      # empty paragraphs never count


def test_scrub_pii_redacts_and_counts(spark):
    from btrblocks_spark.functions.text import scrub_pii

    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-ample.org and d@e.io here"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call 555-123-4567 or 555.987.6543"),
            (4, "clean text, no pii at all"),
            (5, "combo x@y.com 1.2.3.4 111-222-3333"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in scrub_pii(docs).collect()}
    assert got[1].text == "mail <EMAIL> and <EMAIL> here"
    assert got[1].n_email == 2 and got[1].n_ipv4 == 0
    assert got[2].text == "server <IP> and <IP> up"
    assert got[2].n_ipv4 == 2
    assert got[3].text == "call <PHONE> or <PHONE>"
    assert got[3].n_phone == 2
    assert got[4].text == "clean text, no pii at all"
    assert (got[4].n_email, got[4].n_ipv4, got[4].n_phone) == (0, 0, 0)
    assert got[5].text == "combo <EMAIL> <IP> <PHONE>"


def test_corpus_report_grouping_sets(spark):
    from btrblocks_spark.functions.text import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "en", "web", "alpha beta"),
            (2, "en", "web", "alpha beta"),   # exact dup of 1
            (3, "en", "book", "gamma delta"),
            (4, "de", "web", "eins zwei"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    got = {(r.lang, r.source): r for r in corpus_report(docs).collect()}
    assert len(got) == 3 + 2 + 2 + 1  # cells + lang rollup + source rollup + total
    top = got[("<all>", "<all>")]
    assert (top.n_docs, top.n_unique) == (4, 3)
    assert top.dup_frac == 0.25
    assert top.total_tokens == 8
    en_web = got[("en", "web")]
    assert (en_web.n_docs, en_web.n_unique, en_web.dup_frac) == (2, 1, 0.5)
    assert got[("de", "<all>")].n_docs == 1


def test_vocabulary_counts_and_topk(spark):
    from btrblocks_spark.functions.text import vocabulary

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "apple cherry"), (3, None)],
        "doc_id long, text string",
    )
    rows = vocabulary(docs).collect()
    # r.count would resolve to Row.count() — index the column by name
    assert [(r.token, r["count"], r.doc_freq) for r in rows] == [
        ("apple", 3, 2), ("banana", 1, 1), ("cherry", 1, 1),
    ]
    assert [r.token for r in vocabulary(docs, top_k=1).collect()] == ["apple"]
    assert [r.token for r in vocabulary(docs, min_count=2).collect()] == ["apple"]
