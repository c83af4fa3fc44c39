"""Connected components (alternating star) + duplicate-cluster canon."""

import pytest
from pyspark.sql import functions as F

from btrblocks_spark.functions.graph import (
    canonical_docs,
    connected_components,
    dedup_clusters,
)


def _cc_map(df):
    return {r.node: r.component for r in df.collect()}


def test_basic_components(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21), (21, 20)],
        "u long, v long",
    )
    assert _cc_map(connected_components(edges)) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20,
    }


def test_long_chain_converges_fast(spark):
    """A 200-node chain has diameter 199: naive min-label propagation
    would need ~200 rounds; alternating star must finish in <= 15."""
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "u long, v long"
    )
    cc = _cc_map(connected_components(chain, max_rounds=15))
    assert set(cc.values()) == {0} and len(cc) == 200


def test_self_loops_ignored(spark):
    edges = spark.createDataFrame([(5, 5), (5, 6)], "u long, v long")
    assert _cc_map(connected_components(edges)) == {5: 5, 6: 5}


def test_non_convergence_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(40)], "u long, v long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=1)


def test_dedup_clusters_with_singletons(spark):
    ids = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 9)], "doc_a long, doc_b long"
    )
    m = {
        r.doc_id: r.cluster_id
        for r in dedup_clusters(pairs, all_ids=ids).collect()
    }
    assert len(m) == 12
    assert m[1] == m[2] == m[5] == 1
    assert m[7] == m[9] == 7
    assert m[0] == 0 and m[11] == 11  # singletons label themselves


def test_canonical_docs_keeps_longest(spark):
    docs = spark.createDataFrame(
        [(1, "aa", 2), (2, "aaaa", 4), (5, "aaa", 3), (8, "b", 1)],
        "doc_id long, text string, n_chars long",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 5)], "doc_a long, doc_b long")
    clusters = dedup_clusters(pairs, all_ids=docs.select("doc_id"))
    kept = {r.doc_id: (r.cluster_id, r.cluster_size)
            for r in canonical_docs(docs, clusters).collect()}
    # cluster {1,2,5} keeps doc 2 (longest); singleton 8 survives
    assert kept == {2: (1, 3), 8: (8, 1)}
