"""Edge-case text fixtures (nulls, empties, unicode, whitespace-only)
through the text-analysis and dedup family — cheap insurance that the
oracle-green suite keeps catching regressions as operators evolve."""

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def edge_docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   \t\n  "),
            (4, "héllo wörld — déjà vu naïve façade"),
            (5, "日本語のテキストです。これはテストです。"),
            (6, "the quick brown fox jumps over the lazy dog " * 5),
            (7, "the quick brown fox jumps over the lazy dog " * 5),
            (8, "a"),
            (9, "123 456 789 !!! ??? ..."),
        ],
        "doc_id long, text string",
    )


def test_quality_and_tokens_handle_nulls(edge_docs):
    from btrblocks_spark.functions.text import quality_score, token_count

    q = {r.doc_id: r for r in quality_score(edge_docs).collect()}
    assert len(q) == 9  # no row dropped
    for d in (1, 2, 3):
        assert (q[d].n_tokens or 0) == 0
        assert (q[d].quality or 0.0) == 0.0
    assert q[6].quality > 0.3

    t = {r.doc_id: r.n_tokens for r in token_count(edge_docs).collect()}
    assert (t[1] or 0) == 0 and (t[2] or 0) == 0
    assert t[5] >= 0  # unicode text must not crash the tokenizer
    assert t[6] == 45


def test_lang_id_und_for_degenerate_docs(edge_docs):
    from btrblocks_spark.functions.text import lang_id

    out = {r.doc_id: r.pred_lang for r in lang_id(edge_docs).collect()}
    for d in (1, 2, 3, 5, 8, 9):
        assert out[d] == "und", (d, out[d])
    assert out[6] == "en"


def test_fingerprint_and_exact_dedup_on_edges(edge_docs):
    from btrblocks_spark.functions.dedup import exact_dedup
    from btrblocks_spark.functions.text import fingerprint

    fp = {r.doc_id: r.fingerprint for r in fingerprint(edge_docs).collect()}
    assert fp[6] == fp[7]  # identical docs share a fingerprint
    assert fp[2] == fp[3]  # whitespace-only normalizes to empty

    groups = exact_dedup(edge_docs).collect()
    by_keep = {r.keep_doc_id: r.dup_count for r in groups}
    assert by_keep.get(6) == 2  # 6 and 7 collapse, keeper is min id


def test_ngram_jaccard_ignores_degenerate_docs(edge_docs):
    from btrblocks_spark.functions.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(edge_docs, threshold=0.3).collect()
    ids = {(r.doc_a, r.doc_b) for r in pairs}
    assert (6, 7) in ids  # the identical pair is found
    for a, b in ids:  # null/empty/short docs never form pairs
        assert a not in (1, 2, 3, 8) and b not in (1, 2, 3, 8)


def test_minhash_and_simhash_skip_nulls(edge_docs):
    from btrblocks_spark.functions.dedup import (
        minhash_signatures,
        simhash_det,
    )

    sigs = minhash_signatures(edge_docs)
    docs_with_sigs = {
        r.doc_id for r in sigs.select("doc_id").distinct().collect()
    }
    assert 1 not in docs_with_sigs and 2 not in docs_with_sigs
    assert {6, 7} <= docs_with_sigs

    sh = {r.doc_id: r.simhash for r in simhash_det(edge_docs).collect()}
    assert sh[6] == sh[7]


def test_repetition_and_pii_handle_edges(edge_docs):
    from btrblocks_spark.functions.text import ngram_repetition, scrub_pii

    rep = {r.doc_id: r for r in ngram_repetition(edge_docs, n=2).collect()}
    assert len(rep) == 9
    for d in (1, 2, 3, 8):  # null/empty/ws/single-token -> 0 grams, frac 0
        assert (rep[d].n_grams, rep[d].rep_frac) == (0, 0.0)
    # 5x-repeated sentence: 44 bigrams, 9 distinct -> 1 - 9/44
    assert rep[6].rep_frac == round(1 - 9 / 44, 6)
    assert rep[4].n_grams > 0             # unicode must not crash

    pii = {r.doc_id: r for r in scrub_pii(edge_docs).collect()}
    assert len(pii) == 9
    assert pii[1].text is None            # null propagates, never throws
    assert (pii[1].n_email or 0) == 0
    assert pii[4].text == "héllo wörld — déjà vu naïve façade"


def test_dedup_paragraphs_and_decontaminate_edges(edge_docs):
    from btrblocks_spark.functions.dedup import dedup_paragraphs
    from btrblocks_spark.functions.text import decontaminate

    out = {r.doc_id: r for r in dedup_paragraphs(edge_docs).collect()}
    # null/empty/whitespace docs contribute no paragraphs and vanish
    for d in (1, 2, 3):
        assert d not in out
    # identical docs 6/7: 6 keeps its (single) paragraph, 7 loses it
    assert 6 in out and 7 not in out
    assert out[6].n_kept == 1 and out[6].n_total == 1
    assert out[5].text.strip() != ""      # unicode paragraph survives

    bench = edge_docs.filter(F.col("doc_id") == 7)  # shares all of 6's grams
    kept = sorted(
        r.doc_id
        for r in decontaminate(
            edge_docs.filter(F.col("doc_id") != 7), bench, n=4
        ).collect()
    )
    # doc 6 contaminated; null/empty/short docs have no 4-grams -> kept
    assert kept == [1, 2, 3, 4, 5, 8, 9]
