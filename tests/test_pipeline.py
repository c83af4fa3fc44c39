"""Composed-curation pipeline: each stage's drop is attributable, and
the composition equals running the stages by hand."""

from pyspark.sql import functions as F


def test_curate_corpus_stage_funnel(spark):
    from btrblocks_spark.functions.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [
            # kept end-to-end (en, high quality, low repetition)
            (1, "the quick brown fox jumps over that lazy dog and runs to "
                "its den for it was tired of all this running in circles " * 3),
            # exact dup of 1 -> dropped at stage 1
            (2, "the quick brown fox jumps over that lazy dog and runs to "
                "its den for it was tired of all this running in circles " * 3),
            # german -> dropped at stage 2 (lang)
            (3, "der hund und die katze sind von den nicht ein haus und "
                "der mann ist mit den kindern von der stadt " * 3),
            # degenerate repetition (rep_frac ~0.99) -> dropped at stage 3
            (4, "the spam for spam the spam for spam " * 30),
            # shares a 4-gram with the benchmark -> dropped at stage 4
            (5, "wholly original text here except secret benchmark answer "
                "phrase appears and it is long enough to pass the quality "
                "floor for this test of the decontamination stage in full " * 2),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(99, "the secret benchmark answer phrase is hidden")],
        "doc_id long, text string",
    )
    out = curate_corpus(
        docs, benchmark=bench, lang="en", min_quality=0.1,
        max_rep=0.8, rep_n=2, decontam_n=4,
    )
    kept = {r.doc_id: r for r in out.collect()}
    assert set(kept) == {1}
    assert kept[1].n_tokens > 0 and kept[1].quality > 0.1
    # paragraph dedup is a no-op on single-paragraph docs; scrub too
    assert "quick brown fox" in kept[1].text


def test_curate_corpus_optional_stages_off(spark):
    from btrblocks_spark.functions.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over that lazy dog for fun and "
             "it was a very good day in the park with all the dogs " * 2)],
        "doc_id long, text string",
    )
    # no benchmark, repetition gate disabled -> doc survives untouched
    out = curate_corpus(docs, benchmark=None, min_quality=0.0).collect()
    assert len(out) == 1 and out[0].doc_id == 1


def test_curate_corpus_custom_column_names(spark):
    from btrblocks_spark.functions.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [(7, "the quick brown fox jumps for it was a fine day in the "
             "park and all of the dogs ran to the gate " * 2)],
        "id long, body string",
    )
    out = curate_corpus(
        docs, min_quality=0.0, text_col="body", id_col="id"
    ).collect()
    assert len(out) == 1 and out[0].id == 7
    assert "quick brown fox" in out[0].body
