"""Incremental curation from CDC: refresh == full batch re-curation,
across appends (with duplicate steals), MOR deletes (ownership
re-election), in-place updates, and crash replay (exactly-once)."""

import pytest
from pyspark.sql import functions as F

import btrblocks_spark.functions.incremental as inc
from btrblocks_spark.functions.incremental import (
    init_curation,
    refresh_curation,
)
from btrblocks_spark.functions.pipeline import curate_corpus
from btrblocks_spark.operators.rowops import delete_where
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable

MINQ = 0.01

P_SHARED = "the shared boilerplate paragraph one and the same words"
P_FOX = "the quick brown fox jumps over the lazy dog and the cat"
P_D3 = "another unique paragraph for doc three with the words and more"

BASE = [
    ("d001", f"{P_FOX}\n\n{P_SHARED}\n\nthe unique tail of doc one"),
    ("d002", f"{P_FOX}\n\n{P_SHARED}\n\nthe unique tail of doc one"),
    ("d003", f"{P_SHARED}\n\n{P_D3}"),
    ("d004", "12345 67890\n\n!!! ### 000"),  # quality gate fail
    ("d005", "contact the writer at bob@example.com and the story "
             "continues with the usual words\n\nthe number is "
             "555-123-4567 and the end"),
]

BENCH = [("b1", "le monde entier est un theatre dit le poete")]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def _batch(src, benchmark):
    return curate_corpus(
        src.scan(columns=["doc_id", "text"]),
        benchmark=benchmark,
        min_quality=MINQ,
    )


def _sorted(df):
    return sorted(
        (r.doc_id, r.text, r.n_tokens, r.quality) for r in df.collect()
    )


@pytest.fixture()
def setup(spark, tmp_path):
    src = BtrTable.create(
        spark, str(tmp_path / "src"), _docs(spark, BASE), num_files=2,
        job_id="src0",
    )
    bench = _docs(spark, BENCH)
    out = init_curation(
        src, str(tmp_path / "cur"), benchmark=bench, min_quality=MINQ,
        job_id="init0",
    )
    return src, out, bench


def test_init_matches_batch(spark, setup):
    src, out, bench = setup
    got = _sorted(out.scan())
    want = _sorted(_batch(src, bench))
    assert got == want
    ids = {r[0] for r in got}
    assert "d002" not in ids  # exact dup of d001
    assert "d004" not in ids  # quality fail
    d3 = next(r for r in got if r[0] == "d003")
    assert P_SHARED not in d3[1]  # paragraph owned by d001
    d5 = next(r for r in got if r[0] == "d005")
    assert "<EMAIL>" in d5[1] and "<PHONE>" in d5[1]


def test_append_refresh_matches_batch(spark, setup):
    src, out, bench = setup
    # d010: exact dup of d001 (dropped); d011 repeats d003's unique
    # paragraph (sub-doc dedup); d012 fresh
    src.append(_docs(spark, [
        ("d010", f"{P_FOX}\n\n{P_SHARED}\n\nthe unique tail of doc one"),
        ("d011", f"{P_D3}\n\nthe fresh paragraph of doc eleven and such"),
        ("d012", "the completely fresh words of doc twelve and the rest"),
    ]), job_id="a1")
    r = refresh_curation(src, out, benchmark=bench, job_id="r1")
    assert not r["noop"]
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    got = {x[0]: x[1] for x in _sorted(out.scan())}
    assert "d010" not in got
    assert P_D3 not in got["d011"]

    # second append: d000 has a SMALLER id than d001 with the same
    # content — it steals exact-dedup ownership AND every paragraph
    src.append(_docs(spark, [
        ("d000", f"{P_FOX}\n\n{P_SHARED}\n\nthe unique tail of doc one"),
    ]), job_id="a2")
    refresh_curation(src, out, benchmark=bench, job_id="r2")
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    ids = {x[0] for x in _sorted(out.scan())}
    assert "d000" in ids and "d001" not in ids


def test_delete_reelects_ownership(spark, setup):
    src, out, bench = setup
    # deleting the owner re-elects the long-dropped duplicate d002
    delete_where(src, "doc_id = 'd001'", strategy="mor", job_id="del1")
    r = refresh_curation(src, out, benchmark=bench, job_id="r1")
    assert not r["noop"]
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    ids = {x[0] for x in _sorted(out.scan())}
    assert "d001" not in ids and "d002" in ids


def test_update_in_place(spark, setup):
    src, out, bench = setup
    # d003 rewritten: drops the shared paragraph, keeps its unique one
    upsert_eq(src, _docs(spark, [
        ("d003", f"{P_D3}\n\nthe new extra paragraph of doc three"),
    ]), on="doc_id", job_id="u1")
    refresh_curation(src, out, benchmark=bench, job_id="r1")
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))


def test_decontamination_gate(spark, setup):
    src, out, bench = setup
    # shares a 4-gram with the benchmark -> decontaminated out
    src.append(_docs(spark, [
        ("d020", "le monde entier est un theatre but the words here "
                 "are the english and the filler of doc twenty"),
        ("d021", "the clean words of doc twentyone and the filler"),
    ]), job_id="a1")
    refresh_curation(src, out, benchmark=bench, job_id="r1")
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    ids = {x[0] for x in _sorted(out.scan())}
    assert "d020" not in ids and "d021" in ids


def test_replay_exactly_once(spark, setup, monkeypatch):
    src, out, bench = setup
    src.append(_docs(spark, [
        ("d012", "the completely fresh words of doc twelve and the rest"),
        ("d013", f"{P_FOX}\n\n{P_SHARED}\n\nthe unique tail of doc one"),
    ]), job_id="a1")
    orig = inc.upsert_eq

    def crash_on_final(table, *a, **k):
        if table.root == out.root:
            raise RuntimeError("simulated crash before curated commit")
        return orig(table, *a, **k)

    monkeypatch.setattr(inc, "upsert_eq", crash_on_final)
    with pytest.raises(RuntimeError, match="simulated"):
        refresh_curation(src, out, benchmark=bench, job_id="r1")
    # states advanced, curated watermark did not
    monkeypatch.setattr(inc, "upsert_eq", orig)
    hashes = BtrTable(spark, f"{out.root}_state_hashes")
    assert inc._state_wm(hashes) == src.current_snapshot_id()
    r = refresh_curation(src, out, benchmark=bench, job_id="r2")
    assert not r["noop"]
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    # and a THIRD run is a clean noop
    assert refresh_curation(src, out, benchmark=bench)["noop"]


def test_noop_refresh(spark, setup):
    src, out, bench = setup
    assert refresh_curation(src, out, benchmark=bench)["noop"]


def test_replay_with_moved_head(spark, setup, monkeypatch):
    """Crash between state and curated commits, THEN the source moves
    on before the retry: the retry must clamp its first window to the
    state tables' watermark (replaying exactly the interrupted change
    set) and process the newer commits as a second window — the
    re-elected owner must not be lost."""
    src, out, bench = setup
    delete_where(src, "doc_id = 'd001'", strategy="mor", job_id="del1")
    orig = inc.upsert_eq

    def crash_on_final(table, *a, **k):
        if table.root == out.root:
            raise RuntimeError("simulated crash before curated commit")
        return orig(table, *a, **k)

    monkeypatch.setattr(inc, "upsert_eq", crash_on_final)
    with pytest.raises(RuntimeError, match="simulated"):
        refresh_curation(src, out, benchmark=bench, job_id="r1")
    monkeypatch.setattr(inc, "upsert_eq", orig)
    # the head moves BEFORE the retry
    src.append(_docs(spark, [
        ("d030", "the completely fresh words of doc thirty and the rest"),
    ]), job_id="a2")
    r = refresh_curation(src, out, benchmark=bench, job_id="r2")
    assert r["windows"] == 2
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    ids = {x[0] for x in _sorted(out.scan())}
    assert "d002" in ids and "d001" not in ids and "d030" in ids
    assert refresh_curation(src, out, benchmark=bench)["noop"]


def test_auto_maintain_bounds_eq_deletes(spark, setup, monkeypatch):
    """Every refresh adds eq-delete files to the state/curated tables;
    auto-maintenance compacts once a table crosses the threshold, so
    read amplification stays bounded across many refreshes — and the
    result still equals the full batch re-curation afterwards."""
    src, out, bench = setup
    monkeypatch.setattr(inc, "MAINTAIN_EQ_DELETES", 1)
    hashes = BtrTable(spark, f"{out.root}_state_hashes")
    for i, (did, txt) in enumerate([
        ("d020", "the completely fresh words of doc twenty and the rest"),
        ("d021", "the surprisingly novel words of doc twentyone and so on"),
    ]):
        src.append(
            _docs(spark, [(did, txt)]), job_id=f"maint-a{i}"
        )
        r = refresh_curation(src, out, benchmark=bench)
        assert r["maintained"]  # threshold 1 -> compacted every time
    assert len(hashes.eq_delete_files()) == 0
    assert len(out.eq_delete_files()) == 0
    assert _sorted(out.scan()) == _sorted(_batch(src, bench))
    # maintenance snapshots must not confuse watermark discovery
    assert refresh_curation(src, out, benchmark=bench)["noop"]
