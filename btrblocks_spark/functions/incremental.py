"""Incremental corpus curation from CDC — refresh cost O(changed docs).

``init_curation`` runs one batch pass (semantically identical to
:func:`btrblocks_spark.functions.pipeline.curate_corpus`) and persists,
next to the curated output, the two state tables a refresh needs:

- ``state_hashes(doc_id, content_hash)`` — EVERY source doc ever seen.
  Exact-dedup ownership is ``min(doc_id)`` per hash and is independent
  of the quality gates (a duplicate of a low-quality doc dies with it),
  so the state must include gate-failed docs too. Hidden-partitioned
  ``bucket(N, content_hash)`` so a refresh probes only the buckets its
  changed hashes live in.
- ``state_paras(doc_id, pos, phash)`` — every paragraph occurrence of
  every gate-surviving owner (the stage-5 input set). The corpus-wide
  paragraph winner is ``min (doc_id, pos)`` per paragraph hash.
  Hidden-partitioned ``bucket(N, phash)``.

``refresh_curation`` folds ``src.scan_changes(watermark, head)`` in:

1. Ownership delta: changed content hashes re-elect their min-id owner
   against the hash state (inserts AND deletes — a deleted owner's
   group re-elects among the surviving copies, exactly as a batch
   re-run would).
2. Entering owners run the stateless gates (lang/quality/repetition/
   decontamination — all per-doc, so incrementality is free).
3. Paragraph delta: the entering survivors' paragraphs and the leaving
   survivors' paragraphs change winners on exactly their own hashes;
   every doc whose winner set changed (gained OR lost a paragraph) is
   re-assembled from the post-state winner map.
4. One ``upsert_eq`` commit updates the curated table (new/changed
   docs upserted, vanished docs equality-deleted) and carries the
   advanced watermark in the SAME snapshot summary — the exactly-once
   anchor.

Exactly-once on replay: each state table carries its own watermark in
its last commit summary. A crash between the state commits and the
curated commit leaves the states advanced but the curated watermark
behind; the re-run detects a state already at the target snapshot and
reconstructs that table's PRE image from the (deterministic) change
window instead of re-applying it — ``pre = post − inserts + deletes``.

Scale shape: every step is a digest-keyed join or a bucket-pruned state
probe; nothing is per-row Python; the only driver-side materialization
is the changed-doc id list used as an (advisory, capped) scan prune.

Reference analog: none — the reference is a compression engine; the
composition follows CCNet/RefinedWeb-style curation over an Iceberg-
like table, built from this repo's own primitives (scan_changes,
upsert_eq, hidden partitioning).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from btrblocks_spark.functions.text import (
    corpus_features,
    decontaminate,
    ngram_repetition,
    scrub_pii,
)
from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable

_WM = "curate_watermark"
_PARAMS = "curate_params"
_PRUNE_CAP = 10_000  # advisory prune lists larger than this are skipped


# --------------------------------------------------------------- pieces
def _gate(feats: DataFrame, p: dict, benchmark: DataFrame | None):
    """Stateless per-doc gates on a corpus_features projection carrying
    the text column: language allowlist, quality floor, repetition cap,
    decontamination. Mirrors curate_corpus stages 2-4 exactly."""
    id_col, text_col = p["id_col"], p["text_col"]
    s = feats.filter(
        (F.col("pred_lang") == p["lang"])
        & (F.col("quality") >= p["min_quality"])
    )
    if p["max_rep"] < 1.0:
        rep = ngram_repetition(
            s.select(id_col, text_col),
            text_col=text_col,
            n=p["rep_n"],
            id_col=id_col,
        ).select(id_col, "rep_frac")
        s = s.join(rep, id_col).filter(F.col("rep_frac") <= p["max_rep"])
    if benchmark is not None:
        s = decontaminate(
            s, benchmark, text_col=text_col, n=p["decontam_n"],
            id_col=id_col,
        )
    return s.select(id_col, text_col, "n_tokens", "quality")


def _paras_of(df: DataFrame, p: dict) -> DataFrame:
    """(id, pos, para, phash) rows — the exact normalization
    dedup_paragraphs uses (regex whitespace strip, md5 of lower)."""
    stripped = F.regexp_replace(F.col("para"), r"^\s+|\s+$", "")
    return df.select(
        F.col(p["id_col"]),
        F.posexplode(F.split(F.col(p["text_col"]), p["sep"])).alias(
            "pos", "para"
        ),
    ).filter(stripped != "").withColumn(
        "phash", F.md5(F.lower(stripped))
    )


def _assemble(kept: DataFrame, feats: DataFrame, p: dict) -> DataFrame:
    """Reassemble kept (id, pos, para) into final curated rows
    (id, text, n_tokens, quality) — stage 5 reassembly + stage 6 PII
    scrub of curate_corpus."""
    id_col, text_col = p["id_col"], p["text_col"]
    docs = kept.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("pos", "para"))).alias("_ps")
    ).select(
        id_col,
        F.concat_ws(
            p["joiner"], F.transform("_ps", lambda s: s.para)
        ).alias(text_col),
    )
    out = docs.join(feats.select(id_col, "n_tokens", "quality"), id_col)
    return scrub_pii(
        out, text_col=text_col, id_col=id_col,
        keep=["n_tokens", "quality"],
    ).select(
        id_col, text_col, "n_tokens",
        F.round("quality", 6).alias("quality"),
    )


def _state_wm(t: BtrTable) -> int | None:
    for snap in reversed(t.snapshots()):
        wm = (snap.get("summary") or {}).get(_WM)
        if wm is not None:
            return int(wm)
    return None


def _probe(t: BtrTable, col: str, keys: DataFrame, columns: list[str]):
    """State probe: scan pruned to the keys' buckets (advisory, capped)
    then exactly filtered by a semi-join. ``keys`` must be distinct."""
    rows = keys.take(_PRUNE_CAP + 1)  # one job: cap signal + values
    vals = [r[0] for r in rows] if len(rows) <= _PRUNE_CAP else None
    scan = t.scan(
        columns=columns, prune={col: vals} if vals else None
    )
    return scan.join(F.broadcast(keys), col, "leftsemi")


# ----------------------------------------------------------------- init
def init_curation(
    src: BtrTable,
    out_root: str,
    benchmark: DataFrame | None = None,
    lang: str = "en",
    min_quality: float = 0.3,
    max_rep: float = 1.0,
    rep_n: int = 2,
    decontam_n: int = 4,
    sep: str = r"\n\n+",
    joiner: str = "\n\n",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 16,
    job_id: str | None = None,
) -> BtrTable:
    """Batch bootstrap: curate ``src`` into a table at ``out_root`` and
    persist the refresh state tables at ``out_root + '_state_*'``.
    The output rows equal ``curate_corpus(src.scan())`` exactly."""
    p = {
        "lang": lang, "min_quality": min_quality, "max_rep": max_rep,
        "rep_n": rep_n, "decontam_n": decontam_n, "sep": sep,
        "joiner": joiner, "text_col": text_col, "id_col": id_col,
        "n_buckets": n_buckets,
    }
    job_id = job_id or f"curate-init-{uuid.uuid4().hex[:8]}"
    spark = src.spark
    wm = src.current_snapshot_id()
    docs = src.scan(columns=[id_col, text_col])
    feats = corpus_features(
        docs, text_col=text_col, keep=[text_col], id_col=id_col
    ).localCheckpoint(eager=False)

    hashes = BtrTable.create(
        spark, f"{out_root}_state_hashes",
        feats.select(id_col, "content_hash"),
        partition_by=[f"bucket({n_buckets}, content_hash)"],
        job_id=f"{job_id}-h",
    )
    hashes._commit([], operation="curate-state", replaced=None,
                   extra_summary={_WM: wm})

    w = Window.partitionBy("content_hash")
    owners = feats.withColumn("_o", F.min(id_col).over(w)).filter(
        F.col(id_col) == F.col("_o")
    ).drop("_o")
    survivors = _gate(owners, p, benchmark).localCheckpoint(eager=False)

    paras = _paras_of(survivors, p).localCheckpoint(eager=False)
    ptable = BtrTable.create(
        spark, f"{out_root}_state_paras",
        paras.select(id_col, "pos", "phash"),
        partition_by=[f"bucket({n_buckets}, phash)"],
        job_id=f"{job_id}-p",
    )
    ptable._commit([], operation="curate-state", replaced=None,
                   extra_summary={_WM: wm})

    first = Window.partitionBy("phash").orderBy(id_col, "pos")
    kept = paras.withColumn("_rk", F.row_number().over(first)).filter(
        F.col("_rk") == 1
    )
    rows = _assemble(kept, survivors, p)
    out = BtrTable.create(spark, out_root, rows, job_id=job_id)
    out._commit([], operation="curate-state", replaced=None,
                extra_summary={_WM: wm, _PARAMS: p})
    return out


# -------------------------------------------------------------- refresh
#: a state/curated table carrying at least this many equality-delete
#: files after a refresh is compacted opportunistically — every
#: ``upsert_eq`` refresh adds delete files, and an unmaintained table's
#: scans re-apply ALL of them on every probe (read amplification grows
#: linearly in refresh count at 100 TB)
MAINTAIN_EQ_DELETES = 8


def refresh_curation(
    src: BtrTable,
    out: BtrTable,
    benchmark: DataFrame | None = None,
    job_id: str | None = None,
    auto_maintain: bool = True,
) -> dict:
    """Fold source changes since the last watermark into the curated
    table — O(changed docs), result identical to a full re-curation.
    ``benchmark`` must be the same eval set ``init_curation`` saw
    (decontamination is stateless per doc, so only sameness matters).

    Windows are CLAMPED to any intermediate state-table watermark: a
    crash may have advanced a state table to some snapshot between the
    curated watermark and the current head, and the replay pre-image
    reconstruction (``pre = post − inserts + deletes``) is only valid
    against the exact change window the interrupted run applied — so
    the retry first replays wm→state_wm, commits the curated table
    there, then processes state_wm→head as a fresh window.
    """
    job_id = job_id or f"curate-refresh-{uuid.uuid4().hex[:8]}"
    spark = src.spark
    wm = next(
        int(s["summary"][_WM]) for s in reversed(out.snapshots())
        if (s.get("summary") or {}).get(_WM) is not None
    )
    p = next(
        s["summary"][_PARAMS] for s in reversed(out.snapshots())
        if (s.get("summary") or {}).get(_PARAMS) is not None
    )
    head = src.current_snapshot_id()
    if head == wm:
        return {"job_id": job_id, "from": wm, "to": head, "noop": True}

    hashes = BtrTable(spark, f"{out.root}_state_hashes")
    ptable = BtrTable(spark, f"{out.root}_state_paras")
    start, windows, upserted, last_sid = wm, 0, 0, None
    while wm != head:
        mids = [
            w
            for w in (_state_wm(hashes), _state_wm(ptable))
            if w is not None and wm < w < head
        ]
        target = min(mids) if mids else head
        res = _refresh_window(
            src, out, hashes, ptable, benchmark, p, wm, target,
            f"{job_id}-w{windows}" if windows else job_id,
        )
        windows += 1
        upserted += res["upserted_docs"]
        last_sid = res["snapshot_id"]
        wm = target
    maintained = []
    if auto_maintain:
        # bound read amplification: absorb accumulated eq-delete files
        # once a table crosses the threshold (compaction applies the
        # deletes and retires them; watermarks live in snapshot
        # summaries, so maintenance never perturbs replay bookkeeping)
        from btrblocks_spark.operators.compact import compact
        for t in (hashes, ptable, out):
            if len(t.eq_delete_files()) >= MAINTAIN_EQ_DELETES:
                compact(t, job_id=f"{job_id}-maint")
                maintained.append(t.root)
    return {
        "job_id": job_id,
        "from": start,
        "to": head,
        "snapshot_id": last_sid,
        "upserted_docs": upserted,
        "windows": windows,
        "maintained": maintained,
        "noop": False,
    }


def _refresh_window(
    src: BtrTable,
    out: BtrTable,
    hashes: BtrTable,
    ptable: BtrTable,
    benchmark: DataFrame | None,
    p: dict,
    wm: int,
    cur: int,
    job_id: str,
) -> dict:
    """One exactly-once refresh window wm→cur (both valid source
    snapshot ids). Source texts are read AT ``cur`` (time travel) so a
    clamped window reproduces exactly the state the interrupted run
    saw, not a later head."""
    spark = src.spark
    id_col, text_col = p["id_col"], p["text_col"]

    ch = src.scan_changes(wm, cur, columns=[id_col, text_col])
    ins = ch.filter(F.col("_change_type") == "insert").select(
        id_col, text_col
    ).localCheckpoint(eager=False)
    dels = ch.filter(F.col("_change_type") == "delete").select(
        id_col, text_col
    ).localCheckpoint(eager=False)

    featize = lambda df: corpus_features(  # noqa: E731
        df, text_col=text_col, keep=[text_col], id_col=id_col
    )
    ins_h = featize(ins).select(id_col, "content_hash")
    del_h = featize(dels).select(id_col, "content_hash")
    aff_h = ins_h.select("content_hash").union(
        del_h.select("content_hash")
    ).distinct().localCheckpoint(eager=False)

    # --- 1. ownership delta on the affected hash groups -------------
    state_rows = _probe(
        hashes, "content_hash", aff_h, [id_col, "content_hash"]
    )
    if _state_wm(hashes) == cur:  # replay: state already post-image
        pre_rows = state_rows.join(
            ins.select(id_col), id_col, "left_anti"
        ).unionByName(del_h)
        post_rows = state_rows
    else:
        pre_rows = state_rows
        post_rows = state_rows.join(
            dels.select(id_col), id_col, "left_anti"
        ).unionByName(ins_h)
        upsert_eq(
            hashes, ins_h, on=id_col, job_id=f"{job_id}-h",
            extra_delete_keys=dels.select(id_col).join(
                ins.select(id_col), id_col, "left_anti"
            ),
            extra_summary={_WM: cur},
        )
    pre_own = pre_rows.groupBy("content_hash").agg(
        F.min(id_col).alias("_pre")
    )
    post_own = post_rows.groupBy("content_hash").agg(
        F.min(id_col).alias("_post")
    )
    own = pre_own.join(post_own, "content_hash", "full").localCheckpoint(
        eager=False
    )
    enter = own.filter(
        F.col("_post").isNotNull()
        & ~F.col("_post").eqNullSafe(F.col("_pre"))
    ).select(F.col("_post").alias(id_col))
    leave = own.filter(
        F.col("_pre").isNotNull()
        & ~F.col("_pre").eqNullSafe(F.col("_post"))
    ).select(F.col("_pre").alias(id_col))
    # an UPDATED doc (same id in deletes and inserts) can keep its
    # ownership — same normalized hash — while its RAW text changed;
    # force such owners through leave+enter so their old paragraphs
    # retire and the new text is reassembled
    upd = ins.select(id_col).join(dels.select(id_col), id_col, "leftsemi")
    enter = enter.unionByName(
        upd.join(
            post_own.select(F.col("_post").alias(id_col)),
            id_col, "leftsemi",
        )
    ).distinct()
    leave = leave.unionByName(
        upd.join(
            pre_own.select(F.col("_pre").alias(id_col)),
            id_col, "leftsemi",
        )
    ).distinct()

    # --- 2. gates for entering owners; leavers re-derived ------------
    def texts_for(ids: DataFrame) -> DataFrame:
        """(id, text) for a set of ids: fresh inserts from the window,
        anything older from a pruned source scan; deleted docs from
        their old images."""
        from_ins = ins.join(ids, id_col, "leftsemi")
        rest = ids.join(ins, id_col, "left_anti")
        rows = rest.take(_PRUNE_CAP + 1)  # one job: cap signal + values
        if not rows:
            return from_ins
        vals = (
            [r[0] for r in rows] if len(rows) <= _PRUNE_CAP else None
        )
        old = src.scan(
            columns=[id_col, text_col],
            prune={id_col: vals} if vals else None,
            snapshot_id=cur,  # window-exact text, not a later head
        ).join(F.broadcast(rest), id_col, "leftsemi")
        return from_ins.unionByName(old)

    cand = texts_for(enter)
    s_new = _gate(featize(cand), p, benchmark).localCheckpoint(
        eager=False
    )
    # leavers that WERE stage-5 docs: re-run the (deterministic) gates
    # on their previous text — old images for deleted docs, the source
    # row for displaced-but-alive docs
    leave_alive = leave.join(dels, id_col, "left_anti")
    leave_texts = dels.join(leave, id_col, "leftsemi").unionByName(
        texts_for(leave_alive)
    )
    surv_leave = _gate(featize(leave_texts), p, benchmark).select(
        id_col, text_col
    ).localCheckpoint(eager=False)

    # --- 3. paragraph delta ------------------------------------------
    p_add = _paras_of(s_new, p)
    p_del = _paras_of(surv_leave, p)
    aff_ph = p_add.select("phash").union(
        p_del.select("phash")
    ).distinct().localCheckpoint(eager=False)
    prows = _probe(ptable, "phash", aff_ph, [id_col, "pos", "phash"])
    if _state_wm(ptable) == cur:  # replay: already post-image
        pre_p = prows.join(
            s_new.select(id_col), id_col, "left_anti"
        ).unionByName(p_del.select(id_col, "pos", "phash"))
        post_p = prows
    else:
        pre_p = prows
        post_p = prows.join(
            surv_leave.select(id_col), id_col, "left_anti"
        ).unionByName(p_add.select(id_col, "pos", "phash"))
        add_keys = p_add.select(id_col, "pos")
        upsert_eq(
            ptable, p_add.select(id_col, "pos", "phash"),
            on=[id_col, "pos"], job_id=f"{job_id}-p",
            extra_delete_keys=p_del.select(id_col, "pos").join(
                add_keys, [id_col, "pos"], "left_anti"
            ),
            extra_summary={_WM: cur},
        )

    def winners(rows: DataFrame) -> DataFrame:
        return rows.groupBy("phash").agg(
            F.min(F.struct(id_col, "pos")).alias("_w")
        ).select(
            "phash",
            F.col(f"_w.{id_col}").alias("_wid"),
            F.col("_w.pos").alias("_wpos"),
        )

    a, b = winners(pre_p).alias("_a"), winners(post_p).alias("_b")
    flips = a.join(
        b, F.col("_a.phash") == F.col("_b.phash"), "full"
    ).filter(
        ~(
            F.col("_a._wid").eqNullSafe(F.col("_b._wid"))
            & F.col("_a._wpos").eqNullSafe(F.col("_b._wpos"))
        )
    )
    touched = flips.select(
        F.coalesce(F.col("_a._wid"), F.col("_b._wid")).alias(id_col)
    ).union(
        flips.select(
            F.coalesce(F.col("_b._wid"), F.col("_a._wid")).alias(id_col)
        )
    ).distinct()

    # --- 4. reassemble every affected doc from the post-state --------
    # affected = new survivors + old docs that gained/lost a paragraph,
    # minus docs that are leaving curation entirely
    # exclusions must not remove re-entering docs (an updated doc sits
    # in BOTH surv_leave — its old text — and s_new — its new text)
    leavers_only = surv_leave.select(id_col).join(
        s_new.select(id_col), id_col, "left_anti"
    )
    dels_only = dels.select(id_col).join(
        s_new.select(id_col), id_col, "left_anti"
    )
    affected = touched.unionByName(
        s_new.select(id_col)
    ).distinct().join(leavers_only, id_col, "left_anti").join(
        dels_only, id_col, "left_anti"
    )
    aff_texts = s_new.select(id_col, text_col).unionByName(
        texts_for(affected.join(s_new, id_col, "left_anti"))
    )
    aff_feats = featize(aff_texts).localCheckpoint(eager=False)
    aff_paras = _paras_of(aff_feats, p).localCheckpoint(eager=False)
    need_ph = aff_paras.select("phash").distinct()
    # the paras state is post-image here in both branches (the normal
    # path committed its upsert above; the replay path found it already
    # committed), so the probe sees exactly the batch-equivalent state
    win_rows = _probe(ptable, "phash", need_ph, [id_col, "pos", "phash"])
    wmap = winners(win_rows)
    kept = aff_paras.join(wmap, "phash").filter(
        (F.col(id_col) == F.col("_wid")) & (F.col("pos") == F.col("_wpos"))
    ).select(id_col, "pos", "para")
    new_rows = _assemble(kept, aff_feats, p).localCheckpoint(eager=False)

    # --- 5. one exactly-once curated commit --------------------------
    # vanished docs: affected docs whose kept set emptied, leaving
    # survivors, and source-deleted docs — minus anything re-upserted
    # (upsert_eq requires delete-only keys disjoint from source keys)
    gone = affected.unionByName(
        surv_leave.select(id_col)
    ).unionByName(
        dels.select(id_col)
    ).distinct().join(new_rows.select(id_col), id_col, "left_anti")
    res = upsert_eq(
        out, new_rows, on=id_col, job_id=job_id,
        extra_delete_keys=gone,
        extra_summary={_WM: cur, _PARAMS: p},
    )
    return {
        "snapshot_id": res["snapshot_id"],
        "upserted_docs": new_rows.count(),
    }
