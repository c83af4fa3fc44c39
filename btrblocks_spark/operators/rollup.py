"""Incremental rollup maintenance — a materialized aggregate kept in
sync with its source table from the CDC changelog, never by rescanning.

The 100 TB motivation: every training-data pipeline keeps rollups
(rows/bytes per source, per language, per day) over tables that grow by
appends and upserts. Recomputing a groupBy over 100 TB per refresh is
the anti-pattern; the changelog (``BtrTable.scan_changes``) is exactly
the delta needed, because sum/count are *decomposable*: an insert adds,
a delete old-image subtracts. Cost per refresh is O(changed rows) +
O(rollup table), independent of source size.

Exactly-once: the refresh's upsert commit carries the new source
watermark (``rollup_src_snapshot``) in its own snapshot summary — one
atomic commit moves both the data and the cursor, so a crashed/replayed
refresh can never double-apply a window.

Vanished keys (all source rows for a group deleted) are removed from
the rollup via equality-delete-only keys (``upsert_eq``'s
``extra_delete_keys``), keeping the invariant ``refresh == full
recompute`` exact.

Reference parity: the reference engine (btrblocks) has no incremental
view maintenance; this extends the lakehouse layer (Iceberg-style
changelog consumers; see scan_changes at sources/table.py).
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from btrblocks_spark.operators.upsert import upsert_eq
from btrblocks_spark.sources.table import BtrTable

__all__ = ["create_rollup", "refresh_rollup"]

_COUNT_COL = "n_rows"
_WATERMARK = "rollup_src_snapshot"


def _norm_aggs(aggs: dict) -> dict[str, tuple[str, str | None]]:
    """{out: ("sum"|"count", in_col|None)} — only decomposable aggs.

    min/max are rejected: they are not maintainable under deletes
    without re-reading the group (a shrinking max needs the runner-up).
    """
    out: dict[str, tuple[str, str | None]] = {}
    for name, spec in aggs.items():
        fn, col = (spec, None) if isinstance(spec, str) else tuple(spec)
        if fn not in ("sum", "count"):
            raise ValueError(
                f"rollup agg {name!r}: only sum/count are incrementally "
                f"maintainable under deletes (got {fn!r})"
            )
        if fn == "count" and col is not None:
            raise ValueError(f"rollup agg {name!r}: count takes no column")
        if fn == "sum" and col is None:
            raise ValueError(f"rollup agg {name!r}: sum needs a column")
        out[name] = (fn, col)
    if _COUNT_COL in out and out[_COUNT_COL] != ("count", None):
        raise ValueError(f"{_COUNT_COL!r} is reserved for the row count")
    out.setdefault(_COUNT_COL, ("count", None))
    return out


def _signed_aggs(norm: dict, sign) -> list:
    return [
        F.sum(
            sign * (F.lit(1) if col is None else F.col(col))
        ).alias(name)
        for name, (fn, col) in norm.items()
    ]


def _input_cols(keys: list[str], norm: dict) -> list[str]:
    cols = list(keys)
    for _, (fn, col) in norm.items():
        if col is not None and col not in cols:
            cols.append(col)
    return cols


def create_rollup(
    src: BtrTable,
    dst_root: str,
    keys: list[str] | str,
    aggs: dict,
    job_id: str | None = None,
    num_files: int | None = None,
) -> BtrTable:
    """Materialize ``src.groupBy(keys).agg(aggs)`` at the current
    snapshot and record the watermark; ``refresh_rollup`` advances it
    incrementally. ``aggs``: ``{out_col: ("sum", col) | "count"}``.
    A ``n_rows`` count column is always present (it detects vanished
    groups). Key columns get per-file blooms so refresh upserts prune.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    norm = _norm_aggs(aggs)
    job_id = job_id or f"rollup-{uuid.uuid4().hex[:8]}"
    watermark = src.current_snapshot_id()
    full = (
        src.scan(columns=_input_cols(keys, norm))
        .groupBy(*keys)
        .agg(*_signed_aggs(norm, F.lit(1)))
    )
    int_keys = [
        k for k in keys
        if dict(full.dtypes)[k] in ("int", "bigint", "smallint", "tinyint")
    ]
    dst = BtrTable.create(
        src.spark,
        dst_root,
        full,
        num_files=num_files,
        job_id=job_id,
        bloom_cols=int_keys or None,
    )
    # metadata-only commit pinning the watermark (the create snapshot
    # itself has no summary channel; this keeps state inside the table,
    # atomic with table history — never a sidecar file)
    dst._commit(
        [],
        operation="rollup-state",
        replaced=None,
        extra_summary={_WATERMARK: watermark, "rollup_keys": keys},
    )
    return dst


def rollup_watermark(dst: BtrTable) -> int:
    """Latest source snapshot folded into ``dst`` (from its history)."""
    for snap in reversed(dst.snapshots()):
        wm = (snap.get("summary") or {}).get(_WATERMARK)
        if wm is not None:
            return int(wm)
    raise KeyError("table has no rollup watermark (not a rollup?)")


def refresh_rollup(
    src: BtrTable,
    dst: BtrTable,
    keys: list[str] | str,
    aggs: dict,
    job_id: str | None = None,
) -> dict:
    """Fold source changes since the last refresh into the rollup.

    One scan of the changelog window + one scan of the (small) rollup;
    groups untouched by the window are never read beyond the rollup
    join. Returns job metrics incl. the advanced watermark.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    norm = _norm_aggs(aggs)
    job_id = job_id or f"rollup-refresh-{uuid.uuid4().hex[:8]}"
    last = rollup_watermark(dst)
    cur = src.current_snapshot_id()
    if cur == last:
        return {"job_id": job_id, "from": last, "to": cur,
                "upserted_keys": 0, "noop": True}

    changes = src.scan_changes(last, cur, columns=_input_cols(keys, norm))
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = changes.groupBy(*keys).agg(*_signed_aggs(norm, sign))

    olds = dst.scan(columns=keys + list(norm))
    renamed = olds.select(
        *keys, *[F.col(n).alias(f"_old_{n}") for n in norm]
    )
    # null-SAFE key join: a NULL grouping key is a legitimate group
    # (groupBy emits it); plain equality would never match the existing
    # rollup row and coalesce would silently reset its aggregates. The
    # downstream upsert_eq delete matches NULLs too (Iceberg null=null
    # equality-delete semantics, blockfile.eq_delete_mask).
    d, r = delta.alias("_d"), renamed.alias("_r")
    cond = F.lit(True)
    for k in keys:
        cond = cond & F.col(f"_d.{k}").eqNullSafe(F.col(f"_r.{k}"))
    merged = d.join(r, on=cond, how="left").select(
        *[F.col(f"_d.{k}").alias(k) for k in keys],
        *[
            (F.coalesce(F.col(f"_old_{n}"), F.lit(0)) + F.col(n))
            .cast(dict(olds.dtypes)[n])
            .alias(n)
            for n in norm
        ],
    )
    merged = merged.localCheckpoint(eager=False)
    alive = merged.filter(F.col(_COUNT_COL) > 0)
    vanished = merged.filter(F.col(_COUNT_COL) <= 0).select(*keys)

    res = upsert_eq(
        dst,
        alive,
        on=keys,
        job_id=job_id,
        extra_delete_keys=vanished,
        extra_summary={_WATERMARK: cur, "rollup_keys": keys},
    )
    return {
        "job_id": job_id,
        "from": last,
        "to": cur,
        "snapshot_id": res["snapshot_id"],
        "upserted_keys": res["eq_delete_keys"],
        "noop": False,
    }
