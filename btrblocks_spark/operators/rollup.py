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


#: bottom-k size of the per-group KMV distinct sketch (state column)
KMV_K = 256


def _norm_aggs(aggs: dict) -> dict[str, tuple[str, str | None]]:
    """{out: (fn, in_col|None)} with fn in sum/count/min/max/
    approx_distinct.

    sum/count are decomposable (insert adds, delete old-image
    subtracts). min/max fold incrementally for insert-only windows;
    any delete event forces an exact per-group recompute in
    ``refresh_rollup`` (a shrinking max needs the runner-up).
    approx_distinct keeps a mergeable bottom-k KMV hash sketch per
    group in a companion ``_kmv_<name>`` state column: inserts union
    into the sketch (decomposable), deletes dirty the group exactly
    like min/max (a sketch cannot forget).
    """
    out: dict[str, tuple[str, str | None]] = {}
    for name, spec in aggs.items():
        fn, col = (spec, None) if isinstance(spec, str) else tuple(spec)
        if fn not in ("sum", "count", "min", "max", "approx_distinct"):
            raise ValueError(
                f"rollup agg {name!r}: supported fns are "
                f"sum/count/min/max/approx_distinct (got {fn!r})"
            )
        if fn == "count" and col is not None:
            raise ValueError(f"rollup agg {name!r}: count takes no column")
        if fn in ("sum", "min", "max", "approx_distinct") and col is None:
            raise ValueError(f"rollup agg {name!r}: {fn} needs a column")
        out[name] = (fn, col)
    if _COUNT_COL in out and out[_COUNT_COL] != ("count", None):
        raise ValueError(f"{_COUNT_COL!r} is reserved for the row count")
    out.setdefault(_COUNT_COL, ("count", None))
    return out


def _split(norm: dict):
    """(additive sum/count entries, min/max entries, kmv entries)."""
    add = {n: v for n, v in norm.items() if v[0] in ("sum", "count")}
    mm = {n: v for n, v in norm.items() if v[0] in ("min", "max")}
    kmv = {n: v for n, v in norm.items() if v[0] == "approx_distinct"}
    return add, mm, kmv


def _kmv_state(n: str) -> str:
    return f"_kmv_{n}"


def _kmv_hash(col: str):
    # deterministic 63-bit non-negative hash; nulls drop out of the
    # sketch (collect_set ignores them). shiftrightunsigned, not abs:
    # in non-ANSI mode abs(Long.MIN_VALUE) stays negative, and one such
    # hash would permanently occupy the sketch's bottom slot and
    # corrupt _kmv_est (the >>>1 map is guaranteed non-negative and
    # matches the 63-bit range _kmv_est assumes)
    return F.shiftrightunsigned(F.xxhash64(F.col(col).cast("string")), 1)


def _kmv_collect(expr):
    """bottom-k of a hash expression, as a sorted array<bigint>.

    The collect_set buffer is O(distinct-in-group) — safe ONLY when the
    group is bounded (one input partition's slice of it); every rollup
    aggregation containing a sketch therefore goes through
    :func:`_grouped`'s two-stage plan, never a direct groupBy."""
    return F.slice(
        F.array_sort(F.collect_set(expr)), 1, KMV_K
    )


def _kmv_fold(state_col):
    """Merge partial bottom-k sketch arrays into one bottom-k."""
    return F.slice(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list(state_col)))
        ),
        1,
        KMV_K,
    )


def _grouped(df, keys: list[str], s1: list, s2: list | None):
    """groupBy(keys).agg(s1) — but when ``s2`` is given (sketch aggs
    present), run TWO stages: partials per (keys, input partition),
    then a fold per keys. Per-group aggregation state is then bounded
    by one input partition (collect_set of a 10^9-NDV group would
    otherwise hold the full distinct hash set in one executor buffer);
    the stage-2 buffers hold <= k * n_partials elements. sum/count/
    min/max/dirty-flag partials re-fold losslessly."""
    if s2 is None:
        return df.groupBy(*keys).agg(*s1)
    p = df.groupBy(
        *keys, F.spark_partition_id().alias("_pid")
    ).agg(*s1)
    return p.groupBy(*keys).agg(*s2)


def _kmv_est(state):
    """KMV estimate from a sorted bottom-k state array: exact below k,
    else (k-1) * range / kth-smallest-hash."""
    full = F.lit(float(KMV_K - 1)) * F.lit(float(1 << 63))
    return (
        F.when(F.size(state) < KMV_K, F.size(state).cast("bigint"))
        .otherwise(
            F.floor(full / F.element_at(state, -1).cast("double"))
        )
        .cast("bigint")
    )


def _signed_aggs(norm: dict, sign) -> list:
    add, mm, kmv = _split(norm)
    return [
        F.sum(
            sign * (F.lit(1) if col is None else F.col(col))
        ).alias(name)
        for name, (fn, col) in add.items()
    ] + [
        (F.min(F.col(col)) if fn == "min" else F.max(F.col(col))).alias(
            name
        )
        for name, (fn, col) in mm.items()
    ] + [
        _kmv_collect(_kmv_hash(col)).alias(_kmv_state(name))
        for name, (_, col) in kmv.items()
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
    add, mm, kmv = _split(norm)
    s2 = None
    if kmv:
        s2 = (
            [F.sum(n).alias(n) for n in add]
            + [
                (F.min(n) if fn == "min" else F.max(n)).alias(n)
                for n, (fn, _) in mm.items()
            ]
            + [
                _kmv_fold(_kmv_state(n)).alias(_kmv_state(n))
                for n in kmv
            ]
        )
    full = _grouped(
        src.scan(columns=_input_cols(keys, norm)),
        keys,
        _signed_aggs(norm, F.lit(1)),
        s2,
    )
    for n in kmv:
        full = full.withColumn(n, _kmv_est(F.col(_kmv_state(n))))
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
    add, mm, kmv = _split(norm)
    is_ins = F.col("_change_type") == "insert"
    agg_exprs = [
        F.sum(
            sign * (F.lit(1) if col is None else F.col(col))
        ).alias(name)
        for name, (fn, col) in add.items()
    ]
    if mm:
        # min/max fold from INSERT images only; any delete event marks
        # the group dirty — its extrema must be recomputed exactly (the
        # deleted row may have held them and the runner-up is unknown)
        agg_exprs += [
            (
                F.min(F.when(is_ins, F.col(col)))
                if fn == "min"
                else F.max(F.when(is_ins, F.col(col)))
            ).alias(name)
            for name, (fn, col) in mm.items()
        ]
    if kmv:
        # sketch union from INSERT images only; deletes dirty the
        # group (a bottom-k sketch cannot forget a hash)
        agg_exprs += [
            _kmv_collect(
                F.when(is_ins, _kmv_hash(col))
            ).alias(_kmv_state(name))
            for name, (_, col) in kmv.items()
        ]
    if mm or kmv:
        agg_exprs.append(
            F.max((~is_ins).cast("int")).alias("_mm_dirty")
        )
    s2 = None
    if kmv:
        s2 = (
            [F.sum(n).alias(n) for n in add]
            + [
                (F.min(n) if fn == "min" else F.max(n)).alias(n)
                for n, (fn, _) in mm.items()
            ]
            + [
                _kmv_fold(_kmv_state(n)).alias(_kmv_state(n))
                for n in kmv
            ]
            + [F.max("_mm_dirty").alias("_mm_dirty")]
        )
    delta = _grouped(changes, keys, agg_exprs, s2)

    state_cols = [_kmv_state(n) for n in kmv]
    olds = dst.scan(columns=keys + list(norm) + state_cols)
    renamed = olds.select(
        *keys,
        *[F.col(n).alias(f"_old_{n}") for n in norm],
        *[F.col(s).alias(f"_old_{s}") for s in state_cols],
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
    old_types = dict(olds.dtypes)
    out_cols = [F.col(f"_d.{k}").alias(k) for k in keys]
    out_cols += [
        (F.coalesce(F.col(f"_old_{n}"), F.lit(0)) + F.col(n))
        .cast(old_types[n])
        .alias(n)
        for n in add
    ]
    out_cols += [
        (
            F.least(F.col(f"_old_{n}"), F.col(n))
            if fn == "min"
            else F.greatest(F.col(f"_old_{n}"), F.col(n))
        )
        .cast(old_types[n])
        .alias(n)
        for n, (fn, col) in mm.items()
    ]
    empty_state = F.array().cast("array<bigint>")
    out_cols += [
        F.slice(
            F.array_sort(
                F.array_union(
                    F.coalesce(F.col(f"_old_{s}"), empty_state),
                    F.coalesce(F.col(s), empty_state),
                )
            ),
            1,
            KMV_K,
        ).alias(s)
        for s in state_cols
    ]
    if mm or kmv:
        out_cols.append(F.col("_mm_dirty"))
    merged = d.join(r, on=cond, how="left").select(*out_cols)
    if mm or kmv:
        # exact per-group recompute for delete-touched groups, at the
        # window's own snapshot (time travel keeps replays exact); the
        # dirty set is O(changed groups), broadcast into a null-safe
        # semijoin, and only those groups are re-read from the source
        dirty = merged.filter(F.col("_mm_dirty") == 1).select(*keys)
        mm_in = list(
            dict.fromkeys(
                keys
                + [c for _, (_, c) in mm.items()]
                + [c for _, (_, c) in kmv.items()]
            )
        )
        # advisory file prune when the dirty key set is small and the
        # rollup has a single key (the exact semijoin below stays the
        # correctness filter): one take() both caps and fetches
        prune = None
        if len(keys) == 1:
            rows_ = dirty.take(1001)
            if len(rows_) <= 1000 and all(
                r[0] is not None for r in rows_
            ):
                # a NULL dirty key disables pruning entirely: its rows
                # live in files a value-set prune could skip
                vals = [r[0] for r in rows_]
                if vals:
                    prune = {keys[0]: vals}
        srcscan = src.scan(columns=mm_in, snapshot_id=cur, prune=prune)
        jc = F.lit(True)
        for k in keys:
            jc = jc & F.col(f"_s.{k}").eqNullSafe(F.col(f"_k.{k}"))
        x_s1 = [
            (
                F.min(F.col(col)) if fn == "min" else F.max(F.col(col))
            ).alias(f"_x_{n}")
            for n, (fn, col) in mm.items()
        ] + [
            _kmv_collect(_kmv_hash(col)).alias(f"_x_{_kmv_state(n)}")
            for n, (_, col) in kmv.items()
        ]
        x_s2 = None
        if kmv:
            x_s2 = [
                (
                    F.min(f"_x_{n}") if fn == "min" else F.max(f"_x_{n}")
                ).alias(f"_x_{n}")
                for n, (fn, _) in mm.items()
            ] + [
                _kmv_fold(f"_x_{_kmv_state(n)}").alias(
                    f"_x_{_kmv_state(n)}"
                )
                for n in kmv
            ]
        exact = _grouped(
            srcscan.alias("_s").join(
                F.broadcast(dirty.alias("_k")), on=jc, how="leftsemi"
            ),
            keys,
            x_s1,
            x_s2,
        ).withColumn("_x_hit", F.lit(True))
        m, x = merged.alias("_m"), exact.alias("_x")
        xc = F.lit(True)
        for k in keys:
            xc = xc & F.col(f"_m.{k}").eqNullSafe(F.col(f"_x.{k}"))
        merged = m.join(x, on=xc, how="left").select(
            *[F.col(f"_m.{k}").alias(k) for k in keys],
            *[F.col(f"_m.{n}").alias(n) for n in add],
            *[
                F.when(
                    F.col("_x_hit"), F.col(f"_x_{n}")
                )
                .otherwise(F.col(f"_m.{n}"))
                .cast(old_types[n])
                .alias(n)
                for n in mm
            ],
            *[
                F.when(
                    F.col("_x_hit"), F.col(f"_x_{s}")
                )
                .otherwise(F.col(f"_m.{s}"))
                .alias(s)
                for s in state_cols
            ],
        )
    # estimates derive from the FINAL per-group sketch (merged or
    # exactly recomputed), never folded arithmetically
    for n in kmv:
        merged = merged.withColumn(
            n, _kmv_est(F.col(_kmv_state(n)))
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
