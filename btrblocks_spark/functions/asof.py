"""ASOF join — match each left row to the latest right row at-or-before
its timestamp (per key).

Spark has no ASOF JOIN operator; a naive range join explodes. This is
the union-window formulation, one shuffle total:

1. tag right rows ``_asof_src=1`` and left rows ``_asof_src=0``, union
   by name (absent columns null-padded);
2. window ``partitionBy(by).orderBy(on, _asof_src DESC)`` — at equal
   timestamps right rows sort BEFORE left rows, giving inclusive
   (right.ts <= left.ts) semantics, same as ANSI/DuckDB ASOF JOIN;
3. ONE struct of (right ``on``, all right payload columns) is carried
   forward with ``last(struct, ignorenulls=True)`` over
   unbounded-preceding..current — the nearest right row travels whole,
   so a NULL field never backfills from a farther row and the
   tolerance gap check reads the same matched row;
4. keep only left rows.

Cost: ONE hash shuffle on ``by`` + per-partition sort — identical shape
to a window aggregate, no join amplification, no driver collect.
Skew note: a hot ``by`` key serializes into one task; pre-aggregate the
right side per (by, on) — done below — so partition size is bounded by
event counts, not pair counts.

Right rows with duplicate (by, on) keys are reduced with ``max`` first,
making the match deterministic (ANSI ASOF leaves the equal-timestamp
winner unspecified; the oracle query must reduce identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    direction: str = "backward",
    suffix: str = "_r",
    tolerance: float | None = None,
) -> DataFrame:
    """ASOF join; right value columns come back suffixed.

    ``direction="backward"`` (default): latest right with
    right.on <= left.on. ``"forward"``: earliest right with
    right.on >= left.on. ``tolerance`` (pandas ``merge_asof``
    semantics): a match farther than this from ``left.on`` is nulled
    out — numeric ``on`` in its own units, timestamps in seconds."""
    assert direction in ("backward", "forward")
    by = [by] if isinstance(by, str) else list(by or [])
    keys = by + [on]
    payload = [c for c in right.columns if c not in keys]

    # deterministic per-(by, on) reduction of the right side
    r = right.groupBy(*keys).agg(
        *[F.max(c).alias(c + suffix) for c in payload]
    )
    out_payload = [c + suffix for c in payload]

    lt = left.withColumn("_asof_src", F.lit(0))
    for c in out_payload:
        lt = lt.withColumn(c, F.lit(None).cast(r.schema[c].dataType))
    rt = r.withColumn("_asof_src", F.lit(1))
    for c in left.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = lt.unionByName(rt.select(*lt.columns))

    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("_asof_src").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).desc(), F.col("_asof_src").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
    # forward-fill ONE struct of (right.on, all payload columns): the
    # struct is non-null exactly on right rows, so last(ignorenulls)
    # carries the nearest right row WHOLE — a NULL field in the matched
    # row stays NULL instead of leaking a value from a farther row
    # (pandas merge_asof whole-row semantics; also keeps the tolerance
    # gap check and the values on the same single row)
    m = F.when(
        F.col("_asof_src") == 1,
        F.struct(
            F.col(on).alias("_ton"),
            *[F.col(c) for c in out_payload],
        ),
    )
    u = u.withColumn("_asof_m", F.last(m, ignorenulls=True).over(w))
    keep = F.col("_asof_m").isNotNull()
    if tolerance is not None:
        # the matched right row's own `on` rides the same struct, so
        # the gap check needs no extra shuffle or join
        gap = F.col(on).cast("double") - F.col(
            "_asof_m._ton"
        ).cast("double")
        if direction == "forward":
            gap = -gap
        keep = keep & (gap <= F.lit(tolerance))
    for c in out_payload:
        u = u.withColumn(c, F.when(keep, F.col(f"_asof_m.{c}")))
    u = u.drop("_asof_m")
    return u.filter(F.col("_asof_src") == 0).drop("_asof_src")
