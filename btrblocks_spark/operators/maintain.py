"""Auto-maintenance planner: metadata-only diagnosis → ordered actions.

``plan_maintenance(table)`` inspects ONLY the manifest rows and table
metadata (zero data-file I/O — the same discipline as ``stats_agg``) and
returns the ordered list of maintenance actions a healthy 100 TB table
needs; ``maintain(table, apply=True)`` executes them. This is the
"table service" layer every production lakehouse runs on a schedule
(Iceberg's maintenance actions / Delta's OPTIMIZE scheduler), built from
the operators this repo already has:

1. ``compact``  — when small files pile up past ``min_small_files`` per
   partition, when delete files (positional OR equality) await
   absorption, or when stale-schema files linger after a rename/drop.
2. ``cluster``  — when the table has a declared clustering history (any
   file carries a ``sort_key``) but newer appends diluted it below
   ``min_clustered_fraction`` of rows.
3. ``rewrite_manifests`` — when the manifest list fragments past half
   of ``MANIFEST_LIST_MAX`` with small manifests.
4. ``expire_snapshots`` — when history grows past ``keep_snapshots``.
5. ``remove_orphan_files`` — opt-in (``orphans=True``): requires a data
   directory listing, so it is not metadata-only; kept explicit.

Signals, thresholds, and the reason string for every recommended action
come back in the plan so an operator (or a cron driver) can audit why a
job ran. Every action is itself checkpoint-resumable, so a killed
maintenance run resumes safely.
"""

from __future__ import annotations

import json

from btrblocks_spark import PART_SIZE_BYTES
from btrblocks_spark.sources.table import BtrTable


def plan_maintenance(
    table: BtrTable,
    target_file_bytes: int = PART_SIZE_BYTES,
    min_small_files: int = 8,
    min_clustered_fraction: float = 0.75,
    max_sorted_runs: int = 8,
    keep_snapshots: int = 20,
    orphans: bool = False,
) -> list[dict]:
    """Ordered action plan ``[{action, reason, ...params}]`` from
    manifest + metadata signals only (no data file is opened)."""
    rows = table.all_files()
    data = [r for r in rows if (r.get("content") or 0) == 0]
    pos_del = [r for r in rows if (r.get("content") or 0) == 1]
    eq_del = [r for r in rows if (r.get("content") or 0) == 2]
    meta = table.metadata()
    plan: list[dict] = []

    # ---- compact
    small_by_part: dict[str, int] = {}
    small_cut = int(target_file_bytes * 0.75)
    for r in data:
        if r["file_bytes"] < small_cut:
            small_by_part[r["partition"]] = (
                small_by_part.get(r["partition"], 0) + 1
            )
    worst_small = max(small_by_part.values(), default=0)
    retired = table._retired_names(meta)
    n_stale = (
        sum(
            1
            for r in data
            if retired & set(json.loads(r["stats"] or "{}"))
        )
        if retired
        else 0
    )
    reasons = []
    if worst_small >= min_small_files:
        reasons.append(
            f"{worst_small} small files (<{small_cut}B) in one partition"
        )
    if pos_del or eq_del:
        reasons.append(
            f"{len(pos_del)} positional + {len(eq_del)} equality "
            "delete files await absorption"
        )
    if n_stale:
        reasons.append(f"{n_stale} files carry a retired schema")
    if reasons:
        plan.append(
            {
                "action": "compact",
                "reason": "; ".join(reasons),
                "target_file_bytes": target_file_bytes,
            }
        )

    # ---- cluster (only when the table has a clustering history)
    sort_keys = {r["sort_key"] for r in data if r["sort_key"]}
    if len(sort_keys) == 1:
        key = next(iter(sort_keys))
        total = sum(r["row_count"] for r in data) or 1
        clustered = sum(
            r["row_count"] for r in data if r["sort_key"] == key
        )
        frac = clustered / total
        # incremental clustering keeps frac high but accumulates sorted
        # RUNS (one per only_new job) whose zkey ranges overlap — prune
        # tightness decays with run count, so past max_sorted_runs a
        # full re-merge is planned even with zero dilution
        runs = {
            r["job_id"] for r in data if r["sort_key"] == key
        }
        if frac >= min_clustered_fraction and len(runs) > max_sorted_runs:
            curve, cols = key.split("(", 1)
            plan.append(
                {
                    "action": "cluster",
                    "reason": (
                        f"{len(runs)} overlapping sorted runs on {key} "
                        f"(threshold {max_sorted_runs}) -> full re-merge"
                    ),
                    "curve": curve,
                    "by": cols.rstrip(")").split(","),
                    "mode": "full",
                }
            )
        if frac < min_clustered_fraction:
            curve, cols = key.split("(", 1)
            # moderate dilution -> incremental run over just the new
            # files (rewrite cost O(new data)); past the half-way mark
            # the sorted runs themselves are the minority, so a full
            # re-merge pays off
            mode = "incremental" if frac >= 0.5 else "full"
            plan.append(
                {
                    "action": "cluster",
                    "reason": (
                        f"only {frac:.0%} of rows still clustered on "
                        f"{key} (threshold {min_clustered_fraction:.0%})"
                        f" -> {mode} re-cluster"
                    ),
                    "curve": curve,
                    "by": cols.rstrip(")").split(","),
                    "mode": mode,
                }
            )

    # ---- rewrite_manifests
    entries = table._manifest_list(table.current_snapshot_id())
    cap = table.MANIFEST_LIST_MAX // 2
    if len(entries) > cap:
        plan.append(
            {
                "action": "rewrite_manifests",
                "reason": (
                    f"{len(entries)} manifests in the list "
                    f"(re-cluster threshold {cap})"
                ),
            }
        )

    # ---- expire_snapshots
    n_snaps = len(meta["snapshots"])
    if n_snaps > keep_snapshots:
        plan.append(
            {
                "action": "expire_snapshots",
                "reason": f"{n_snaps} snapshots (keep {keep_snapshots})",
                "keep_last": keep_snapshots,
            }
        )

    # ---- orphan scan (opt-in: needs a data-dir listing)
    if orphans:
        plan.append(
            {
                "action": "remove_orphan_files",
                "reason": "requested orphan sweep",
            }
        )
    return plan


def maintain(
    table: BtrTable,
    apply: bool = True,
    job_id: str | None = None,
    **plan_kwargs,
) -> dict:
    """Plan and (optionally) execute maintenance; returns the plan plus
    each executed action's result metrics."""
    import uuid

    from btrblocks_spark.operators.cluster import cluster
    from btrblocks_spark.operators.compact import compact

    job_id = job_id or f"maint-{uuid.uuid4().hex[:8]}"
    plan = plan_maintenance(table, **plan_kwargs)
    out: dict = {"job_id": job_id, "plan": plan, "results": {}}
    if not apply:
        return out
    for i, step in enumerate(plan):
        act = step["action"]
        if act == "compact":
            out["results"][act] = compact(
                table,
                target_file_bytes=step["target_file_bytes"],
                job_id=f"{job_id}-c{i}",
            )
        elif act == "cluster":
            out["results"][act] = cluster(
                table,
                by=tuple(step["by"]),
                curve=step["curve"],
                job_id=f"{job_id}-z{i}",
                only_new=step.get("mode") == "incremental",
            )
        elif act == "rewrite_manifests":
            out["results"][act] = table.rewrite_manifests()
        elif act == "expire_snapshots":
            out["results"][act] = table.expire_snapshots(
                keep_last=step["keep_last"]
            )
        elif act == "remove_orphan_files":
            out["results"][act] = table.remove_orphan_files()
    return out
