"""Row-level DELETE WHERE / UPDATE WHERE over a BtrTable.

SQL-style row-level mutations built on the same two physical strategies
as MERGE INTO (`operators/merge.py`):

``strategy="mor"`` (default, merge-on-read): matching rows become
Iceberg-v2 positional delete files (plus, for UPDATE, new data files
holding the updated rows); nothing is rewritten, so written bytes scale
with the change set. ``compact()`` later absorbs the deletes.

``strategy="cow"`` (copy-on-write): every file containing a matching row
is rewritten without (DELETE) / with transformed (UPDATE) rows and
atomically replaced in one snapshot — scans after the commit carry no
merge cost.

Predicate semantics follow SQL: a row is affected iff the predicate
evaluates to TRUE; FALSE and NULL rows are kept untouched (the
``coalesce(pred, false)`` below — a bare ``NOT pred`` would also delete
NULL-predicate rows).

The reference has no row-level DML (it is a compression library); this
is part of the table-maintenance surface the north rule adds on top
(MERGE INTO / maintenance family, see ``operators/merge.py``).

Scale notes (100 TB): candidate files are stats-pruned from the
predicate's referenced columns before any data I/O; the matching scan
reads only those columns (+ _file/_pos); the only driver-side
materialization is the list of touched file PATHS (bounded by file
count, never rows).
"""

from __future__ import annotations

import re
import uuid

from pyspark.sql import DataFrame, functions as F

from btrblocks_spark.operators.merge import write_positional_deletes
from btrblocks_spark.sources.table import BtrTable


def _pred_columns(table: BtrTable, predicate: str) -> list[str]:
    """Table columns referenced by a SQL predicate string (identifier
    intersection — conservative: may over-select, never under-selects
    for valid unquoted identifiers)."""
    idents = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", predicate))
    return [c for c in table.schema_arrow().names if c in idents]


def _stats_prune_from_predicate(
    table: BtrTable, predicate: str
) -> dict | None:
    """Best-effort file-level prune dict from simple ``col op literal``
    conjuncts of the predicate (min/max zone-map semantics; anything
    unrecognized contributes nothing — pruning is advisory, the row
    filter is always re-applied)."""
    bounds: dict[str, list] = {}  # col -> [lo, hi] (None = open)
    # col <op> numeric-literal, only for top-level AND conjuncts;
    # OR (disjunction widens) and NOT (negation flips) disable pruning
    if re.search(r"(?i)\b(or|not)\b", predicate):
        return None
    names = set(table.schema_arrow().names)
    for m in re.finditer(
        r"([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|==|=|<|>)\s*(-?\d+(?:\.\d+)?)",
        predicate,
    ):
        col, op, lit = m.group(1), m.group(2), m.group(3)
        if col not in names:
            continue
        val = float(lit) if "." in lit else int(lit)
        b = bounds.setdefault(col, [None, None])
        if op in ("=", "=="):
            b[0] = val if b[0] is None else max(b[0], val)
            b[1] = val if b[1] is None else min(b[1], val)
        elif op in ("<", "<="):
            b[1] = val if b[1] is None else min(b[1], val)
        elif op in (">", ">="):
            b[0] = val if b[0] is None else max(b[0], val)
    return {k: tuple(v) for k, v in bounds.items()} or None


def delete_where(
    table: BtrTable,
    predicate: str,
    strategy: str = "mor",
    job_id: str | None = None,
) -> dict:
    """DELETE FROM table WHERE predicate.

    Returns a result dict with snapshot id, matched-row count, and
    written-bytes metrics (mirrors ``merge_into``'s result shape)."""
    assert strategy in ("mor", "cow")
    job_id = job_id or f"delete-{uuid.uuid4().hex[:8]}"
    pred_cols = _pred_columns(table, predicate)
    prune = _stats_prune_from_predicate(table, predicate)
    hit = F.coalesce(F.expr(predicate), F.lit(False))

    if strategy == "mor":
        scanned = table.scan(
            columns=pred_cols or None,
            prune=prune,
            with_file=True,
            with_pos=True,
        )
        if "_file" not in scanned.columns:  # prune excluded every file
            return {
                "job_id": job_id,
                "snapshot_id": table.current_snapshot_id(),
                "strategy": strategy,
                "deleted_rows": 0,
                "noop": True,
            }
        matched = scanned.filter(hit).select(
            F.col("_file").alias("file_path"),
            F.col("_pos").alias("pos"),
        )
        delete_rows = write_positional_deletes(table, matched, job_id)
        n = sum(r["row_count"] for r in delete_rows)
        if not delete_rows:
            return {
                "job_id": job_id,
                "snapshot_id": table.current_snapshot_id(),
                "strategy": strategy,
                "deleted_rows": 0,
                "noop": True,
            }
        sid = table._commit(
            delete_rows,
            operation="delete",
            replaced=None,
            extra_summary={
                "predicate": predicate,
                "strategy": "mor",
                "delete_rows": n,
            },
        )
        return {
            "job_id": job_id,
            "snapshot_id": sid,
            "strategy": "mor",
            "deleted_rows": n,
            "delete_files": len(delete_rows),
            "delete_bytes": sum(r["file_bytes"] for r in delete_rows),
            "new_bytes": sum(r["file_bytes"] for r in delete_rows),
        }

    # ------------------------------------------------------------- cow
    touched = _touched_files(table, pred_cols, prune, hit)
    if not touched:
        return {
            "job_id": job_id,
            "snapshot_id": table.current_snapshot_id(),
            "strategy": strategy,
            "deleted_rows": 0,
            "noop": True,
        }
    cols = table.user_columns()
    before = table.scan(files=touched).count()
    kept = table.scan(files=touched).filter(~hit).select(*cols)
    new_rows = table._write_files(kept, job_id=job_id)
    after = sum(r["row_count"] for r in new_rows)
    replaced = set(touched) | _covered_delete_files(table, touched)
    sid = table._commit(
        new_rows,
        operation="delete",
        replaced=replaced,
        extra_summary={
            "predicate": predicate,
            "strategy": "cow",
            "delete_rows": before - after,
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "strategy": "cow",
        "deleted_rows": before - after,
        "rewritten_files": len(touched),
        "new_files": len(new_rows),
        "new_bytes": sum(r["file_bytes"] for r in new_rows),
    }


def update_where(
    table: BtrTable,
    assignments: dict[str, str],
    predicate: str,
    strategy: str = "mor",
    job_id: str | None = None,
) -> dict:
    """UPDATE table SET col = expr, ... WHERE predicate.

    ``assignments`` maps column name → SQL expression (may reference any
    table column; evaluated against the PRE-update row, SQL semantics).
    """
    assert strategy in ("mor", "cow")
    cols = table.user_columns()
    unknown = set(assignments) - set(cols)
    if unknown:
        raise ValueError(f"assignments target unknown columns: {unknown}")
    job_id = job_id or f"update-{uuid.uuid4().hex[:8]}"
    pred_cols = _pred_columns(table, predicate)
    prune = _stats_prune_from_predicate(table, predicate)
    hit = F.coalesce(F.expr(predicate), F.lit(False))

    if strategy == "mor":
        scanned = table.scan(prune=prune, with_file=True, with_pos=True)
        if "_file" not in scanned.columns:  # prune excluded every file
            return {
                "job_id": job_id,
                "snapshot_id": table.current_snapshot_id(),
                "strategy": strategy,
                "updated_rows": 0,
                "noop": True,
            }
        matched = scanned.filter(hit).cache()
        # cast assignment results back to the table's column types so
        # appended files stay schema-compatible with existing files
        types = {f.name: f.dataType for f in matched.schema.fields}

        def updated_cols():
            return [
                F.expr(assignments[c]).cast(types[c]).alias(c)
                if c in assignments
                else F.col(c)
                for c in cols
            ]
        try:
            delete_rows = write_positional_deletes(
                table,
                matched.select(
                    F.col("_file").alias("file_path"),
                    F.col("_pos").alias("pos"),
                ),
                job_id,
            )
            n = sum(r["row_count"] for r in delete_rows)
            if not delete_rows:
                return {
                    "job_id": job_id,
                    "snapshot_id": table.current_snapshot_id(),
                    "strategy": strategy,
                    "updated_rows": 0,
                    "noop": True,
                }
            data_rows = table._write_files(
                matched.select(*updated_cols()), job_id=job_id
            )
        finally:
            matched.unpersist()
        sid = table._commit(
            delete_rows + data_rows,
            operation="update",
            replaced=None,
            extra_summary={
                "predicate": predicate,
                "strategy": "mor",
                "update_rows": n,
            },
        )
        return {
            "job_id": job_id,
            "snapshot_id": sid,
            "strategy": "mor",
            "updated_rows": n,
            "delete_files": len(delete_rows),
            "new_files": len(data_rows),
            "new_bytes": sum(
                r["file_bytes"] for r in delete_rows + data_rows
            ),
        }

    # ------------------------------------------------------------- cow
    touched = _touched_files(table, pred_cols, prune, hit)
    if not touched:
        return {
            "job_id": job_id,
            "snapshot_id": table.current_snapshot_id(),
            "strategy": strategy,
            "updated_rows": 0,
            "noop": True,
        }
    src = table.scan(files=touched)
    types = {f.name: f.dataType for f in src.schema.fields}
    n_upd = src.filter(hit).count()
    rewritten = src.select(
        *[
            F.when(hit, F.expr(assignments[c]).cast(types[c]))
            .otherwise(F.col(c))
            .alias(c)
            if c in assignments
            else F.col(c)
            for c in cols
        ]
    )
    new_rows = table._write_files(rewritten, job_id=job_id)
    replaced = set(touched) | _covered_delete_files(table, touched)
    sid = table._commit(
        new_rows,
        operation="update",
        replaced=replaced,
        extra_summary={
            "predicate": predicate,
            "strategy": "cow",
            "update_rows": n_upd,
        },
    )
    return {
        "job_id": job_id,
        "snapshot_id": sid,
        "strategy": "cow",
        "updated_rows": n_upd,
        "rewritten_files": len(touched),
        "new_files": len(new_rows),
        "new_bytes": sum(r["file_bytes"] for r in new_rows),
    }


def _touched_files(
    table: BtrTable, pred_cols: list[str], prune: dict | None, hit
) -> list[str]:
    """Paths of data files containing at least one predicate-TRUE row
    (driver materializes paths only, never rows)."""
    scanned = table.scan(
        columns=pred_cols or None, prune=prune, with_file=True
    )
    if "_file" not in scanned.columns:  # prune excluded every file
        return []
    return [
        r._file
        for r in scanned.filter(hit).select("_file").distinct().collect()
    ]


def _covered_delete_files(table: BtrTable, rewritten: list[str]) -> set:
    """Positional delete files whose every referenced data file is being
    rewritten — they are absorbed by the rewrite (their shadowing was
    applied by the scan) and must leave the manifest with it."""
    import json as _json

    rw = set(rewritten)
    out = set()
    for r in table.delete_files():
        refs = set(_json.loads(r["source_files"] or "[]"))
        if refs and refs <= rw:
            out.add(r["file_path"])
    return out
