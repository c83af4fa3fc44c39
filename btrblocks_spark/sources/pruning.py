"""Shared min/max-stats pruning predicate.

One matcher, two granularities: file-level (manifest ``stats`` JSON,
``table.scan(prune=...)``) and block-level (the per-block ``zone`` JSON
written by ``blockfile.encode_table`` — the zone-map analog of the
predicate ``scan()`` the reference *declares* but never implements,
``/root/reference/btrblocks/scheme/integer/PBP.cpp:51-56``).

A prune bound is either a ``(lo, hi)`` range (either side may be None)
or a list/set of discrete values (in-set form). Stats are stored
stringified; numeric bounds coerce them to float. Missing or
uncoercible stats KEEP the unit — pruning is an optimization, never a
correctness filter.
"""

from __future__ import annotations


def stats_may_match(stats: dict, prune: dict) -> bool:
    """True when a unit (file or block) with ``stats`` = {col: {"min":
    str|None, "max": str|None, ...}} may contain rows matching ``prune``."""
    for col, bound in prune.items():
        st = stats.get(col)
        if isinstance(bound, dict):
            # token form: {"tokens_all": [...]} — the unit survives iff
            # its token bloom may contain EVERY token (substring/search
            # semantics); units without a bloom are kept. Blooms exist
            # only at file level, so block zone maps pass through here.
            toks = bound.get("tokens_all") or ()
            bl = (st or {}).get("token_bloom")
            if bl is None:
                continue
            import numpy as np

            from btrblocks_spark.codec.bloom import bloom_may_contain_any

            for t in toks:
                if not bloom_may_contain_any(
                    bl, np.array([str(t)], dtype=object)
                ):
                    return False
            continue
        if not st or st.get("min") is None:
            continue
        smin, smax = st["min"], st["max"]
        if isinstance(bound, (list, set, frozenset)):
            vals = set(bound)
            numeric_bound = any(isinstance(v, (int, float)) for v in vals)
            if numeric_bound:
                try:
                    smin, smax = float(smin), float(smax)
                except (TypeError, ValueError):
                    continue
            try:
                if not any(smin <= v <= smax for v in vals):
                    return False
            except TypeError:
                pass  # uncomparable bound/stat types: keep the file
            continue
        lo, hi = bound
        numeric_bound = isinstance(lo, (int, float)) or isinstance(
            hi, (int, float)
        )
        if numeric_bound:
            try:
                smin, smax = float(smin), float(smax)
            except (TypeError, ValueError):
                continue  # non-numeric stats can't prune a numeric bound
        try:
            if lo is not None and smax < lo:
                return False
            if hi is not None and smin > hi:
                return False
        except TypeError:
            pass  # uncomparable bound/stat types (e.g. datetime vs JSON
            # string stats): pruning is advisory — keep the file
    return True
