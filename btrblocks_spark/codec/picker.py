"""Greedy sample-based scheme selection.

Mirrors ``/root/reference/btrblocks/compression/SchemePicker.hpp:34-68``:
for each enabled+usable scheme, compress a stratified sample and measure the
achieved ratio; pick the argmax; fall back to UNCOMPRESSED when nothing
beats 1.0. ONE_VALUE short-circuits when unique<=1 (SchemePicker.hpp:118-129)
and depth 0 forces UNCOMPRESSED.

Usability guards are the reference's tuned thresholds
(``/root/reference/btrblocks/scheme/SchemeConfig.hpp``):
  RLE        — average_run_length > 2            (SchemeConfig.hpp:20)
  FREQUENCY  — unique/n <= 0.5 and top-1 >= 0.9  (SchemeConfig.hpp:17)
  DELTA_BP   — is_sorted                         (PBP.cpp:60-65)
  DICT       — unique < n/2                      (DynamicDictionary isUsable)
  PSEUDODEC  — unique_ratio >= 0.1, <=50% patches (Pseudodecimal.cpp:112-119,476-483)
"""

from __future__ import annotations

import numpy as np

from btrblocks_spark.codec import numeric
from btrblocks_spark.codec.stats import number_stats, sample_indices


def _candidates_int(v: np.ndarray, stats) -> list[int]:
    out = [numeric.FOR_BP]
    if stats.average_run_length > 2.0:
        out.append(numeric.RLE)
    if stats.unique_count < stats.n / 2:
        out.append(numeric.DICT)
        uniq_ratio = stats.unique_count / max(stats.n, 1)
        if uniq_ratio <= 0.5:
            out.append(numeric.FREQUENCY)
    if stats.is_sorted:
        out.append(numeric.DELTA_BP)
    return out


def _candidates_double(v: np.ndarray, stats) -> list[int]:
    out = []
    if stats.average_run_length > 2.0:
        out.append(numeric.RLE)
    if stats.unique_count < stats.n / 2:
        out.append(numeric.DICT)
        if stats.unique_count / max(stats.n, 1) <= 0.5:
            out.append(numeric.FREQUENCY)
    if stats.unique_count / max(stats.n, 1) >= 0.1:
        out.append(numeric.PSEUDODECIMAL)
    return out


def _frequency_top_ratio(v: np.ndarray) -> float:
    if len(v) == 0:
        return 0.0
    view = v.view(np.int64) if v.dtype == np.float64 else v
    _, counts = np.unique(view, return_counts=True)
    return counts.max() / len(v)


def pick_numeric(
    v: np.ndarray, level: int, seed: int, exclude: tuple[int, ...] = ()
) -> int:
    n = len(v)
    if n == 0 or level <= 0:
        return numeric.UNCOMPRESSED
    stats = number_stats(v, None)
    if stats.unique_count <= 1:
        return numeric.ONE_VALUE
    is_float = v.dtype == np.float64
    cands = _candidates_double(v, stats) if is_float else _candidates_int(v, stats)
    cands = [c for c in cands if c not in exclude]
    if numeric.FREQUENCY in cands and _frequency_top_ratio(v) < 0.9:
        cands.remove(numeric.FREQUENCY)
    if not cands:
        return numeric.UNCOMPRESSED
    if len(cands) == 1 and not is_float and cands[0] == numeric.FOR_BP:
        return numeric.FOR_BP

    sample = v[sample_indices(n, seed)]
    raw_size = sample.nbytes
    best, best_size = numeric.UNCOMPRESSED, raw_size + 5
    for scheme in cands:
        if scheme == numeric.DELTA_BP and not _sorted(sample):
            continue  # sample may break sortedness only at slice joints; re-check
        try:
            size = len(numeric.encode(sample, level, seed, force_scheme=scheme))
        except Exception:
            continue
        if size < best_size:
            best, best_size = scheme, size
    if best_size >= raw_size + 5:
        return numeric.UNCOMPRESSED
    return best


def _sorted(v: np.ndarray) -> bool:
    return bool(np.all(np.diff(v) >= 0))
