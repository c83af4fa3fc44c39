"""Greedy sample-based scheme selection.

Mirrors ``/root/reference/btrblocks/compression/SchemePicker.hpp:34-68``:
for each enabled+usable scheme, compress a stratified sample and measure the
achieved ratio; pick the argmax; fall back to UNCOMPRESSED when nothing
beats 1.0. ONE_VALUE short-circuits when unique<=1 (SchemePicker.hpp:118-129)
and depth 0 forces UNCOMPRESSED.

Usability guards are the reference's tuned thresholds
(``/root/reference/btrblocks/scheme/SchemeConfig.hpp``), evaluated on the
stratified sample (the reference also samples — NumberStats.hpp:34-76):
  RLE        — average_run_length > 2            (SchemeConfig.hpp:20)
  FREQUENCY  — unique/n <= 0.5 and top-1 >= 0.9  (SchemeConfig.hpp:17)
  DELTA_BP   — is_sorted                         (PBP.cpp:60-65)
  DICT       — unique < n/2                      (DynamicDictionary isUsable)
  PSEUDODEC  — unique_ratio >= 0.1, <=50% patches (Pseudodecimal.cpp:112-119,476-483)

Full-block ``np.unique`` happens only inside the encoder of the scheme
that actually wins — never during selection.
"""

from __future__ import annotations

import numpy as np

from btrblocks_spark.codec import numeric
from btrblocks_spark.codec.stats import sample_indices


def pick_numeric(
    v: np.ndarray, level: int, seed: int, exclude: tuple[int, ...] = ()
) -> int:
    from btrblocks_spark.codec.config import get_config

    n = len(v)
    if n == 0 or level <= 0:
        return numeric.UNCOMPRESSED
    is_float = v.dtype == np.float64
    cfg = get_config()
    enabled = cfg.double_schemes if is_float else cfg.integer_schemes
    rv = v.view(np.int64) if is_float else v

    # exact ONE_VALUE short-circuit (bit-pattern compare; cheap single pass)
    if numeric.ONE_VALUE in enabled and rv.min() == rv.max():
        return numeric.ONE_VALUE

    diffs = np.diff(rv)
    run_breaks = int(np.count_nonzero(diffs)) + 1
    avg_run_length = n / run_breaks
    is_sorted = not is_float and bool(np.all(np.diff(v) >= 0))

    sample = v[sample_indices(n, seed)]
    s_rv = sample.view(np.int64) if is_float else sample
    s_uniq, s_counts = np.unique(s_rv, return_counts=True)
    unique_ratio = len(s_uniq) / len(sample)
    top_ratio = s_counts.max() / len(sample)

    cands: list[int] = []
    if not is_float:
        cands.append(numeric.FOR_BP)
    if avg_run_length > 2.0:
        cands.append(numeric.RLE)
    if unique_ratio < 0.5:
        cands.append(numeric.DICT)
        if top_ratio >= 0.9:
            cands.append(numeric.FREQUENCY)
    if is_sorted and avg_run_length <= 2.0:
        # on sorted-with-long-runs data RLE dominates (its run count does
        # not grow with block size, so a sampled size comparison would
        # misrank it); RLE's values stream cascades through DELTA anyway
        cands.append(numeric.DELTA_BP)
    if is_float and unique_ratio >= 0.1:
        cands.append(numeric.PSEUDODECIMAL)
        cands.append(numeric.DOUBLE_BP)
    cands = [c for c in cands if c not in exclude and c in enabled]
    if not cands:
        return numeric.UNCOMPRESSED
    if cands == [numeric.FOR_BP]:
        return numeric.FOR_BP

    raw_size = sample.nbytes
    best, best_size = numeric.UNCOMPRESSED, raw_size + 5
    for scheme in cands:
        probe = sample
        if scheme == numeric.DELTA_BP:
            # the stratified sample's cross-run jumps would inflate the
            # delta width; measure on a sequence rebuilt from WITHIN-run
            # deltas only (run boundaries are a vanishing fraction of a
            # real block)
            if not _sorted(sample):
                continue
            idx = sample_indices(n, seed)
            within = np.diff(idx) == 1
            deltas = np.diff(sample)[within]
            if len(deltas) == 0:
                continue
            probe = np.concatenate([sample[:1], sample[0] + np.cumsum(deltas)])
        try:
            size = len(numeric.encode(probe, level, seed, force_scheme=scheme))
        except Exception:
            continue
        if size < best_size:
            best, best_size = scheme, size
    if best_size >= raw_size + 5:
        return numeric.UNCOMPRESSED
    return best


def _sorted(v: np.ndarray) -> bool:
    return bool(np.all(np.diff(v) >= 0))
