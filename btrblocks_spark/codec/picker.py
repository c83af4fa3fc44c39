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


def _bit_widths(res: np.ndarray) -> np.ndarray:
    """Per-value bit length of non-negative uint64 residuals, vectorized
    (frexp exponent == bit_length; split in 32-bit halves so every input
    is float64-exact)."""
    hi = (res >> np.uint64(32)).astype(np.uint32)
    lo = (res & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    lo_w = np.frexp(lo.astype(np.float64))[1]
    hi_w = np.frexp(hi.astype(np.float64))[1]
    return np.where(hi > 0, hi_w + 32, lo_w)


def _pfor_size_est(
    res: np.ndarray, scale: float = 1.0, n_full: int | None = None
) -> float:
    """Width-histogram PFOR size estimate (mirrors the encoder's
    base-width minimization in numeric._enc_pfor). With ``scale=1`` on
    the full residual block it is exact; with a sampled residual array
    and ``scale = n_full/len(sample)`` it extrapolates exception counts
    — used as the cheap gate before paying for the exact pass."""
    from btrblocks_spark.codec.bitpack import _WIDTHS, bits_needed

    n = n_full if n_full is not None else len(res)
    if n == 0 or len(res) == 0:
        return 18.0
    hist = np.bincount(_bit_widths(res), minlength=65)
    above = np.cumsum(hist[::-1])[::-1]  # above[w] = count(width >= w)
    pos_bytes = (bits_needed(max(n - 1, 0)) + 7) // 8
    best = None
    for w in _WIDTHS:
        n_exc = float(above[w + 1]) * scale if w < 64 else 0.0
        sz = 18 + (n * w + 7) // 8 + n_exc * (8 + pos_bytes)
        if best is None or sz < best:
            best = sz
    return float(best)


def pick_numeric(
    v: np.ndarray, level: int, seed: int, exclude: tuple[int, ...] = ()
) -> int:
    """Pick by EXTRAPOLATED full-block size, not raw sample size.

    Linear schemes (FOR/DELTA/FREQUENCY/decimal) scale their measured
    sample encoding by n/sample. DICT is sized analytically from a Chao1
    distinct-count extrapolation (a raw sample encoding makes the
    dictionary look proportionally ~100x bigger than it is), and RLE by
    the block's EXACT run count (already computed for the usability
    gate), since neither grows linearly with sampled rows.
    """
    from btrblocks_spark.codec.bitpack import bits_needed
    from btrblocks_spark.codec.config import get_config

    n = len(v)
    if n == 0 or level <= 0:
        return numeric.UNCOMPRESSED
    is_float = v.dtype == np.float64
    cfg = get_config()
    enabled = cfg.double_schemes if is_float else cfg.integer_schemes
    rv = v.view(np.int64) if is_float else v

    rmin, rmax = int(rv.min()), int(rv.max())
    # exact ONE_VALUE short-circuit (bit-pattern compare; cheap single pass)
    if numeric.ONE_VALUE in enabled and rmin == rmax:
        return numeric.ONE_VALUE

    diffs = np.diff(rv)
    full_runs = int(np.count_nonzero(diffs)) + 1
    avg_run_length = n / full_runs
    is_sorted = not is_float and bool(np.all(diffs >= 0))

    idx = sample_indices(n, seed)
    sample = v[idx]
    s_rv = sample.view(np.int64) if is_float else sample
    s_uniq, s_counts = np.unique(s_rv, return_counts=True)
    f1 = int((s_counts == 1).sum())
    f2 = int((s_counts == 2).sum())
    est_d = min(float(len(s_uniq) + (f1 * f1) / (2.0 * max(f2, 1))), n)
    est_ratio = est_d / n
    top_ratio = s_counts.max() / len(sample)

    cands: list[int] = []
    if not is_float:
        cands.append(numeric.FOR_BP)
        cands.append(numeric.PFOR)
    if avg_run_length > 2.0:
        cands.append(numeric.RLE)
    if est_ratio < 0.5:
        cands.append(numeric.DICT)
        if top_ratio >= 0.9:
            cands.append(numeric.FREQUENCY)
    if is_sorted and avg_run_length <= 2.0:
        # on sorted-with-long-runs data RLE dominates (see RLE sizing)
        cands.append(numeric.DELTA_BP)
    if is_float and est_ratio >= 0.1:
        cands.append(numeric.PSEUDODECIMAL)
        cands.append(numeric.DOUBLE_BP)
    cands = [c for c in cands if c not in exclude and c in enabled]
    if not cands:
        return numeric.UNCOMPRESSED

    full_est: dict[int, float] = {numeric.UNCOMPRESSED: float(n * 8)}
    # FOR_BP is sized exactly from the full-block min/max (no residual
    # array needed). PFOR's exact sizing needs a full-block width
    # histogram — an O(n) pass with two temporaries — so it is gated
    # behind a sampled outlier signal: only when the sample's width
    # distribution (or a max outside the sample) says patching could
    # beat plain FOR_BP by >2% do we pay for the exact histogram.
    w_full = bits_needed(rmax - rmin)
    if numeric.FOR_BP in cands:
        full_est[numeric.FOR_BP] = 14.0 + (n * w_full + 7) // 8
    if numeric.PFOR in cands:
        s_res = (s_rv.astype(np.int64) - rmin).astype(np.uint64)
        s_widths = _bit_widths(s_res)
        sw_max = int(s_widths.max()) if len(s_widths) else 0
        pfor_est = _pfor_size_est(
            s_res, scale=n / max(len(s_res), 1), n_full=n
        )
        for_size = 14.0 + (n * w_full + 7) // 8
        # extrapolation-variance repair: when the sample contains only a
        # handful of wide values the extrapolated exception count is
        # noisy — a sample that happens to hold the global max width but
        # under-represents exceptions would otherwise silently drop a
        # winning PFOR (compression-only regression, decode unaffected)
        s_hist = np.bincount(s_widths, minlength=66) if len(s_widths) else \
            np.zeros(66, np.int64)
        s_above = np.cumsum(s_hist[::-1])[::-1]
        n_exc_sampled = int(s_above[sw_max]) if sw_max > 0 else 0
        few_wide = 0 < n_exc_sampled <= 4
        if w_full > sw_max or few_wide or pfor_est < for_size * 0.98:
            # outliers beyond the sample, a high-variance sampled
            # exception estimate, or a sampled win — exact pass
            residuals = (rv.astype(np.int64) - rmin).astype(np.uint64)
            full_est[numeric.PFOR] = _pfor_size_est(residuals)
        # else: PFOR cannot meaningfully beat FOR_BP here; leave it out
    if set(full_est) | set(cands) <= {
        numeric.UNCOMPRESSED, numeric.FOR_BP, numeric.PFOR
    }:
        return min(full_est, key=lambda s: full_est[s])
    for scheme in cands:
        if scheme in (numeric.FOR_BP, numeric.PFOR):
            continue
        if scheme == numeric.DICT:
            # code width sits between the sample's distinct count (lower
            # bound) and the Chao extrapolation (upper); averaging avoids
            # mis-ranking right at a packing-width cliff (e.g. 255 vs 338)
            code_bits = (
                max(bits_needed(max(len(s_uniq) - 1, 1)), 1)
                + max(bits_needed(max(int(est_d) - 1, 1)), 1)
            ) / 2.0
            full_est[scheme] = est_d * 8 + n * code_bits / 8.0 + 32
            continue
        probe = sample
        scale = n / len(sample)
        if scheme == numeric.DELTA_BP:
            # rebuild from WITHIN-run deltas (cross-stratum jumps would
            # inflate the delta width)
            if not _sorted(sample):
                continue
            within = np.diff(idx) == 1
            deltas = np.diff(sample)[within]
            if len(deltas) == 0:
                continue
            probe = np.concatenate([sample[:1], sample[0] + np.cumsum(deltas)])
            scale = n / len(probe)
        try:
            size = len(numeric.encode(probe, level, seed, force_scheme=scheme))
        except Exception:
            continue
        if scheme == numeric.RLE:
            sample_runs = int(np.count_nonzero(np.diff(
                probe.view(np.int64) if is_float else probe
            ))) + 1
            scale = full_runs / max(sample_runs, 1)
        full_est[scheme] = size * scale
    best = min(full_est, key=lambda s: full_est[s])
    if full_est[best] >= n * 8:
        return numeric.UNCOMPRESSED
    return best


def _sorted(v: np.ndarray) -> bool:
    return bool(np.all(np.diff(v) >= 0))
