"""Per-block statistics, mirroring the reference's single-pass collectors.

Numeric: ``/root/reference/btrblocks/stats/NumberStats.hpp:78-130``
(min/max/null_count/unique_count/average_run_length/is_sorted).
String: ``/root/reference/btrblocks/stats/StringStats.cpp:5-37``
(distinct set, total/unique lengths, null count).

Like the reference, null slots carry NULL_CODE (0) and *do* participate in
stats and run detection ("Let NULL_CODE of null values also taken into stats
consideration", NumberStats.hpp:89; RLE null-run extension RLE.hpp:35-46).

Also implements the stratified sampler used by the scheme picker
(``/root/reference/btrblocks/stats/NumberStats.hpp:34-76``): n slices, one
random run of ``length`` values from each — but deterministically seeded so
checkpoint-resume re-picks the same schemes.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from btrblocks_spark import SAMPLE_COUNT, SAMPLE_RUN_LENGTH


@dataclass
class NumberStats:
    n: int
    null_count: int
    min: float
    max: float
    unique_count: int
    average_run_length: float
    is_sorted: bool


@dataclass
class StringStats:
    n: int
    null_count: int
    unique_count: int
    total_length: int
    total_unique_length: int


def number_stats(values: np.ndarray, validity: np.ndarray | None) -> NumberStats:
    n = len(values)
    null_count = 0 if validity is None else int(n - validity.sum())
    if n == 0:
        return NumberStats(0, 0, 0, 0, 0, 0.0, True)
    uniq = np.unique(values)
    run_breaks = int(np.count_nonzero(np.diff(values))) + 1
    return NumberStats(
        n=n,
        null_count=null_count,
        min=values.min(),
        max=values.max(),
        unique_count=len(uniq),
        average_run_length=n / run_breaks,
        is_sorted=bool(np.all(np.diff(values) >= 0)),
    )


def string_stats(
    offsets: np.ndarray, pool: bytes, validity: np.ndarray | None
) -> StringStats:
    n = len(offsets) - 1
    null_count = 0 if validity is None else int(n - validity.sum())
    lengths = np.diff(offsets)
    # Distinct via numpy on (length, bytes) — see dict builder for the heavy path.
    from btrblocks_spark.codec.strings import unique_strings

    uniq_offsets, uniq_pool, _ = unique_strings(offsets, pool)
    return StringStats(
        n=n,
        null_count=null_count,
        unique_count=len(uniq_offsets) - 1,
        total_length=int(lengths.sum()),
        total_unique_length=len(uniq_pool),
    )


def sample_indices(n: int, seed: int) -> np.ndarray:
    """Deterministic stratified sample: SAMPLE_COUNT runs of SAMPLE_RUN_LENGTH.

    Whole block if n <= SAMPLE_COUNT * SAMPLE_RUN_LENGTH (reference
    NumberStats.hpp:40-44). The reference seeds from std::random_device; we
    seed deterministically for resume-idempotence (SURVEY.md §7.2).
    """
    total = SAMPLE_COUNT * SAMPLE_RUN_LENGTH
    if n <= total:
        return np.arange(n)
    rng = np.random.default_rng(seed)
    slice_len = n // SAMPLE_COUNT
    starts = (
        np.arange(SAMPLE_COUNT) * slice_len
        + rng.integers(0, max(1, slice_len - SAMPLE_RUN_LENGTH), SAMPLE_COUNT)
    )
    idx = (starts[:, None] + np.arange(SAMPLE_RUN_LENGTH)[None, :]).reshape(-1)
    return np.minimum(idx, n - 1)
