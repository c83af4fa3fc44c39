"""Per-file key bloom digests for MERGE touched-file discovery.

A small bloom filter over an integer key column, written into the
manifest ``stats`` JSON at encode time (``blockfile.encode_table``,
``bloom_cols``). ``merge_into`` consults it during candidate discovery:
files whose bloom rejects every source key are skipped WITHOUT opening
them — the keyscan reads key blobs only from files that may actually
hold a match. The manifest min/max range prune cuts the candidate set
coarsely; the bloom cuts it per-key (a file whose key range overlaps
the source range but holds none of its keys is range-kept, bloom-
dropped).

Vectorized splitmix64 double hashing (Kirsch-Mitzenmacher): probe i of
key x lands at ``(h1 + i*h2) mod m`` with (h1, h2) the two halves of
splitmix64(x). ~10 bits/key, k=4 -> ~1.2% false positives; a false
positive only costs an extra file keyscan, never correctness.
Integer key columns only (the merge-bench key shape); other types
simply get no bloom and fall back to the range prune.
"""

from __future__ import annotations

import base64

import numpy as np

BITS_PER_KEY = 10
N_HASHES = 4
MAX_BITS = 1 << 18  # 32 KiB of bits per file per column, manifest-friendly


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constants)."""
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _hash64(keys) -> np.ndarray:
    """uint64 hash per key. Integer arrays hash via splitmix64 directly;
    string/bytes keys are folded to 64 bits with two seeded crc32 passes
    (C-speed via zlib) and then splitmix-finalized. Same function on the
    write and probe sides — the only requirement."""
    arr = np.asarray(keys)
    if arr.dtype.kind in "iu":
        return _splitmix64(arr.astype(np.int64).view(np.uint64))
    import zlib

    out = np.empty(len(arr), np.uint64)
    for i, v in enumerate(arr):
        b = v.encode() if isinstance(v, str) else bytes(v)
        out[i] = (zlib.crc32(b) << 32) | zlib.crc32(b, 0x9E3779B9)
    return _splitmix64(out)


def _probes(keys, m: int) -> np.ndarray:
    """(len(keys), N_HASHES) bit positions."""
    h = _hash64(keys)
    h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
    h2 = ((h >> np.uint64(32)) | np.uint64(1)).astype(np.int64)
    i = np.arange(N_HASHES, dtype=np.int64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % m


def build_bloom(values) -> dict | None:
    """Bloom dict {m, k, b64} for an int64/string key array; None when
    empty."""
    arr = np.asarray(values)
    if len(arr) == 0:
        return None
    uniq = np.unique(
        arr.astype(np.int64) if arr.dtype.kind in "iu" else arr
    )
    m = int(min(MAX_BITS, max(1024, len(uniq) * BITS_PER_KEY)))
    m = (m + 63) // 64 * 64
    bits = np.zeros(m, np.uint8)
    bits[_probes(uniq, m).ravel()] = 1
    return {
        "m": m,
        "k": N_HASHES,
        "b64": base64.b64encode(np.packbits(bits).tobytes()).decode(),
    }


def bloom_may_contain_any(bloom: dict, keys) -> bool:
    """True when ANY of ``keys`` may be in the file (all-k-bits-set for
    at least one key). Vectorized over the whole key batch."""
    m = int(bloom["m"])
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(bloom["b64"]), np.uint8)
    )[:m]
    pos = _probes(np.asarray(keys), m)
    return bool(bits[pos].all(axis=1).any())


# ------------------------------------------------------------- tokens
import re as _re

_TOKEN_RE = _re.compile(r"[a-z0-9]+")


def tokenize(s: str) -> list[str]:
    """Write-side AND query-side tokenizer for caption/text token blooms
    (must be identical on both sides): lowercase alnum runs."""
    return _TOKEN_RE.findall(s.lower())


def build_token_bloom(strings) -> dict | None:
    """Per-file token bloom over a text column: the bloom of the UNION
    of every value's tokens. ``scan(prune={col: {"tokens_all":
    [...]}})`` skips files whose bloom rejects any query token — the
    substring-search analog of the key blooms (a LIKE '%word%' scan
    opens only files that may contain the word)."""
    toks: set[str] = set()
    for s in strings:
        if s is not None:
            toks.update(tokenize(s))
    if not toks:
        return None
    return build_bloom(np.array(sorted(toks), dtype=object))


# ---------------------------------------------------------------- KMV
#: bottom-k size for per-file distinct sketches (stderr ~ 1/sqrt(k-2)
#: ~ 6%); 256 * 8 B ~ 2.7 KB base64 per column per file in the manifest
KMV_K = 256
#: hash domain: splitmix64 >> 1 is uniform in [0, 2^63)
KMV_DOMAIN = float(1 << 63)


def build_kmv(values, k: int = KMV_K) -> dict | None:
    """Per-file KMV (k-minimum-values) distinct sketch over a key array:
    the k smallest DISTINCT 63-bit hashes, little-endian int64 base64.
    Mergeable across files by unioning and re-taking the bottom k —
    the manifest-level distinct-stats primitive (`stats_agg` folds
    these into an approx COUNT(DISTINCT) with zero data I/O). Same
    `_hash64` as the blooms, so int and string keys both work."""
    arr = np.asarray(values)
    if len(arr) == 0:
        return None
    uniq = np.unique(
        arr.astype(np.int64) if arr.dtype.kind in "iu" else arr
    )
    h = np.unique(
        (_hash64(uniq) >> np.uint64(1)).astype(np.int64)
    )  # sorted
    bottom = h[:k]
    return {
        "k": int(k),
        "b64": base64.b64encode(
            bottom.astype("<i8").tobytes()
        ).decode(),
    }


def kmv_hashes(sketch: dict) -> np.ndarray:
    """Decode a ``build_kmv`` sketch back to its sorted int64 hashes."""
    return np.frombuffer(base64.b64decode(sketch["b64"]), "<i8")


def kmv_estimate(hashes: np.ndarray, k: int = KMV_K) -> int:
    """NDV estimate from a MERGED (unioned, deduped, sorted) hash set:
    exact count below k, else (k-1) / U_(k) with U the kth smallest
    hash normalized to (0, 1] (Bar-Yossef et al. 2002)."""
    if len(hashes) < k:
        return int(len(hashes))
    kth = float(hashes[k - 1])
    return int((k - 1) * KMV_DOMAIN / max(kth, 1.0))
