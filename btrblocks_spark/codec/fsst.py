"""FSST — Fast Static Symbol Table string compression, vectorized in numpy.

A real implementation of the scheme the reference links in as libfsst
(``/root/reference/btrblocks/scheme/string/Fsst.cpp:17-80``; Boncz,
Neumann, Leis: "FSST: Fast Random Access String Compression", VLDB 2020):

- a static table of up to 255 symbols, each 1-8 bytes, trained on a
  sample by iterated greedy pair-concatenation (``buildSymbolTable``);
- the byte stream is parsed greedy-longest-match into 1-byte codes;
- code 255 is the escape marker: the next byte is a literal.

Differences from libfsst, both documented and harmless to the format's
self-describing blob:

- Parsing is vectorized lockstep over fixed 64-byte segments (symbols do
  not cross segment boundaries). libfsst restricts symbols to not cross
  *string* boundaries; since the surrounding block codec stores string
  offsets separately and decodes whole pools, segment granularity only
  changes the achieved ratio by a hair, never correctness.
- Training runs a fixed number of deterministic rounds (no perturbation),
  so the same input always yields the same table.

Blob layout::

    u8 n_symbols | u8 lengths[n_symbols] | symbol bytes (concatenated) |
    u64 raw_len | u64 comp_len | compressed bytes

Decompression is table-lookup + scatter — a handful of numpy passes, no
per-byte Python.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_SYMBOLS = 255  # codes 0..254; 255 = escape
MAX_SYMBOL_LEN = 8
SEGMENT = 64
_TRAIN_ROUNDS = 4
_TRAIN_SAMPLE_BYTES = 64 * 1024
ESCAPE = 255


class SymbolTable:
    """Trained symbol table. ``values`` are u64 big-endian left-aligned
    symbol bytes; ``lengths`` their byte lengths (1..8)."""

    __slots__ = ("values", "lengths", "_by_len", "_direct1", "_direct2")

    def __init__(self, values: np.ndarray, lengths: np.ndarray):
        order = np.lexsort((values, lengths))
        self.values = values[order]
        self.lengths = lengths[order]
        # per length: (sorted keys, code ids); lengths 1-2 get
        # direct-addressed tables (a single gather beats binary search)
        self._by_len = {}
        codes = np.arange(len(self.values), dtype=np.uint16)
        self._direct1 = None
        self._direct2 = None
        for ln in range(1, MAX_SYMBOL_LEN + 1):
            sel = self.lengths == ln
            if not sel.any():
                continue
            keys = self.values[sel] >> np.uint64(8 * (8 - ln))
            ks = np.argsort(keys)
            keys, ids = keys[ks], codes[sel][ks]
            if ln == 1:
                self._direct1 = np.full(256, 0xFFFF, np.uint16)
                self._direct1[keys.astype(np.int64)] = ids
            elif ln == 2:
                self._direct2 = np.full(65536, 0xFFFF, np.uint16)
                self._direct2[keys.astype(np.int64)] = ids
            else:
                self._by_len[ln] = (keys, ids)

    def serialize(self) -> bytes:
        n = len(self.values)
        sym_bytes = bytearray()
        for v, ln in zip(self.values, self.lengths):
            sym_bytes += int(v).to_bytes(8, "big")[: int(ln)]
        return struct.pack("<B", n) + self.lengths.astype(np.uint8).tobytes() + bytes(
            sym_bytes
        )

    @classmethod
    def deserialize(cls, buf, pos: int) -> tuple["SymbolTable", int]:
        # single-byte indexing: a pyarrow-buffer memoryview is format
        # 'b' (SIGNED), so a symbol count >= 128 would read negative —
        # normalize to unsigned before indexing (zero-copy view cast)
        if isinstance(buf, memoryview) and buf.format != "B":
            buf = buf.cast("B")
        n = buf[pos]
        pos += 1
        lengths = np.frombuffer(buf, np.uint8, n, pos).astype(np.int64)
        pos += n
        values = np.zeros(n, np.uint64)
        for i in range(n):
            ln = int(lengths[i])
            values[i] = int.from_bytes(
                bytes(buf[pos : pos + ln]) + b"\0" * (8 - ln), "big"
            )
            pos += ln
        return cls(values, lengths.astype(np.uint8)), pos


def _windows_u64(data: np.ndarray) -> np.ndarray:
    """W[i] = bytes data[i:i+8] as big-endian u64 (zero-padded past end)."""
    n = len(data)
    padded = np.zeros(n + 8, np.uint8)
    padded[:n] = data
    w = np.zeros(n, np.uint64)
    for k in range(8):
        w |= padded[k : n + k].astype(np.uint64) << np.uint64(8 * (7 - k))
    return w


def _match_all(
    data: np.ndarray, table: SymbolTable, w: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy longest-match code + advance length for EVERY position.

    Returns (codes:uint16 — <255 symbol code, 256+b escape of byte b,
    lengths:int64 — bytes consumed)."""
    n = len(data)
    codes = data.astype(np.uint16) + np.uint16(256)  # default: escape
    lengths = np.ones(n, np.int64)
    if n == 0 or len(table.values) == 0:
        return codes, lengths
    if w is None:
        w = _windows_u64(data)
    # ascending length: longer matches overwrite shorter ones
    if table._direct1 is not None:
        c1 = table._direct1[data]
        hit = c1 != 0xFFFF
        codes[hit] = c1[hit]
    if table._direct2 is not None:
        probe = (w >> np.uint64(48)).astype(np.int64)
        c2 = table._direct2[probe]
        hit = c2 != 0xFFFF
        if n >= 1:
            hit[n - 1 :] = False  # symbol must fit
        codes[hit] = c2[hit]
        lengths[hit] = 2
    for ln in sorted(table._by_len):
        keys, code_ids = table._by_len[ln]
        probe = w >> np.uint64(8 * (8 - ln))
        idx = np.searchsorted(keys, probe)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == probe
        hit[n - ln + 1 :] = False  # symbol must fit
        codes[hit] = code_ids[idx_c[hit]]
        lengths[hit] = ln
    return codes, lengths


def _parse(
    data: np.ndarray, table: SymbolTable, w: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy parse into token sequence, lockstep across SEGMENT chunks.

    Returns (tokens:uint16 in stream order, seg_id per token)."""
    n = len(data)
    if n == 0:
        return np.empty(0, np.uint16), np.empty(0, np.int64)
    codes, lengths = _match_all(data, table, w)
    n_seg = (n + SEGMENT - 1) // SEGMENT
    seg_start = np.arange(n_seg, dtype=np.int64) * SEGMENT
    seg_end = np.minimum(seg_start + SEGMENT, n)
    # clamp advances at segment boundaries (symbols don't cross segments)
    pos_seg_end = np.minimum(
        (np.arange(n, dtype=np.int64) // SEGMENT + 1) * SEGMENT, n
    )
    adv = np.minimum(lengths, pos_seg_end - np.arange(n))
    crosses = adv < lengths
    # a clamped match can't use the symbol: fall back to escape
    tok_at = np.where(crosses, data.astype(np.uint16) + np.uint16(256), codes)
    adv = np.where(crosses, 1, adv)

    max_steps = SEGMENT
    tok_mat = np.full((n_seg, max_steps), 0xFFFF, np.uint16)
    P = seg_start.copy()
    active_idx = np.arange(n_seg)
    step = 0
    while len(active_idx) and step < max_steps:
        p = P[active_idx]
        tok_mat[active_idx, step] = tok_at[p]
        P[active_idx] = p + adv[p]
        still = P[active_idx] < seg_end[active_idx]
        if not still.all():
            active_idx = active_idx[still]
        step += 1
    valid = tok_mat != 0xFFFF
    tokens = tok_mat[valid]
    seg_ids = np.broadcast_to(
        np.arange(n_seg, dtype=np.int64)[:, None], tok_mat.shape
    )[valid]
    return tokens, seg_ids


def _emit(tokens: np.ndarray) -> np.ndarray:
    """Token sequence -> compressed byte stream (uint8)."""
    esc = tokens >= 256
    out_lens = np.where(esc, 2, 1).astype(np.int64)
    offs = np.zeros(len(tokens) + 1, np.int64)
    np.cumsum(out_lens, out=offs[1:])
    out = np.empty(offs[-1], np.uint8)
    pos = offs[:-1]
    out[pos[~esc]] = tokens[~esc].astype(np.uint8)
    out[pos[esc]] = ESCAPE
    out[pos[esc] + 1] = (tokens[esc] - 256).astype(np.uint8)
    return out


def train(data: np.ndarray, rounds: int = _TRAIN_ROUNDS) -> SymbolTable:
    """Iterated greedy symbol-table construction (buildSymbolTable analog)."""
    sample = data[:_TRAIN_SAMPLE_BYTES]
    table = SymbolTable(np.empty(0, np.uint64), np.empty(0, np.uint8))
    w = _windows_u64(sample)
    for _ in range(rounds):
        tokens, seg_ids = _parse(sample, table, w)
        if len(tokens) == 0:
            break
        # token -> (u64 left-aligned value, byte length)
        is_esc = tokens >= 256
        tval = np.where(
            is_esc,
            (tokens.astype(np.uint64) - 256) << np.uint64(56),
            np.zeros(len(tokens), np.uint64),
        )
        tlen = np.where(is_esc, 1, 0).astype(np.int64)
        if len(table.values):
            sym = ~is_esc
            tcodes = tokens[sym].astype(np.int64)
            tval[sym] = table.values[tcodes]
            tlen[sym] = table.lengths[tcodes].astype(np.int64)
        # singles
        cand_v = [tval]
        cand_l = [tlen]
        # adjacent pairs within a segment, concat <= 8 bytes
        if len(tokens) > 1:
            same = seg_ids[1:] == seg_ids[:-1]
            plen = tlen[:-1] + tlen[1:]
            ok = same & (plen <= MAX_SYMBOL_LEN)
            pv = tval[:-1][ok] | (
                tval[1:][ok] >> (np.uint64(8) * tlen[:-1][ok].astype(np.uint64))
            )
            cand_v.append(pv)
            cand_l.append(plen[ok])
        values = np.concatenate(cand_v)
        lens = np.concatenate(cand_l)
        # aggregate gains: group by (value, length) via lexsort (much
        # faster than np.unique(axis=0)'s void-dtype sort)
        order = np.lexsort((lens, values))
        sv, sl = values[order], lens[order]
        is_new = np.concatenate(
            [[True], (sv[1:] != sv[:-1]) | (sl[1:] != sl[:-1])]
        )
        bounds = np.flatnonzero(np.concatenate([is_new, [True]]))
        counts = np.diff(bounds)
        uv = sv[is_new]
        ul = sl[is_new]
        gain = counts * np.maximum(ul, 1)
        # deterministic top-N: by (gain desc, value asc, len asc)
        order = np.lexsort((ul, uv, -gain))[:MAX_SYMBOLS]
        table = SymbolTable(uv[order], ul[order].astype(np.uint8))
    return table


def compress(data) -> bytes:
    """Full blob: symbol table + compressed stream."""
    arr = np.frombuffer(data, np.uint8)
    table = train(arr)
    tokens, _ = _parse(arr, table)
    comp = _emit(tokens)
    return (
        table.serialize()
        + struct.pack("<QQ", len(arr), len(comp))
        + comp.tobytes()
    )


def decompress(blob) -> bytes:
    buf = memoryview(blob)
    if buf.format != "B":  # pyarrow buffers view as signed 'b'
        buf = buf.cast("B")
    table, pos = SymbolTable.deserialize(buf, 0)
    raw_len, comp_len = struct.unpack_from("<QQ", buf, pos)
    pos += 16
    comp = np.frombuffer(buf, np.uint8, comp_len, pos)
    if comp_len == 0:
        return b""
    # --- find token starts: runs of ESCAPE bytes parse as escape pairs ---
    is_esc_byte = comp == ESCAPE
    token_start = np.ones(len(comp), bool)
    if is_esc_byte.any():
        idx = np.flatnonzero(is_esc_byte)
        run_break = np.flatnonzero(np.diff(idx) > 1)
        run_starts = idx[np.concatenate([[0], run_break + 1])]
        run_ends = idx[np.concatenate([run_break, [len(idx) - 1]])] + 1
        run_lens = run_ends - run_starts
        # a maximal run of k ESCAPE bytes always begins at a token
        # boundary (the byte before it ends its own token); it parses as
        # escape pairs: escape-starts at s, s+2, ...; the bytes between
        # are their literals. Odd k: the last escape consumes the first
        # byte AFTER the run as its literal.
        n_esc = (run_lens + 1) // 2
        total = int(n_esc.sum())
        rep_start = np.repeat(run_starts, n_esc)
        local = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(n_esc)[:-1]]), n_esc
        )
        esc_pos = rep_start + 2 * local
        run_all = np.repeat(run_starts, run_lens) + (
            np.arange(int(run_lens.sum()))
            - np.repeat(np.concatenate([[0], np.cumsum(run_lens)[:-1]]), run_lens)
        )
        token_start[run_all] = False
        token_start[esc_pos] = True
        consumed = np.zeros(len(comp) + 1, bool)
        consumed[esc_pos + 1] = True  # literal of each escape
        token_start &= ~consumed[: len(comp)]
    starts = np.flatnonzero(token_start)
    codes = comp[starts]
    esc_tok = codes == ESCAPE
    # output lengths
    sym_lens = table.lengths.astype(np.int64)
    out_lens = np.ones(len(starts), np.int64)
    if len(sym_lens):
        out_lens[~esc_tok] = sym_lens[codes[~esc_tok]]
    offs = np.zeros(len(starts) + 1, np.int64)
    np.cumsum(out_lens, out=offs[1:])
    out = np.empty(int(offs[-1]), np.uint8)
    pos_out = offs[:-1]
    # escapes: literal byte
    out[pos_out[esc_tok]] = comp[starts[esc_tok] + 1]
    # symbols: scatter per length class
    if len(table.values):
        sym_mat = (
            table.values[:, None]
            >> (np.uint64(8) * (np.uint64(7) - np.arange(8, dtype=np.uint64)))
        ).astype(np.uint8)
        scodes = codes[~esc_tok].astype(np.int64)
        spos = pos_out[~esc_tok]
        slen = sym_lens[scodes]
        for ln in range(1, MAX_SYMBOL_LEN + 1):
            sel = slen == ln
            if not sel.any():
                continue
            base = spos[sel]
            rows = sym_mat[scodes[sel]]
            for k in range(ln):
                out[base + k] = rows[:, k]
    result = out.tobytes()
    if len(result) != raw_len:
        raise ValueError(
            f"fsst: decompressed {len(result)} bytes, expected {raw_len}"
        )
    return result
