"""Synthesize a larger perf-testing dataset from /root/testdata/sf0.1.

The driver's round-end MEASUREMENT runs at a larger driver-generated
scale factor (sf=1.0 in BENCH_r06.json). That generator is driver-side;
this tool builds a statistically similar stand-in by replicating sf0.1
K times with deterministic mutations so optimizations can be validated
at the scale that actually gets measured:

- keyed tables (orders/lineitem/part/customer/supplier/events): keys are
  offset per replica so joins keep the same fan-out per key;
- events: timestamps shift by replica * (span + 1h) so temporal density
  (events per 60 s bin) stays constant, matching the observed ~linear
  sf0.1 -> sf1.0 driver timings for the range join;
- documents: replica > 0 texts are re-sampled word salad from the same
  vocabulary with the same doc-length distribution (seeded per doc), so
  shingle/dup structure stays comparable instead of creating K-sized
  exact-dup clusters;
- embeddings: re-sampled unit normals per replica (seeded).

Usage: python tools/make_sf.py OUT_DIR K   (K=10 approximates sf1.0)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("MAKE_SF_SRC", "/root/testdata/sf0.1")


def _offset(col: pa.ChunkedArray, k: int, step: int) -> pa.Array:
    return pa.array(col.to_numpy(zero_copy_only=False) + k * step,
                    type=col.type)


def main() -> None:
    out_dir, K = sys.argv[1], int(sys.argv[2])
    os.makedirs(out_dir, exist_ok=True)

    # small dims: copy as-is
    for t in ("region", "nation"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"),
                       f"{out_dir}/{t}.parquet")

    def repl(name: str, key_steps: dict[str, int],
             mutate=None) -> None:
        t = pq.read_table(f"{SRC}/{name}.parquet")
        parts = []
        for k in range(K):
            cols = {}
            for fname in t.schema.names:
                col = t.column(fname)
                if fname in key_steps:
                    cols[fname] = _offset(col, k, key_steps[fname])
                else:
                    cols[fname] = col
            tk = pa.table(cols)
            if mutate is not None:
                tk = mutate(tk, k)
            parts.append(tk)
        pq.write_table(pa.concat_tables(parts), f"{out_dir}/{name}.parquet")
        print(name, "->", sum(p.num_rows for p in parts), "rows")

    o = pq.read_table(f"{SRC}/orders.parquet")
    n_ok = int(o.column("o_orderkey").to_numpy().max()) + 1
    c = pq.read_table(f"{SRC}/customer.parquet")
    n_ck = int(c.column("c_custkey").to_numpy().max()) + 1
    p = pq.read_table(f"{SRC}/part.parquet")
    n_pk = int(p.column("p_partkey").to_numpy().max()) + 1
    s = pq.read_table(f"{SRC}/supplier.parquet")
    n_sk = int(s.column("s_suppkey").to_numpy().max()) + 1

    repl("customer", {"c_custkey": n_ck})
    repl("supplier", {"s_suppkey": n_sk})
    repl("part", {"p_partkey": n_pk})
    repl("orders", {"o_orderkey": n_ok, "o_custkey": n_ck})
    repl("lineitem", {"l_orderkey": n_ok, "l_partkey": n_pk,
                      "l_suppkey": n_sk})

    # events: shift replicas past the end of the span (constant density)
    ev = pq.read_table(f"{SRC}/events.parquet")
    ts = ev.column("ts").cast(pa.int64()).to_numpy()
    span = int(ts.max() - ts.min()) + 3_600_000_000
    n_ev = int(ev.column("event_id").to_numpy().max()) + 1
    n_usr = int(ev.column("user_id").to_numpy().max()) + 1

    def mut_ev(tk: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return tk
        new_ts = pa.array(
            tk.column("ts").cast(pa.int64()).to_numpy() + k * span,
            type=pa.int64()).cast(ev.schema.field("ts").type)
        return tk.set_column(tk.schema.get_field_index("ts"), "ts", new_ts)

    repl("events", {"event_id": n_ev, "user_id": n_usr}, mutate=mut_ev)

    # documents: fresh word salad per replica from the sf0.1 vocabulary
    d = pq.read_table(f"{SRC}/documents.parquet")
    n_doc = int(d.column("doc_id").to_numpy().max()) + 1
    vocab = sorted({w for txt in d.column("text").to_pylist()
                    for w in txt.split() if w})
    lens = [len(txt.split()) for txt in d.column("text").to_pylist()]

    def mut_doc(tk: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return tk
        rng = np.random.default_rng(1234 + k)
        texts = []
        for n_words in lens:
            idx = rng.integers(0, len(vocab), size=n_words)
            texts.append(" ".join(vocab[i] for i in idx))
        tk = tk.set_column(tk.schema.get_field_index("text"), "text",
                           pa.array(texts))
        return tk.set_column(
            tk.schema.get_field_index("n_chars"), "n_chars",
            pa.array([len(t) for t in texts], type=pa.int64()))

    repl("documents", {"doc_id": n_doc}, mutate=mut_doc)

    # embeddings: fresh unit vectors per replica
    e = pq.read_table(f"{SRC}/embeddings.parquet")
    n_vec = int(e.column("vec_id").to_numpy().max()) + 1
    dim = len(e.column("embedding")[0].as_py())

    def mut_emb(tk: pa.Table, k: int) -> pa.Table:
        if k == 0:
            return tk
        rng = np.random.default_rng(777 + k)
        v = rng.standard_normal((tk.num_rows, dim))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        arr = pa.array(list(v.astype(np.float64)),
                       type=e.schema.field("embedding").type)
        return tk.set_column(tk.schema.get_field_index("embedding"),
                             "embedding", arr)

    repl("embeddings", {"vec_id": n_vec}, mutate=mut_emb)
    open(os.path.join(out_dir, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
