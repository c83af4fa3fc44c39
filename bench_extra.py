"""Extra benchmarks for the optimization round (bench.py is FROZEN).

Times individual queries from __spark_entry__.queries() with the same
methodology as bench.py (same session config, .count() action, 3 reps,
min+median), optionally with the noop sink for isolation (guide §1.4),
and can dump .explain("formatted") plans.

Usage:
  python bench_extra.py [--sf DIR] [--reps N] [--noop] [--explain OUTDIR] q1 q2 ...
  python bench_extra.py --all           # the 20 BENCH_QUERIES
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _spark(cores: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"btrblocks-bench-extra-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", "48g")
        .config("spark.locality.wait", "0s")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true",
                    help="noop sink instead of count()")
    ap.add_argument("--explain", metavar="OUTDIR",
                    help="dump explain('formatted') per query")
    ap.add_argument("--all", action="store_true",
                    help="run the bench.py BENCH_QUERIES list")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    import bench

    qs = entrymod.queries()
    names = args.names
    if args.all:
        names = list(bench.BENCH_QUERIES)
    if not names:
        ap.error("no queries given (use --all or name queries)")

    spark = _spark(CPUS)
    # warmup like bench.py: JIT the scan path once
    qs[names[0]](spark, args.sf).count()

    out: dict[str, dict] = {}
    for name in names:
        fn = qs[name]
        if args.explain:
            os.makedirs(args.explain, exist_ok=True)
            df = fn(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.explain, f"{name}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            df = fn(spark, args.sf)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            samples.append(round(time.time() - t0, 3))
        out[name] = {
            "min": min(samples),
            "median": sorted(samples)[len(samples) // 2],
            "samples": samples,
        }
        print(f"{name}: min={out[name]['min']} samples={samples}",
              flush=True)
    spark.stop()
    print(json.dumps({"sf_dir": args.sf, "queries": out}))


if __name__ == "__main__":
    main()
