"""Job entrypoints for spark-submit.

Package the library and submit any maintenance job against a table root::

    python tools/make_pyfiles.py               # -> dist/btrblocks_spark.zip
    spark-submit --py-files dist/btrblocks_spark.zip tools/submit_job.py \
        compact --table /data/imgtable --target-file-bytes 67108864

(or ``python -m btrblocks_spark.jobs ...`` locally — the driver builds its
own SparkSession; on a cluster, spark-submit's conf wins).

Subcommands: create, append, compact, cluster, merge, expire, verify,
describe, export, meta. Every job prints a one-line JSON result.
"""

from __future__ import annotations

import argparse
import json
import re as _re
import os
import sys


def _spark(app: str):
    from pyspark.sql import SparkSession

    existing = SparkSession.getActiveSession()
    if existing is not None:
        # embedded invocation (tests, notebooks): reuse, never stop it
        return existing, False
    builder = (
        SparkSession.builder.appName(app)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
    )
    if not os.environ.get("SPARK_SUBMIT_MODE"):
        builder = builder.master(
            os.environ.get("SPARK_MASTER", "local[*]")
        )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark, True


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="btrblocks_spark.jobs")
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="create a table from parquet input")
    c.add_argument("--table", required=True)
    c.add_argument("--input", required=True, help="parquet path/glob")
    c.add_argument("--partition-by", default="")
    c.add_argument("--num-files", type=int, default=None)

    a = sub.add_parser("append")
    a.add_argument("--table", required=True)
    a.add_argument("--input", required=True)
    a.add_argument(
        "--stage",
        action="store_true",
        help="write-audit-publish: record the snapshot without making "
        "it current (audit via scan at its id, then `publish`)",
    )

    tg = sub.add_parser("tag", help="create/drop a named snapshot tag")
    tg.add_argument("--table", required=True)
    tg.add_argument("name")
    tg.add_argument("--snapshot", type=int, default=None)
    tg.add_argument("--delete", action="store_true")

    pb = sub.add_parser(
        "publish", help="publish (or abandon) a staged WAP snapshot"
    )
    pb.add_argument("--table", required=True)
    pb.add_argument("snapshot", type=int)
    pb.add_argument("--abandon", action="store_true")

    k = sub.add_parser("compact")
    k.add_argument("--table", required=True)
    k.add_argument("--target-file-bytes", type=int, default=16 * 2**20)
    k.add_argument("--job-id", default=None)

    z = sub.add_parser("cluster")
    z.add_argument("--table", required=True)
    z.add_argument("--by", default="phash,w,h")
    z.add_argument("--curve", choices=["zorder", "hilbert"], default="zorder")
    z.add_argument("--job-id", default=None)
    z.add_argument(
        "--only-new", action="store_true",
        help="incremental: cluster only files appended since the last "
        "cluster into a fresh sorted run (O(new data) rewrite)",
    )

    m = sub.add_parser("merge")
    m.add_argument("--table", required=True)
    m.add_argument("--source", required=True, help="parquet path of source")
    m.add_argument(
        "--on", required=True,
        help="key column, or comma-separated composite key",
    )
    m.add_argument("--when-matched", default="update")
    m.add_argument("--when-not-matched", default="insert")
    m.add_argument(
        "--strategy",
        choices=["staged", "shuffle", "mor"],
        default="staged",
        help="copy-on-write (staged/shuffle) or merge-on-read deletes",
    )

    ev = sub.add_parser(
        "evolve-spec",
        help="replace the hidden-partitioning spec without rewriting "
        "data (Iceberg partition-spec evolution)",
    )
    ev.add_argument("--table", required=True)
    ev.add_argument(
        "--partition-by", default="",
        help="new spec, comma-separated: bucket(N,c) truncate(W,c) "
        "days(c) or plain columns; empty = unpartitioned",
    )

    e = sub.add_parser("expire")
    e.add_argument("--table", required=True)
    e.add_argument("--keep-last", type=int, default=3)
    e.add_argument(
        "--older-than", type=float, default=None,
        help="age retention in seconds: younger snapshots are kept "
        "even beyond --keep-last",
    )

    v = sub.add_parser("verify")
    v.add_argument("--table", required=True)
    v.add_argument("--before", type=int, required=True)
    v.add_argument("--images", action="store_true")

    d = sub.add_parser("describe")
    d.add_argument("--table", required=True)

    x = sub.add_parser(
        "export", help="decompress the table back to plain parquet"
    )
    x.add_argument("--table", required=True)
    x.add_argument("--output", required=True, help="parquet output dir")
    x.add_argument("--columns", default="", help="comma-separated subset")
    x.add_argument("--snapshot", type=int, default=None)
    x.add_argument(
        "--native-io", action="store_true",
        help="read block files via pyarrow.fs in executors (object stores)",
    )

    rm = sub.add_parser(
        "rewrite-manifests", help="compact the manifest list into one"
    )
    rm.add_argument("--table", required=True)

    rd = sub.add_parser(
        "rewrite-deletes",
        help="minor-compact positional delete files (no data rewrite)",
    )
    rd.add_argument("--table", required=True)
    rd.add_argument("--min-files", type=int, default=2)

    rb = sub.add_parser("rollback", help="roll back to an earlier snapshot")
    rb.add_argument("--table", required=True)
    rb.add_argument("--snapshot", type=int, required=True)

    mn = sub.add_parser(
        "maintain",
        help="plan (and run) auto-maintenance from metadata signals",
    )
    mn.add_argument("--table", required=True)
    mn.add_argument(
        "--plan-only", action="store_true", help="print the plan, run nothing"
    )
    mn.add_argument("--keep-snapshots", type=int, default=20)
    mn.add_argument("--min-small-files", type=int, default=8)
    mn.add_argument("--orphans", action="store_true")

    ru = sub.add_parser(
        "rollup",
        help="create or refresh an incremental rollup (materialized "
        "sum/count aggregate maintained from the changelog)",
    )
    ru.add_argument("--src", required=True, help="source table root")
    ru.add_argument("--dst", required=True, help="rollup table root")
    ru.add_argument("--keys", required=True, help="comma-separated group keys")
    ru.add_argument(
        "--sum",
        action="append",
        default=[],
        metavar="OUT=COL",
        help="sum aggregate (repeatable); n_rows count is always kept",
    )
    ru.add_argument(
        "--create",
        action="store_true",
        help="materialize from scratch (otherwise refresh from watermark)",
    )

    th = sub.add_parser(
        "thumbs",
        help="materialize or refresh a derived thumbnail table "
        "(decode -> antialiased resize -> re-encode, O(new images) "
        "per refresh)",
    )
    th.add_argument("--src", required=True, help="image table root")
    th.add_argument("--dst", required=True, help="thumbnail table root")
    th.add_argument("--width", type=int, default=64)
    th.add_argument("--height", type=int, default=64)
    th.add_argument("--fmt", default="png")
    th.add_argument(
        "--create", action="store_true",
        help="materialize from scratch (otherwise refresh from "
        "watermark)",
    )

    vc = sub.add_parser("vacuum", help="remove orphan data/staging files")
    vc.add_argument("--table", required=True)
    vc.add_argument("--dry-run", action="store_true")
    vc.add_argument(
        "--older-than",
        type=float,
        default=3 * 24 * 3600.0,
        help="age threshold in seconds (default 3 days); younger files "
        "are kept to protect in-flight/resumable jobs",
    )

    ac = sub.add_parser("add-column", help="schema evolution: add a column")
    ac.add_argument("--table", required=True)
    ac.add_argument("--name", required=True)
    ac.add_argument("--type", required=True, help="Spark DDL type, e.g. double")

    rc = sub.add_parser(
        "rename-column", help="schema evolution: rename a column in place"
    )
    rc.add_argument("--table", required=True)
    rc.add_argument("--from", dest="old", required=True)
    rc.add_argument("--to", dest="new", required=True)

    dc = sub.add_parser(
        "drop-column", help="schema evolution: drop a column logically"
    )
    dc.add_argument("--table", required=True)
    dc.add_argument("--name", required=True)

    wc = sub.add_parser(
        "widen-column",
        help="schema evolution: promote a column to a wider type "
        "(int->bigint, float->double; metadata-only)",
    )
    wc.add_argument("--table", required=True)
    wc.add_argument("--name", required=True)
    wc.add_argument("--type", required=True, help="target Spark DDL type")

    hi = sub.add_parser(
        "history",
        help="snapshot log with is_current_ancestor (metadata only)",
    )
    hi.add_argument("--table", required=True)

    nc = sub.add_parser(
        "net-changes",
        help="net row-level changes per key over (from, to] — last "
        "effect per key, apply-equivalent to the ordered changelog",
    )
    nc.add_argument("--table", required=True)
    nc.add_argument("--from", dest="from_sid", type=int, required=True)
    nc.add_argument("--to", dest="to_sid", type=int, default=None)
    nc.add_argument("--keys", required=True, help="comma-separated")
    nc.add_argument("--out", required=True, help="parquet output path")

    st = sub.add_parser(
        "stats",
        help="metadata-only COUNT/MIN/MAX aggregates (zero data I/O)",
    )
    st.add_argument("--table", required=True)
    st.add_argument(
        "--agg",
        action="append",
        required=True,
        help="fn:col[:alias], e.g. count:*  min:o_orderkey:mn  approx_quantile:0.5:v:p50",
    )
    st.add_argument(
        "--partition",
        action="append",
        default=None,
        help="col=value partition scope (repeatable; exact per-file "
        "manifest partition match)",
    )

    ch = sub.add_parser(
        "changes", help="snapshot-diff changelog between two snapshots"
    )
    ch.add_argument("--table", required=True)
    ch.add_argument("--from-snapshot", type=int, required=True)
    ch.add_argument("--to-snapshot", type=int, default=None)
    ch.add_argument("--output", default=None, help="parquet output dir")

    lk = sub.add_parser(
        "lookup", help="point lookup (stats + bloom + zone-map skips)"
    )
    lk.add_argument("--table", required=True)
    lk.add_argument("--column", required=True)
    lk.add_argument("--value", required=True)
    lk.add_argument("--int", dest="as_int", action="store_true",
                    help="treat value as an integer key")

    mt = sub.add_parser(
        "meta", help="dump per-block scheme trees (btrmeta analog)"
    )
    mt.add_argument("--table", required=True)
    mt.add_argument("--file", default=None, help="specific data file")
    mt.add_argument("--blocks", type=int, default=1, help="blocks per file")

    cu = sub.add_parser(
        "curate",
        help="run the composed corpus-curation pipeline over parquet docs",
    )
    cu.add_argument("--input", required=True, help="documents parquet path")
    cu.add_argument("--out", required=True, help="curated parquet output")
    cu.add_argument("--benchmark", default=None, help="eval-set parquet")
    cu.add_argument("--lang", default="en")
    cu.add_argument("--min-quality", type=float, default=0.3)
    cu.add_argument("--max-rep", type=float, default=1.0)
    cu.add_argument("--rep-n", type=int, default=2)
    cu.add_argument("--decontam-n", type=int, default=8)
    cu.add_argument(
        "--report",
        action="store_true",
        help="append CUBE(lang, source) corpus stats of the curated "
        "output to the result JSON (needs lang/source columns)",
    )

    ci = sub.add_parser(
        "curate-init",
        help="batch-bootstrap INCREMENTAL curation: curated table + "
        "hash/paragraph state tables next to it",
    )
    ci.add_argument("--src", required=True, help="source BtrTable root")
    ci.add_argument("--out", required=True, help="curated BtrTable root")
    ci.add_argument("--benchmark", default=None, help="eval-set parquet")
    ci.add_argument("--lang", default="en")
    ci.add_argument("--min-quality", type=float, default=0.3)
    ci.add_argument("--max-rep", type=float, default=1.0)
    ci.add_argument("--rep-n", type=int, default=2)
    ci.add_argument("--decontam-n", type=int, default=8)

    rc2 = sub.add_parser(
        "rollup-create",
        help="materialize an incremental rollup table from a source "
        "BtrTable (sum/count/min/max)",
    )
    rc2.add_argument("--src", required=True)
    rc2.add_argument("--out", required=True)
    rc2.add_argument("--keys", required=True, help="comma-separated")
    rc2.add_argument(
        "--aggs", required=True,
        help="out=fn:col pairs, comma-separated; count takes no col "
        "(e.g. total=sum:bytes,lo=min:w,n=count)",
    )

    bj = sub.add_parser(
        "bucket-join",
        help="shuffle-free join of two co-bucketed tables; writes the "
        "result as plain parquet",
    )
    bj.add_argument("--left", required=True, help="left table root")
    bj.add_argument("--right", required=True, help="right table root")
    bj.add_argument(
        "--on", required=True,
        help="join key, or left_key,right_key when names differ",
    )
    bj.add_argument(
        "--how", default="inner",
        choices=["inner", "left", "leftsemi", "leftanti"],
    )
    bj.add_argument("--output", required=True, help="parquet output dir")
    bj.add_argument("--columns", default="", help="left-side subset")
    bj.add_argument("--columns-b", default="", help="right-side subset")

    rr = sub.add_parser(
        "rollup-refresh",
        help="fold source changes since the watermark into the rollup "
        "(O(changed rows), exactly-once)",
    )
    rr.add_argument("--src", required=True)
    rr.add_argument("--out", required=True)
    rr.add_argument("--keys", required=True)
    rr.add_argument("--aggs", required=True)

    cr = sub.add_parser(
        "curate-refresh",
        help="fold source changes since the watermark into the curated "
        "table — O(changed docs), result == full re-curation",
    )
    cr.add_argument("--src", required=True, help="source BtrTable root")
    cr.add_argument("--out", required=True, help="curated BtrTable root")
    cr.add_argument("--benchmark", default=None, help="eval-set parquet")

    args = p.parse_args(argv)
    from btrblocks_spark.sources.table import BtrTable

    if args.cmd == "meta":
        # pure-metadata path: no Spark session needed
        import pyarrow.parquet as pq

        from btrblocks_spark.codec import block_scheme_tree

        t = BtrTable(None, args.table)
        rows = t.data_files()
        if args.file:
            rows = [r for r in rows if r["file_path"].endswith(args.file)]
        out = []
        for r in rows[:20]:
            bt = pq.read_table(r["file_path"])
            trees = {}
            for c in bt.schema.names:
                if not c.startswith("b_"):
                    continue
                col_trees = [
                    block_scheme_tree(bt.column(c)[i].as_py())
                    for i in range(min(args.blocks, bt.num_rows))
                ]
                trees[c[2:]] = col_trees if args.blocks > 1 else col_trees[0]
            out.append(
                {
                    "file": os.path.basename(r["file_path"]),
                    "rows": r["row_count"],
                    "blocks": r["block_count"],
                    "ratio": round(r["raw_bytes"] / max(r["file_bytes"], 1), 3),
                    "schemes": trees,
                }
            )
        print(json.dumps(out, indent=1))
        return 0

    spark, owns_session = _spark(f"btrblocks-{args.cmd}")
    out: dict
    if args.cmd == "create":
        df = spark.read.parquet(args.input)
        # paren-aware split: "bucket(4,k),fmt" -> ["bucket(4,k)", "fmt"]
        parts = [
            c for c in _re.split(r",(?![^(]*\))", args.partition_by) if c
        ]
        t = BtrTable.create(
            spark, args.table, df, partition_by=parts, num_files=args.num_files
        )
        out = {"table": args.table, "files": len(t.data_files())}
    elif args.cmd == "append":
        t = BtrTable.load(spark, args.table)
        n = t.append(spark.read.parquet(args.input), stage=args.stage)
        out = (
            {"staged_snapshot_id": n}
            if args.stage
            else {"appended_files": n}
        )
    elif args.cmd == "tag":
        t = BtrTable.load(spark, args.table)
        if args.delete:
            t.drop_tag(args.name)
            out = {"dropped": args.name}
        else:
            out = {args.name: t.tag(args.name, args.snapshot)}
    elif args.cmd == "publish":
        t = BtrTable.load(spark, args.table)
        out = (
            t.abandon(args.snapshot)
            if args.abandon
            else t.publish(args.snapshot)
        )
    elif args.cmd == "compact":
        from btrblocks_spark.operators.compact import compact

        t = BtrTable.load(spark, args.table)
        out = compact(t, args.target_file_bytes, job_id=args.job_id)
    elif args.cmd == "cluster":
        from btrblocks_spark.operators.cluster import cluster

        t = BtrTable.load(spark, args.table)
        out = cluster(
            t,
            by=tuple(args.by.split(",")),
            job_id=args.job_id,
            curve=args.curve,
            only_new=args.only_new,
        )
    elif args.cmd == "merge":
        from btrblocks_spark.operators.merge import merge_into

        t = BtrTable.load(spark, args.table)
        out = merge_into(
            t,
            spark.read.parquet(args.source),
            on=(args.on.split(",") if "," in args.on else args.on),
            when_matched=args.when_matched,
            when_not_matched=args.when_not_matched,
            strategy=args.strategy,
        )
    elif args.cmd == "curate-init":
        from btrblocks_spark.functions.incremental import init_curation

        src_t = BtrTable.load(spark, args.src)
        bench = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        dst = init_curation(
            src_t, args.out, benchmark=bench, lang=args.lang,
            min_quality=args.min_quality, max_rep=args.max_rep,
            rep_n=args.rep_n, decontam_n=args.decontam_n,
        )
        out = {
            "created": args.out,
            "docs": sum(r["row_count"] for r in dst.data_files()),
        }
    elif args.cmd == "thumbs":
        from btrblocks_spark.operators.derive import (
            materialize_thumbnails,
            refresh_thumbnails,
        )

        src_t = BtrTable.load(spark, args.src)
        if args.create:
            dst = materialize_thumbnails(
                src_t, args.dst, out_w=args.width, out_h=args.height,
                fmt=args.fmt,
            )
            out = {
                "created": args.dst,
                "rows": sum(r["row_count"] for r in dst.data_files()),
            }
        else:
            out = refresh_thumbnails(
                src_t, BtrTable.load(spark, args.dst)
            )
    elif args.cmd == "bucket-join":
        from btrblocks_spark.operators.bucketjoin import bucket_join

        keys = [k.strip() for k in args.on.split(",")]
        if len(keys) > 2:
            p.error(
                "--on takes one key name, or left_key,right_key — "
                "composite bucket-join keys are not supported"
            )
        on = keys[0] if len(keys) == 1 else (keys[0], keys[1])
        df = bucket_join(
            BtrTable.load(spark, args.left),
            BtrTable.load(spark, args.right),
            on=on,
            how=args.how,
            columns=(
                [c.strip() for c in args.columns.split(",") if c.strip()]
                or None
            ),
            columns_b=(
                [
                    c.strip()
                    for c in args.columns_b.split(",")
                    if c.strip()
                ]
                or None
            ),
        )
        df.write.mode("overwrite").parquet(args.output)
        out = {
            "output": args.output,
            "rows": spark.read.parquet(args.output).count(),
        }
    elif args.cmd in ("rollup-create", "rollup-refresh"):
        from btrblocks_spark.operators.rollup import (
            create_rollup,
            refresh_rollup,
        )

        aggs = {}
        for part in args.aggs.split(","):
            name, spec = part.split("=", 1)
            fn, _, col = spec.partition(":")
            aggs[name.strip()] = (
                fn.strip() if not col else (fn.strip(), col.strip())
            )
        keys = [k.strip() for k in args.keys.split(",")]
        src_t = BtrTable.load(spark, args.src)
        if args.cmd == "rollup-create":
            dst = create_rollup(src_t, args.out, keys, aggs)
            out = {
                "created": args.out,
                "groups": sum(
                    r["row_count"] for r in dst.data_files()
                ),
            }
        else:
            out = refresh_rollup(
                src_t, BtrTable.load(spark, args.out), keys, aggs
            )
    elif args.cmd == "curate-refresh":
        from btrblocks_spark.functions.incremental import refresh_curation

        src_t = BtrTable.load(spark, args.src)
        bench = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        out = refresh_curation(
            src_t, BtrTable.load(spark, args.out), benchmark=bench,
        )
    elif args.cmd == "evolve-spec":
        t = BtrTable.load(spark, args.table)
        raw = [
            c
            for c in _re.split(r",(?![^(]*\))", args.partition_by or "")
            if c
        ]
        out = t.evolve_partition_spec(raw or None)
    elif args.cmd == "curate":
        from btrblocks_spark.functions.pipeline import curate_corpus

        docs = spark.read.parquet(args.input)
        bench = (
            spark.read.parquet(args.benchmark) if args.benchmark else None
        )
        curated = curate_corpus(
            docs,
            benchmark=bench,
            lang=args.lang,
            min_quality=args.min_quality,
            max_rep=args.max_rep,
            rep_n=args.rep_n,
            decontam_n=args.decontam_n,
        )
        curated.write.mode("overwrite").parquet(args.out)
        n_in = docs.count()
        n_out = spark.read.parquet(args.out).count()
        out = {
            "docs_in": n_in,
            "docs_out": n_out,
            "dropped": n_in - n_out,
            "out": args.out,
        }
        if args.report:
            from pyspark.sql import functions as F

            from btrblocks_spark.functions.text import corpus_report

            # the pipeline output keeps (id, text, ...); re-attach the
            # lang/source grouping axes from the input for the report
            axes = [c for c in ("lang", "source") if c in docs.columns]
            rep_src = spark.read.parquet(args.out)
            if axes:
                rep_src = rep_src.join(
                    docs.select("doc_id", *axes), "doc_id", "left"
                )
            for c in ("lang", "source"):
                if c not in rep_src.columns:
                    rep_src = rep_src.withColumn(c, F.lit("unknown"))
            out["report"] = [
                r.asDict() for r in corpus_report(rep_src).collect()
            ]
    elif args.cmd == "changes":
        t = BtrTable.load(spark, args.table)
        df = t.scan_changes(args.from_snapshot, args.to_snapshot)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
            out = {"output": args.output, "rows": spark.read.parquet(args.output).count()}
        else:
            rows = df.limit(50).collect()
            out = {"rows": df.count(), "preview": [r.asDict() for r in rows[:5]]}
    elif args.cmd == "lookup":
        t = BtrTable.load(spark, args.table)
        value = int(args.value) if args.as_int else args.value
        rows = t.lookup(args.column, value).collect()
        out = {"rows": len(rows), "result": [r.asDict() for r in rows[:20]]}
    elif args.cmd == "expire":
        t = BtrTable.load(spark, args.table)
        out = t.expire_snapshots(
            keep_last=args.keep_last, older_than=args.older_than
        )
    elif args.cmd == "verify":
        from btrblocks_spark.operators.verify import (
            verify_images,
            verify_snapshots_equal,
        )

        t = BtrTable.load(spark, args.table)
        out = verify_snapshots_equal(t, args.before)
        if args.images:
            out["images"] = verify_images(t)
    elif args.cmd == "rollback":
        t = BtrTable.load(spark, args.table)
        out = t.rollback(args.snapshot)
    elif args.cmd == "rewrite-deletes":
        from btrblocks_spark.operators.merge import rewrite_position_deletes

        t = BtrTable.load(spark, args.table)
        out = rewrite_position_deletes(t, min_files=args.min_files)
    elif args.cmd == "rewrite-manifests":
        t = BtrTable.load(spark, args.table)
        out = t.rewrite_manifests()
    elif args.cmd == "maintain":
        from btrblocks_spark.operators.maintain import maintain

        t = BtrTable.load(spark, args.table)
        out = maintain(
            t,
            apply=not args.plan_only,
            keep_snapshots=args.keep_snapshots,
            min_small_files=args.min_small_files,
            orphans=args.orphans,
        )
    elif args.cmd == "rollup":
        from btrblocks_spark.operators.rollup import (
            create_rollup,
            refresh_rollup,
        )

        keys = [c for c in args.keys.split(",") if c]
        aggs: dict = {"n_rows": "count"}
        for spec in args.sum:
            name, _, col = spec.partition("=")
            if not col:
                p.error(f"--sum expects OUT=COL, got {spec!r}")
            aggs[name] = ("sum", col)
        src = BtrTable.load(spark, args.src)
        if args.create:
            dst = create_rollup(src, args.dst, keys, aggs)
            out = {
                "created": args.dst,
                "groups": sum(r["row_count"] for r in dst.data_files()),
            }
        else:
            dst = BtrTable.load(spark, args.dst)
            out = refresh_rollup(src, dst, keys, aggs)
    elif args.cmd == "vacuum":
        t = BtrTable.load(spark, args.table)
        out = t.remove_orphan_files(
            dry_run=args.dry_run, older_than_seconds=args.older_than
        )
    elif args.cmd == "add-column":
        t = BtrTable.load(spark, args.table)
        out = t.add_column(args.name, args.type)
    elif args.cmd == "rename-column":
        t = BtrTable.load(spark, args.table)
        out = t.rename_column(args.old, args.new)
    elif args.cmd == "drop-column":
        t = BtrTable.load(spark, args.table)
        out = t.drop_column(args.name)
    elif args.cmd == "widen-column":
        t = BtrTable.load(spark, args.table)
        out = t.widen_column(args.name, args.type)
    elif args.cmd == "history":
        t = BtrTable.load(spark, args.table)
        out = [r.asDict() for r in t.history_df().collect()]
    elif args.cmd == "net-changes":
        t = BtrTable.load(spark, args.table)
        df = t.net_changes(
            args.from_sid, args.to_sid,
            keys=[k.strip() for k in args.keys.split(",")],
        )
        df.write.mode("overwrite").parquet(args.out)
        out = {
            "out": args.out,
            "rows": spark.read.parquet(args.out).count(),
        }
    elif args.cmd == "stats":
        t = BtrTable.load(spark, args.table)
        specs = []
        for a in args.agg:
            parts = a.split(":")
            if parts[0] == "approx_quantile":
                # approx_quantile:<q>:col[:alias]
                if len(parts) < 3:
                    p.error(f"--agg {a!r}: need approx_quantile:<q>:col")
                fn, col = f"{parts[0]}:{parts[1]}", parts[2]
                alias = (
                    parts[3]
                    if len(parts) > 3
                    else f"q{parts[1]}_{col}".replace(".", "_")
                )
            else:
                fn, col = parts[0], parts[1]
                alias = parts[2] if len(parts) > 2 else (
                    f"{fn}_{col}".replace("*", "all")
                )
            specs.append((fn, col, alias))
        part = None
        if args.partition:
            part = {}
            for kv in args.partition:
                k, _, v = kv.partition("=")
                part[k] = int(v) if v.lstrip("-").isdigit() else v
        out = t.stats_agg(specs, partition=part).collect()[0].asDict()
    elif args.cmd == "export":
        t = BtrTable.load(spark, args.table)
        cols = [c for c in args.columns.split(",") if c] or None
        df = t.scan(
            columns=cols,
            snapshot_id=args.snapshot,
            native_io=True if args.native_io else None,
        )
        df.write.mode("overwrite").parquet(args.output)
        out = {
            "output": args.output,
            "rows": spark.read.parquet(args.output).count(),
        }
    else:  # describe
        t = BtrTable.load(spark, args.table)
        rows = t.data_files()
        out = {
            "snapshot": t.current_snapshot_id(),
            "snapshots": len(t.snapshots()),
            "files": len(rows),
            "rows": sum(r["row_count"] for r in rows),
            "bytes": sum(r["file_bytes"] for r in rows),
            "partitions": sorted({r["partition"] for r in rows}),
        }
    print(json.dumps(out, default=str))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
