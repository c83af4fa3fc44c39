"""Round-1 extensions: rewrite_manifests, image resize, IVF ANN,
stream-to-table ingest."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.sources.table import BtrTable

SF = "/root/testdata/sf0.001"


def test_rewrite_manifests(spark, tmp_path):
    t = BtrTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(image_caption_table(300, seed=2)),
        partition_by=["fmt"],
        num_files=3,
        job_id="rm0",
    )
    n = t.scan().count()
    res = t.rewrite_manifests()
    assert res["dropped"] == 0
    assert t.scan().count() == n
    # manifest rows now sorted by (partition, min)
    rows = t.data_files()
    parts = [r["partition"] for r in rows]
    assert parts == sorted(parts)


def test_resize_kernel(spark):
    from btrblocks_spark.functions.images import (
        decode_image,
        resize_batches,
    )

    df = spark.createDataFrame(image_caption_table(30, seed=4))
    out = df.select("image_id", "bytes", "fmt").mapInArrow(
        lambda it: resize_batches(it, 32, 32),
        "image_id string, thumb binary, thumb_w int, thumb_h int",
    )
    rows = out.collect()
    assert len(rows) == 30
    px = decode_image(rows[0].thumb)
    assert px.shape == (32, 32, 3)


def test_resize_nearest_exact():
    from btrblocks_spark.functions.images import resize_nearest

    px = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(px, 3, 2)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0, 0], px[0, 0])


def test_knn_ivf_contains_self(spark):
    from btrblocks_spark.functions.similarity import knn_ivf

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    q = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    out = knn_ivf(emb, q, dim=dim, k=3, n_centroids=8, n_probe=2)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        best = [r for r in rs if r.rank == 1][0]
        assert best.vec_id == qid and best.cosine == 1.0


def test_stream_into_table(spark, tmp_path):
    from btrblocks_spark.streaming.ingest import (
        read_events_stream,
        stream_into_table,
    )

    src = str(tmp_path / "ev_in")
    import shutil

    import os

    os.makedirs(src)
    shutil.copy(f"{SF}/events.parquet", f"{src}/events.parquet")
    events = spark.read.parquet(f"{SF}/events.parquet")
    root = str(tmp_path / "evtable")
    BtrTable.create(spark, root, events.limit(0), num_files=1, job_id="seed")

    q = stream_into_table(
        read_events_stream(spark, src), root, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    t = BtrTable.load(spark, root)
    assert t.scan().count() == events.count()
    ops = [s["operation"] for s in t.snapshots()]
    assert "stream-append" in ops


def test_rollback_and_orphans(spark, tmp_path):
    from btrblocks_spark.fixtures import image_caption_table
    from btrblocks_spark.operators.compact import compact
    from btrblocks_spark.sources import fs
    from btrblocks_spark.sources.table import BtrTable

    root = str(tmp_path / "rb")
    df = spark.createDataFrame(image_caption_table(200, seed=13))
    t = BtrTable.create(spark, root, df, num_files=3,
                        max_rows_per_file=60, job_id="rb0")
    sid_before = t.current_snapshot_id()
    compact(t, target_file_bytes=64 * 1024 * 1024, job_id="rbc")
    assert t.current_snapshot_id() != sid_before

    # rollback: pre-compaction file layout restored, history preserved
    res = t.rollback(sid_before)
    assert res["rolled_back_to"] == sid_before
    assert t.scan().count() == 200
    assert df.exceptAll(t.scan()).count() == 0
    assert len(t.snapshots()) >= 3  # rollback added one

    # drop snapshots that reference the compacted files, then the
    # compacted files are orphans (expire already deletes unreferenced
    # data, so plant an extra fake orphan too)
    orphan = fs.join(root, "data", "zzz-orphan.parquet")
    fs.write_bytes_atomic(orphan, b"junk")
    # default 3-day age threshold protects the freshly planted file
    safe = t.remove_orphan_files()
    assert fs.exists(orphan) and safe["removed"] == 0 and safe["kept"] >= 1
    # a file owned by a job with live _checkpoints markers is protected
    # even past the age threshold
    fs.mkdirs(fs.join(root, "_checkpoints", "livejob"))
    fs.write_bytes_atomic(
        fs.join(root, "_checkpoints", "livejob", "t0.json"), b"{}"
    )
    live = fs.join(root, "data", "livejob-bin00000.parquet")
    fs.write_bytes_atomic(live, b"junk")
    res = t.remove_orphan_files(older_than_seconds=0.0)
    assert fs.exists(live)
    assert not fs.exists(orphan)
    assert t.scan().count() == 200  # referenced data untouched
    dry = t.remove_orphan_files(dry_run=True, older_than_seconds=0.0)
    assert not any(p.endswith("livejob-bin00000.parquet")
                   for p in dry["paths"])
    fs.delete_file(live)


def test_remove_orphans_sweeps_crashed_rebase_manifests(spark, tmp_path):
    """A crash in _commit's optimistic phase (manifest processing runs
    OUTSIDE the lock) leaves manifest-<token>-r*/-a.parquet files that
    no snapshot references; remove_orphan_files must sweep manifests/
    with the same age guard it applies to data/ (ADVICE r5)."""
    import shutil
    import time as _time

    from btrblocks_spark.sources import fs

    root = str(tmp_path / "om")
    df = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = BtrTable.create(spark, root, df, job_id="om0")
    mdir = fs.join(root, "manifests")
    src = fs.join(mdir, fs.list_files(mdir)[0])
    crashed = [
        fs.join(mdir, "manifest-deadbeef-r0.parquet"),
        fs.join(mdir, "manifest-deadbeef-a.parquet"),
    ]
    for p in crashed:
        shutil.copy(src, p)
    # age guard: fresh leftovers survive (a racing writer may still
    # publish them)
    kept = t.remove_orphan_files()
    assert all(fs.exists(p) for p in crashed) and kept["removed"] == 0
    old = _time.time() - 10 * 24 * 3600
    import os as _os

    for p in crashed:
        _os.utime(p, (old, old))
    res = t.remove_orphan_files()
    assert res["removed"] == 2
    assert not any(fs.exists(p) for p in crashed)
    # referenced manifests untouched, table still reads
    assert t.scan().count() == 50


def test_resize_area_antialiased():
    """Area-average resize: block means exact on integer factors, flat
    stays flat, and a checkerboard averages to mid-gray instead of the
    aliased extremes nearest-neighbor picks."""
    from btrblocks_spark.functions.images import (
        resize_area,
        resize_nearest,
    )

    rng = np.random.default_rng(9)
    base = rng.integers(0, 256, (8, 10, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(base, 4, 0), 4, 1)
    assert (resize_area(img, 10, 8) == base).all()
    cb = np.zeros((16, 16, 3), np.uint8)
    cb[::2, 1::2] = 255
    cb[1::2, ::2] = 255
    assert abs(resize_area(cb, 8, 8).mean() - 127.5) < 2.0
    assert resize_nearest(cb, 8, 8).mean() in (0.0, 255.0)
    # ragged factors + degenerate shapes stay well-formed
    assert resize_area(
        rng.integers(0, 256, (37, 53, 3), dtype=np.uint8), 7, 5
    ).shape == (5, 7, 3)
    assert resize_area(
        rng.integers(0, 256, (100, 3, 3), dtype=np.uint8), 2, 99
    ).shape == (99, 2, 3)


def test_resize_batches_area_filter(spark):
    import pyarrow as pa

    from btrblocks_spark.functions import images

    rng = np.random.default_rng(10)
    rows = []
    for i in range(3):
        px = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
        rows.append(
            {
                "image_id": f"i{i}",
                "bytes": images.encode_image(px, "png"),
                "fmt": "png",
            }
        )
    batch = pa.RecordBatch.from_pylist(rows)
    out = pa.Table.from_batches(
        list(images.resize_batches(iter([batch]), 16, 8))
    )
    assert out.num_rows == 3
    th = images.decode_image(out.column("thumb")[0].as_py())
    assert th.shape == (8, 16, 3)
