"""Model-based maintenance fuzz: a seeded random sequence of table ops
must always scan back exactly the model's row multiset.

The model is a plain dict {image_id: caption}; every op updates it and
the table, then the invariant `scan() == model` is checked. This is the
composition test the per-op suites can't give: compaction after merge
after cluster after schema changes, in random order.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from btrblocks_spark.fixtures import image_caption_table
from btrblocks_spark.operators.cluster import cluster
from btrblocks_spark.operators.compact import compact
from btrblocks_spark.operators.merge import merge_into
from btrblocks_spark.sources.table import BtrTable

N0 = 240
STEPS = 6


def _model_from(df):
    return {r.image_id: r.caption for r in df.select("image_id", "caption").collect()}


def _check(table, model):
    got = {
        r.image_id: r.caption
        for r in table.scan(columns=["image_id", "caption"]).collect()
    }
    assert got == model, (
        f"mismatch: {len(got)} rows vs model {len(model)}; "
        f"missing={list(set(model) - set(got))[:3]} "
        f"extra={list(set(got) - set(model))[:3]}"
    )


@pytest.mark.parametrize("seed", [101, 202])
def test_random_maintenance_sequence(spark, tmp_path_factory, seed):
    rng = np.random.default_rng(seed)
    root = str(tmp_path_factory.mktemp(f"fuzz{seed}"))
    base = image_caption_table(N0, seed=seed)
    df = spark.createDataFrame(base)
    table = BtrTable.create(
        spark, root, df, partition_by=["fmt"], num_files=4,
        max_rows_per_file=50, job_id=f"f{seed}",
    )
    model = _model_from(df)
    cols = table.schema_arrow().names
    next_id = 10_000_000

    for step in range(STEPS):
        op = rng.choice(["append", "compact", "cluster", "update", "delete"])
        if op == "append":
            extra = image_caption_table(40, seed=int(rng.integers(1e6)))
            extra = extra.set_column(
                0,
                "image_id",
                [[f"img{next_id + i:09d}" for i in range(40)]],
            )
            next_id += 40
            edf = spark.createDataFrame(extra)
            table.append(edf, job_id=f"a{seed}-{step}")
            model.update(_model_from(edf))
        elif op == "compact":
            compact(table, target_file_bytes=8 * 1024 * 1024,
                    job_id=f"c{seed}-{step}")
        elif op == "cluster":
            cluster(table, job_id=f"z{seed}-{step}", max_rows_per_file=120)
        elif op == "update":
            keys = sorted(model)
            chosen = list(rng.choice(keys, size=min(25, len(keys)),
                                     replace=False))
            src = (
                table.scan()
                .filter(F.col("image_id").isin(chosen))
                .withColumn("caption",
                            F.concat(F.col("caption"), F.lit(f" v{step}")))
                .select(*cols)
            )
            src_rows = _model_from(src)
            merge_into(table, src, on="image_id",
                       job_id=f"u{seed}-{step}")
            model.update(src_rows)
        else:  # delete
            keys = sorted(model)
            chosen = list(rng.choice(keys, size=min(15, len(keys)),
                                     replace=False))
            src = table.scan().filter(
                F.col("image_id").isin(chosen)
            ).select(*cols)
            merge_into(table, src, on="image_id", when_matched="delete",
                       when_not_matched="ignore",
                       job_id=f"d{seed}-{step}")
            for k in chosen:
                model.pop(k, None)
        _check(table, model)

    # end state: expire history, re-check
    table.expire_snapshots(keep_last=1)
    _check(table, model)
