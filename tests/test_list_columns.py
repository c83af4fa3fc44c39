"""List-of-number (embedding) columns through the block codec and BtrTable.

A training-data lakehouse must store embedding columns next to images and
captions; blocks encode list offsets through the integer codec and float32
values raw (T_LIST_* in codec/block.py).
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from btrblocks_spark.codec import block
from btrblocks_spark.sources.table import BtrTable


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([[1.0, 2.5], [3.0], [], [4.5, 5.5, 6.5]], pa.list_(pa.float32())),
        pa.array([[1.0, 2.5], None, [], [4.5]], pa.list_(pa.float32())),
        pa.array([[1.25, 2.5], [3.0]], pa.list_(pa.float64())),
        pa.array([[1, 2], [3], None], pa.list_(pa.int64())),
        pa.array([[1, 2], [3]], pa.list_(pa.int32())),
        pa.array([], pa.list_(pa.float32())),
        pa.array([None, None], pa.list_(pa.float32())),
    ],
    ids=["f32", "f32-null", "f64", "i64-null", "i32", "empty", "all-null"],
)
def test_list_block_roundtrip(arr):
    out = block.decode_block(block.encode_block(arr))
    assert out.cast(arr.type).to_pylist() == arr.to_pylist()


def test_list_block_offsets_compress():
    # fixed-width lists: offsets are a perfect arithmetic sequence, the
    # cascading int codec should crush them (DELTA/ONE_VALUE territory)
    arr = pa.array([[float(i), float(i + 1)] for i in range(5000)],
                   pa.list_(pa.float32()))
    blob = block.encode_block(arr)
    raw = 5000 * 2 * 4
    assert len(blob) < raw * 1.05  # offsets overhead ~amortized away


def test_embeddings_table_e2e(spark, tmp_path):
    src = "/root/testdata/sf0.001/embeddings.parquet"
    df = spark.read.parquet(src)
    root = str(tmp_path / "embtbl")
    table = BtrTable.create(spark, root, df, num_files=2, job_id="emb0")
    out = table.scan()
    assert out.count() == df.count()
    assert df.exceptAll(out).count() == 0
    assert out.exceptAll(df).count() == 0

    # compact keeps embedding contents intact
    from btrblocks_spark.operators.compact import compact

    compact(table, target_file_bytes=64 * 1024 * 1024, job_id="embc")
    out2 = table.scan(columns=["vec_id", "embedding"])
    assert out2.count() == df.count()
    assert (
        df.select("vec_id", "embedding").exceptAll(out2).count() == 0
    )
