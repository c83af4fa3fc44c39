"""Codec configuration (BtrBlocksConfig analog): scheme sets + cascade depth."""

import numpy as np
import pyarrow as pa

from btrblocks_spark.codec import block, config, numeric, strings
from btrblocks_spark.codec.picker import pick_numeric


def test_disable_scheme_changes_pick():
    v = np.repeat(np.arange(10, dtype=np.int64), 1000)  # RLE territory
    assert pick_numeric(v, 3, 42) == numeric.RLE
    with config.scoped(
        integer_schemes=config._ALL_INT - {numeric.RLE}
    ):
        assert pick_numeric(v, 3, 42) != numeric.RLE
    assert pick_numeric(v, 3, 42) == numeric.RLE  # restored


def test_disable_one_value():
    v = np.full(5000, 7, np.int64)
    assert pick_numeric(v, 3, 42) == numeric.ONE_VALUE
    with config.scoped(
        integer_schemes=config._ALL_INT - {numeric.ONE_VALUE}
    ):
        picked = pick_numeric(v, 3, 42)
        assert picked != numeric.ONE_VALUE
        blob = numeric.encode(v, 3, 42)
        out, _ = numeric.decode(memoryview(blob), 0, "i")
        assert (out == v).all()


def test_string_scheme_set():
    vals = [f"caption number {i % 40} with words" for i in range(3000)]
    arr = pa.array(vals, pa.large_binary())
    offs, pool = strings.from_arrow(arr)
    with config.scoped(string_schemes={strings.UNCOMPRESSED}):
        assert strings.pick_string(offs, pool, 3, 42) == strings.UNCOMPRESSED


def test_cascade_depth_config():
    from btrblocks_spark.sources.blockfile import encode_table

    t = pa.table({"a": pa.array(np.repeat(np.arange(50, dtype=np.int64), 200))})
    with config.scoped(max_cascade_depth=0):
        bt, _ = encode_table(t)
        blob = bt.column("b_a")[0].as_py()
        tree = block.block_scheme_tree(blob)
        assert tree["scheme"] == "UNCOMPRESSED"
    bt, _ = encode_table(t)
    tree = block.block_scheme_tree(bt.column("b_a")[0].as_py())
    assert tree["scheme"] != "UNCOMPRESSED"


def test_configure_api():
    def setup(cfg):
        cfg.disable("double", numeric.DOUBLE_BP)

    cfg = config.configure(setup)
    try:
        assert numeric.DOUBLE_BP not in cfg.double_schemes
    finally:
        config.reset()
    assert numeric.DOUBLE_BP in config.get_config().double_schemes
