"""CSV import/export with declared YAML schema (btrfiles analog)."""

import numpy as np

from btrblocks_spark.codec import numeric

SCHEMA_YAML = """
columns:
  - {name: id, type: integer}
  - {name: price, type: double}
  - {name: note, type: string}
  - {name: junk, type: skip}
"""


def test_csv_roundtrip_with_nulls(spark, tmp_path):
    from btrblocks_spark.sources.csv_io import read_csv, write_csv

    src = tmp_path / "in.csv"
    src.write_text("1|1.5|hello|x\n2|null|null|y\nnull|3.25|world|z\n")
    df = read_csv(spark, str(src), SCHEMA_YAML)
    rows = {tuple(r) for r in df.collect()}
    assert (1, 1.5, "hello") in rows
    assert (2, None, None) in rows
    assert (None, 3.25, "world") in rows
    assert df.columns == ["id", "price", "note"]  # junk skipped

    out = tmp_path / "out"
    write_csv(df, str(out))
    back = read_csv(
        spark,
        str(out),
        """
columns:
  - {name: id, type: integer}
  - {name: price, type: double}
  - {name: note, type: string}
""",
    )
    assert {tuple(r) for r in back.collect()} == rows


def test_double_bp_roundtrip():
    rng = np.random.default_rng(3)
    # narrow-range doubles: high u32 words nearly constant
    v = 1000.0 + rng.uniform(0, 1, 4096)
    blob = numeric.encode(v, 3, 42, force_scheme=numeric.DOUBLE_BP)
    out, consumed = numeric.decode(memoryview(blob), 0, "f")
    assert consumed == len(blob)
    np.testing.assert_array_equal(out, v)


def test_double_bp_special_values():
    v = np.array([np.nan, np.inf, -np.inf, 0.0, -0.0, 1e-300], np.float64)
    blob = numeric.encode(v, 3, 42, force_scheme=numeric.DOUBLE_BP)
    out, _ = numeric.decode(memoryview(blob), 0, "f")
    np.testing.assert_array_equal(out, v)
