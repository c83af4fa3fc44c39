"""Iceberg-style table layer over block-compressed parquet data files.

The reference's file/table format is a directory of ``column{i}_part{j}``
files plus one ``metadata`` file (``/root/reference/btrblocks/compression/
Datablock.cpp:27-52``). We re-model it Spark-first:

- A *data file* is a parquet file whose rows are **blocks**: one row per
  horizontal slice of <= 65536 tuples, with one ``b_<col>: binary`` cell per
  logical column holding the self-describing compressed blob
  (:mod:`btrblocks_spark.codec`). Parquet column pruning therefore skips
  undecoded columns at I/O level — the analog of the reference's
  per-column part files.
- A *manifest* is a parquet table listing data files with per-column
  min/max/null_count stats, partition value, lineage (job id, source
  files) and the creating snapshot — the analog of ``FileMetadata`` but
  queryable as a DataFrame (file pruning = a Catalyst filter on it).
- A *snapshot log* + ``metadata.json`` pointer provide atomic commits
  (temp-write + ``os.replace``) and time travel; data files are immutable,
  so old snapshots stay readable until expired.
"""

from btrblocks_spark.sources.table import BtrTable  # noqa: F401
