"""Table-maintenance jobs (the north rule's operator set).

- :mod:`compact`  — bin-packing small-file compaction with block re-encode
  (the distributed analog of the reference's 16 MiB ColumnPart packing,
  ``/root/reference/btrblocks/storage/Chunk.cpp:233-290``).
- :mod:`cluster`  — Z-order / Hilbert clustering over (phash, w, h) with
  explicit salted-repartition skew handling on hot phash ranges.
- :mod:`merge`    — MERGE INTO (upsert/delete) rewriting only touched files.
- :mod:`bucketjoin` — storage-partitioned join: two tables sharing a
  partition transform over the join key (bucket/truncate/days) join
  partition-by-partition with zero data shuffle (SPJ contract).
- :mod:`rollup`   — incremental materialized aggregates from the CDC
  changelog (sum/count/min/max/approx_distinct KMV sketches).
- :mod:`maintain` — metadata-only auto-maintenance planner.
- :mod:`backfill` — backfill derived columns without full rewrites.
- :mod:`rowops`   — DELETE WHERE / UPDATE WHERE (MOR positional deletes
  or CoW rewrite; shares the delete-file writer with merge).
- :mod:`upsert`   — upsert_eq: Iceberg-v2 EQUALITY deletes + data
  sequence numbers; O(change) writes with zero reads, absorbed by
  compact().
- :mod:`verify`   — post-maintenance scan-equality + PSNR invariants.

Snapshot expiry and manifest rewrite live on :class:`BtrTable` itself.
"""
