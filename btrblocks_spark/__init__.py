"""btrblocks_spark — a PySpark-native lakehouse table-maintenance engine.

A from-scratch rebuild of the capabilities of PaulLampe/btrblocks
(BtrBlocks, SIGMOD 2023) as an idiomatic PySpark engine:

- ``codec``      — BtrBlocks-style cascading columnar compression kernels
                   (numpy/Arrow vectorized, no per-row Python). Mirrors the
                   scheme algebra of ``/root/reference/btrblocks/scheme/``.
- ``sources``    — Iceberg-style table layer: manifest DataFrame, snapshot
                   log, atomic manifest-swap commits, checkpoint-resumable
                   jobs, per-partition lineage.
- ``operators``  — table maintenance jobs: bin-packing compaction, Z-order /
                   Hilbert clustering, MERGE INTO, snapshot expiry, manifest
                   rewrite.
- ``functions``  — training-data pipeline functions: dedup (exact, MinHash
                   LSH, SimHash, n-gram Jaccard), similarity search, text
                   analysis, multimodal (image) column handling.
- ``plans``      — SQL-checkable DataFrame formulations of the codec's
                   analysis operators (run-length stats, dictionary build,
                   frame-of-reference, frequency/mode, delta, block stats).
- ``streaming``  — Structured Streaming ingest with watermarked windows.

Everything above the Arrow batch boundary is declarative DataFrame code that
Catalyst optimizes; everything below it is vectorized numpy inside
``mapInArrow`` / ``applyInPandas`` kernels.
"""

__version__ = "0.1.0"

BLOCK_SIZE = 65536  # tuples per block (reference: btrblocks/btrblocks.hpp:24)
PART_SIZE_BYTES = 16 * 1024 * 1024  # max part file (storage/Chunk.cpp:12)
MAX_CASCADE_DEPTH = 3  # btrblocks/btrblocks.hpp:31,37,43
SAMPLE_COUNT = 10  # btrblocks/btrblocks.hpp:25
SAMPLE_RUN_LENGTH = 64  # btrblocks/btrblocks.hpp:26
