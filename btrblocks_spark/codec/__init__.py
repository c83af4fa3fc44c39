"""Cascading columnar compression kernels (numpy/Arrow, fully vectorized).

Re-expresses the scheme algebra of the reference
(``/root/reference/btrblocks/scheme/``) in numpy. The unit of work is a
*block*: one column slice of <= 65536 tuples. Each block is encoded into a
self-describing byte blob (scheme tree + null bitmap) analogous to the
reference's ``ColumnChunkMeta`` + payload
(``/root/reference/btrblocks/compression/Datablock.hpp:12-21``).

Scheme selection is greedy and sample-based, mirroring
``/root/reference/btrblocks/compression/SchemePicker.hpp:34-68`` with the
reference's tuned usability thresholds
(``/root/reference/btrblocks/scheme/SchemeConfig.hpp``).
"""

from btrblocks_spark.codec.block import (  # noqa: F401
    decode_block,
    encode_block,
    block_scheme_tree,
)
