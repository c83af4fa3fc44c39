"""SQL-checkable DataFrame formulations of the engine's analysis operators.

Each function here is the *declarative* (Catalyst-optimizable) expression
of a mechanism the codec kernels perform imperatively per block — run
detection (RLE), dictionary building (DICT), frame-of-reference bias
(FOR), top-value/exceptions (FREQUENCY), delta/sortedness (PFOR_DELTA
gate), one-value guards, and per-block stats (NumberStats). They run over
the driver's TPC-H-ish parquet and each has a DuckDB oracle twin in
``__spark_entry__.py`` (SURVEY.md §5.4).
"""
