"""spark-submit driver shim: ships with no logic of its own so the whole
engine rides in via ``--py-files`` (the north-rule packaging model).

Usage::

    python tools/make_pyfiles.py               # -> dist/btrblocks_spark.zip
    spark-submit --py-files dist/btrblocks_spark.zip tools/submit_job.py \
        compact --table s3://bucket/imgtable --target-file-bytes 67108864

Any ``btrblocks_spark.jobs`` subcommand works (create, append, compact,
cluster, merge, expire, verify, describe, export, meta).
"""

import sys

from btrblocks_spark.jobs import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
