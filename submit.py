#!/usr/bin/env python3
"""spark-submit entry script (the north-rule deployment shape).

    zip -r splade_spark.zip splade_spark
    spark-submit --master <cluster> --py-files splade_spark.zip \
        submit.py build --transcripts ... --index ... --shards 4096

Thin wrapper over splade_spark.cli.main so the package can be shipped
purely via --py-files (executors import it from the zip); the driver-side
session is created by cli.main through session.get_spark, which respects
the spark-submit-provided master/conf.
"""

from __future__ import annotations

import sys

from splade_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
