#!/usr/bin/env python3
"""spark-submit primary application file for frankensearch_spark.

spark-submit takes a script path (it has no ``-m`` module mode), and the
package's own ``cli.py`` can't be the primary file because its relative
imports need the package context.  This shim is the deployment entry:

    cd /root/repo && zip -qr fs.zip frankensearch_spark -i '*.py'
    spark-submit --master <cluster> --py-files fs.zip scripts/fs_submit.py \
        build --input <transcripts.parquet> --index <index-dir>
    spark-submit --master <cluster> --py-files fs.zip scripts/fs_submit.py \
        search --index <index-dir> --query "error AND handling"

``--py-files`` ships the zip to the driver and every executor and puts it
on ``sys.path``; ``frankensearch_spark.session.get_spark`` detects the
spark-submit gateway and leaves ``--master`` / ``--conf`` in control.
Exercised end-to-end by ``tests/test_spark_submit.py``.
"""
import sys

from frankensearch_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
