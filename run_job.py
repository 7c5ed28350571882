#!/usr/bin/env python
"""spark-submit entrypoint (north_rule: "ships via spark-submit --py-files").

Usage:
  zip -qr d1pkg.zip d1_log_aggregation_spark -x '*__pycache__*'
  spark-submit --master <...> --py-files d1pkg.zip run_job.py <sf_dir> <out_dir>
"""

import sys

from d1_log_aggregation_spark.job import main

if __name__ == "__main__":
    main(sys.argv)
