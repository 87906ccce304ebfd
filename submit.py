#!/usr/bin/env python
"""spark-submit driver script. The package travels via --py-files:

  Z=$(python -m indexer_spark.packaging)
  spark-submit --master local[8] --py-files "$Z" submit.py <cmd> ...
"""
import sys

from indexer_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
