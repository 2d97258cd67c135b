"""Run one registry entry through the oracle compare (dev helper).

Usage: python tests/run_one.py NAME [NAME...] [--sf SF_DIR]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession

import sqawk_spark.operators as operators
from sqawk_spark.operators.registry import REGISTRY

operators.load_all()

from tests.oracle_check import compare


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("run_one")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for name in args:
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                df = spec.builder(spark, sf_dir)
                n = df.count()
                print(f"{name:40s} {time.time()-t0:5.1f}s  rows-only n={n}")
            else:
                compare(spark, sf_dir, spec.builder, spec.oracle)
                print(f"{name:40s} {time.time()-t0:5.1f}s  pass")
        except Exception as e:
            rc = 1
            print(f"{name:40s} {time.time()-t0:5.1f}s  FAIL: {e}")
    spark.stop()
    return rc


if __name__ == "__main__":
    sys.exit(main())
