"""Full-registry oracle sweep at sf0.01 — local mirror of the driver gate.

Run: python tests/sweep_sf001.py [sf_dir]
Prints one line per query; exits nonzero if any oracle-checked query fails.
"""

from __future__ import annotations

import sys
import time
import traceback

from pyspark.sql import SparkSession

import sqawk_spark.operators as operators
from sqawk_spark.operators.registry import REGISTRY

operators.load_all()

from tests.oracle_check import compare


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("sweep")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    failures = []
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        t0 = time.time()
        try:
            if spec.oracle is None:
                df = spec.builder(spark, sf_dir)
                n = df.count()
                status = f"rows_only({n})"
            else:
                compare(spark, sf_dir, spec.builder, spec.oracle)
                status = "pass"
        except Exception as exc:  # noqa: BLE001
            status = f"FAIL: {exc}"
            failures.append(name)
            traceback.print_exc()
        print(f"{name:40s} {time.time() - t0:6.1f}s  {status}", flush=True)
    print(f"\n{len(REGISTRY) - len(failures)}/{len(REGISTRY)} ok; failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
