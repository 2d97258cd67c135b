"""Time a subset of registry queries exactly like bench.py (noop sink,
warm + best-of-2). Usage:

  SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tests/micro_bench.py q1 q2 ...

Prints one `name seconds` line per query.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import sqawk_spark.operators as operators  # noqa: E402

operators.load_all()

from sqawk_spark.operators.registry import REGISTRY  # noqa: E402
from sqawk_spark.session import get_session  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="micro_bench")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def run_once(spec) -> None:
        spec.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name} MISSING", flush=True)
            continue
        spark.sparkContext.setJobDescription(name)
        run_once(spec)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            run_once(spec)
            best = min(best, time.perf_counter() - t0)
        print(f"{name} {best:.3f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
