"""Split a query's per-run cost into builder / explain / execute time.

  SPARK_GRAFT_SF_DIR=... python tests/profile_query.py name [name ...]

For each name (after one untimed warm run, like bench.py):
  build   = registry builder call (driver-side plan construction)
  explain = .explain cost on the built frame (analysis + optimization,
            a proxy for the per-action Catalyst cost of the plan size)
  exec    = noop-sink execution of a freshly built frame
Each is best-of-2. Separates "the driver is compiling a huge tree"
from "the cluster is doing work" (guide §7.3).
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import sqawk_spark.operators as operators  # noqa: E402

operators.load_all()

from sqawk_spark.operators.registry import REGISTRY  # noqa: E402
from sqawk_spark.session import get_session  # noqa: E402


def main() -> int:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session(app_name="profile_query")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    def best2(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name} MISSING", flush=True)
            continue
        spark.sparkContext.setJobDescription(name)
        # warm: materialize family caches + codegen
        spec.builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        t_build = best2(lambda: spec.builder(spark, sf_dir))
        df = spec.builder(spark, sf_dir)

        def _explain():
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")

        t_explain = best2(_explain)

        def _exec():
            spec.builder(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()

        t_exec = best2(_exec)
        print(
            f"{name} build={t_build:.3f} explain={t_explain:.3f} "
            f"exec={t_exec:.3f}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
