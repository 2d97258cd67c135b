"""Capture .explain("formatted") for headline queries into plans/r11/.

Run: python tests/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" (file name suffix)
  names:  registry entries; default = every bench.py HEADLINE query.

Writes plans/r11/<query>_<suffix>.txt. Explain only — no job execution
beyond what a builder itself performs while constructing its plan.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import sqawk_spark.operators as operators  # noqa: E402

operators.load_all()

from sqawk_spark.operators.registry import REGISTRY  # noqa: E402
from sqawk_spark.session import get_session  # noqa: E402


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture_plans")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name}: not in registry", file=sys.stderr)
            continue
        try:
            if os.environ.get("CAPTURE_WARM") == "1":
                # execute once so session-resident family caches
                # materialize — the re-built plan then shows the
                # partitioning/ordering consumers actually see at
                # runtime instead of conservative pre-materialization
                # exchanges
                spec.builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
            df = spec.builder(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {exc}\n"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        n_exch = text.count("Exchange")
        joins = [
            j
            for j in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
            )
            if j in text
        ]
        print(f"{name}: exchanges~{n_exch} joins={joins}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
