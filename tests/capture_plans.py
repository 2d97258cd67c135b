"""Capture .explain("formatted") for headline queries into plans/rNN/.

Run: python tests/capture_plans.py <suffix> [name ...]
  suffix: "before" or "after" (file name suffix)
  names:  registry entries; default = every bench.py HEADLINE query.

Writes plans/r12/<query>_<suffix>.txt. Each file holds TWO sections
(VERDICT r11 housekeeping #9 — the r11 warm-only captures made
before/after exchange counts non-comparable for cache-consuming
entries):

  == COLD PLAN ==   the static plan before any execution this call —
                    what a fresh session would compile;
  == WARM PLAN ==   the plan re-built after one noop-sink execution,
                    showing the partitioning/ordering that consumers
                    of the session-resident family caches actually see
                    at runtime.

For entries with no session cache the two sections are identical
modulo attribute ids. Set CAPTURE_COLD_ONLY=1 to skip the execution
(and the warm section) entirely.

Repeated identical node-detail blocks (the InMemoryRelation bodies
that inflated r11's graph dumps to 14k lines) are collapsed to a
one-line marker after their first occurrence.
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

ROUND_DIR = "r12"


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return _collapse_repeats(buf.getvalue())


def _collapse_repeats(text: str) -> str:
    """Collapse identical multi-line node-detail blocks (separated by
    blank lines) after their first occurrence — the InMemoryRelation
    cached-plan body is printed once per referencing node and dominates
    dump size without adding information."""
    blocks = text.split("\n\n")
    seen: dict[str, int] = {}
    out: list[str] = []
    for i, b in enumerate(blocks):
        body = b.strip("\n")
        if len(body) > 400 and body in seen:
            first = seen[body]
            head = body.splitlines()[0]
            out.append(f"{head}\n   [... identical detail block as #{first}, collapsed ...]")
        else:
            if len(body) > 400:
                seen[body] = i
            out.append(b)
    return "\n\n".join(out)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    if not names:
        import bench

        names = bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", ROUND_DIR)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_session(app_name="capture_plans")
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name}: not in registry", file=sys.stderr)
            continue
        try:
            cold = _formatted_plan(spec.builder(spark, sf_dir))
            if os.environ.get("CAPTURE_COLD_ONLY") == "1":
                text = f"== COLD PLAN ==\n{cold}"
            else:
                # one execution so session-resident family caches
                # materialize; the re-built plan then shows what
                # runtime consumers of those caches actually see
                spec.builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                warm = _formatted_plan(spec.builder(spark, sf_dir))
                text = f"== COLD PLAN ==\n{cold}\n== WARM PLAN ==\n{warm}"
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
