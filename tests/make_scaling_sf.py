"""Generate a scaled-up COPY of a testdata directory for the core-count
scaling study (VERDICT r11 #7: at sf0.1 the whole suite is
stage-overhead-bound and an 8-core vs 32-core comparison diagnoses
nothing; the readonly driver testdata stops at sf0.1).

  python tests/make_scaling_sf.py [src_dir] [dst_dir] [factor]

Defaults: /root/testdata/sf0.1 -> /root/scaling_sf1, factor 10.

Each table becomes `factor` copies of the source rows with all id-like
key columns shifted by copy*ceil(max_key+1) so keys stay unique and
joins keep their selectivity; document/embedding payloads get a
per-copy marker token appended so the corpus does not degenerate into
exact clones (near-dup structure within each copy is preserved; dedup
operators see factor× the families, not factor×-sized families).
This is a MEASUREMENT dataset only — it is written outside
/root/testdata (which is read-only, "do NOT regenerate") and never
feeds the oracle.
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from sqawk_spark.session import get_session  # noqa: E402

# id-like columns to shift per table (everything else copies verbatim)
SHIFT = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "customer": [],
    "supplier": [],
    "part": [],
    "nation": [],
    "region": [],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# small dimensions replicate once (copy 0 only): the star schema's
# dimension cardinality is not what the scaling study measures, and
# shifting their keys would break foreign keys in the fact copies
DIM_ONCE = {"customer", "supplier", "part", "nation", "region"}
MARK_TEXT = {"documents": "text"}


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/scaling_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    spark = get_session(app_name="make_scaling_sf")
    for name, keys in SHIFT.items():
        path = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        n_copies = 1 if name in DIM_ONCE else factor
        offsets = {
            k: int(df.agg(F.max(k)).first()[0]) + 1 for k in keys
        }
        parts = []
        for c in range(n_copies):
            cp = df
            for k in keys:
                cp = cp.withColumn(k, F.col(k) + F.lit(c * offsets[k]))
            if name in MARK_TEXT and c > 0:
                col = MARK_TEXT[name]
                cp = cp.withColumn(
                    col, F.concat(F.col(col), F.lit(f" copymark{c}"))
                )
            if name == "embeddings" and c > 0:
                # nudge one dimension so copies are near- but not
                # exact-duplicates in embedding space
                cp = cp.withColumn(
                    "embedding",
                    F.expr(
                        f"transform(embedding, (x, i) -> CASE WHEN i = 0"
                        f" THEN x + {c} * 1e-4 ELSE x END)"
                    ),
                )
            parts.append(cp)
        out = parts[0]
        for cp in parts[1:]:
            out = out.unionAll(cp)
        dest = os.path.join(dst, f"{name}.parquet")
        out.repartition(8).write.mode("overwrite").parquet(dest)
        print(f"{name}: {n_copies} copies -> {dest}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
