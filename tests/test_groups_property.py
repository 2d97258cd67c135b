"""Randomized GROUPS-frame property test: the dialect rewrite must
match real SQLite across frame bounds, partitions, and WHERE filters
(frames evaluate on the post-WHERE rowset — the ADVICE r03 high
finding). Seeded, so failures reproduce."""

from __future__ import annotations

import random
import sqlite3

from sqawk_spark.dialect import rewrite_statement

FUNCS = ["sum(v)", "count(*)", "min(v)", "max(v)"]
FRAMES = [
    "between 1 preceding and current row",
    "between 2 preceding and 1 following",
    "between current row and 2 following",
    "between unbounded preceding and 1 following",
    "between 1 following and 2 following",
    "between 2 preceding and 1 preceding",
    "between unbounded preceding and unbounded following",
]
PARTS = ["", "partition by p "]
WHERES = ["", " where k <> 3", " where v > 0", " where p = 1 and k < 7"]


def test_groups_frame_randomized_vs_sqlite(spark):
    rng = random.Random(7)
    rows = [
        (rng.randint(0, 2), rng.randint(0, 8), rng.randint(-5, 50))
        for _ in range(60)
    ]
    con = sqlite3.connect(":memory:")
    con.execute("create table t (p int, k int, v int)")
    con.executemany("insert into t values (?,?,?)", rows)
    spark.createDataFrame(rows, "p int, k int, v int").createOrReplaceTempView(
        "t"
    )
    for _ in range(30):
        q = (
            f"select p, k, v, {rng.choice(FUNCS)} over "
            f"({rng.choice(PARTS)}order by k groups {rng.choice(FRAMES)}) "
            f"as s from t{rng.choice(WHERES)} order by p, k, v, s"
        )
        want = con.execute(q).fetchall()
        rewritten = rewrite_statement(q)
        assert rewritten != q, f"not rewritten: {q}"
        got = [tuple(r) for r in spark.sql(rewritten).collect()]
        assert got == want, f"{q}\nrewritten: {rewritten}"
