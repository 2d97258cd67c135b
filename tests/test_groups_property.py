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


# total(v) tested separately: it only resolves where the EXCLUDE
# rewrite replaces it with sum-based expressions (a bare
# ``total(...) over`` window was never supported — Python UDAFs can't
# run in window context)
EX_FUNCS = ["sum(v)", "count(*)", "count(v)", "avg(v)"]
EX_KINDS = ["exclude current row", "exclude group", "exclude ties",
            "exclude no others"]


def test_groups_exclude_randomized_vs_sqlite(spark):
    """EXCLUDE emulation (sum-subtraction over the peer-group window)
    vs real SQLite, including NULL values in the aggregate argument,
    frames that don't contain the current group (EXCLUDE = no-op), and
    all four EXCLUDE forms."""
    rng = random.Random(11)
    rows = [
        (
            rng.randint(0, 2),
            rng.randint(0, 8),
            None if rng.random() < 0.2 else rng.randint(-5, 50),
        )
        for _ in range(60)
    ]
    con = sqlite3.connect(":memory:")
    con.execute("create table tx (p int, k int, v int)")
    con.executemany("insert into tx values (?,?,?)", rows)
    spark.createDataFrame(rows, "p int, k int, v int").createOrReplaceTempView(
        "tx"
    )
    for _ in range(40):
        fn = rng.choice(EX_FUNCS)
        q = (
            f"select p, k, v, {fn} over "
            f"({rng.choice(PARTS)}order by k groups {rng.choice(FRAMES)} "
            f"{rng.choice(EX_KINDS)}) "
            f"as s from tx{rng.choice(WHERES)} order by p, k, v, s"
        )
        want = con.execute(q).fetchall()
        rewritten = rewrite_statement(q)
        assert rewritten != q, f"not rewritten: {q}"
        got = [tuple(r) for r in spark.sql(rewritten).collect()]
        # float compare for avg/total
        norm = lambda rs: [  # noqa: E731
            tuple(
                round(x, 9) if isinstance(x, float) else x for x in r
            )
            for r in rs
        ]
        assert norm(got) == norm(want), f"{q}\nrewritten: {rewritten}"


def test_groups_exclude_total_vs_sqlite(spark):
    """total(v) with an in-frame EXCLUDE lowers fully onto sum() —
    SQLite parity incl. NULLs (total of an empty remainder is 0.0)."""
    rng = random.Random(13)
    rows = [
        (rng.randint(0, 6), None if rng.random() < 0.3 else rng.randint(-5, 9))
        for _ in range(30)
    ]
    con = sqlite3.connect(":memory:")
    con.execute("create table tt (k int, v int)")
    con.executemany("insert into tt values (?,?)", rows)
    spark.createDataFrame(rows, "k int, v int").createOrReplaceTempView("tt")
    for kind in ("exclude current row", "exclude group", "exclude ties"):
        for frame in FRAMES:
            if _frame_contains(frame) is not True:
                continue
            q = (
                f"select k, v, total(v) over (order by k groups {frame}"
                f" {kind}) as s from tt order by k, v, s"
            )
            want = con.execute(q).fetchall()
            got = [tuple(r) for r in spark.sql(rewrite_statement(q)).collect()]
            assert got == want, q


def _frame_contains(frame: str):
    from sqawk_spark.dialect import _frame_contains_current_group

    return _frame_contains_current_group("between " + frame.split("between ")[1])


def test_groups_exclude_minmax_vs_sqlite(spark):
    """min/max EXCLUDE GROUP/TIES/CURRENT ROW lower to the
    directional decomposition (preceding/following-groups RANGE
    sub-frames, plus — for CURRENT ROW — the peer-partition
    before-self/after-self ROWS sub-frames) via NULL-skipping
    least/greatest; parity vs real SQLite incl. NULLs, duplicate
    (p, k, v) rows, and frames that reduce to a single direction or
    to just the current row."""
    rng = random.Random(17)
    rows = [
        (
            rng.randint(0, 2),
            rng.randint(0, 8),
            None if rng.random() < 0.2 else rng.randint(-5, 50),
        )
        for _ in range(60)
    ]
    con = sqlite3.connect(":memory:")
    con.execute("create table tm (p int, k int, v int)")
    con.executemany("insert into tm values (?,?,?)", rows)
    spark.createDataFrame(rows, "p int, k int, v int").createOrReplaceTempView(
        "tm"
    )
    for fn in ("min(v)", "max(v)"):
        for frame in FRAMES:
            for kind in ("exclude group", "exclude ties",
                         "exclude current row"):
                for part in PARTS:
                    q = (
                        f"select p, k, v, {fn} over ({part}order by k"
                        f" groups {frame} {kind}) as s from tm"
                        f" order by p, k, v, s"
                    )
                    want = con.execute(q).fetchall()
                    rewritten = rewrite_statement(q)
                    assert rewritten != q, f"not rewritten: {q}"
                    got = [tuple(r) for r in spark.sql(rewritten).collect()]
                    assert got == want, f"{q}\nrewritten: {rewritten}"


def test_groups_exclude_unsupported_still_bails():
    """Aggregates outside the decomposable set (here group_concat —
    order-sensitive, no exact windowed decomposition) must pass
    through untouched so Spark raises a hard error rather than a
    silent wrong answer."""
    q = (
        "select group_concat(v) over (order by k groups between"
        " 1 preceding and 1 following exclude group) from t"
    )
    assert rewrite_statement(q) == q
