"""SQLite windowed-sum result-class STICKINESS, probed and pinned.

SQLite's window sum maintains one accumulator per partition: rows are
added as they enter the frame (sumStep) and removed as they leave
(sumInverse), and the first non-integer added flips the accumulator
to approximate WITHOUT ever flipping back — sumInverse keeps the
flag.  So the result class of ``sum(x) OVER (... rows between 1
preceding and current row)`` is REAL for every row at-or-after the
first non-integer in window order, even when the current frame holds
only integers.  EXCLUDE frames are the exception: SQLite recomputes
those per frame, so the frame's own membership decides the class.

Found by the round-9 composed-SQL fuzzer (seed 20240815, script 116:
``sum(a2) over (order by a1, anr rows between current row and 2
following)`` rendered 1 where SQLite renders 1.0 — the text rows that
contaminated the accumulator had already left the frame).  The engine
encodes the rule in dialect._sticky_over_sql: the non-integer
detector count runs over [unbounded preceding .. same frame end],
while the value sums keep the original frame.
"""

from __future__ import annotations

import io
import sqlite3

import pytest

import sqawk_spark.cli as cli

ROWS = ["txt", "5", "7", "9", "2.5", "1", "3"]


@pytest.fixture(scope="module")
def oracle():
    con = sqlite3.connect(":memory:")
    con.execute("create table a (anr INTEGER PRIMARY KEY, a1)")
    for i, v in enumerate(ROWS, start=1):
        try:
            tv = int(v)
        except ValueError:
            try:
                tv = float(v)
            except ValueError:
                tv = v
        con.execute("insert into a values (?, ?)", (i, tv))
    return con


FRAMES = [
    "rows between 1 preceding and current row",
    "rows between current row and 1 following",
    "rows between unbounded preceding and current row",
    "rows between 2 following and 3 following",
    "range between 1 preceding and 1 following",
    "groups between 1 preceding and current row",
    "groups between 1 preceding and current row exclude current row",
    # ROWS/RANGE + EXCLUDE is not emulated (peer-run boundaries vary
    # per row, which Spark's literal ROWS bounds cannot express): the
    # engine leaves the clause for Spark to reject loudly rather than
    # approximating — only GROUPS frames decompose (rewrite_groups_frames)
]


def _render(rows) -> str:
    out = []
    for r in rows:
        cells = []
        for v in r:
            if v is None:
                cells.append("")
            elif isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        out.append(" ".join(cells))
    return "\n".join(out)


@pytest.mark.parametrize("frame", FRAMES)
def test_window_sum_sticky_class(tmp_path, oracle, frame):
    sql = (
        f"select anr, sum(a1) over (order by anr {frame}) as w "
        f"from a order by anr"
    )
    want = _render(oracle.execute(sql).fetchall())
    f = tmp_path / "sticky.csv"
    f.write_text("\n".join(ROWS) + "\n")
    out = io.StringIO()
    rc = cli.run(
        ["-FS", ",", sql, "datatypes=numeric", str(f)], out=out
    )
    assert rc == 0
    got = out.getvalue().rstrip("\n")
    assert got == want, f"{frame}\nsqlite : {want!r}\npysqawk: {got!r}"


def test_sticky_is_per_partition(tmp_path, oracle):
    sql = (
        "select anr, sum(a1) over (partition by anr % 2 order by anr "
        "rows between 1 preceding and current row) as w "
        "from a order by anr"
    )
    want = _render(oracle.execute(sql).fetchall())
    f = tmp_path / "sticky.csv"
    f.write_text("\n".join(ROWS) + "\n")
    out = io.StringIO()
    rc = cli.run(
        ["-FS", ",", sql, "datatypes=numeric", str(f)], out=out
    )
    assert rc == 0
    assert out.getvalue().rstrip("\n") == want
