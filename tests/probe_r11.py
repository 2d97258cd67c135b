"""Round-11 differential probe battery: every divergence named in
VERDICT.md round 10 plus the ADVICE.md ordinal bug.  Run directly:
``python tests/probe_r11.py``; exits nonzero on any divergence."""

import io
import sqlite3
import sys

import sqawk_spark.cli as cli

ROWS = [("1", "x"), ("0", "y"), ("-3", "z"), ("2", "3abc"), ("", "0.5")]

# queries whose output is order-pinned by an ORDER BY (or single row)
QUERIES = [
    # --- boolean-as-integer value contexts (verdict What's wrong #1/#4)
    "select sum(a1 > 0) as s from a",
    "select sum(a1 > 0) filter (where a2) as s from a",
    "select avg(a1 > 0) as s from a",
    "select total(a1 > 0) as s from a",
    "select count(a1 > 0) as s from a",
    "select max(a1 > 0) as s from a",
    "select min(a1 > 0) as s from a",
    "select (a1 > 0) + 1 as s from a order by a1",
    "select (a1 = 1) * 5 as s from a order by a1",
    "select abs(a1 > 0) as s from a order by a1",
    "select sum((a1 > 0) + 1) as s from a",
    "select sum(a1 like '1%') as s from a",
    "select sum(a1 > 0 and a2 > 0) as s from a",
    "select sum(not a1) as s from a",
    "select length(a1 > 0) as s from a order by a1",
    "select group_concat(a1 > 0, ';') as s from a",
    "select coalesce(a1 > 5, 9) as s from a order by a1",
    "select sum(a1 is null) as s from a",
    "select (a1 > 0) + (a2 > 0) as s from a order by a1",
    "select -(a1 > 0) as s from a order by a1",
    # --- per-scope ORDER BY class keys (What's wrong #2)
    "select group_concat(a1, ';') as s from (select a1 from a order by a1)",
    "select a1 from (select a1 from a order by a1) limit 3",
    "select group_concat(a1, ';') as s from (select a1 from a order by a1 desc)",
    # --- numeric-value set-op identity (What's wrong #3)
    "select count(*) as c from (select 7 union select 7.0)",
    "select count(*) as c from (select 7 union select '7' union select 7.0)",
    "select 7 union select 7.0",
    "select 7 union select '7' union select 7.0 order by 1",
    "select count(*) as c from (select 2.5 union select 2.5)",
    "select count(*) as c from (select a1 from a union select a1 + 0.0 from a)",
    # --- mixed-literal CASE render (What's wrong #5)
    "select case when a1=1 then 1.5 when a1=0 then 3 else 2 end as c from a order by a1",
    "select case when a1=1 then 1.5 when a1=0 then 3 end as c from a order by a1",
    "select case when a1=1 then 1.5 else 2.5 end as c from a order by a1",
    "select case when a1=1 then 1.5 when a1=0 then 3 else 2.5 end as c from a order by a1",
    "select case when a1=1 then 1.5 else 3 end as c from a order by a1",
    # --- COLLATE positions (Missing #2)
    "select max(a3 collate nocase) as m from a",
    "select min(a3 collate nocase) as m from a",
    "select count(distinct a3 collate nocase) as c from a",
    "select a1 from a where a3 between 'A' and 'b' collate nocase order by a1",
    "select case a3 when 'AB' collate nocase then 1 else 0 end as c from a order by a1",
    "select a3 collate nocase from a order by 1",
    "select a3, count(*) as c from a group by a3 collate nocase order by 1",
    # --- ADVICE: ORDER BY ordinal resolving to a bare integer literal
    "select 2, a1 from a order by 1",
    "select 42 from a order by 1",
    "select 2 as k, a1 from a order by 1, 2",
]


def main(only: list[str] | None = None) -> int:
    con = sqlite3.connect(":memory:")
    con.execute("create table a(a1 INTEGER, a2 INTEGER, a3 INTEGER)")
    rows3 = [r + (t,) for r, t in zip(ROWS, ["AB", "ab", "Ba", "aB", "zz"])]
    con.executemany("insert into a values (?,?,?)", rows3)
    con.commit()

    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for r in rows3:
            f.write(",".join(r) + "\n")
        apath = f.name

    bad = 0
    for q in QUERIES:
        if only and not any(s in q for s in only):
            continue
        try:
            rows = con.execute(q).fetchall()
            want = "\n".join(
                "|".join("" if v is None else str(v) for v in row)
                for row in rows
            )
            want = want + "\n" if rows else ""
        except sqlite3.Error as e:
            print(f"SKIP (sqlite error) {q}: {e}")
            continue
        buf = io.StringIO()
        argv = ["-FS", ",", "-OFS", "|", q, apath]
        try:
            rc = cli.run(argv, out=buf)
        except Exception as e:
            msg = f"{type(e).__name__}: {e}"
            if len(msg) > 300:
                msg = msg[:300] + f"... [{len(msg)} chars]"
            print(f"FAIL {q}\n  pysqawk raised: {msg}")
            bad += 1
            continue
        got = buf.getvalue()
        ordered = "order by" in q or "\n" not in got.rstrip("\n")
        if ordered:
            match = got == want
        else:
            match = sorted(got.splitlines()) == sorted(want.splitlines())
        if rc != 0 or not match:
            print(f"FAIL {q}\n  sqlite: {want!r}\n  pysqawk: {got!r}")
            bad += 1
        else:
            print(f"ok   {q}")
    os.unlink(apath)
    print(f"\n{bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
