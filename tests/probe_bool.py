"""Differential probe battery: pysqawk CLI vs real SQLite on the
numeric-as-boolean coercion surface (round-10 brief #1).  Run directly:
``python tests/probe_bool.py``; exits nonzero on any divergence."""

import io
import sqlite3
import sys

import sqawk_spark.cli as cli

ROWS = [("1", "x"), ("0", "y"), ("-3", "z"), ("2", "3abc"), ("", "0.5")]

QUERIES = [
    "select a1 from a where a1",
    "select a1 from a where 1",
    "select a1 from a where 0.0",
    "select a1 from a where '  2x'",
    "select a1 from a where ''",
    "select a1 from a where null",
    "select a1 from a where a2",
    "select a1 from a where a1 - 1",
    "select a1 from a where not a1",
    "select a1 from a where not a2",
    "select a1 from a where a1 and a2",
    "select a1 from a where a1 or a2",
    "select a1 from a where a1 and a2 or a1 = 0",
    "select a1 from a where not (a1 or a2)",
    "select a1 from a where a1 > 0 and a2",
    "select a1 from a where a1 between 0 and 2 and a1",
    "select case when 2 then 'y' else 'n' end as c from a limit 1",
    "select case when a2 then a1 else 'e' end as c from a",
    "select a1 from a where case when a2 then a1 else 0 end",
    "select 1 and 2 as x, not 0.5 as y, 7 or null as z from a limit 1",
    "select 0 or null as x, 1 and null as y, 0 and null as z from a limit 1",
    "select not a2 as n from a",
    "select a1 and a2 as n from a",
    "select iif(a1, 'y', 'n') as r from a",
    "select iif(a2, a1, 'n') as r from a",
    "select a1 from a where length(a2)",
    "select a1 from a where abs(a1)",
    "select sum(a1) as s, a2 from a group by a2 having sum(a1) order by a2",
    "select sum(a1) as s, a2 from a group by a2 having count(*) order by a2",
    "select a1 from a where (select 1)",
    "select a1 from a where (select 0)",
    "select a1 from a where a1 like '1%' or a1",
    "select a1, not a1 from a order by 2, 1",
    "select not a1 and a2 as x from a",
]

JOIN_QUERIES = [
    "select a1, b1 from a join b on a1 order by a1, b1",
    "select a1, b1 from a join b on b1 and a1 order by a1, b1",
]


def main() -> int:
    # INTEGER affinity mirrors the CLI's default column datatype
    # (tests/test_cli_fuzz.py::load_sqlite)
    con = sqlite3.connect(":memory:")
    con.execute("create table a(a1 INTEGER, a2 INTEGER)")
    con.executemany("insert into a values (?,?)", ROWS)
    con.execute("create table b(b1 INTEGER)")
    con.executemany("insert into b values (?)", [("1",), ("0",)])
    con.commit()

    import tempfile, os

    with tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False
    ) as f:
        for r in ROWS:
            f.write(" ".join(v if v else "''" for v in r) + "\n")
        apath = f.name
    # the awk parser reads '' literally; write a real empty field via
    # a leading separator instead — use FS=, and empty first field
    with open(apath, "w") as f:
        for r in ROWS:
            f.write(",".join(r) + "\n")
    with tempfile.NamedTemporaryFile(
        "w", suffix=".txt", delete=False
    ) as f:
        f.write("1\n0\n")
        bpath = f.name

    bad = 0
    for q in QUERIES + JOIN_QUERIES:
        try:
            want = "\n".join(
                "|".join("" if v is None else str(v) for v in row)
                for row in con.execute(q).fetchall()
            )
        except sqlite3.Error as e:
            print(f"SKIP (sqlite error) {q}: {e}")
            continue
        buf = io.StringIO()
        argv = ["-FS", ",", "-OFS", "|", q, apath]
        if q in JOIN_QUERIES:
            argv.append(bpath)
        try:
            rc = cli.run(argv, out=buf)
        except Exception as e:
            print(f"FAIL {q}\n  pysqawk raised: {type(e).__name__}: {e}")
            bad += 1
            continue
        got = buf.getvalue().rstrip("\n")
        if q in JOIN_QUERIES or "order by" in q or "group by" in q:
            match = got == want
        else:
            match = sorted(got.splitlines()) == sorted(want.splitlines())
        if rc != 0 or not match:
            print(f"FAIL {q}\n  sqlite: {want!r}\n  pysqawk: {got!r}")
            bad += 1
        else:
            print(f"ok   {q}")
    os.unlink(apath)
    os.unlink(bpath)
    print(f"\n{bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
