"""Round-12 stress battery B: shapes one step around this round's own
fixes — unary sign over every operand kind, EXISTS under NOT/CASE/
comparisons, collation mixes (nocase + rtrim in one statement, folds
on numeric-affinity columns), scalar functions over predicates,
numeric-value identity through IN and HAVING, VALUES compositions,
and mixed union chains with multi-column rows.  Run directly:
``python tests/probe_r12b.py [substr ...]``; exits nonzero on any
divergence.  Ground truth: real sqlite3, stdout byte-compared through
the full CLI."""

import io
import sqlite3
import sys

import sqawk_spark.cli as cli

ROWS = [
    ("1", "x", "AB"),
    ("0", "y", "ab"),
    ("-3", "z", "Ba"),
    ("2", "3abc", "aB"),
    ("", "0.5", "zz"),
    ("2.5", "-1", "ab "),
]

QUERIES = [
    # --- unary sign over operand kinds (script-16 family)
    "select -(a1) as c from a order by a1",
    "select +(a1) as c from a order by a1",
    "select -a2 as c from a order by a1",
    "select - -a1 as c from a order by a1",
    "select -(a1 > 0) as c from a order by a1",
    "select -(select max(a1) from a) as c",
    "select -(case when a1 = 1 then 1.5 else 2 end) as c from a order by a1",
    "select -'3abc' as c from a limit 1",
    "select sum(-(a1)) as s from a",
    # --- EXISTS compositions (script-186 family)
    "select not exists(select 1 from a where a1 = 1) + 2 as e",
    "select not exists(select 1 from a where a1 = 99) + 2 as e",
    "select (not exists(select 1 from a where a1 = 1)) + 2 as e",
    "select exists(select 1 from a where a1 = 1) = 1 as e",
    "select case exists(select 1 from a where a1 = 1) when 1 then 'y' else 'n' end as c",
    "select exists(select 1 from a where a1 = 1) * exists(select 1 from a where a1 = 0) as e",
    "select a1 from a where exists(select 1 from a b where b.a1 = 0) order by a1",
    "select cast(exists(select 1 from a where a1 = 1) as text) as e",
    # --- collation mixes
    "select a3 = 'ab' collate nocase as p, a3 = 'ab   ' collate rtrim as q from a order by a1",
    "select count(*) as c from a where a3 = 'AB' collate nocase and a3 = 'ab  ' collate rtrim",
    "select a1 = '1 ' collate rtrim as p from a order by a1",
    "select a1 < '2' collate nocase as p from a order by a1",
    "select min(a1 collate nocase) as m from a",
    "select max(a1 collate rtrim) as m from a",
    "select group_concat(distinct a3 collate nocase) as g from a",
    "select count(distinct a3 collate rtrim) as c from a",
    "select a3 from a order by a3 collate rtrim desc, a1",
    "select a3 collate binary from a order by 1",
    # --- scalar functions over predicates
    "select round(a1 > 0) as p from a order by a1",
    "select nullif(a1 > 0, 0) as p from a order by a1",
    "select replace('10', '1', a1 > 0) as p from a order by a1",
    "select instr('10', a1 > 0) as p from a order by a1",
    "select abs(a1 >= 2) + length(a1 < 0) as p from a order by a1",
    "select iif(a1, a1 > 1, -1) as p from a order by a1",
    # --- windowed predicates and sums
    "select a1, sum(a1 > 0) over (order by a1 rows between 1 preceding and current row) as s from a order by a1",
    "select a1, sum(cast(a1 as text)) over (order by a1 rows unbounded preceding) as s from a order by a1",
    "select a1, max(a1 > 0) over (order by a1) as m from a order by a1",
    # --- numeric-value identity through IN / HAVING
    "select a1 from a where a1 in (2.0, 0.0) order by a1",
    "select a1 from a where a1 + 0.0 in (2, 2.5) order by a1",
    "select count(*) as c from (select 2 union select 2.0 union select '2')",
    "select count(*) as c from (select a1 from a intersect select a1 + 0.0 from a)",
    "select a1, count(*) as c from a group by a1 having a1 in (2, 2.5) order by a1",
    # --- VALUES compositions
    "select * from (values (1, 'x'), (2.5, 'y')) order by 1",
    "values (1 + 0.5), (2)",
    "select count(*) as c from (values (1), (2), (3))",
    "values ('a'), (1), (2.0)",
    # --- mixed union chains, multi-column
    "select 1, 'x' union select 1.0, 'x' union all select 2, 'y'",
    "select a1, a2 from a union select a1 + 0.0, a2 from a union all select 99, 'q' order by 1, 2",
    "select 7 union all select 7.0 union select '7'",
    "select 3 union select 1 union all select 2.0 union all select '0'",
    # --- aggregate renders over casts in compounds (seed-A family)
    "select sum(cast(a1 as integer)) as s from a union all select count(*) from a",
    "select 1 as t, sum(cast(a1 as integer)) filter (where a3 <= 'Z') as c from a union all select 2, min(a1) from a order by t",
    "select avg(cast(a1 as integer)) as s from a union all select 9.5",
]


def main(only: list[str] | None = None) -> int:
    con = sqlite3.connect(":memory:")
    con.execute("create table a(a1 INTEGER, a2 INTEGER, a3 INTEGER)")
    con.executemany("insert into a values (?,?,?)", ROWS)
    con.commit()

    import tempfile, os

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        for r in ROWS:
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
