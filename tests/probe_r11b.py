"""Round-11 stress batteries beyond the verdict's minimized repros:
set-operation value identity (orderings, mixed chains, multi-column),
CASE class renders (simple/nested/NULL branches), COLLATE positions,
and DISTINCT value identity over a mixed-class column.  Each group
carries its own fixture.  Run directly: ``python tests/probe_r11b.py``;
exits nonzero on any divergence.  The two KNOWN residues (documented
in dialect.py) are skipped explicitly."""

import io
import sqlite3
import sys

import sqawk_spark.cli as cli

# (rows, queries) groups; rows are (a1, a2) or (a1, a2, a3) tuples
GROUP_AB = [("1", "x"), ("0", "y"), ("-3", "z"), ("2", "3abc"), ("", "0.5")]
GROUP_COLLATE = [
    ("1", "AB"), ("0", "ab"), ("-3", "Ba"), ("2", "aB"), ("", "zz"),
    ("5", "aa"),
]
GROUP_DISTINCT = [
    ("7", "x"), ("7.0", "y"), ("2", "z"), ("2", "w"), ("abc", "v"),
    ("", "u"), ("7e0", "t"),
]

SETOP_QUERIES = [
    "select 3 union select 1 union select 2",
    "select 3 union select 1 order by 1 desc",
    "select 7.0 union select 7",
    "select 7.0 union select 7 order by 1",
    "select 1, 2.0 union select 1.0, 2",
    "select 1, 'x' union select 1.0, 'x'",
    "select 1, 'x' union select 1.0, 'y' order by 2 desc",
    "select a1 from a union select 0 from a",
    "select a1 from a union select 0.0 from a order by 1",
    "select a1 from a union select a2 from a",
    "select a1 from a union all select a1 + 0.0 from a",
    "select a1 from a union all select a1 from a union select 0.0",
    "select a1 from a intersect select a1 from a",
    "select a1 from a except select 1",
    "select 2 union select 2.0 union select 3 limit 2",
    "select 7 union select 7.0 limit 1",
    "select a1 from a where a1 in (2.0, 1.0) order by a1",
    "select a1 from a where a1 in (2, '1') order by a1",
    "select a1 from a where a1 + 0.0 in (2, 1) order by a1",
    "select count(*) as c from "
    "(select max(a1) from a union select max(a1)+0.0 from a)",
    "select 7 union select 7.0 union select 7",
    "select 'b' union select 'a' union select 'B'",
    "select null union select null union select 0",
    "select null union select 0.0 order by 1",
    "select -0.0 union select 0",
    "select 9223372036854775807 union select 9223372036854775807.0",
    "select a1, count(*) as c from a group by a1 "
    "union select 99, 99 order by 1, 2",
    # INTERSECT / EXCEPT value identity (round 11: the left side's
    # representative survives, keys compare 7 and 7.0 equal)
    "select 7 intersect select 7.0",
    "select 7.0 intersect select 7",
    "select 7.0 except select 7",
    "select 7 except select '7'",
    "select a1 from a intersect select a1 + 0.0 from a",
    "select a1 from a except select a1 + 0.0 from a",
    "select a1 from a except select 1.0",
    "select a1 from a intersect select a1 from a intersect select 2.0",
    "select a1 from a except select 1 except select 2.0",
    "select a1, a2 from a intersect select a1 + 0.0, a2 from a",
    "select a1 from a intersect select a1 from a order by 1 desc",
]

CASE_QUERIES = [
    "select case a1 when 1 then 1.5 when 0 then 3 else 2 end as c "
    "from a order by a1",
    "select case when a1=1 then 2.5 when a1=0 then 'txt' else 3 end "
    "as c from a order by a1",
    "select case when a1=1 then 1.5 when a1=0 then a1 else 2 end "
    "as c from a order by a1",
    "select case when a1=1 then a1+0.5 when a1=0 then 3 else 2 end "
    "as c from a order by a1",
    "select case when a1=1 then 1.5 when a1=0 then "
    "case when a2='y' then 7 else 8 end else 2 end as c from a "
    "order by a1",
    "select case when a1=1 then 1 when a1=0 then 2 else 3 end as c "
    "from a order by a1",
    "select case when a1=1 then 1.5 end as c from a order by a1",
    "select case when a1 = 1 then 9223372036854775807 "
    "when a1=0 then 1.5 else 0 end as c from a order by a1",
    "select case when a1=1 then null when a1=0 then 1.5 else 3 end "
    "as c from a order by a1",
    "select sum(case when a1>0 then 1.5 else 2 end) as s from a",
    "select case when a1=1 then -1.5 when a1=0 then -3 else 2 end "
    "as c from a order by a1",
    # CASE as an arithmetic operand: the selected branch's own class
    # drives the result class per row (round-11 residue, closed)
    "select case when a1=1 then 1.5 when a1=0 then 3 else 2 end + 1 "
    "as c from a order by a1",
    "select 1 + case when a1=1 then 1.5 when a1=0 then 3 else 2 end "
    "as c from a order by a1",
    "select case when a1=1 then 1.5 when a1=0 then 3 else 2 end * 2 "
    "as c from a order by a1",
    "select sum(case when a1=1 then 1.5 when a1=0 then 3 else 2 end "
    "+ 1) as s from a",
    "select case when a1=1 then 1.5 else 2 end + "
    "case when a1=0 then 3 else 4 end as c from a order by a1",
    "select case when a1=1 then 1.5 when a1=0 then 3 else 2 end / 2 "
    "as c from a order by a1",
]

COLLATE_QUERIES = [
    "select max(a2 collate nocase) as m, min(a2 collate nocase) as n "
    "from a",
    "select count(a2 collate nocase) as c from a",
    "select count(distinct a2 collate nocase) as c from a",
    "select sum(a1 collate nocase) as s from a",
    "select group_concat(a2 collate nocase, ';') as g from a",
    "select a1 from a where a2 collate nocase between 'AA' and 'B' "
    "order by a1",
    "select a1 from a where a2 not between 'A' and 'b' collate nocase "
    "order by a1",
    "select a1, case a2 when 'ab' collate nocase then 'hit' "
    "when 'zz' then 'z' else 'miss' end as r from a order by a1",
    "select a2 collate nocase as k from a order by k",
    "select a2 collate nocase from a order by 1 desc",
    "select a2, count(*) as c from a group by a2 collate nocase "
    "order by 2 desc, 1",
    "select min(a2 collate nocase) as m from a group by a1 > 0 "
    "order by m",
    "select max(a2 collate nocase) as m from a where a1 <> '' "
    "group by a1 % 2 order by m",
]

DISTINCT_QUERIES = [
    "select distinct a1 from a",
    "select distinct a1 from a order by a1",
    "select distinct a1 from a order by a1 desc",
    "select distinct a1 from a limit 2",
    "select distinct a1, a2 from a",
    "select distinct a1 from a where a2 <> 'y'",
    "select count(*) as c from (select distinct a1 from a)",
]

# predicate-value corners: windows, HAVING, IN-lhs, DML interplay
PREDVAL_QUERIES = [
    "select anr, sum(a1 > 0) over (order by anr) as r from a "
    "order by anr",
    "select anr, count(a1 > 0) over (order by anr) as r from a "
    "order by anr",
    "select a1 > 0 as g, count(*) as c from a group by a1 > 0 "
    "order by g",
    "select a1 from a group by a1 having sum(a1 > 0) order by a1",
    "select a1 from a where (a1 > 0) in (1) order by a1",
    "select a1, iif(a2, a1 > 0, 9) as r from a order by a1",
    "select a1 from a order by a1 > 0, a1",
    "select nullif(a1 > 0, 1) as r from a order by a1",
    "select sum((a1 > 0) * (a1 < 2)) as s from a",
    "select typeof(a1 > 0) as t from a limit 1",
    "select max(a1 > 0, 0) as m from a order by a1",
    "select a1, a1 in (1, 2) as r from a order by a1",
    "select sum(a1 in (1, 2)) as s from a",
    "select sum(exists (select 1 where 1)) as s from a",
    "select cast(a1 > 0 as text) as t from a order by a1",
]

# one ring further out: CTE bodies, scalar subqueries, HAVING
NEXTRING_QUERIES = [
    "with t as (select a1 from a order by a1) "
    "select group_concat(a1, ';') as g from t",
    "with t as (select a1 from a order by a1 desc) select a1 from t",
    "select group_concat(a1, ';') as g from "
    "(with u as (select a1 from a order by a1) select a1 from u)",
    "select a1 > 0 from a order by 1",
    "select a1 > 0 as p from a order by p desc, a1",
    "select sum(a1 > 0) + sum(a1 < 0) as s from a",
    "select (select count(*) from a) > 3 as big from a limit 1",
    "select a1 from a where (select max(a1) from a) > 0 order by a1",
    "select case when sum(a1 > 0) > 1 then 'many' else 'few' end "
    "as r from a",
    "select a1 from a where (select max(a1) from a) order by a1",
]

GROUP_BAREGROUP = [("1", "x"), ("2", "x"), ("-3", "y"), ("0", "y"), ("5", "y")]

# bare EXPRESSIONS in aggregate/grouped queries take the group's
# first row (no min/max present)
BAREGROUP_QUERIES = [
    "select a1 * 2, count(*) from a group by a2 order by a2",
    "select a1 || '!', count(*) from a group by a2 order by a2",
    "select a1 > 0, count(*) from a group by a2 order by a2",
    "select case when a1=1 then 1.5 else 3 end, a2, count(*) from a "
    "group by a2 order by a2",
    "select a1 + 0.5, count(*) from a group by a2 order by a2",
    "select abs(a1), a2 from a group by a2 order by a2",
    "select a1 * 2 from a group by a2 order by a2",
    "select sum(a1), a1 * 2 from a",
]

GROUP_BAREEXPR = [("1", "x"), ("2", "y"), ("-3", "z"), ("0", "aa")]

# bare EXPRESSIONS beside a single min/max evaluate on the winning row
BAREEXPR_QUERIES = [
    "select min(a2), case when a1=1 then 1.5 else 3 end + 1 from a",
    "select max(a1), a2 || '!' from a",
    "select max(a1), abs(a1) + 1 from a",
    "select min(a1), a1 > 0 from a",
    "select max(a1), 5 from a",
    "select max(a1), 'k' from a",
    "select a2, max(a1), a1 * 2 from a",
    "select min(a1), coalesce(a2, 'z') from a",
]

GROUPS = [
    ("setops", GROUP_AB, SETOP_QUERIES),
    ("case", GROUP_AB, CASE_QUERIES),
    ("collate", GROUP_COLLATE, COLLATE_QUERIES),
    ("distinct", GROUP_DISTINCT, DISTINCT_QUERIES),
    ("bareexpr", GROUP_BAREEXPR, BAREEXPR_QUERIES),
    ("predval", GROUP_AB, PREDVAL_QUERIES),
    ("nextring", GROUP_AB, NEXTRING_QUERIES),
    ("baregroup", GROUP_BAREGROUP, BAREGROUP_QUERIES),
]

# documented residues (dialect.py): chains mixing a distinct UNION with
# a LATER `union all` keep the flat rendered compound
KNOWN_RESIDUE = {
    "select a1 from a union select a1+0.0 from a union all select 1",
}


def main(only: list[str] | None = None) -> int:
    import os
    import tempfile

    bad = 0
    for gname, rows, queries in GROUPS:
        con = sqlite3.connect(":memory:")
        # anr mirrors the CLI's row counter (INTEGER PRIMARY KEY =
        # rowid alias, 1-based insert order)
        con.execute(
            "create table a(anr INTEGER PRIMARY KEY, "
            "a1 INTEGER, a2 INTEGER)"
        )
        con.executemany("insert into a (a1, a2) values (?,?)", rows)
        con.commit()
        with tempfile.NamedTemporaryFile(
            "w", suffix=".txt", delete=False
        ) as f:
            for r in rows:
                f.write(",".join(r) + "\n")
            apath = f.name
        for q in queries:
            if q in KNOWN_RESIDUE:
                print(f"SKIP (documented residue) {q}")
                continue
            if only and not any(s in q for s in only):
                continue
            try:
                got_rows = con.execute(q).fetchall()
            except sqlite3.Error as e:
                print(f"SKIP (sqlite error) {q}: {e}")
                continue
            want = "\n".join(
                "|".join("" if v is None else str(v) for v in row)
                for row in got_rows
            )
            want = want + "\n" if got_rows else ""
            buf = io.StringIO()
            try:
                rc = cli.run(["-FS", ",", "-OFS", "|", q, apath], out=buf)
            except Exception as e:  # noqa: BLE001 — report and count
                msg = f"{type(e).__name__}: {e}"
                print(f"FAIL [{gname}] {q}\n  raised: {msg[:300]}")
                bad += 1
                continue
            got = buf.getvalue()
            ordered = "order by" in q or gname in ("setops", "distinct")
            match = (
                got == want
                if ordered
                else sorted(got.splitlines()) == sorted(want.splitlines())
            )
            if rc != 0 or not match:
                print(
                    f"FAIL [{gname}] {q}\n"
                    f"  sqlite: {want!r}\n  pysqawk: {got!r}"
                )
                bad += 1
            else:
                print(f"ok   [{gname}] {q}")
        con.close()
        os.unlink(apath)
    print(f"\n{bad} divergences")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
