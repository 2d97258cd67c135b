"""Composed-script differential fuzzer: random multi-feature SELECTs
through the FULL pysqawk CLI vs real SQLite (stdlib sqlite3) on
identically-loaded tables, stdout byte-compared.

Every dialect feature is property-tested in isolation elsewhere
(test_affinity_property, test_groups_property, test_filter_clause,
...), but the reference's actual contract is arbitrary COMPOSED SQL
evaluated verbatim (lib/classes/sqawk.tcl:216).  This harness
generates compositions: mixed-affinity ``datatypes=`` tables x CAST x
COLLATE NOCASE x aggregate FILTER x bare-column min/max x
``LIMIT n, m`` x IS x GLOB/LIKE x window frames (ROWS, GROUPS and
integer RANGE) x CASE, on top of storage-class WHERE / ORDER BY /
GROUP BY semantics.

Determinism (byte-compare must be well defined):

- seeded rng (``SQAWK_FUZZ_SEED``, default 20240815) — any failure
  replays exactly; the failure message carries the script index, the
  SQL, the file content and both outputs.
- every generated query carries a TOTAL order: plain/window queries
  append ``anr`` as the final sort key; aggregate queries sort on the
  group key, which is unique per group by construction (see the
  affinity note below); DISTINCT queries sort on every output column.
- numeric pools are small integers and dyadic rationals (k/8 .. k/2):
  their double sums are EXACT at these magnitudes in any evaluation
  order, so Spark's partial aggregation and SQLite's serial loop
  produce bit-identical doubles, and both sides render reals via
  shortest-repr (sqawk_spark/affinity.py module docstring).  Text
  values never start with a digit, so SQLite's sum/avg coercion maps
  them to exactly 0.
- int/real equal-value group-key collisions (int 2 vs real 2.0, which
  SQLite groups together with an order-dependent representative)
  cannot arise: INTEGER/NUMERIC affinity converts every lossless real
  text ('2.0') to an int, REAL affinity converts every int, and TEXT
  affinity converts nothing, so a single column or single generated
  expression never yields both storage classes at an equal value.

Oracle-side loading replicates the reference's table builder
(lib/classes/table.tcl:59-78): ``anr INTEGER PRIMARY KEY, anf
INTEGER, a0 TEXT, a1..aN`` with declared datatypes (default INTEGER),
missing trailing fields NULL.  Inserting Python ``str`` values lets
real SQLite apply declared-type affinity exactly as Tcl's driver
does, and rendering ``None -> ''``, ``int -> str``, ``float ->
repr`` mirrors the awk serializer contract the affinity property
suite pins.

Run size: ``SQAWK_FUZZ_N`` (default 200 scripts) — the driver brief's
minimum; set it lower while iterating locally.
"""

from __future__ import annotations

import io
import os
import random
import sqlite3

import pytest

import sqawk_spark.cli as cli

SEED = int(os.environ.get("SQAWK_FUZZ_SEED", "20240815"))
N_SCRIPTS = int(os.environ.get("SQAWK_FUZZ_N", "200"))

# --- value pools ---------------------------------------------------------

INT_TEXTS = ["0", "1", "3", "20", "001", "007", "-7", "42", "-15", "100"]
# dyadic rationals only: exact in double arithmetic under any order
REAL_TEXTS = ["1.5", "0.25", "2.75", "-0.5", "10.125", "3.5", "-2.25"]
# never digit-prefixed: sum/avg coercion maps each to exactly 0
TEXT_TEXTS = ["c", "x", "ab", "AB", "Abc", "zz", "Q", "ba", "aB", ""]
DATATYPES = ["integer", "real", "text", "numeric", ""]

STR_LITS = ["'ab'", "'AB'", "'c'", "'z'", "'2'", "''", "'Abc'"]
# for shapes where a digit-prefixed text value would hit the dynamic-
# key ordering residue (it keys numeric, SQLite classes it text)
NODIGIT_STR_LITS = ["'ab'", "'AB'", "'c'", "'z'", "''", "'Abc'"]
NUM_LITS = ["0", "1", "2", "5", "-3", "20", "1.5", "0.25", "-0.5"]
LIKE_PATS = ["%b%", "a%", "_b", "%5", "A%", "%2%", "__"]
GLOB_PATS = ["*b*", "[abc]*", "?b", "2*", "*5", "[A-Z]*"]
# (pattern, escape-char): escaped wildcards, escaped escapes, escaped
# ordinary letters (SQLite still case-folds those), dangling escapes
ESC_LIKE_PATS = [
    ("a!%b", "!"),
    ("!%%", "!"),
    ("a!_", "!"),
    ("%E%%", "E"),
    ("a!!b", "!"),
    ("!a%", "!"),
    ("%!", "!"),
    ("x!%", "x"),
]
CMP_OPS = ["<", "<=", ">", ">=", "=", "<>"]


def _field(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.4:
        return rng.choice(INT_TEXTS)
    if r < 0.7:
        return rng.choice(REAL_TEXTS)
    return rng.choice(TEXT_TEXTS)


def make_dataset(rng: random.Random) -> tuple[str, list[str]]:
    """(file text, per-column datatypes).  3 columns, ragged tail rows."""
    datatypes = [rng.choice(DATATYPES) for _ in range(3)]
    lines = []
    for _ in range(rng.randint(10, 24)):
        nf = 3 if rng.random() < 0.85 else rng.randint(1, 2)
        lines.append(",".join(_field(rng) for _ in range(nf)))
    return "\n".join(lines) + "\n", datatypes


# --- expression / predicate generators -----------------------------------

COLS = ["a1", "a2", "a3", "anr", "anf"]
INT_COLS = ["anr", "anf"]


def col(rng: random.Random) -> str:
    return rng.choice(COLS)


def scalar(
    rng: random.Random,
    depth: int = 0,
    chain_cols: list[str] | None = None,
    distinct_safe: bool = False,
) -> str:
    # distinct_safe: every generated expression must keep ONE storage
    # class per equal value across rows — NUMERIC casts over REAL-ish
    # columns map text rows to INTEGER 0 while keeping stored reals
    # REAL (cast(x as numeric) is a no-op on reals), so 0 and 0.0 can
    # co-occur and SQLite's DISTINCT dedups them cross-class with an
    # arrival-order representative no distributed engine reproduces.
    affs = ["integer", "real", "text"] if distinct_safe else [
        "integer", "real", "text", "numeric"
    ]
    r = rng.random()
    if r < 0.35:
        return col(rng)
    if r < 0.55:
        return f"cast({col(rng)} as {rng.choice(affs)})"
    if r < 0.7:
        # '/' and '%' are the per-step-typed operators (SQLite
        # truncates int division at EVERY step and casts '%' operands
        # to int64); chains of two ops exercise the step order.
        # Division keeps the exact-double-sum contract (module
        # docstring): divisors are nonzero powers of two, so a REAL
        # quotient stays dyadic; '%' computes on int64 either way.
        def term(r2: random.Random) -> str:
            op = r2.choice(["+", "-", "*", "/", "%"])
            if op == "/":
                lit = r2.choice([1, 2, 4, -2, 8])
            else:
                lit = r2.choice([1, 2, 3, 4, -3, 7])
            return f"{op} {lit}"

        c = rng.choice(chain_cols) if chain_cols else col(rng)
        out = f"{c} {term(rng)}"
        if rng.random() < 0.4:
            out += f" {term(rng)}"
        return out
    if r < 0.8:
        return rng.choice(NUM_LITS + STR_LITS)
    if r < 0.9 and depth == 0:
        return (
            f"case when {pred(rng, 1)} then {scalar(rng, 1)} "
            f"else {scalar(rng, 1)} end"
        )
    if r < 0.95 and depth == 0:
        # iif branches stay class-render-safe: columns and integer
        # literals render identically through Spark's if() coercion
        # (an un-classed REAL or division branch would not)
        cond = pred(rng, 1) if rng.random() < 0.5 else bool_term(rng, 1)
        branch = lambda: (  # noqa: E731
            col(rng) if rng.random() < 0.6 else str(rng.randint(-3, 20))
        )
        return f"iif({cond}, {branch()}, {branch()})"
    return col(rng)


def pred(rng: random.Random, depth: int = 0) -> str:
    r = rng.random()
    if r < 0.06:
        # bare value in a boolean context (numeric-as-boolean
        # coercion, round-10); defined below pred — runtime-resolved
        return bool_term(rng, 1)
    if r < 0.3:
        lhs = scalar(rng, 1) if rng.random() < 0.3 else col(rng)
        return f"{lhs} {rng.choice(CMP_OPS)} {rng.choice(NUM_LITS + STR_LITS)}"
    if r < 0.4:
        return f"{col(rng)} is {rng.choice(['null', 'not null'])}"
    if r < 0.48:
        return f"{col(rng)} is {rng.choice(NUM_LITS + STR_LITS)}"
    if r < 0.58:
        k = rng.random()
        if k < 0.5:
            return f"{col(rng)} like '{rng.choice(LIKE_PATS)}'"
        if k < 0.7:
            p, e = rng.choice(ESC_LIKE_PATS)
            return f"{col(rng)} like '{p}' escape '{e}'"
        if k < 0.85:
            return (
                f"{col(rng)} || {col(rng)} like "
                f"'{rng.choice(LIKE_PATS)}'"
            )
        if k < 0.95:
            a, b = rng.choice(LIKE_PATS), rng.choice(["%", "_b", "5"])
            return f"{col(rng)} like '{a}' || '{b}'"
        return f"like('{rng.choice(LIKE_PATS)}', {col(rng)})"
    if r < 0.68:
        return f"{col(rng)} glob '{rng.choice(GLOB_PATS)}'"
    if r < 0.78:
        c, s = col(rng), rng.choice(STR_LITS)
        if rng.random() < 0.5:
            return f"{c} collate nocase {rng.choice(['=', '<>', '<', '>'])} {s}"
        return f"{c} {rng.choice(['=', '<>'])} {s} collate nocase"
    if r < 0.84:
        lo, hi = sorted(rng.sample(range(-5, 25), 2))
        neg = "not " if rng.random() < 0.3 else ""
        if rng.random() < 0.3:
            return f"{col(rng)} {neg}between '{lo}' and '{hi}'"
        return f"{col(rng)} {neg}between {lo} and {hi}"
    if r < 0.9:
        pool = NUM_LITS if rng.random() < 0.5 else STR_LITS
        items = ", ".join(rng.sample(pool, rng.randint(1, 3)))
        neg = "not " if rng.random() < 0.3 else ""
        return f"{col(rng)} {neg}in ({items})"
    if depth >= 2:
        return f"{col(rng)} {rng.choice(CMP_OPS)} {rng.choice(NUM_LITS)}"
    a, b = pred(rng, depth + 1), pred(rng, depth + 1)
    j = rng.choice(["and", "or"])
    neg = "not " if rng.random() < 0.25 else ""
    return f"{neg}({a} {j} {b})"


def bool_term(rng: random.Random, depth: int = 0) -> str:
    """A VALUE in a boolean context (round-10 brief #1): SQLite
    coerces it through the numeric rules — bare columns, literals,
    arithmetic, NOT, nested AND/OR."""
    r = rng.random()
    if r < 0.3:
        return col(rng)
    if r < 0.42:
        return rng.choice(NUM_LITS)
    if r < 0.52:
        return rng.choice(STR_LITS)
    if r < 0.57:
        return "null"
    if r < 0.75:
        return (
            f"{rng.choice(INT_COLS)} {rng.choice(['+', '-'])}"
            f" {rng.randint(-2, 3)}"
        )
    if r < 0.88:
        return f"not {col(rng)}"
    if depth == 0:
        other = (
            pred(rng, 2) if rng.random() < 0.5 else bool_term(rng, 1)
        )
        return (
            f"({bool_term(rng, 1)} {rng.choice(['and', 'or'])} {other})"
        )
    return col(rng)


def bool_cond(rng: random.Random) -> str:
    """A whole boolean-context condition mixing value terms with real
    predicates through AND/OR/NOT."""
    parts = [
        bool_term(rng) if rng.random() < 0.6 else pred(rng, 1)
        for _ in range(rng.randint(1, 3))
    ]
    out = parts[0]
    for p in parts[1:]:
        out = f"{out} {rng.choice(['and', 'or'])} {p}"
    if rng.random() < 0.2:
        out = f"not ({out})"
    return out


def agg(rng: random.Random) -> str:
    fn = rng.choice(["sum", "avg", "total", "min", "max", "count"])
    arg = "*" if fn == "count" and rng.random() < 0.4 else scalar(rng, 1)
    out = f"{fn}({arg})"
    if rng.random() < 0.45:
        out += f" filter (where {pred(rng, 1)})"
    return out


def limit_clause(rng: random.Random) -> str:
    r = rng.random()
    if r < 0.5:
        return ""
    n, m = rng.randint(0, 12), rng.randint(0, 5)
    if r < 0.7:
        return f" limit {n}"
    if r < 0.85:
        return f" limit {n}, {m}"
    return f" limit {n} offset {m}"


def order_key(rng: random.Random) -> str:
    k = col(rng)
    if rng.random() < 0.3:
        k += " collate nocase"
    if rng.random() < 0.4:
        k += " desc"
    return k


# --- query shapes --------------------------------------------------------


def q_plain(rng: random.Random) -> str:
    items = ", ".join(
        f"{scalar(rng)} as c{i}" for i in range(rng.randint(1, 3))
    )
    where = f" where {pred(rng)}" if rng.random() < 0.75 else ""
    okeys = ", ".join(order_key(rng) for _ in range(rng.randint(1, 2)))
    return (
        f"select {items} from a{where} "
        f"order by {okeys}, anr{limit_clause(rng)}"
    )


def q_distinct(rng: random.Random) -> str:
    # depth=1 keeps CASE out of DISTINCT items: ORDER BY over a
    # DISTINCT alias of a mixed-class CASE is the one documented
    # residual ordering divergence (dialect._collect_item_alias_classes).
    # Chains stay on guaranteed-INTEGER columns: a chain over a REAL/
    # NUMERIC column maps text rows to one INT result while a real row
    # can equal it (a1+1-7 → -6 vs -6.0), which SQLite's DISTINCT
    # dedups cross-class with an arrival-order representative no
    # distributed engine can reproduce (the same documented conflation
    # as the int/real group-key note in the module docstring).
    n = rng.randint(1, 2)
    items = ", ".join(
        f"{scalar(rng, 1, chain_cols=INT_COLS, distinct_safe=True)} as c{i}"
        for i in range(n)
    )
    okeys = ", ".join(f"c{i}" for i in range(n))
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    return (
        f"select distinct {items} from a{where} "
        f"order by {okeys}{limit_clause(rng)}"
    )


def q_agg(rng: random.Random) -> str:
    g = col(rng) if rng.random() < 0.6 else f"cast({col(rng)} as text)"
    aggs = ", ".join(
        f"{agg(rng)} as s{i}" for i in range(rng.randint(1, 3))
    )
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    having = (
        f" having count(*) {rng.choice(['>=', '>'])} {rng.randint(1, 2)}"
        if rng.random() < 0.35
        else ""
    )
    desc = " desc" if rng.random() < 0.3 else ""
    return (
        f"select {g} as g, {aggs} from a{where} group by {g}{having} "
        f"order by g{desc}{limit_clause(rng)}"
    )


def q_global_agg(rng: random.Random) -> str:
    aggs = ", ".join(
        f"{agg(rng)} as s{i}" for i in range(rng.randint(1, 4))
    )
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    return f"select {aggs} from a{where}"


def q_bare_minmax(rng: random.Random) -> str:
    """SQLite bare-column semantics: with a single min/max aggregate the
    other columns come from the winning row.  Aggregate over anr (unique
    per row) so the winning row — and the byte output — is unique."""
    fn = rng.choice(["min", "max"])
    bare = ", ".join(
        f"{col(rng)} as b{i}" for i in range(rng.randint(1, 2))
    )
    g = rng.choice(["a2", "a3", "anf"])
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    # round 10: other aggregates no longer disable the winning-row
    # rule (probed: max(nr) + count(*) still takes the max row)
    extra = ", count(*) as n" if rng.random() < 0.3 else ""
    return (
        f"select {g} as g, {fn}(anr) as m, {bare}{extra} from a{where} "
        f"group by {g} order by g"
    )


def q_bare_group(rng: random.Random) -> str:
    """No-min/max bare columns (round 10): an aggregate query without
    min/max gives bare non-grouped columns the FIRST row of the group
    in scan order — probed deterministic on the real library."""
    bare = ", ".join(
        f"{col(rng)} as b{i}" for i in range(rng.randint(1, 2))
    )
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    if rng.random() < 0.25:
        return f"select {bare}, count(*) as n from a{where}"
    g = rng.choice(["a2", "a3", "anf"])
    aggs = ""
    if rng.random() < 0.7:
        fn = rng.choice(["count", "sum", "total"])
        arg = "*" if fn == "count" else rng.choice(INT_COLS)
        aggs = f", {fn}({arg}) as s0"
    return (
        f"select {bare}, {g} as g{aggs} from a{where} "
        f"group by {g} order by g"
    )


ROWS_FRAMES = [
    "rows between 1 preceding and current row",
    "rows between 2 preceding and 1 following",
    "rows between unbounded preceding and current row",
    "rows between current row and 2 following",
    "rows between unbounded preceding and unbounded following",
]
GROUPS_FRAMES = [
    "groups between 1 preceding and current row",
    "groups between 2 preceding and 1 following",
    "groups between unbounded preceding and 1 following",
    "groups between current row and unbounded following",
]
GROUPS_EXCLUDE = ["", "", " exclude current row", " exclude group", " exclude ties"]
# ROWS frames: EXCLUDE CURRENT ROW decomposes exactly (frame ⊖ self /
# directional sub-frames); GROUP and TIES over a bounded ROWS edge are
# tie-order-dependent in SQLite itself, so the engine rejects them
# loudly and the fuzzer doesn't generate them (they ARE generated for
# the unbounded-both frame, which lowers through the GROUPS machinery)
ROWS_EXCLUDE = ["", "", " exclude current row", " exclude no others"]
RANGE_FRAMES = [
    "range between 2 preceding and current row",
    "range between 1 preceding and 1 following",
    "range between unbounded preceding and current row",
]
# RANGE EXCLUDE: peers are RANGE CURRENT ROW..CURRENT ROW over the
# value key; the integer-classed keys (anr/anf) unlock the min/max
# directional sub-frames, so all four forms lower
RANGE_EXCLUDE = [
    "",
    " exclude current row",
    " exclude group",
    " exclude ties",
    " exclude no others",
]


def q_window(rng: random.Random) -> str:
    part = rng.choice(["", "partition by a2 ", "partition by anf "])
    fn = rng.choice(["sum", "count", "min", "max", "avg"])
    # one storage class per equal ARG value (chains over int columns,
    # no NUMERIC casts): a window min/max whose frame holds INTEGER 0
    # and REAL 0.0 (x % 1 makes them freely) picks SQLite's
    # first-in-FRAME-order representative, which would need a
    # row_number subquery per window to reproduce — the engine's
    # deterministic integer-preference tiebreak is documented instead
    # (the plain-aggregate arrival tiebreak can't apply: frame order
    # is the window's ORDER BY, not scan order)
    arg = scalar(rng, 1, chain_cols=INT_COLS, distinct_safe=True)
    kind = rng.random()
    if kind < 0.45:
        k = f"{col(rng)}, anr"
        frame = rng.choice(ROWS_FRAMES)
        if frame.endswith("unbounded following"):
            frame += rng.choice(GROUPS_EXCLUDE)
        else:
            frame += rng.choice(ROWS_EXCLUDE)
    elif kind < 0.8:
        k = col(rng)
        frame = rng.choice(GROUPS_FRAMES) + rng.choice(GROUPS_EXCLUDE)
    else:
        k = rng.choice(INT_COLS)
        frame = rng.choice(RANGE_FRAMES) + rng.choice(RANGE_EXCLUDE)
    win = f"{fn}({arg}) over ({part}order by {k} {frame})"
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    return f"select anr, a1, {win} as w from a{where} order by anr"


def q_ranking(rng: random.Random) -> str:
    part = rng.choice(["", "partition by anf "])
    k = order_key(rng)
    fn = rng.choice(
        [
            f"rank() over ({part}order by {k})",
            f"dense_rank() over ({part}order by {k})",
            f"row_number() over ({part}order by {k}, anr)",
            f"ntile(3) over ({part}order by {k}, anr)",
            f"lead(a1) over ({part}order by {k}, anr)",
            f"lag(a1, 2) over ({part}order by {k}, anr)",
        ]
    )
    where = f" where {pred(rng)}" if rng.random() < 0.4 else ""
    return f"select anr, a1, {fn} as w from a{where} order by anr"


def q_join(rng: random.Random) -> str:
    """Two-table join (files → tables a and b): the join condition
    compares classed columns ACROSS tables — equality under storage
    classes, plus a cross-table WHERE.  Total order via both anr's."""
    jk = rng.choice(
        [
            ("a1", "b1"),
            ("a2", "b2"),
            ("a1", "b2"),
            ("anf", "bnf"),
        ]
    )
    kind = rng.choice(["join", "left join"])
    items = ", ".join(
        f"{c} as c{i}"
        for i, c in enumerate(
            rng.sample(["a1", "a2", "b1", "b2", "anr", "bnr"], 3)
        )
    )
    where = (
        f" where {pred(rng)}" if rng.random() < 0.5 else ""
    )
    return (
        f"select {items} from a {kind} b on {jk[0]} = {jk[1]}"
        f"{where} order by anr, bnr{limit_clause(rng)}"
    )


def q_subquery(rng: random.Random) -> str:
    """One-level derived table wrapping aggregate aliases — the r8
    judge-reproduced divergence class (subquery-wrapped REAL sum must
    render 5.0, not 5): the inner scope's item classes propagate to
    the outer scope's projection / WHERE / ORDER BY."""
    kind = rng.random()
    if kind < 0.45:
        # global aggregates inside, aliases (or chains over them) out
        n = rng.randint(1, 3)
        inner = ", ".join(f"{agg(rng)} as s{i}" for i in range(n))
        where = f" where {pred(rng)}" if rng.random() < 0.4 else ""
        outs = []
        for i in range(n):
            if rng.random() < 0.3:
                outs.append(f"s{i} + {rng.randint(-2, 3)} as c{i}")
            else:
                outs.append(f"s{i} as c{i}")
        return (
            f"select {', '.join(outs)} from "
            f"(select {inner} from a{where})"
        )
    if kind < 0.8:
        # grouped inner: outer filters/sorts on the propagated aliases
        g = col(rng)
        inner = (
            f"select {g} as g, {agg(rng)} as s0, count(*) as n0 "
            f"from a group by {g}"
        )
        hav = (
            f" where n0 {rng.choice(['>=', '>'])} {rng.randint(1, 2)}"
            if rng.random() < 0.5
            else ""
        )
        return (
            f"select g, s0 from ({inner}){hav} "
            f"order by g{limit_clause(rng)}"
        )
    # plain projection inner, anr carried through for the total order
    items = ", ".join(
        f"{scalar(rng, 1)} as c{i}" for i in range(rng.randint(1, 2))
    )
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    owhere = f" where {pred_on_anr(rng)}" if rng.random() < 0.3 else ""
    return (
        f"select c0, r from (select {items}, anr as r from a{where})"
        f"{owhere} order by r{limit_clause(rng)}"
    )


def pred_on_anr(rng: random.Random) -> str:
    return f"r {rng.choice(CMP_OPS)} {rng.randint(0, 20)}"


def q_setop(rng: random.Random) -> str:
    """Set operations.  Dedup forms (UNION/INTERSECT/EXCEPT) use the
    SAME column in both branches so equal values share one canonical
    storage class (the module-docstring conflation rule extended
    across branches); UNION ALL mixes columns freely under a branch
    tag + anr total order."""
    op = rng.choice(["union", "union all", "intersect", "except"])
    if op == "union all":
        p1 = f" where {pred(rng)}" if rng.random() < 0.5 else ""
        p2 = f" where {pred(rng)}" if rng.random() < 0.5 else ""
        if rng.random() < 0.3:
            # one aggregate row per branch (classed sums/avgs through
            # a compound — int-class sum in one branch, REAL in the
            # other, must render per branch); UNION ALL only: a real
            # aggregate can land exactly on an integer one's value,
            # which a dedup op would conflate cross-class
            return (
                f"select 1 as t, {agg(rng)} as c0 from a{p1} "
                f"union all select 2, {agg(rng)} from a{p2} "
                f"order by t"
            )
        c1, c2 = col(rng), col(rng)
        return (
            f"select 1 as t, {c1} as c0, anr as r from a{p1} "
            f"union all select 2, {c2}, anr from a{p2} "
            f"order by t, r{limit_clause(rng)}"
        )
    c = col(rng)
    p1 = f" where {pred(rng)}" if rng.random() < 0.6 else ""
    p2 = f" where {pred(rng)}" if rng.random() < 0.6 else ""
    # positional ORDER BY keys like the alias through the ordered-
    # compound wrapper (it used to order rendered strings bytewise)
    ob = rng.choice(["c0", "1"])
    r = rng.random()
    if r < 0.2:
        # literal FROM-less branch (round-10 brief #3): INTEGER 7 and
        # TEXT '7' are DISTINCT rows under SQLite's class-aware
        # identity.  Integer literals only — REAL_TEXTS are never
        # integral, so a literal can't hit the documented cross-class
        # int/real equal-value residue
        lit = rng.choice(
            ["0", "1", "2", "5", "20", "'ab'", "'AB'", "'z'", "''",
             "'2'", "'007'"]
        )
        return (
            f"select {c} as c0 from a{p1} {op} select {lit} "
            f"order by {ob}{limit_clause(rng)}"
        )
    if r < 0.3:
        # pure-literal compound
        lits = rng.sample(
            ["3", "'3'", "1", "'x'", "''", "2", "'2'", "5"], 2
        )
        return (
            f"select {lits[0]} as c0 {op} select {lits[1]} "
            f"order by {ob}"
        )
    return (
        f"select {c} as c0 from a{p1} {op} select {c} from a{p2} "
        f"order by {ob}{limit_clause(rng)}"
    )


def q_multistmt(rng: random.Random) -> str:
    """2-3 ';'-separated statements — reference tests.tcl:191-200:
    every statement's rows flow through ONE serializer in order."""
    parts = [
        rng.choice([q_plain, q_agg, q_global_agg])(rng)
        for _ in range(rng.randint(2, 3))
    ]
    return "; ".join(parts)


def q_distinct_case(rng: random.Random) -> str:
    """CASE inside DISTINCT (the r8 depth guard, dropped): a mixed
    numeric/text CASE alias under DISTINCT must order by value class.
    The text branch is a NON-digit-prefixed string literal: equal
    values cannot straddle storage classes across branches, and the
    dynamic-key ordering of the rendered output never misclassifies
    it as numeric (the documented digit-prefixed-text residue)."""
    c = (
        f"case when {pred(rng, 1)} "
        f"then {scalar(rng, 1, chain_cols=INT_COLS, distinct_safe=True)} "
        f"else {rng.choice(NODIGIT_STR_LITS)} end"
    )
    where = f" where {pred(rng)}" if rng.random() < 0.5 else ""
    return (
        f"select distinct {c} as c0 from a{where} "
        f"order by c0{limit_clause(rng)}"
    )


def q_cte(rng: random.Random) -> str:
    """WITH-wrapped aggregates: the CTE body's alias classes must
    propagate to the outer scope exactly like a derived table's."""
    if rng.random() < 0.5:
        n = rng.randint(1, 2)
        inner = ", ".join(f"{agg(rng)} as s{i}" for i in range(n))
        where = f" where {pred(rng)}" if rng.random() < 0.4 else ""
        outs = ", ".join(f"s{i} as c{i}" for i in range(n))
        return f"with t as (select {inner} from a{where}) select {outs} from t"
    g = col(rng)
    return (
        f"with t as (select {g} as g, {agg(rng)} as s0 from a group by {g}) "
        f"select g, s0 from t order by g{limit_clause(rng)}"
    )


def q_scalar_funcs(rng: random.Random) -> str:
    """Scalar-library composites over classed columns — the r08
    VERDICT's remaining fuzz-grammar gap.  Each form is byte-compared
    against real SQLite, so the dialect's exactness rewrites are on
    trial: typeof() must see the LOAD-TIME storage class ('007' in a
    TEXT column is 'text'), substr() must walk func.c's position-0 /
    negative-Z rules, upper()/lower() must fold ASCII only, printf()
    must coerce like SQLite.  length(123) renders through the text
    conversion on both engines."""
    forms = [
        lambda: f"typeof({col(rng)})",
        lambda: f"substr({col(rng)}, {rng.randint(-4, 4)})",
        lambda: (
            f"substr({col(rng)}, {rng.randint(-4, 4)},"
            f" {rng.randint(-4, 4)})"
        ),
        lambda: f"upper({col(rng)})",
        lambda: f"lower({col(rng)})",
        lambda: f"length({col(rng)})",
        lambda: f"printf('%d|%s', {rng.choice(INT_COLS)}, {col(rng)})",
        lambda: f"printf('%5.2f', {rng.choice(INT_COLS)})",
        lambda: f"abs({rng.choice(INT_COLS)} - 3)",
        lambda: f"coalesce(nullif({col(rng)}, '0'), 'z')",
        lambda: f"upper(substr({col(rng)}, 2, 3))",
        lambda: f"typeof({col(rng)}) || ':' || length({col(rng)})",
        lambda: f"round({col(rng)})",
        lambda: f"round({col(rng)}, {rng.randint(0, 2)})",
        lambda: f"nullif({col(rng)}, {rng.choice(NUM_LITS + STR_LITS)})",
        lambda: f"sign({col(rng)})",
    ]
    items = ", ".join(
        f"{rng.choice(forms)()} as c{i}" for i in range(rng.randint(1, 3))
    )
    where = f" where {pred(rng)}" if rng.random() < 0.4 else ""
    return f"select {items} from a{where} order by anr"


def q_scalar_clauses(rng: random.Random) -> str:
    """Scalar-library calls OUTSIDE the select list — WHERE operands,
    GROUP BY keys, ORDER BY keys — composing the exactness rewrites
    (typeof class CASE, substr/round UDFs, sign) with the affinity
    comparison passes, which must leave the unclassifiable emitted
    text alone."""
    conds = [
        lambda: (
            f"typeof({col(rng)}) ="
            f" '{rng.choice(['integer', 'real', 'text'])}'"
        ),
        lambda: (
            f"length({col(rng)}) {rng.choice(['<', '>', '='])}"
            f" {rng.randint(0, 4)}"
        ),
        lambda: (
            f"substr({col(rng)}, {rng.randint(-2, 2)}, 2) ="
            f" '{rng.choice(['00', 'ab', '2.', '-1'])}'"
        ),
        lambda: f"sign({col(rng)}) = {rng.choice([-1, 0, 1])}",
        lambda: (
            f"round({col(rng)}) {rng.choice(['>', '<='])}"
            f" {rng.randint(-2, 20)}"
        ),
    ]
    r = rng.random()
    if r < 0.45:
        w = " and ".join(rng.choice(conds)() for _ in range(rng.randint(1, 2)))
        return f"select anr, a1 from a where {w} order by anr"
    if r < 0.75:
        g = f"substr({col(rng)}, 1, 1)"
        return (
            f"select {g} as g, count(*) as n from a group by {g}"
            f" order by g, n"
        )
    return (
        f"select anr, {col(rng)} as c0 from a"
        f" order by length({col(rng)}), anr{limit_clause(rng)}"
    )


def q_bool_where(rng: random.Random) -> str:
    """Bare/numeric/text boolean WHERE conditions (round-10 brief #1:
    ``where a1`` is everyday SQLite idiom the engine hard-errored on)."""
    return (
        f"select anr, a1, a2 from a where {bool_cond(rng)} "
        f"order by anr{limit_clause(rng)}"
    )


def q_bool_items(rng: random.Random) -> str:
    """AND/OR/NOT as select items return SQLite's logical 0/1/NULL."""
    items = ", ".join(
        f"{bool_cond(rng)} as c{i}" for i in range(rng.randint(1, 2))
    )
    return f"select anr, {items} from a order by anr"


def q_distinct_collate(rng: random.Random) -> str:
    """Expression-collation propagation (round-10 brief #2): COLLATE
    NOCASE at item level or inside a CASE subtree governs ORDER BY
    order and DISTINCT row identity (first-arrival representative)."""
    c = rng.choice(["a1", "a2", "a3"])
    where = f" where {pred(rng)}" if rng.random() < 0.4 else ""
    d = " desc" if rng.random() < 0.3 else ""
    r = rng.random()
    if r < 0.35:
        return (
            f"select distinct {c} collate nocase as c0 from a{where} "
            f"order by c0{d}{limit_clause(rng)}"
        )
    s1, s2 = rng.choice(NODIGIT_STR_LITS), rng.choice(NODIGIT_STR_LITS)
    if r < 0.6:
        return (
            f"select distinct case when {c} <> {s1} collate nocase "
            f"then {c} else {s2} end as c0 from a{where} "
            f"order by c0{d}{limit_clause(rng)}"
        )
    if r < 0.8:
        # GROUP BY fold with first-arrival representative
        gk = rng.choice([f"{c} collate nocase", None])
        if gk:
            return (
                f"select {gk} as g, count(*) as n from a{where} "
                f"group by {rng.choice(['g', '1'])} order by g{d}"
            )
        return (
            f"select case when {c} <> {s1} collate nocase then {c} "
            f"else {s2} end as g, count(*) as n from a{where} "
            f"group by 1 order by g{d}"
        )
    # comparison collation propagating out of a CASE subtree; the
    # literal is digit-free so the loose dynamic-branch fold is exact
    cmp_lit = rng.choice(NODIGIT_STR_LITS)
    paren = rng.random() < 0.5
    case_sql = (
        f"case when {c} <> {s1} collate nocase then {c} else {s2} end"
    )
    if paren:
        case_sql = f"({case_sql})"
    if rng.random() < 0.5:
        cond = f"{case_sql} {rng.choice(['=', '<>'])} {cmp_lit}"
    else:
        cond = f"{cmp_lit} {rng.choice(['=', '<>'])} {case_sql}"
    return f"select anr, a1 from a where {cond} order by anr"


def q_pred_values(rng: random.Random) -> str:
    """Round-11 brief #1: comparisons/boolean expressions as VALUES —
    aggregate arguments (``sum(a1 > 0)`` is SQLite's conditional
    count), arithmetic operands (``(a1 > 0) + 1``), and scalar
    function arguments (``abs(a1 > 0)``, ``coalesce(a1 > 5, 9)``)."""
    p = lambda: pred(rng, 1) if rng.random() < 0.7 else bool_cond(rng)  # noqa: E731
    r = rng.random()
    if r < 0.4:
        fn = rng.choice(["sum", "avg", "total", "count", "min", "max"])
        body = f"{fn}({p()})"
        if rng.random() < 0.4:
            body += f" filter (where {pred(rng, 1)})"
        extra = f", sum({p()}) as c1" if rng.random() < 0.4 else ""
        return f"select {body} as c0{extra} from a"
    if r < 0.6:
        op = rng.choice(["+", "-", "*"])
        rhs = (
            f"({p()})" if rng.random() < 0.4 else str(rng.randint(-3, 9))
        )
        return (
            f"select anr, ({p()}) {op} {rhs} as c0 from a order by anr"
        )
    if r < 0.75:
        fn = rng.choice(["abs", "length", "coalesce"])
        # coalesce alternative stays INTEGER: a REAL literal would hit
        # the (pre-existing) coalesce class-render gap, not the
        # predicate-value lowering under test
        arg = (
            f"{p()}, {rng.randint(-3, 20)}" if fn == "coalesce" else p()
        )
        return f"select anr, {fn}({arg}) as c0 from a order by anr"
    if r < 0.88:
        return f"select anr, -({p()}) as c0 from a order by anr"
    return (
        f"select group_concat({p()}, ';') as c0 from a"
    )


def q_ordered_derived(rng: random.Random) -> str:
    """Round-11 brief #2: ORDER BY inside a derived table feeding an
    order-sensitive aggregate keys storage classes per scope
    (``group_concat(x) from (select x from a order by x)``)."""
    c = rng.choice(["a1", "a2", "a3"])
    where = f" where {pred(rng, 1)}" if rng.random() < 0.4 else ""
    d = " desc" if rng.random() < 0.35 else ""
    inner = (
        f"select {c} as c, anr from a{where} order by c{d}, anr"
    )
    if rng.random() < 0.25:
        inner += f" limit {rng.randint(1, 8)}"
    if rng.random() < 0.6:
        return f"select group_concat(c, ';') as g from ({inner})"
    return f"select c from ({inner})"


def q_setop_numeric(rng: random.Random) -> str:
    """Round-11 brief #3: INTEGER and REAL compare numerically EQUAL
    in distinct set-op row identity (``7 UNION 7.0`` keeps one row,
    the LAST branch's rendering survives); TEXT stays distinct.
    A chain is all-UNION or all-UNION-ALL (a distinct UNION followed
    by a later UNION ALL is the one documented residue)."""
    base = rng.choice(["7", "2", "-3", "0"])
    variants = [
        base,
        f"{base}.0",
        f"'{base}'",
        f"{base} + 0.0",
        rng.choice(NUM_LITS),
    ]
    op = " union " if rng.random() < 0.75 else " union all "
    n = rng.randint(2, 4)
    if rng.random() < 0.6:
        branches = [
            f"select {rng.choice(variants)} as c0" for _ in range(n)
        ]
    else:
        exprs = [
            "a1",
            "a1 + 0.0",
            "a2",
            rng.choice(variants),
        ]
        branches = [
            f"select {rng.choice(exprs)} as c0 from a" for _ in range(n)
        ]
    ob = ""
    if rng.random() < 0.5:
        ob = " order by 1" + (" desc" if rng.random() < 0.3 else "")
    return op.join(branches) + ob


def q_collate_positions(rng: random.Random) -> str:
    """Round-11 brief #5: COLLATE NOCASE in aggregate arguments,
    BETWEEN, simple-CASE bases, bare items, and explicit GROUP BY."""
    c = rng.choice(["a1", "a2", "a3"])
    s1, s2 = rng.choice(NODIGIT_STR_LITS), rng.choice(NODIGIT_STR_LITS)
    r = rng.random()
    if r < 0.25:
        fn = rng.choice(["min", "max"])
        where = f" where {pred(rng, 1)}" if rng.random() < 0.4 else ""
        return f"select {fn}({c} collate nocase) as m from a{where}"
    if r < 0.4:
        return f"select count(distinct {c} collate nocase) as n from a"
    if r < 0.55:
        lo, hi = sorted([s1, s2])
        neg = "not " if rng.random() < 0.3 else ""
        return (
            f"select anr, {c} from a where {c} {neg}between {lo} "
            f"and {hi} collate nocase order by anr"
        )
    if r < 0.7:
        return (
            f"select anr, case {c} when {s1} collate nocase then 'hit' "
            f"when {s2} then 'lo' else 'miss' end as r from a "
            f"order by anr"
        )
    if r < 0.85:
        d = " desc" if rng.random() < 0.3 else ""
        return f"select {c} collate nocase from a order by 1{d}, {c}"
    return (
        f"select {c} as g, count(*) as n from a "
        f"group by {c} collate nocase order by g"
    )


def q_r12_shapes(rng: random.Random) -> str:
    """Round-12 next-ring shapes: EXISTS as an integer value, COLLATE
    RTRIM / BINARY, COLLATE NOCASE on IN lists and value-position
    comparisons, group_concat(DISTINCT [collate nocase]), VALUES
    tables, a distinct UNION followed by literal UNION ALL branches,
    scalar-subquery arithmetic, min/max over mixed-literal CASEs, and
    CAST of a predicate to REAL."""
    c = rng.choice(["a1", "a2", "a3"])
    s1, s2 = rng.choice(NODIGIT_STR_LITS), rng.choice(NODIGIT_STR_LITS)
    r = rng.random()
    if r < 0.1:
        sub = f"select 1 from a where {pred(rng, 1)}"
        neg = "not " if rng.random() < 0.3 else ""
        if rng.random() < 0.5:
            return f"select {neg}exists({sub}) + {rng.randint(0, 3)} as e"
        return f"select {neg}exists({sub}) as e"
    if r < 0.2:
        coll = rng.choice(["rtrim", "binary"])
        op = rng.choice(["=", "<", ">=", "!="])
        if rng.random() < 0.4:
            return (
                f"select min({c} collate {coll}) as m, "
                f"max({c} collate {coll}) as x from a"
            )
        if coll == "rtrim" and s1 != "''":
            # trailing spaces are what RTRIM ignores — pad the literal
            s1 = s1[:-1] + " " * rng.randint(1, 2) + "'"
        return (
            f"select anr, {c} {op} {s1} collate {coll} as p "
            f"from a order by anr"
        )
    if r < 0.3:
        neg = "not " if rng.random() < 0.3 else ""
        return (
            f"select anr, {c} from a where {c} collate nocase "
            f"{neg}in ({s1}, {s2}) order by anr"
        )
    if r < 0.4:
        op = rng.choice(["=", "<", ">", "<="])
        return (
            f"select anr, {c} {op} {s1} collate nocase as p "
            f"from a order by anr"
        )
    if r < 0.5:
        coll = " collate nocase" if rng.random() < 0.5 else ""
        return f"select group_concat(distinct {c}{coll}) as g from a"
    if r < 0.6:
        vals = ", ".join(
            f"({rng.choice(NUM_LITS)}, {rng.choice(NODIGIT_STR_LITS)})"
            for _ in range(rng.randint(2, 4))
        )
        if rng.random() < 0.5:
            return f"values {vals}"
        return f"select * from (values {vals}) order by 1, 2"
    if r < 0.7:
        lits = ["7", "7.0", "'7'", "2", "2.0", "0"]
        n_u = rng.randint(1, 2)
        branches = [
            f"select {rng.choice(lits)}" for _ in range(n_u + 1)
        ]
        tail = [
            f"select {rng.choice(lits)}"
            for _ in range(rng.randint(1, 2))
        ]
        return " union ".join(branches) + " union all " + (
            " union all ".join(tail)
        )
    if r < 0.8:
        sub = rng.choice(
            [
                f"(select max({c}) from a)",
                f"(select count(*) from a)",
                f"(select min(a1) from a where {pred(rng, 1)})",
            ]
        )
        op = rng.choice(["+", "-", "*"])
        lit = rng.choice(["1", "2.5", "0.0", "3"])
        return f"select {sub} {op} {lit} as s"
    if r < 0.9:
        fn = rng.choice(["min", "max"])
        b1, b2, b3 = (rng.choice(NUM_LITS) for _ in range(3))
        els = f" else {b3}" if rng.random() < 0.7 else ""
        return (
            f"select {fn}(case when a1 = 1 then {b1} "
            f"when a1 = 0 then {b2}{els} end) as m from a"
        )
    tgt = rng.choice(["real", "numeric", "text"])
    return (
        f"select anr, cast(({pred(rng, 1)}) as {tgt}) as p "
        f"from a order by anr"
    )


SHAPES = [
    (q_plain, 5),
    (q_distinct, 2),
    (q_agg, 4),
    (q_global_agg, 2),
    (q_bare_minmax, 2),
    (q_bare_group, 2),
    (q_bool_where, 3),
    (q_bool_items, 2),
    (q_distinct_collate, 2),
    (q_pred_values, 3),
    (q_ordered_derived, 2),
    (q_setop_numeric, 2),
    (q_collate_positions, 2),
    (q_r12_shapes, 3),
    (q_window, 4),
    (q_ranking, 2),
    (q_join, 3),
    (q_subquery, 3),
    (q_setop, 3),
    (q_multistmt, 2),
    (q_distinct_case, 2),
    (q_cte, 2),
    (q_scalar_funcs, 3),
    (q_scalar_clauses, 2),
]
SHAPE_POOL = [fn for fn, w in SHAPES for _ in range(w)]


# --- oracle: real SQLite on an identically-loaded table ------------------


def load_sqlite(
    text: str,
    datatypes: list[str],
    con: sqlite3.Connection | None = None,
    prefix: str = "a",
) -> sqlite3.Connection:
    con = con or sqlite3.connect(":memory:")
    decls = [
        f"{prefix}{i + 1} "
        f"{datatypes[i].upper() if datatypes[i] else 'INTEGER'}"
        for i in range(3)
    ]
    con.execute(
        f"create table {prefix} ({prefix}nr INTEGER PRIMARY KEY, "
        f"{prefix}nf INTEGER, {prefix}0 TEXT, "
        + ", ".join(decls)
        + ")"
    )
    for nr, line in enumerate(text.splitlines(), start=1):
        fields = line.split(",")
        row = [nr, len(fields), line] + [
            fields[i] if i < len(fields) else None for i in range(3)
        ]
        con.execute(
            f"insert into {prefix} values (?,?,?,?,?,?)", row
        )
    return con


def render_sqlite(rows) -> str:
    out_lines = []
    for row in rows:
        cells = []
        for v in row:
            if v is None:
                cells.append("")
            elif isinstance(v, float):
                cells.append(repr(v))
            else:
                cells.append(str(v))
        out_lines.append(" ".join(cells))
    return "\n".join(out_lines)


def run_cli(argv: list[str]) -> str:
    out = io.StringIO()
    rc = cli.run(argv, out=out)
    assert rc == 0, f"CLI failed rc={rc} argv={argv}"
    got = out.getvalue()
    return got[:-1] if got.endswith("\n") else got


# --- the harness ---------------------------------------------------------


@pytest.fixture(scope="module", autouse=True)
def _warm_session(spark):
    yield


def _run_batch(rng: random.Random, n: int, tmp_path, start: int = 0):
    """Generate n scripts; each dataset serves a handful of queries."""
    i = start
    failures = []
    while i < start + n:
        text, datatypes = make_dataset(rng)
        text_b, datatypes_b = make_dataset(rng)
        f = tmp_path / f"fuzz_{i}.csv"
        f.write_text(text)
        fb = tmp_path / f"fuzz_{i}_b.csv"
        fb.write_text(text_b)
        dt_opt = "datatypes=" + ",".join(t or "integer" for t in datatypes)
        dt_opt_b = "datatypes=" + ",".join(
            t or "integer" for t in datatypes_b
        )
        con = load_sqlite(text, datatypes)
        load_sqlite(text_b, datatypes_b, con=con, prefix="b")
        for _ in range(min(8, start + n - i)):
            sql = rng.choice(SHAPE_POOL)(rng)
            # multi-statement scripts: every statement's rows flow
            # through one serializer, in order (generated literals
            # never contain ';', so the split is unambiguous)
            # zero-row statements print nothing; a one-row statement
            # whose row renders EMPTY (e.g. a lone NULL aggregate)
            # prints an empty line — render_sqlite returns '' for
            # both, so distinguish on the row count
            blocks = [
                render_sqlite(rows) if rows else None
                for rows in (
                    con.execute(s).fetchall() for s in sql.split("; ")
                )
            ]
            want = "\n".join(b for b in blocks if b is not None)
            argv = ["-FS", ",", sql, dt_opt, str(f)]
            if " join b " in sql:  # only q_join references table b
                argv += [dt_opt_b, str(fb)]
            try:
                got = run_cli(argv)
            except Exception as exc:  # noqa: BLE001 — collect, then fail
                got = f"<EXCEPTION: {type(exc).__name__}: {str(exc)[:300]}>"
            if got != want:
                failures.append(
                    f"--- script {i} (seed {SEED}) ---\n"
                    f"sql: {sql}\ndatatypes: {datatypes}\n"
                    f"file:\n{text}"
                    f"sqlite:\n{want!r}\npysqawk:\n{got!r}\n"
                )
            i += 1
        con.close()
    if failures:
        import pathlib
        import tempfile

        dump = pathlib.Path(tempfile.gettempdir()) / "sqawk_fuzz_failures.txt"
        dump.write_text("\n".join(failures))
        raise AssertionError(
            f"{len(failures)} divergence(s) (full dump: {dump}):\n"
            + "\n".join(failures[:3])
        )


def test_cli_fuzz_composed(tmp_path):
    rng = random.Random(SEED)
    _run_batch(rng, N_SCRIPTS, tmp_path)


# --- ingestion-option composition fuzzing (round 9, brief #8) -------------
#
# The SQL x ingestion interaction: ragged NF x MNF=crop/expand x
# header=1 x F0=0 x non-comma FS, with the SQLite side loaded through
# the SAME option semantics (sources/base.py build_table, itself
# golden-pinned to lib/classes/table.tcl): storage-class keys over a
# cropped column, group keys over expand-padded NULLs, header-named
# columns in WHERE, a0 presence under F0.

ING_N = int(os.environ.get("SQAWK_FUZZ_ING_N", "120"))
ING_FS = [",", ";", ":"]
HDR_NAMES = ["k1", "k2", "k3", "k4", "k5"]


def make_ragged_dataset(rng: random.Random, fs: str, header: bool):
    """(file text, datatypes, n_header_fields).  Rows 1..5 fields."""
    datatypes = [rng.choice(DATATYPES) for _ in range(3)]
    lines = []
    if header:
        lines.append(fs.join(HDR_NAMES[: rng.randint(2, 5)]))
    for _ in range(rng.randint(8, 18)):
        nf = rng.choice([1, 2, 3, 3, 3, 4, 5])
        lines.append(fs.join(_field(rng) for _ in range(nf)))
    return "\n".join(lines) + "\n", datatypes, (
        len(lines[0].split(fs)) if header else 0
    )


def load_sqlite_opts(
    text: str,
    datatypes: list[str],
    fs: str,
    nf: int,
    mnf: str,
    header: bool,
    f0: bool,
) -> tuple[sqlite3.Connection, list[str]]:
    """Real SQLite loaded through the engine's option semantics
    (sources/base.py build_table): header consumed first, crop
    truncates to NF (anf = post-crop width), expand widens to the max
    record width, per-column declared affinities, NULL padding, a0
    only under F0."""
    rows = text.splitlines()
    header_fields: list[str] = []
    if header:
        header_fields = rows[0].split(fs)
        rows = rows[1:]
    widths = [len(r.split(fs)) for r in rows]
    width = nf if mnf == "crop" else max([nf] + widths)
    names = []
    for i in range(width):
        names.append(
            header_fields[i] if i < len(header_fields) else f"a{i + 1}"
        )
    decls = []
    for i in range(width):
        dt = datatypes[i] if i < len(datatypes) else "integer"
        decls.append(f"{names[i]} {dt.upper() if dt else 'INTEGER'}")
    con = sqlite3.connect(":memory:")
    a0_col = "a0 TEXT, " if f0 else ""
    con.execute(
        f"create table a (anr INTEGER PRIMARY KEY, anf INTEGER, "
        f"{a0_col}" + ", ".join(decls) + ")"
    )
    ph = ",".join("?" * (2 + (1 if f0 else 0) + width))
    for anr, line in enumerate(rows, start=1):
        fields = line.split(fs)
        if mnf == "crop":
            fields = fields[:nf]
        vals = [anr, len(fields)]
        if f0:
            vals.append(line)
        vals += [fields[i] if i < len(fields) else None for i in range(width)]
        con.execute(f"insert into a values ({ph})", vals)
    return con, names


def ing_query(rng: random.Random, cols: list[str], f0: bool) -> str:
    pool = cols + ["anr", "anf"] + (["a0"] if f0 else [])
    c = lambda: rng.choice(pool)  # noqa: E731

    def where() -> str:
        if rng.random() < 0.55:
            lhs = c()
            r = rng.random()
            if r < 0.5:
                return (
                    f" where {lhs} {rng.choice(CMP_OPS)} "
                    f"{rng.choice(NUM_LITS + STR_LITS)}"
                )
            if r < 0.75:
                return f" where {lhs} is {rng.choice(['null', 'not null'])}"
            return f" where {lhs} like '{rng.choice(LIKE_PATS)}'"
        return ""

    r = rng.random()
    if r < 0.4:
        items = ", ".join(
            f"{c()} as c{i}" for i in range(rng.randint(1, 3))
        )
        return f"select {items} from a{where()} order by anr"
    if r < 0.7:
        k = c()
        return (
            f"select {k} as g, count(*) as n, sum({c()}) as s "
            f"from a{where()} group by {k} order by g"
        )
    okey = c()
    return (
        f"select anf as c0, {c()} as c1 from a{where()} "
        f"order by {okey}, anr"
    )


def test_cli_fuzz_ingestion(tmp_path):
    rng = random.Random(SEED + 1)
    failures = []
    i = 0
    while i < ING_N:
        fs = rng.choice(ING_FS)
        header = rng.random() < 0.4
        f0 = rng.random() < 0.7
        nf = rng.randint(2, 4)
        mnf = rng.choice(["crop", "expand"])
        text, datatypes, n_hdr = make_ragged_dataset(rng, fs, header)
        f = tmp_path / f"ing_{i}.csv"
        f.write_text(text)
        con, names = load_sqlite_opts(
            text, datatypes, fs, nf, mnf, header, f0
        )
        opts = [
            "datatypes=" + ",".join(t or "integer" for t in datatypes),
            f"NF={nf}",
            f"MNF={mnf}",
        ]
        if header:
            opts.append("header=1")
        if not f0:
            opts.append("F0=0")
        for _ in range(min(6, ING_N - i)):
            sql = ing_query(rng, names, f0)
            want = render_sqlite(con.execute(sql).fetchall())
            argv = ["-FS", fs, sql, *opts, str(f)]
            try:
                got = run_cli(argv)
            except Exception as exc:  # noqa: BLE001
                got = f"<EXCEPTION: {type(exc).__name__}: {str(exc)[:300]}>"
            if got != want:
                failures.append(
                    f"--- ing script {i} (seed {SEED}) ---\n"
                    f"sql: {sql}\nfs={fs!r} nf={nf} mnf={mnf} "
                    f"header={header} f0={f0} datatypes={datatypes}\n"
                    f"file:\n{text}"
                    f"sqlite:\n{want!r}\npysqawk:\n{got!r}\n"
                )
            i += 1
        con.close()
    if failures:
        import pathlib
        import tempfile

        dump = (
            pathlib.Path(tempfile.gettempdir())
            / "sqawk_fuzz_ing_failures.txt"
        )
        dump.write_text("\n".join(failures))
        raise AssertionError(
            f"{len(failures)} ingestion divergence(s) "
            f"(full dump: {dump}):\n" + "\n".join(failures[:3])
        )
