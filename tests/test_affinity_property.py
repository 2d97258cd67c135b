"""Property tests: the affinity layer vs REAL SQLite (stdlib sqlite3).

The reference's whole type system IS SQLite affinity (SURVEY.md §1.3),
so the ground truth is executable: insert the text into a SQLite column
with the declared type, read back `CAST(x AS TEXT)`, and demand our
column-expression canonicalization renders the same string.

Domain bounds (documented divergences, not bugs we're hiding):
- reals are kept in [1e-3, 1e7) with ≤ 10 significant digits — outside
  that, SQLite prints %!.15g ('9.22e+18', 'Inf') while Spark prints
  Java shortest-repr ('9.223372036854776E18', 'Infinity'); none of the
  reference's goldens exercise that range (sqawk_spark/affinity.py
  module docstring records the divergence).
- integers stay within int64 (same %!.15g overflow divergence).
"""

from __future__ import annotations

import sqlite3

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from sqawk_spark.affinity import apply_affinity

from pyspark.sql import functions as F

AFFINITY_DECLS = ["integer", "real", "text", "numeric", ""]

_ws = st.sampled_from(["", " ", "  ", "\t", "\n", " \t "])

# < 1e15: a 16+-digit integer under REAL affinity hits the %!.15g vs
# Java-shortest-repr divergence documented in the module docstring
_int_text = st.builds(
    lambda sign, zeros, n, pre, post: f"{pre}{sign}{zeros}{n}{post}",
    st.sampled_from(["", "+", "-"]),
    st.sampled_from(["", "0", "00"]),
    st.integers(0, 10**15 - 1),
    _ws,
    _ws,
)

_real_text = st.builds(
    lambda sign, whole, frac, pre, post: f"{pre}{sign}{whole}.{frac}{post}",
    st.sampled_from(["", "+", "-"]),
    st.integers(1, 9_999_999),
    st.sampled_from(["", "0", "5", "25", "125", "000", "001"]),
    _ws,
    _ws,
)

_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126),
    max_size=8,
)

_value = st.one_of(_int_text, _real_text, _text)


def sqlite_render(values: list[str], decl: str) -> list[str]:
    con = sqlite3.connect(":memory:")
    con.execute(f"CREATE TABLE t(i INTEGER PRIMARY KEY, x {decl})")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(values))
    )
    out = [
        r[0]
        for r in con.execute("SELECT CAST(x AS TEXT) FROM t ORDER BY i")
    ]
    con.close()
    return out


@pytest.mark.parametrize("decl", AFFINITY_DECLS)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(values=st.lists(_value, min_size=40, max_size=40))
def test_affinity_matches_sqlite(spark, decl, values):
    expected = sqlite_render(values, decl)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, x string"
    )
    got = [
        r["y"]
        for r in df.select(
            "i", apply_affinity(F.col("x"), decl).alias("y")
        )
        .orderBy("i")
        .collect()
    ]
    mismatches = [
        (v, g, e) for v, g, e in zip(values, got, expected) if g != e
    ]
    assert not mismatches, f"decl={decl!r}: {mismatches[:5]}"


def test_affinity_goldens_from_reference(spark):
    """The datatypes-1.* golden semantics (reference tests.tcl:1066-1106)
    as direct cases, plus the whitespace rule."""
    cases = {
        # (value, decl) -> rendered
        ("001", "integer"): "1",
        ("002", "integer"): "2",
        ("c", "integer"): "c",
        ("001", "real"): "1.0",
        ("c", "real"): "c",
        ("001", "text"): "001",
        (" 2 ", "integer"): "2",
        ("1e3", "integer"): "1000",
        (".5", "integer"): "0.5",
        ("5.", "integer"): "5",
        ("-0", "integer"): "0",
        ("", "integer"): "",
        # int64 boundary: lossless integer conversion holds to the max
        ("9223372036854775807", "integer"): "9223372036854775807",
        ("-9223372036854775808", "integer"): "-9223372036854775808",
    }
    rows = [(i, v, d) for i, (v, d) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, x string, d string")
    for (v, d), want in cases.items():
        got = (
            df.filter((F.col("x") == v) & (F.col("d") == d))
            .select(apply_affinity(F.col("x"), d).alias("y"))
            .first()["y"]
        )
        assert got == want, (v, d, got, want)
