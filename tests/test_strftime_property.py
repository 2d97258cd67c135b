"""Randomized SQLite date-modifier property test: datetime(tv, mods...)
through the registered UDFs must match the system SQLite for random
modifier chains — including month/year day-overflow rollover and
mixed-sign offsets. Seeded, so failures reproduce."""

from __future__ import annotations

import random
import sqlite3

from pyspark.sql import functions as F  # noqa: F401 — session warm-up

from sqawk_spark.functions import register_udfs

UNITS = [
    "days", "hours", "minutes", "seconds", "months", "years",
    "day", "month", "year",
]
BASES = [
    "2024-02-29 12:30:45",
    "2023-01-31 00:00:00",
    "2024-12-31 23:59:59",
    "2000-03-01 06:07:08",
    "1999-02-28 01:02:03",
]
FIXED_MODS = [
    "start of month", "start of year", "start of day",
    "weekday 0", "weekday 3", "weekday 6",
]


def test_datetime_modifier_chains_match_sqlite(spark):
    register_udfs(spark)
    rng = random.Random(3)
    con = sqlite3.connect(":memory:")
    mods = []
    for _ in range(40):
        n = rng.choice([-25, -13, -1, 0, 1, 2, 11, 13, 100])
        u = rng.choice(UNITS)
        mods.append(f"{'+' if n >= 0 else ''}{n} {u}")
    # fractional counts: SQLite applies the integer part as calendar
    # months/years and the remainder as 30/365 days (date.c) — the
    # ADVICE r04 silent-wrong-answer case
    for _ in range(12):
        n = rng.choice([-2.5, -1.25, -0.5, 0.5, 1.5, 2.75, 0.1, 3.9])
        u = rng.choice(UNITS)
        mods.append(f"{'+' if n >= 0 else ''}{n} {u}")
    mods += FIXED_MODS

    exprs, want = [], []
    for i in range(40):
        base = rng.choice(BASES)
        seq = [rng.choice(mods) for _ in range(rng.randint(1, 3))]
        args = ", ".join(f"'{m}'" for m in seq)
        expr = f"datetime('{base}', {args})"
        exprs.append(expr)
        want.append(con.execute(f"select {expr}").fetchone()[0])

    # one Spark job for all cases
    row = spark.sql(
        "select " + ", ".join(f"{e} as c{i}" for i, e in enumerate(exprs))
    ).first()
    got = [row[f"c{i}"] for i in range(len(exprs))]
    for e, w, g in zip(exprs, want, got):
        assert g == w, f"{e}: spark={g!r} sqlite={w!r}"
