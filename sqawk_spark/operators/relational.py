"""Relational operator coverage (SURVEY.md §2.B).

The reference (dbohdan/sqawk) hands user SQL verbatim to SQLite
(``lib/classes/sqawk.tcl:216``), so its query surface is the SQLite
dialect. Each builder below re-expresses one operator class from that
surface as an idiomatic DataFrame plan over the driver's TPC-H-ish test
tables, with a DuckDB oracle proving value-level equivalence.

Scale notes are inline per operator: which joins broadcast, where the
shuffles are, and why the plan survives a 100× scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

# ---------------------------------------------------------------------------
# B1-B3: scan / projection / computed scalar projection
# ---------------------------------------------------------------------------


@query(
    "scan_full",
    oracle="SELECT r_regionkey, r_name FROM region",
)
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 table scan — `select * from a` (reference tests.tcl:556)."""
    t = load_tables(spark, sf_dir, ("region",))
    return t["region"].select("r_regionkey", "r_name")


@query(
    "projection",
    oracle="SELECT c_name, c_acctbal FROM customer",
)
def projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 projection — column pruning reaches the parquet scan
    (ReadSchema carries only the two columns)."""
    t = load_tables(spark, sf_dir, ("customer",))
    return t["customer"].select("c_name", "c_acctbal")


@query(
    "projection_expr",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice * (1 - l_discount), 4) AS revenue,
               round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6)
                   AS revenue_taxed
        FROM lineitem
    """,
)
def projection_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2/B3 expression projection — `sum(a1)/1024.0/1024`-style scalar
    arithmetic (reference README.md:319). Whole-stage-codegen'd."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc, 4).alias("revenue"),
        F.round(disc * (1 + F.col("l_tax")), 6).alias("revenue_taxed"),
    )


@query(
    "select_constant",
    oracle="SELECT 108 AS x, 'sqawk' AS tag",
)
def select_constant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 table-less select — `select 108` (reference tests.tcl:1053)."""
    return spark.sql("SELECT 108 AS x, 'sqawk' AS tag")


# ---------------------------------------------------------------------------
# B4-B5: filter / DISTINCT
# ---------------------------------------------------------------------------


@query(
    "filter_predicates",
    oracle="""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE (o_orderstatus = 'F' OR o_totalprice > 200000.0)
          AND o_orderpriority LIKE '1%'
          AND o_custkey IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
    """,
)
def filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 filter — AND/OR/LIKE/IN predicate mix (reference
    tests.tcl:236, README.md:327). All predicates push to the scan."""
    t = load_tables(spark, sf_dir, ("orders",))
    o = t["orders"]
    return o.filter(
        ((F.col("o_orderstatus") == "F") | (F.col("o_totalprice") > 200000.0))
        & F.col("o_orderpriority").like("1%")
        & F.col("o_custkey").isin(1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
    ).select("o_orderkey", "o_totalprice", "o_orderpriority")


@query(
    "distinct_pairs",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B5 DISTINCT — `select distinct shell from passwd`
    (reference README.md:20). Partial (map-side) distinct runs before
    the shuffle, so the exchange carries only unique pairs."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# B6-B7, B20-B22: joins
# ---------------------------------------------------------------------------


@query(
    "join_inner",
    oracle="""
        SELECT o_orderkey, c_name, o_totalprice
        FROM orders JOIN customer ON o_custkey = c_custkey
        WHERE o_totalprice > 250000.0
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B6 two-way inner equi-join — `a inner join b on a2 = b2`
    (reference tests.tcl:167, examples/hp/tryme.sh:5).

    customer is the small build side; Catalyst broadcasts it below the
    autoBroadcast threshold, else AQE picks SMJ with the filter pushed
    below the join."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    o = t["orders"].filter(F.col("o_totalprice") > 250000.0)
    return o.join(
        t["customer"], o.o_custkey == t["customer"].c_custkey, "inner"
    ).select("o_orderkey", "c_name", "o_totalprice")


@query(
    "join_multiway",
    oracle="""
        SELECT c_mktsegment,
               CAST(count(*) AS BIGINT) AS n_lines,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7 multi-way join — 3 tables (reference tests.tcl:181,
    examples/three-files). Partial-aggregation pushdown: lineitem is
    pre-aggregated per orderkey BEFORE the join (orderkey is the join
    key, so the final per-segment totals are identical), shrinking the
    shuffle-join input ~4× — the rewrite Catalyst doesn't do for you
    and the one that matters most at 100 TB, where lineitem dwarfs
    orders. customer then joins on custkey (broadcast at small SF via
    AQE; shuffle join at scale)."""
    t = load_tables(spark, sf_dir, ("lineitem", "orders", "customer"))
    per_order = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(
            F.count("*").alias("n_l"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "rev_l"
            ),
        )
    )
    j = per_order.join(
        t["orders"], F.col("l_orderkey") == F.col("o_orderkey")
    ).join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy("c_mktsegment").agg(
        F.sum("n_l").alias("n_lines"),
        F.round(F.sum("rev_l"), 4).alias("revenue"),
    )


@query(
    "join_left_outer",
    oracle="""
        SELECT p_partkey, p_name,
               CAST(count(l_orderkey) AS BIGINT) AS n_lineitems
        FROM part LEFT JOIN lineitem ON p_partkey = l_partkey
        GROUP BY p_partkey, p_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 LEFT OUTER join — unmatched parts keep NULL lineitem side;
    count(col) skips NULLs in both engines. The count is pushed below
    the join (aggregate lineitem per partkey first): the outer join
    then matches ~25× fewer rows, and unmatched parts surface as NULL
    counts → coalesce(0) — same result as counting post-join, since
    the join key IS the grouping key of the pushed-down aggregate."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    per_part = (
        t["lineitem"].groupBy("l_partkey").agg(F.count("*").alias("n"))
    )
    j = t["part"].join(
        per_part, F.col("p_partkey") == F.col("l_partkey"), "left"
    )
    return j.select(
        "p_partkey",
        "p_name",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_lineitems"),
    )


@query(
    "join_right_outer",
    oracle="""
        SELECT p_partkey, p_retailprice, l_orderkey, l_linenumber
        FROM lineitem RIGHT JOIN part ON l_partkey = p_partkey
        WHERE p_retailprice > 1900.0
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 RIGHT OUTER join (SQLite ≥ 3.39 dialect surface)."""
    t = load_tables(spark, sf_dir, ("part", "lineitem"))
    j = t["lineitem"].join(
        t["part"], F.col("l_partkey") == F.col("p_partkey"), "right"
    )
    return j.filter(F.col("p_retailprice") > 1900.0).select(
        "p_partkey", "p_retailprice", "l_orderkey", "l_linenumber"
    )


@query(
    "join_full_outer",
    oracle="""
        WITH big_cust AS (
            SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000.0
        ),
        big_orders AS (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_big
            FROM orders WHERE o_totalprice > 300000.0 GROUP BY o_custkey
        )
        SELECT c_custkey, c_name, o_custkey, n_big
        FROM big_cust FULL OUTER JOIN big_orders ON c_custkey = o_custkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20 FULL OUTER join — both sides keep unmatched rows."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big_cust = (
        t["customer"].filter(F.col("c_acctbal") > 9000.0).select("c_custkey", "c_name")
    )
    big_orders = (
        t["orders"]
        .filter(F.col("o_totalprice") > 300000.0)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    return big_cust.join(
        big_orders, big_cust.c_custkey == big_orders.o_custkey, "full"
    ).select("c_custkey", "c_name", "o_custkey", "n_big")


@query(
    "join_semi",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_totalprice > 300000.0
        )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 semi join — EXISTS, as a native left_semi (no row
    duplication, build side only carries the key)."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].filter(F.col("o_totalprice") > 300000.0)
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    oracle="""
        SELECT c_custkey, c_name FROM customer
        WHERE NOT EXISTS (
            SELECT 1 FROM orders WHERE o_custkey = c_custkey
        )
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 anti join — NOT EXISTS as native left_anti."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (
        t["customer"]
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_cross",
    oracle="""
        SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 CROSS JOIN — both inputs are fixed-cardinality dimensions
    (5 × 25); broadcast nested loop, safe at any SF."""
    t = load_tables(spark, sf_dir, ("region", "nation"))
    return t["region"].crossJoin(t["nation"]).select("r_name", "n_name")


@query(
    "join_theta",
    oracle="""
        SELECT a.n_name AS nation_a, b.n_name AS nation_b
        FROM nation a JOIN nation b
          ON a.n_regionkey = b.n_regionkey
         AND a.n_nationkey < b.n_nationkey
    """,
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B21 theta join — non-equi ON condition. The equi part
    (regionkey) still hashes; only the inequality is a post-filter,
    so this is NOT a nested-loop at scale."""
    t = load_tables(spark, sf_dir, ("nation",))
    a = t["nation"].alias("a")
    b = t["nation"].alias("b")
    return a.join(
        b,
        (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
        & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
    ).select(F.col("a.n_name").alias("nation_a"), F.col("b.n_name").alias("nation_b"))


@query(
    "join_broadcast_dim",
    oracle="""
        SELECT n_name, round(sum(s_acctbal), 2) AS total_bal,
               CAST(count(*) AS BIGINT) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join: nation has fixed cardinality 25 at
    every SF, so the hint removes the shuffle on the fact side
    entirely — the plan is a single scan + broadcast + partial agg."""
    t = load_tables(spark, sf_dir, ("supplier", "nation"))
    j = t["supplier"].join(
        F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return j.groupBy("n_name").agg(
        F.round(F.sum("s_acctbal"), 2).alias("total_bal"),
        F.count("*").alias("n_suppliers"),
    )


# ---------------------------------------------------------------------------
# B9-B11, B26: aggregation
# ---------------------------------------------------------------------------


@query(
    "flagship_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               round(sum(l_extendedprice), 2) AS sum_base_price,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
               sum(l_quantity) / count(*) AS avg_qty,
               round(sum(l_extendedprice), 2) / count(*) AS avg_price,
               CAST(count(*) AS BIGINT) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship query (TPC-H Q1 shape): B4 filter + B9 grouped agg over
    the fact table. Hash aggregate with map-side partials — the shuffle
    carries only (4 groups × partitions) rows. Scales linearly."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    li = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("sum_disc_price"),
        (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
        (F.round(F.sum("l_extendedprice"), 2) / F.count("*")).alias("avg_price"),
        F.count("*").alias("count_order"),
    )


@query(
    "groupby_agg",
    oracle="""
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_price,
               round(min(o_totalprice), 2) AS min_price,
               round(max(o_totalprice), 2) AS max_price,
               round(sum(o_totalprice), 2) / count(*) AS avg_price
        FROM orders GROUP BY o_orderpriority
    """,
)
def groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9 grouped aggregation — `select a1, sum(a2) … group by a1`
    (reference README.md:412)."""
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.min("o_totalprice"), 2).alias("min_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
        (F.round(F.sum("o_totalprice"), 2) / F.count("*")).alias("avg_price"),
    )


@query(
    "groupby_having",
    oracle="""
        SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_custkey HAVING count(*) > 5
    """,
)
def groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B10 HAVING — `having count(*) > 1` (reference README.md:397);
    post-aggregation filter, runs after the final merge agg."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") > 5)
    )


@query(
    "global_agg",
    oracle="""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               round(sum(l_quantity), 2) AS total_qty,
               round(min(l_extendedprice), 2) AS min_price,
               round(max(l_extendedprice), 2) AS max_price,
               round(sum(l_discount), 2) / count(*) AS avg_discount
        FROM lineitem
    """,
)
def global_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 global aggregate — `select count(*) from a`
    (reference README.md:323, tests.tcl:520). Single-row result via
    partial + final agg; no groupBy shuffle of raw rows."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        (F.round(F.sum("l_discount"), 2) / F.count("*")).alias("avg_discount"),
    )


@query(
    "bool_as_int_agg",
    oracle="""
        SELECT CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END)
                   AS BIGINT) AS qty_gt,
               CAST(SUM(CASE WHEN l_discount >= 0.05 AND l_tax > 0.03
                   THEN 1 ELSE 0 END) AS BIGINT) AS disc_tax,
               CAST(SUM(CASE WHEN NOT (l_returnflag = 'A')
                   THEN 1 ELSE 0 END) AS BIGINT) AS not_a
        FROM lineitem
    """,
)
def bool_as_int_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 — ``sum(x > 0)`` is SQLite's idiomatic conditional count:
    comparison results are 0/1 INTEGERS in any value position
    (reference executes verbatim SQLite SQL, lib/classes/sqawk.tcl:216;
    VERDICT r10 "What's wrong" #1).  Routed through rewrite_statement
    so the driver pins the dialect's predicate-value lowering, not a
    hand-built equivalent (probe battery: tests/probe_r11.py)."""
    from sqawk_spark.dialect import rewrite_statement

    load_tables(spark, sf_dir, ("lineitem",))
    return spark.sql(
        rewrite_statement(
            "select sum(l_quantity > 25) as qty_gt, "
            "sum(l_discount >= 0.05 and l_tax > 0.03) as disc_tax, "
            "sum(not (l_returnflag = 'A')) as not_a from lineitem"
        )
    )


@query(
    "bool_as_int_arith",
    oracle="""
        SELECT o_orderkey,
               CAST(o_totalprice > 150000 AS INTEGER)
                   + CAST(o_orderpriority = '1-URGENT' AS INTEGER)
                   AS flags,
               abs(CAST(o_totalprice > 150000 AS INTEGER)) * 5 AS amp
        FROM orders ORDER BY o_orderkey LIMIT 200
    """,
)
def bool_as_int_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 — comparison results as arithmetic operands and function
    arguments: ``(x > 0) + 1`` / ``abs(x > 0)`` are integer expressions
    in SQLite and previously hard-errored as Spark booleans (VERDICT
    r10 "What's wrong" #4).  Same rewrite_statement routing as
    bool_as_int_agg."""
    from sqawk_spark.dialect import rewrite_statement

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        rewrite_statement(
            "select o_orderkey, "
            "(o_totalprice > 150000) + (o_orderpriority = '1-URGENT')"
            " as flags, "
            "abs(o_totalprice > 150000) * 5 as amp "
            "from orders order by o_orderkey limit 200"
        )
    )


@query(
    "collate_fold_positions",
    oracle="""
        SELECT CAST(COUNT(DISTINCT lower(CASE WHEN p_partkey % 2 = 0
                   THEN p_type ELSE lower(p_type) END)) AS BIGINT)
                   AS dc,
               CAST(COUNT(*) AS BIGINT) AS rt,
               min(p_name) AS mc
        FROM part
    """,
)
def collate_fold_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 — COLLATE in aggregate arguments and value-position
    comparisons (round-12 probe ring): ``count(distinct x collate
    nocase)`` counts ASCII-folded values, ``=`` under COLLATE RTRIM
    ignores trailing spaces (``x || '  ' = x collate rtrim`` is true
    on every row), and ``min(x collate nocase)`` picks by the folded
    key while rendering the original value.  Routed through
    rewrite_statement so the driver pins the dialect lowering
    (probe battery: tests/probe_r12.py)."""
    from sqawk_spark.dialect import rewrite_statement

    load_tables(spark, sf_dir, ("part",))
    return spark.sql(
        rewrite_statement(
            "select count(distinct (case when p_partkey % 2 = 0 "
            "then p_type else lower(p_type) end) collate nocase)"
            " as dc, "
            "sum((p_brand || '  ') = p_brand collate rtrim) as rt, "
            "min(p_name collate nocase) as mc from part"
        )
    )


@query(
    "exists_as_int_value",
    oracle="""
        SELECT CAST(EXISTS(SELECT 1 FROM orders
                   WHERE o_totalprice > 100000) AS INTEGER) + 1
                   AS big,
               CAST(NOT EXISTS(SELECT 1 FROM orders
                   WHERE o_totalprice < 0) AS INTEGER) AS none_neg,
               CAST(EXISTS(SELECT 1 FROM orders
                   WHERE o_orderpriority = '1-URGENT') AS INTEGER) * 5
                   AS amp
    """,
)
def exists_as_int_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16/B18 — EXISTS as a 0/1 INTEGER value in arithmetic (SQLite
    lang_expr: EXISTS yields an integer usable anywhere a number
    goes); previously ``exists(...) + 1`` hard-errored through
    Spark's higher-order ``exists`` function (round-12 probe)."""
    from sqawk_spark.dialect import rewrite_statement

    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        rewrite_statement(
            "select exists(select 1 from orders "
            "where o_totalprice > 100000) + 1 as big, "
            "(not exists(select 1 from orders "
            "where o_totalprice < 0)) + 0 as none_neg, "
            "exists(select 1 from orders "
            "where o_orderpriority = '1-URGENT') * 5 as amp"
        )
    )


@query(
    "setop_value_identity_mixed",
    oracle="""
        SELECT '7.0' AS v UNION ALL SELECT '7' UNION ALL SELECT '2'
    """,
)
def setop_value_identity_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 — a distinct UNION followed by UNION ALL branches:
    left-associativity dedups the prefix by NUMERIC value (INTEGER 7
    and REAL 7.0 are one row, last-arrival '7.0' survives in b-tree
    key order) and the tail appends in statement order — SQLite's
    temp-b-tree semantics, was the documented round-11 residue
    (round-12 probe: ``7 union 7.0 union all '7'`` prints 7.0, 7)."""
    from sqawk_spark.dialect import rewrite_statement

    return spark.sql(
        rewrite_statement(
            "select 7 as v union select 7.0 union all select '7' "
            "union all select 2",
            # the set-op branch renderer runs under the class pass,
            # which no-ops on an empty catalog; literal-only queries
            # still need it entered (the CLI always has loaded columns)
            classes={"v": "dynamic"},
        )
    )


@query(
    "count_distinct",
    oracle="""
        SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_parts,
               CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
    """,
)
def count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 aggregate DISTINCT — Catalyst expands multi-distinct into an
    expand + two-phase agg; exact (approx_count_distinct is the scale
    escape hatch, kept out of the oracle-checked path)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count("*").alias("n_rows"),
    )


@query(
    "group_concat",
    oracle="""
        SELECT n_regionkey,
               string_agg(n_name, ',' ORDER BY n_name) AS nations
        FROM nation GROUP BY n_regionkey
    """,
)
def group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B11 `group_concat` (SQLite dialect) — collect_list + sort +
    concat_ws; ordered inside the group for determinism."""
    t = load_tables(spark, sf_dir, ("nation",))
    return (
        t["nation"]
        .groupBy("n_regionkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations")
        )
    )


# ---------------------------------------------------------------------------
# B12-B14: order by / limit
# ---------------------------------------------------------------------------


@query(
    "orderby_multi",
    oracle="""
        SELECT s_suppkey, s_name, s_acctbal
        FROM supplier ORDER BY s_acctbal DESC, s_suppkey
    """,
)
def orderby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 ORDER BY — multi-key with direction mix (reference
    README.md:20, tests.tcl:169). Range-partitioned total sort."""
    t = load_tables(spark, sf_dir, ("supplier",))
    return (
        t["supplier"]
        .orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


@query(
    "topk_limit",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 LIMIT — ORDER BY + LIMIT compiles to TakeOrderedAndProject
    (per-partition top-k, then merge of k·partitions rows — no total
    sort, no full shuffle). Unique tie-break keeps it deterministic."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select("o_orderkey", "o_totalprice")
        .limit(10)
    )


@query(
    "limit_offset",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 LIMIT/OFFSET — via Spark SQL (OFFSET is native in 3.4+)."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10 OFFSET 5
        """
    )


@query("order_random", oracle=None)
def order_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B13 nondeterministic shuffle — `order by random()` (reference
    README.md:331). No oracle by nature; driver rows-only check."""
    t = load_tables(spark, sf_dir, ("nation",))
    return t["nation"].orderBy(F.rand()).select("n_nationkey", "n_name")


# ---------------------------------------------------------------------------
# B15: set operations
# ---------------------------------------------------------------------------


@query(
    "set_union_all",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 UNION ALL — no shuffle at all (pure concatenation of
    partitions)."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.unionAll(b)


@query(
    "set_union",
    oracle="""
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 UNION (distinct) — union + hash distinct."""
    t = load_tables(spark, sf_dir, ("customer", "supplier"))
    a = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    b = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return a.union(b).distinct()


@query(
    "set_intersect",
    oracle="""
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000.0
        INTERSECT
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000.0
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 INTERSECT — compiles to a left-semi over distinct inputs."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = (
        t["customer"]
        .filter(F.col("c_acctbal") > 5000.0)
        .select(F.col("c_custkey").alias("custkey"))
    )
    b = (
        t["orders"]
        .filter(F.col("o_totalprice") > 200000.0)
        .select(F.col("o_custkey").alias("custkey"))
    )
    return a.intersect(b)


@query(
    "set_except",
    oracle="""
        SELECT c_custkey AS custkey FROM customer
        EXCEPT
        SELECT o_custkey AS custkey FROM orders
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 EXCEPT — left-anti over distinct inputs."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    a = t["customer"].select(F.col("c_custkey").alias("custkey"))
    b = t["orders"].select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b)


# ---------------------------------------------------------------------------
# B16-B17: subqueries / CTE
# ---------------------------------------------------------------------------


@query(
    "subquery_in",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0
        )
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 IN subquery — decorrelates to a left-semi join."""
    load_tables(spark, sf_dir, ("orders", "customer"))
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_acctbal > 9500.0
        )
        """
    )


@query(
    "subquery_scalar",
    oracle="""
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 scalar subquery — single-row broadcast into the filter."""
    load_tables(spark, sf_dir, ("orders",))
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 2 * (SELECT avg(o_totalprice) FROM orders)
        """
    )


@query(
    "subquery_exists_correlated",
    oracle="""
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
        ) AND c_acctbal < 0.0
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16 correlated EXISTS — Catalyst decorrelates to left-semi."""
    load_tables(spark, sf_dir, ("customer", "orders"))
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
        ) AND c_acctbal < 0.0
        """
    )


@query(
    "cte_top_suppliers",
    oracle="""
        WITH supplier_revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, revenue
        FROM supplier JOIN supplier_revenue ON s_suppkey = l_suppkey
        WHERE revenue > (
            SELECT avg(revenue) FROM supplier_revenue
        )
    """,
)
def cte_top_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B17 CTE + scalar subquery over it (TPC-H Q15 shape)."""
    load_tables(spark, sf_dir, ("supplier", "lineitem"))
    return spark.sql(
        """
        WITH supplier_revenue AS (
            SELECT l_suppkey,
                   round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
            FROM lineitem GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, revenue
        FROM supplier JOIN supplier_revenue ON s_suppkey = l_suppkey
        WHERE revenue > (
            SELECT avg(revenue) FROM supplier_revenue
        )
        """
    )


# ---------------------------------------------------------------------------
# B18, B24: scalar expression surface
# ---------------------------------------------------------------------------


@query(
    "case_cast",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_totalprice < 100000.0 THEN 'small'
                    WHEN o_totalprice < 250000.0 THEN 'medium'
                    ELSE 'large' END AS bucket,
               CAST(trunc(o_totalprice) AS BIGINT) AS price_int,
               CAST(o_orderkey AS VARCHAR) AS key_str
        FROM orders
    """,
)
def case_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 CASE / CAST — searched CASE and type casts.

    Note: CAST(double AS BIGINT) truncates toward zero in Spark and
    SQLite, but DuckDB *rounds* — the oracle spells trunc() out."""
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000.0, "small")
        .when(F.col("o_totalprice") < 250000.0, "medium")
        .otherwise("large")
        .alias("bucket"),
        F.col("o_totalprice").cast("long").alias("price_int"),
        F.col("o_orderkey").cast("string").alias("key_str"),
    )


@query(
    "string_funcs",
    oracle="""
        SELECT p_partkey,
               CAST(length(p_name) AS INTEGER) AS name_len,
               upper(p_brand) AS brand_upper,
               lower(p_type) AS type_lower,
               substr(p_name, 1, 5) AS name_head,
               replace(p_type, ' ', '_') AS type_snake,
               CAST(instr(p_type, 'BRUSHED') AS INTEGER) AS brushed_at,
               trim(concat(' ', p_brand, ' ')) AS brand_trim,
               concat(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size
        FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 string library — length/upper/lower/substr/replace/instr/
    trim/concat (`printf` analog: format_string, see math_funcs).
    Reference registers these via SQLite core (SURVEY §2.B24)."""
    t = load_tables(spark, sf_dir, ("part",))
    return t["part"].select(
        "p_partkey",
        F.length("p_name").alias("name_len"),
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.instr("p_type", "BRUSHED").alias("brushed_at"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
        F.concat(
            F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")
        ).alias("brand_size"),
    )


@query(
    "math_funcs",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               round(abs(l_discount - 0.05), 4) AS disc_dev,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(l_partkey % 7 AS BIGINT) AS part_mod,
               round(sqrt(l_quantity), 4) AS qty_sqrt,
               round(power(l_quantity, 2), 2) AS qty_sq,
               printf('%03d', CAST(l_linenumber AS INTEGER)) AS line_padded
        FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 math library + printf (`printf("%03d", a1)` — reference
    tests.tcl:1079 → format_string)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.floor("l_extendedprice").alias("price_floor"),
        (F.col("l_partkey") % 7).alias("part_mod"),
        F.round(F.sqrt("l_quantity"), 4).alias("qty_sqrt"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.format_string("%03d", F.col("l_linenumber")).alias("line_padded"),
    )


@query(
    "date_funcs",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INTEGER) AS order_year,
               CAST(month(o_orderdate) AS INTEGER) AS order_month,
               CAST(day(o_orderdate) AS INTEGER) AS order_day,
               strftime(o_orderdate, '%Y-%m') AS order_ym,
               strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start
        FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 date/time — SQLite `strftime`/`date` analogs via
    year/month/day/date_format/date_trunc (format-token translation:
    %Y-%m ↔ yyyy-MM)."""
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].select(
        "o_orderkey",
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.dayofmonth("o_orderdate").alias("order_day"),
        F.date_format("o_orderdate", "yyyy-MM").alias("order_ym"),
        F.date_format(F.date_trunc("month", F.col("o_orderdate")), "yyyy-MM-dd").alias(
            "month_start"
        ),
    )


@query(
    "coalesce_nullif",
    oracle="""
        SELECT c_custkey,
               coalesce(o_cnt, 0) AS n_orders,
               nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
               CASE WHEN o_cnt IS NULL THEN 'inactive' ELSE 'active' END
                   AS activity
        FROM customer LEFT JOIN (
            SELECT o_custkey, CAST(count(*) AS BIGINT) AS o_cnt
            FROM orders GROUP BY o_custkey
        ) ON c_custkey = o_custkey
    """,
)
def coalesce_nullif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 coalesce/ifnull/nullif/iif over outer-join NULLs."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    cnt = t["orders"].groupBy("o_custkey").agg(F.count("*").alias("o_cnt"))
    j = t["customer"].join(cnt, F.col("c_custkey") == F.col("o_custkey"), "left")
    return j.select(
        "c_custkey",
        F.coalesce(F.col("o_cnt"), F.lit(0).cast("long")).alias("n_orders"),
        F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")).alias("seg_or_null"),
        F.when(F.col("o_cnt").isNull(), "inactive").otherwise("active").alias(
            "activity"
        ),
    )


@query(
    "regex_funcs",
    oracle="""
        SELECT doc_id,
               regexp_replace(lang, '^(en|es)$', 'western', 'g') AS lang_grouped,
               regexp_extract(source, '([0-9]+)', 1) AS source_num
        FROM documents
        WHERE regexp_matches(text, 'join.*filter|filter.*join')
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B8 custom scalar functions — the reference registers Tcl
    `regexp`/`regsub` UDFs (sqawk-dev.tcl:199-215, tests.tcl:1129-1137);
    natively these are rlike / regexp_replace / regexp_extract."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (
        t["documents"]
        .filter(F.col("text").rlike("join.*filter|filter.*join"))
        .select(
            "doc_id",
            F.regexp_replace("lang", "^(en|es)$", "western").alias("lang_grouped"),
            F.regexp_extract("source", "([0-9]+)", 1).alias("source_num"),
        )
    )


@query(
    "glob_like",
    oracle="""
        SELECT p_partkey, p_name FROM part
        WHERE p_name LIKE '%steel%' OR p_name GLOB '*metallic*'
    """,
)
def glob_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18 LIKE / GLOB — GLOB translated to an anchored regex
    (SQLite glob: * ? [..]; case-sensitive like LIKE here)."""
    t = load_tables(spark, sf_dir, ("part",))
    return (
        t["part"]
        .filter(
            F.col("p_name").like("%steel%")
            | F.col("p_name").rlike("^.*metallic.*$")
        )
        .select("p_partkey", "p_name")
    )


# ---------------------------------------------------------------------------
# B19: window functions
# ---------------------------------------------------------------------------


@query(
    "window_rank",
    oracle="""
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(row_number() OVER w AS INTEGER) AS rn,
               CAST(rank() OVER w2 AS INTEGER) AS rnk,
               CAST(dense_rank() OVER w2 AS INTEGER) AS drnk
        FROM lineitem
        WINDOW w AS (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber),
               w2 AS (PARTITION BY l_returnflag ORDER BY l_extendedprice DESC)
        QUALIFY rn <= 100
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 ranking windows — row_number/rank/dense_rank (SQLite ≥3.25
    dialect), per-group top-100.

    l_returnflag has THREE distinct values, so a naive single window
    over it drags every row into a 3-partition sort — fine at sf0.1,
    a dead cluster at 100 TB. r11 salted the key for phase 1; r12
    drops the salt (measured: one exchange instead of two, one window
    phase less) because Spark 3.5+'s WindowGroupLimit already does
    the salt's job: the rank-filter plan carries a PARTIAL
    WindowGroupLimit BEFORE the exchange, so every map task emits at
    most 100 rows per flag and the flag exchange moves
    tasks×100×|flags| candidate rows, never the corpus (plan pin in
    tests/test_plans.py).

    The phase split itself stays, and its correctness argument is the
    r11 one: any row priced strictly above an rn≤100 survivor has a
    smaller rn and therefore also survives, so rank/dense_rank
    computed OVER THE SURVIVORS equal their global values — which is
    what lets the rn filter run before the w2 windows (the optimizer
    could not legally push a group limit below them itself)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    order = (F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber")
    cols = ("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")

    w = W.partitionBy("l_returnflag").orderBy(*order)
    w2 = W.partitionBy("l_returnflag").orderBy(F.col("l_extendedprice").desc())
    cand = (
        t["lineitem"]
        .select(*cols)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 100)
    )
    return cand.select(
        *cols,
        "rn",
        F.rank().over(w2).alias("rnk"),
        F.dense_rank().over(w2).alias("drnk"),
    )


@query(
    "window_running_agg",
    oracle="""
        SELECT l_suppkey, l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (
                   PARTITION BY l_suppkey
                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 2) AS running_qty,
               sum(l_quantity) OVER w4 / count(*) OVER w4 AS moving_avg_qty
        FROM lineitem
        WINDOW w4 AS (PARTITION BY l_suppkey
                      ORDER BY l_shipdate, l_orderkey, l_linenumber
                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    """,
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 aggregates OVER with ROWS frames — running sum + moving
    average. Unique ORDER BY tie-break makes frames deterministic."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    order = [F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber")]
    w_run = (
        W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    )
    w_mov = W.partitionBy("l_suppkey").orderBy(*order).rowsBetween(-3, 0)
    return t["lineitem"].select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.sum("l_quantity").over(w_run), 2).alias("running_qty"),
        (F.sum("l_quantity").over(w_mov) / F.count("*").over(w_mov)).alias(
            "moving_avg_qty"
        ),
    )


@query(
    "window_lead_lag",
    oracle="""
        SELECT o_custkey, o_orderkey,
               round(o_totalprice, 2) AS price,
               round(lag(o_totalprice) OVER w, 2) AS prev_price,
               round(lead(o_totalprice) OVER w, 2) AS next_price,
               round(first_value(o_totalprice) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ), 2) AS first_price,
               round(last_value(o_totalprice) OVER (
                   w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ), 2) AS last_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 analytic windows — lead/lag/first_value/last_value with an
    explicit full frame (last_value defaults to a running frame in both
    engines, so the frame is pinned)."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("price"),
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w_full), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(w_full), 2).alias("last_price"),
    )


@query(
    "window_ntile",
    oracle="""
        SELECT c_custkey,
               CAST(ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey)
                    AS INTEGER) AS balance_quartile
        FROM customer
    """,
)
def window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 ntile — global quartiles (single-partition window; fine for
    dimension-sized inputs, fact-table ntile would partition first)."""
    t = load_tables(spark, sf_dir, ("customer",))
    w = W.orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return t["customer"].select(
        "c_custkey", F.ntile(4).over(w).alias("balance_quartile")
    )


@query(
    "window_range_frame",
    oracle="""
        SELECT p_partkey, p_size,
               CAST(count(*) OVER (
                   ORDER BY p_size
                   RANGE BETWEEN 2 PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS n_similar_size
        FROM part
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 RANGE frame — value-based frame (deterministic even with
    duplicate ORDER BY values, unlike ROWS)."""
    t = load_tables(spark, sf_dir, ("part",))
    w = W.orderBy("p_size").rangeBetween(-2, 0)
    return t["part"].select(
        "p_partkey", "p_size", F.count("*").over(w).alias("n_similar_size")
    )


@query(
    "window_groups_frame",
    oracle="""
        WITH r AS (
            SELECT p_partkey, p_size, p_brand,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                   dense_rank() OVER (
                       PARTITION BY p_brand ORDER BY p_size
                   ) AS grp
            FROM part
        )
        SELECT p_partkey, p_size,
               CAST(sum(cents) OVER (
                   PARTITION BY p_brand ORDER BY grp
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
               ) AS BIGINT) AS grp_cents
        FROM r
    """,
)
def window_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 GROUPS frame (SQLite ≥ 3.28) — frames counted in PEER
    GROUPS (distinct ORDER BY values), which Spark lacks natively
    (and DuckDB also rejects: "GROUPS mode ... not implemented yet").

    Emulated exactly the way the dialect rewriter lowers it for CLI
    scripts (dialect.py:rewrite_groups_frames): ``dense_rank()`` over
    the same window numbers the peer groups consecutively, so a RANGE
    frame of the same bounds over the rank spans precisely the peer
    groups a GROUPS frame would. The oracle runs the same
    construction in DuckDB (value-level cross-engine check); the
    GROUPS *semantics* are proven against real SQLite by the CLI
    golden test_groups_frame_matches_sqlite. Sum in integer cents:
    partial-agg order then can't produce float drift."""
    t = load_tables(spark, sf_dir, ("part",))
    wr = W.partitionBy("p_brand").orderBy("p_size")
    ranked = t["part"].select(
        "p_partkey",
        "p_size",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        F.dense_rank().over(wr).alias("grp"),
    )
    wf = W.partitionBy("p_brand").orderBy("grp").rangeBetween(-1, 1)
    return ranked.select(
        "p_partkey",
        "p_size",
        F.sum("cents").over(wf).alias("grp_cents"),
    )


# ---------------------------------------------------------------------------
# B23: grouping sets / rollup / cube (Spark superset; SQLite lacks these)
# ---------------------------------------------------------------------------


@query(
    "rollup_agg",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2) AS sum_qty,
               CAST(count(*) AS BIGINT) AS n
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 ROLLUP — hierarchy totals (superset of the reference:
    SQLite has no ROLLUP; Spark gets it free)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n"),
        )
    )


@query(
    "cube_agg",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               round(sum(o_totalprice), 2) AS sum_price
        FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 CUBE — all grouping-set combinations."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (
        t["orders"]
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "pivot_agg",
    oracle="""
        SELECT l_returnflag,
               round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2)
                   AS qty_O,
               round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2)
                   AS qty_F
        FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot — Spark-native `pivot` with pinned values (single-pass;
    equivalent to conditional aggregation in the oracle)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@query(
    "tpch_q5_local_supplier_volume",
    oracle="""
        SELECT n.n_name AS nation,
               round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                          AS DOUBLE), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — local supplier volume: a six-way star join
    with a mixed broadcast/shuffle strategy.

    The canonical plan Catalyst should pick and AQE confirm: region
    and nation broadcast (fixed cardinality), supplier and customer
    broadcast at low SF or shuffle at high, and the two fact tables
    (orders filtered by date — pushed to the scan — and lineitem)
    shuffle on the join keys with the revenue aggregate partial
    map-side. The c_nationkey = s_nationkey condition is the
    interesting part: it correlates the two dimension legs, which a
    naive plan would turn into a post-join filter over a much larger
    intermediate."""
    t = load_tables(
        spark, sf_dir,
        ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    r = F.broadcast(t["region"].filter(F.col("r_name") == "ASIA"))
    n = F.broadcast(t["nation"])
    revenue = F.sum(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t["supplier"],
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(revenue, 2).alias("revenue"))
    )


@query(
    "merge_upsert_orders",
    oracle="""
        WITH updates AS (
            SELECT o_orderkey,
                   round(o_totalprice * 1.1, 3) AS o_totalprice,
                   'U' AS o_orderstatus
            FROM orders WHERE o_orderkey % 10 = 0
        ),
        inserts AS (
            SELECT o_orderkey + 1000000 AS o_orderkey,
                   round(o_totalprice, 2) AS o_totalprice,
                   'N' AS o_orderstatus
            FROM orders WHERE o_orderkey % 1000 = 0
        ),
        batch AS (SELECT * FROM updates UNION ALL SELECT * FROM inserts)
        SELECT o_orderkey,
               coalesce(b.o_totalprice, round(o.o_totalprice, 2))
                   AS o_totalprice,
               coalesce(b.o_orderstatus, o.o_orderstatus) AS o_orderstatus
        FROM (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders) o
        FULL OUTER JOIN batch b USING (o_orderkey)
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO (CDC upsert) — the warehouse primitive every
    incremental pipeline runs: a change batch (updates to existing
    keys + brand-new keys) merged into the base table; matched rows
    take the batch's values, unmatched batch rows insert, untouched
    base rows pass through.

    Expressed as ONE full-outer join on the key with coalesce — the
    lowering Delta/Iceberg MERGE compiles to when no file-level
    pruning applies. The change batch here is derived deterministically
    from the base (keys %10 as updates at +10% price, rounded to the product's true 3-decimal width to dodge cross-engine tie-rounding, keys %1000
    shifted as inserts) so both engines construct the identical batch.
    At scale: one key-keyed shuffle join; AQE broadcasts the batch
    when it is small, which is the common CDC shape."""
    t = load_tables(spark, sf_dir, ("orders",))
    base = t["orders"].select(
        "o_orderkey",
        F.round("o_totalprice", 2).alias("b_price"),
        F.col("o_orderstatus").alias("b_status"),
    )
    updates = t["orders"].filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 1.1, 3).alias("u_price"),
        F.lit("U").alias("u_status"),
    )
    inserts = t["orders"].filter(F.col("o_orderkey") % 1000 == 0).select(
        (F.col("o_orderkey") + 1_000_000).alias("o_orderkey"),
        F.round("o_totalprice", 2).alias("u_price"),
        F.lit("N").alias("u_status"),
    )
    batch = updates.unionByName(inserts)
    return base.join(batch, "o_orderkey", "full_outer").select(
        "o_orderkey",
        F.coalesce("u_price", "b_price").alias("o_totalprice"),
        F.coalesce("u_status", "b_status").alias("o_orderstatus"),
    )


@query(
    "window_cume_dist",
    oracle="""
        SELECT c_custkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment
                     ORDER BY c_acctbal, c_custkey)
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist — the distribution-position windows
    (B19 family): per-segment relative standing of each customer's
    balance. Unique tie-break keeps both engines' ranks identical;
    rounding absorbs the division's last-ulp difference."""
    t = load_tables(spark, sf_dir, ("customer",))
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return t["customer"].select(
        "c_custkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
    )


@query(
    "tpch_q3_shipping_priority",
    oracle="""
        SELECT l.l_orderkey,
               round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                          AS DOUBLE), 2) AS revenue,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               o.o_orderpriority AS priority
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-07-01'
          AND l.l_shipdate  > TIMESTAMP '1998-07-01'
        GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
        ORDER BY revenue DESC, l.l_orderkey
        LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — shipping priority: unshipped-revenue top-10
    for one market segment (adapted to the driver schema, which has
    ``o_orderpriority`` instead of ``o_shippriority``).

    Scale plan: the segment filter reduces customer ~5× and is pushed
    to the parquet scan; the date filters prune orders and lineitem at
    the scan. customer joins orders on custkey (broadcast at low SF,
    shuffle at high — AQE decides from post-filter sizes), lineitem
    joins on orderkey with map-side partial aggregation, and the final
    top-10 lowers to TakeOrderedAndProject — per-partition heaps, no
    global sort. Tie-break on l_orderkey keeps LIMIT deterministic
    across engines."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < "1998-07-01")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1998-07-01")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(revenue, 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("priority"),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
        SELECT round(CAST(sum(l_extendedprice * l_discount) AS DOUBLE), 2)
                   AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — forecast revenue change: the canonical
    scan-dominated query. No join, no shuffle beyond the single-row
    final agg; the whole predicate (date range, discount band,
    quantity cap) is pushed to the parquet reader as min/max row-group
    pruning + `PushedFilters`, and the sum/count run inside one
    whole-stage-codegen'd pass. At 100 TB this is the pure I/O
    benchmark: cost is exactly bytes-scanned after pruning."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q18_large_volume_customer",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(round(sum(l_quantity), 1) AS DOUBLE) AS total_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING sum(l_quantity) > 250
        )
        SELECT c.c_name,
               c.c_custkey,
               o.o_orderkey,
               strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
               round(o.o_totalprice, 2) AS totalprice,
               b.total_qty
        FROM big b
        JOIN orders o   ON o.o_orderkey = b.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
    """,
)
def tpch_q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-volume customers: orders whose total
    line quantity exceeds a threshold (250 ≈ p99 of the per-order
    distribution), joined back to orders and customer.

    Scale plan: the quantity rollup is a map-side-partial groupBy on
    l_orderkey (2-column scan of the fact table — ReadSchema prunes
    the rest), the HAVING filter drops ~99% of groups BEFORE any join,
    so the orders join sees only the survivors (AQE broadcasts them);
    customer joins on custkey the same way. The classic mistake —
    joining lineitem to orders first and aggregating after — would
    shuffle the full fact table twice; this plan shuffles it once on
    one narrow projection."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 1).alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t["customer"], F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.round("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
    )


@query(
    "window_groups_exclude",
    oracle="""
        WITH r AS (
            SELECT p_partkey, p_size, p_brand,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS cents,
                   dense_rank() OVER (
                       PARTITION BY p_brand ORDER BY p_size
                   ) AS grp
            FROM part
        ),
        w AS (
            SELECT p_partkey, p_size, cents,
                   sum(cents) OVER f AS fs,
                   count(*)   OVER f AS fc,
                   sum(cents) OVER g AS gs,
                   count(*)   OVER g AS gc,
                   min(cents) OVER fp AS mnp,
                   min(cents) OVER ff AS mnf,
                   max(cents) OVER fp AS mxp,
                   max(cents) OVER ff AS mxf,
                   max(cents) OVER pb AS mxb,
                   max(cents) OVER pa AS mxa
            FROM r
            WINDOW f AS (PARTITION BY p_brand ORDER BY grp
                         RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING),
                   g AS (PARTITION BY p_brand, grp),
                   fp AS (PARTITION BY p_brand ORDER BY grp
                          RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING),
                   ff AS (PARTITION BY p_brand ORDER BY grp
                          RANGE BETWEEN 1 FOLLOWING AND 1 FOLLOWING),
                   pb AS (PARTITION BY p_brand, grp ORDER BY grp
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING),
                   pa AS (PARTITION BY p_brand, grp ORDER BY grp
                          ROWS BETWEEN 1 FOLLOWING
                          AND UNBOUNDED FOLLOWING)
        )
        SELECT p_partkey, p_size,
               CAST(CASE WHEN fc - gc > 0 THEN fs - gs END
                    AS BIGINT) AS excl_group,
               CAST(fs - gs + cents AS BIGINT) AS excl_ties,
               CAST(CASE WHEN fc > 1 THEN fs - cents END
                    AS BIGINT) AS excl_current,
               CAST(least(coalesce(mnp, mnf), coalesce(mnf, mnp))
                    AS BIGINT) AS excl_group_min,
               CAST(greatest(coalesce(mxp, mxb, mxa),
                             coalesce(mxf, mxb, mxa),
                             coalesce(mxb, mxp, mxf),
                             coalesce(mxa, mxp, mxf))
                    AS BIGINT) AS excl_current_max
        FROM w
    """,
)
def window_groups_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 GROUPS frame EXCLUDE clauses (SQLite ≥ 3.28) — all three
    forms over one frame: a GROUPS frame holds whole peer groups, so
    the exclusion is an exact windowed subtraction (the same lowering
    the dialect rewriter applies to CLI scripts,
    dialect.py:_rewrite_excluded_agg):

        EXCLUDE GROUP        →  frame_sum - peer_sum   (NULL when the
                                frame holds only the current group)
        EXCLUDE TIES         →  frame_sum - peer_sum + current (never
                                empty: the current row stays in)
        EXCLUDE CURRENT ROW  →  frame_sum - current    (NULL when the
                                frame is just the current row)

    The remaining-count guards reproduce SQLite's empty-frame NULL.
    Two min/max columns exercise the directional decomposition the
    same lowering uses for non-subtractable aggregates:
    ``excl_group_min`` (preceding/following-group RANGE sub-frames)
    and ``excl_current_max`` (those plus the peer-partition
    before-self/after-self ROWS sub-frames — their union is exactly
    peers-minus-self under any tie order). coalesce-pairing keeps the
    least/greatest combine NULL-ignoring when a sub-frame is empty.
    Neither Spark nor DuckDB implements GROUPS or EXCLUDE natively,
    so both sides run the dense_rank+RANGE construction; the
    construction itself is proven equal to REAL SQLite's native
    GROUPS ... EXCLUDE by the randomized fuzz in
    tests/test_groups_property.py. Integer cents keep sums exact.

    Scale: two window passes over the same (p_brand)-keyed exchange —
    Catalyst reuses one shuffle for both window specs since the
    partition keys share a prefix; no join, no driver traffic."""
    t = load_tables(spark, sf_dir, ("part",))
    wr = W.partitionBy("p_brand").orderBy("p_size")
    ranked = t["part"].select(
        "p_partkey",
        "p_size",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
        F.dense_rank().over(wr).alias("grp"),
    )
    wf = W.partitionBy("p_brand").orderBy("grp").rangeBetween(-1, 1)
    wg = W.partitionBy("p_brand", "grp")
    wfp = W.partitionBy("p_brand").orderBy("grp").rangeBetween(-1, -1)
    wff = W.partitionBy("p_brand").orderBy("grp").rangeBetween(1, 1)
    wpb = (
        W.partitionBy("p_brand", "grp")
        .orderBy("grp")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    wpa = (
        W.partitionBy("p_brand", "grp")
        .orderBy("grp")
        .rowsBetween(1, W.unboundedFollowing)
    )
    fs, fc = F.sum("cents").over(wf), F.count("*").over(wf)
    gs, gc = F.sum("cents").over(wg), F.count("*").over(wg)
    cur = F.col("cents")
    # least/greatest in Spark skip NULLs only with >=2 args that are
    # not all NULL; coalesce-pairing reproduces SQLite's NULL-ignoring
    # combine when one side's sub-frame is empty
    mnp, mnf = F.min("cents").over(wfp), F.min("cents").over(wff)
    mxp, mxf = F.max("cents").over(wfp), F.max("cents").over(wff)
    mxb, mxa = F.max("cents").over(wpb), F.max("cents").over(wpa)
    return ranked.select(
        "p_partkey",
        "p_size",
        F.when(fc - gc > 0, fs - gs).alias("excl_group"),
        (fs - gs + cur).alias("excl_ties"),
        F.when(fc > 1, fs - cur).alias("excl_current"),
        F.least(F.coalesce(mnp, mnf), F.coalesce(mnf, mnp)).alias(
            "excl_group_min"
        ),
        F.greatest(
            F.coalesce(mxp, mxb, mxa),
            F.coalesce(mxf, mxb, mxa),
            F.coalesce(mxb, mxp, mxf),
            F.coalesce(mxa, mxp, mxf),
        ).alias("excl_current_max"),
    )


@query(
    "window_rows_exclude",
    oracle="""
        SELECT p_partkey, p_size,
               CAST(sum(cents) OVER (
                   PARTITION BY p_brand ORDER BY p_partkey
                   ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
                   EXCLUDE CURRENT ROW) AS BIGINT) AS s_excl,
               CAST(count(*) OVER (
                   PARTITION BY p_brand ORDER BY p_partkey
                   ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
                   EXCLUDE CURRENT ROW) AS BIGINT) AS c_excl,
               CAST(min(cents) OVER (
                   PARTITION BY p_brand ORDER BY p_partkey
                   ROWS BETWEEN 2 PRECEDING AND 1 FOLLOWING
                   EXCLUDE CURRENT ROW) AS BIGINT) AS mn_excl,
               CAST(max(cents) OVER (
                   PARTITION BY p_brand ORDER BY p_partkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   EXCLUDE CURRENT ROW) AS BIGINT) AS mx_run_excl
        FROM (SELECT p_partkey, p_size, p_brand,
                     CAST(round(p_retailprice * 100) AS BIGINT)
                         AS cents
              FROM part)
    """,
)
def window_rows_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 ROWS frame + EXCLUDE CURRENT ROW (SQLite ≥ 3.28,
    lang_window.html §frame_exclusion; reachable in the reference
    because scripts are evaled verbatim — lib/classes/sqawk.tcl:216).
    A ROWS frame is row-contiguous and the current row is one frame
    unit, so excluding self decomposes exactly — the same lowering the
    dialect applies to CLI scripts (dialect.py:
    rewrite_plain_frame_excludes):

        sum/count →  f(frame) ⊖ current row   (NULL-guarded on the
                     remaining count)
        min/max   →  NULL-skipping combine of the two directional
                     sub-frames [start .. 1 PRECEDING] and
                     [1 FOLLOWING .. end]

    ORDER BY the unique p_partkey makes frame membership — and hence
    the result — deterministic (with tied keys, ROWS membership
    follows the sorter's unspecified tie order in SQLite too). DuckDB
    implements EXCLUDE natively, so the oracle is the verbatim SQL;
    the construction is additionally fuzzed against real SQLite in
    tests/test_groups_property.py.

    Scale: every column rides one (p_brand)-keyed window exchange —
    Catalyst evaluates all four specs in a single WindowExec chain
    over one sort; no join, no driver traffic."""
    t = load_tables(spark, sf_dir, ("part",))
    base = t["part"].select(
        "p_partkey",
        "p_size",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    wf = (
        W.partitionBy("p_brand").orderBy("p_partkey").rowsBetween(-2, 1)
    )
    wl = (
        W.partitionBy("p_brand").orderBy("p_partkey").rowsBetween(-2, -1)
    )
    wr = W.partitionBy("p_brand").orderBy("p_partkey").rowsBetween(1, 1)
    wrun = (
        W.partitionBy("p_brand")
        .orderBy("p_partkey")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    fs, fc = F.sum("cents").over(wf), F.count("*").over(wf)
    mnl, mnr = F.min("cents").over(wl), F.min("cents").over(wr)
    return base.select(
        "p_partkey",
        "p_size",
        F.when(fc > 1, fs - F.col("cents")).alias("s_excl"),
        (fc - 1).alias("c_excl"),
        F.least(F.coalesce(mnl, mnr), F.coalesce(mnr, mnl)).alias(
            "mn_excl"
        ),
        F.max("cents").over(wrun).alias("mx_run_excl"),
    )


@query(
    "window_range_exclude",
    oracle="""
        SELECT p_partkey, p_size,
               CAST(sum(cents) OVER (
                   PARTITION BY p_brand ORDER BY p_size
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   EXCLUDE GROUP) AS BIGINT) AS s_grp,
               CAST(sum(cents) OVER (
                   PARTITION BY p_brand ORDER BY p_size
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   EXCLUDE TIES) AS BIGINT) AS s_ties,
               CAST(count(*) OVER (
                   PARTITION BY p_brand ORDER BY p_size
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   EXCLUDE CURRENT ROW) AS BIGINT) AS c_cur,
               CAST(min(cents) OVER (
                   PARTITION BY p_brand ORDER BY p_size
                   RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING
                   EXCLUDE GROUP) AS BIGINT) AS mn_grp
        FROM (SELECT p_partkey, p_size, p_brand,
                     CAST(round(p_retailprice * 100) AS BIGINT)
                         AS cents
              FROM part)
    """,
)
def window_range_exclude(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 RANGE frame (integer value offsets) + EXCLUDE — the GROUPS
    algebra with the ORDER BY value itself as the rank, exactly the
    dialect lowering (dialect.py:rewrite_plain_frame_excludes): the
    peer group is RANGE CURRENT ROW..CURRENT ROW over p_size, and the
    integer key makes the directional min/max sub-frames
    [1 PRECEDING .. 1 PRECEDING] / [1 FOLLOWING .. 1 FOLLOWING] step
    exactly over the peer run (RANGE is value-based, so key gaps are
    harmless):

        EXCLUDE GROUP        →  f(frame) ⊖ f(peers)
        EXCLUDE TIES         →  f(frame) ⊖ f(peers) ⊕ current row
        EXCLUDE CURRENT ROW  →  f(frame) ⊖ current row
        min + GROUP          →  least over the directional sub-frames

    RANGE membership is value-based, so results are deterministic even
    with tied p_size keys — unlike ROWS GROUP/TIES, which the engine
    rejects loudly. DuckDB implements EXCLUDE natively (verbatim
    oracle); fuzzed against real SQLite in
    tests/test_groups_property.py.

    Scale: one (p_brand)-keyed window exchange; the peer window and
    all sub-frames share its sort. No join, no driver traffic."""
    t = load_tables(spark, sf_dir, ("part",))
    base = t["part"].select(
        "p_partkey",
        "p_size",
        "p_brand",
        F.round(F.col("p_retailprice") * 100).cast("long").alias("cents"),
    )
    wf = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-1, 1)
    wg = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(0, 0)
    wl = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(-1, -1)
    wr = W.partitionBy("p_brand").orderBy("p_size").rangeBetween(1, 1)
    fs, fc = F.sum("cents").over(wf), F.count("*").over(wf)
    gs, gc = F.sum("cents").over(wg), F.count("*").over(wg)
    cur = F.col("cents")
    mnl, mnr = F.min("cents").over(wl), F.min("cents").over(wr)
    return base.select(
        "p_partkey",
        "p_size",
        F.when(fc - gc > 0, fs - gs).alias("s_grp"),
        (fs - gs + cur).alias("s_ties"),
        (fc - 1).alias("c_cur"),
        F.least(F.coalesce(mnl, mnr), F.coalesce(mnr, mnl)).alias(
            "mn_grp"
        ),
    )


@query(
    "tpch_q10_returned_items",
    oracle="""
        SELECT c.c_custkey, c.c_name,
               round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                          AS DOUBLE), 2) AS revenue,
               round(c.c_acctbal, 2) AS acctbal,
               n.n_name AS nation
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
        GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
        ORDER BY revenue DESC, c.c_custkey
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — returned-item reporting: which customers
    returned the most revenue in a half-year window. The returnflag
    and date predicates push to the two fact scans, nation broadcasts
    (fixed 25 rows), and the top-20 lowers to TakeOrderedAndProject
    with the custkey tie-break keeping LIMIT deterministic."""
    t = load_tables(
        spark, sf_dir, ("customer", "orders", "lineitem", "nation")
    )
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    revenue = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.round(revenue, 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
        SELECT round(100.0 * round(CAST(
                   sum(CASE WHEN p.p_type = 'PROMO'
                            THEN l.l_extendedprice * (1 - l.l_discount)
                            ELSE 0 END) AS DOUBLE), 2)
               / round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                            AS DOUBLE), 2), 4) AS promo_revenue_pct,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
          AND l.l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the share of one month's
    revenue from promo parts, i.e. conditional aggregation over a
    fact-dim join. The month filter prunes lineitem at the scan; part
    broadcasts at low SF (AQE decides); the two sums ride one
    map-side-combined aggregation — the conditional-numerator pattern
    never needs a second scan or a self-join. Both sums round to their
    stable 2-decimal width BEFORE the ratio so cross-engine
    partial-agg order can't wiggle the 4th decimal of the percent."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-03-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
    return (
        li.join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0 * F.round(promo, 2) / F.round(F.sum(rev), 2), 4
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "tpch_q12_priority_shipping",
    oracle="""
        SELECT l.l_linestatus AS linestatus,
               CAST(sum(CASE WHEN o.o_orderpriority IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS high_line_count,
               CAST(sum(CASE WHEN o.o_orderpriority NOT IN
                                  ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT)
                   AS low_line_count
        FROM orders o
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l.l_linestatus
    """,
)
def tpch_q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — priority shipping: per line status, how many
    of a year's lineitems belonged to urgent/high-priority orders vs
    the rest (the driver schema has no shipmode, so linestatus is the
    grouping column and orderpriority the CASE discriminator — same
    conditional-count plan class).

    Scale: the year filter prunes lineitem at the scan (2-column
    read), orders joins on orderkey once, both counts ride ONE
    map-side-combined aggregation — the naive two-query formulation
    scans and joins twice for zero extra information."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["orders"]
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias(
                "high_line_count"
            ),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias(
                "low_line_count"
            ),
        )
    )


@query(
    "tpch_q19_disjunctive_revenue",
    oracle="""
        SELECT round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                          AS DOUBLE), 2) AS revenue,
               CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
               AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
               AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 35
               AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — discounted revenue under a disjunction of
    brand/size/quantity conjuncts: the OR-of-ANDs predicate class
    that stresses an optimizer's predicate decomposition. Catalyst
    factors the common l_quantity range (1..30) and the p_size lower
    bound out of the OR into scan-level pushdowns, so both sides
    prune BEFORE the join even though no single conjunct applies to
    every row; the residual OR evaluates post-join in codegen. One
    join, one agg — the UNION-of-three-queries formulation scans the
    fact table three times."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    j = t["lineitem"].join(
        t["part"], F.col("p_partkey") == F.col("l_partkey")
    )
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return j.filter(cond).agg(
        F.round(rev, 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "tpch_q22_global_sales_opportunity",
    oracle="""
        WITH avg_bal AS (
            SELECT round(CAST(sum(c_acctbal) AS DOUBLE), 2) / count(*)
                       AS ab
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT substr(c.c_name, 1, 9) AS cntrycode,
               CAST(count(*) AS BIGINT) AS numcust,
               round(CAST(sum(c.c_acctbal) AS DOUBLE), 2) AS totacctbal
        FROM customer c, avg_bal
        WHERE c.c_acctbal > avg_bal.ab
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY 1
    """,
)
def tpch_q22_global_sales_opportunity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q22 shape — global sales opportunity: customers with
    above-average balances who have never ordered (the driver schema
    has no phone column; the name prefix stands in for the country
    code). Three plan classes in one query: a scalar aggregate
    subquery (the global average — one row, broadcast), an anti-join
    against orders (never a NOT IN that breaks on NULLs), and the
    final rollup.

    Scale: the average is one narrow scan reduced to one row; the
    anti-join shuffles only custkeys; the naive correlated NOT EXISTS
    per row would be a nested loop over orders per customer."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    # registry float rule: round the sum to the data's 2-decimal width
    # before dividing, so both engines derive the IDENTICAL threshold
    # double regardless of partial-agg order (a raw avg() can differ in
    # the last ulp and flip a boundary customer)
    avg_bal = t["customer"].filter(F.col("c_acctbal") > 0.0).agg(
        (F.round(F.sum("c_acctbal"), 2) / F.count("*")).alias("ab")
    )
    rich = (
        t["customer"]
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
    )
    never_ordered = rich.join(
        t["orders"],
        F.col("o_custkey") == F.col("c_custkey"),
        "left_anti",
    )
    return (
        never_ordered.groupBy(
            F.substring("c_name", 1, 9).alias("cntrycode")
        )
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )
