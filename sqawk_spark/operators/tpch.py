"""TPC-H query-shape completion (Q2, Q4, Q7, Q8, Q9, Q11, Q13, Q15,
Q16, Q17, Q20, Q21).

With these twelve the registry carries the full 22-query TPC-H family
(Q1 = flagship_pricing_summary; Q3/Q5/Q6/Q10/Q12/Q14/Q18/Q19/Q22 live
in :mod:`.relational`). The reference (dbohdan/sqawk) hands SQL
verbatim to SQLite (``lib/classes/sqawk.tcl:216``), so every one of
these is a query a reference user could run today; here each is
re-expressed as the DataFrame plan you'd actually want on a cluster —
correlated subqueries decorrelated into windows or pre-aggregations,
EXISTS/NOT EXISTS pairs collapsed into one per-group aggregation,
scalar thresholds broadcast instead of re-evaluated per row.

Schema adaptations (the driver tables are TPC-H-ish, TESTDATA.md):
no ``partsupp`` — the part×supplier relation is derived from observed
``lineitem`` shipments (Q2/Q11/Q16/Q20); no commit/receipt dates —
"late" is ``l_shipdate > o_orderdate + 365 days`` (Q4/Q21); no
``o_comment``/``c_phone`` — the Q13/Q16 exclusion filters use
``o_orderpriority``/``s_acctbal``.

Determinism rules (registry.py docstring): every threshold or argmax
comparison runs on exact integer cents (sums of 2-decimal doubles are
order-dependent in the last ulp; integer sums are not), and doubles
are rounded only for display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

def _rev():
    # classic-PySpark Column construction needs an active SparkContext,
    # so this cannot be a module-level constant
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
        WITH ps AS (
            SELECT l_partkey AS partkey, l_suppkey AS suppkey,
                   min(l_extendedprice / l_quantity) AS unit_cost
            FROM lineitem GROUP BY 1, 2
        ), eu AS (
            SELECT ps.partkey, ps.suppkey, ps.unit_cost,
                   s.s_name, s.s_acctbal, n.n_name
            FROM ps
            JOIN supplier s ON s.s_suppkey = ps.suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            JOIN region r ON r.r_regionkey = n.n_regionkey
            WHERE r.r_name = 'EUROPE'
        )
        SELECT p.p_partkey, p.p_name, eu.s_name, eu.n_name AS nation,
               round(CAST(eu.unit_cost AS DOUBLE), 2) AS unit_cost,
               round(eu.s_acctbal, 2) AS acctbal
        FROM part p JOIN eu ON eu.partkey = p.p_partkey
        WHERE p.p_type = 'LARGE' AND p.p_size <= 10
          AND eu.unit_cost = (SELECT min(e2.unit_cost) FROM eu e2
                              WHERE e2.partkey = p.p_partkey)
        ORDER BY acctbal DESC, p.p_partkey, eu.s_name
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — minimum-cost supplier: for each qualifying
    part, the European supplier(s) offering it at the lowest observed
    unit price. The part×supplier cost relation is derived from
    lineitem (no partsupp in the driver schema): per-(part, supplier)
    ``min(l_extendedprice / l_quantity)``.

    The reference runs SQLite's correlated scalar-min subquery per
    part row; here the correlation lowers to ONE window ``min`` over
    ``partkey`` — no re-scan per row, no self-join. The min compares
    exact IEEE quotients (division is deterministic; min is
    order-free), so the cross-engine equality cannot wiggle.

    Scale: the per-(part, supplier) aggregation is the only big
    shuffle; nation/region (fixed cardinality) carry explicit
    broadcast hints, while the supplier- and part-derived frames SCALE
    WITH THE CORPUS and are left unhinted — AQE broadcasts them when
    runtime statistics allow and falls back to a shuffle join when
    they don't (a forced hint overrides the size check and OOMs at
    100×; SCALE.md regime 2). The window over ``partkey`` rides the
    same hash partitioning as the groupBy above it."""
    t = load_tables(
        spark, sf_dir, ("part", "supplier", "nation", "region", "lineitem")
    )
    dim = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        t["lineitem"]
        .groupBy(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
        )
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_cost"
            )
        )
    )
    eu = ps.join(dim, F.col("suppkey") == F.col("s_suppkey"))
    parts = t["part"].filter(
        (F.col("p_type") == "LARGE") & (F.col("p_size") <= 10)
    )
    joined = eu.join(parts, F.col("partkey") == F.col("p_partkey"))
    best = F.min("unit_cost").over(W.partitionBy("partkey"))
    return (
        joined.withColumn("__best", best)
        .filter(F.col("unit_cost") == F.col("__best"))
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("unit_cost").cast("double"), 2).alias("unit_cost"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.col("acctbal").desc(), "p_partkey", "s_name")
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
        SELECT o.o_orderpriority AS priority,
               CAST(count(*) AS BIGINT) AS order_count
        FROM orders o
        WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
          AND o.o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate
                                           + INTERVAL 365 DAY)
        GROUP BY priority ORDER BY priority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — order priority checking: of a half-year's
    orders, how many (per priority) had at least one lineitem shipped
    more than a year after ordering (the driver schema has no
    commit/receipt dates, so lateness is ship-vs-order delay; same
    EXISTS-decorrelation shape).

    Scale: the date window prunes orders at the scan; EXISTS lowers to
    a LEFT SEMI join on ``l_orderkey`` with the correlated date
    comparison folded into the join condition — one shuffle, then a
    five-group aggregate. No count-then-filter materialization."""
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01")
    )
    late = o.join(
        t["lineitem"],
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")
        ),
        "left_semi",
    )
    return (
        late.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("priority")
    )


@query(
    "tpch_q7_volume_shipping",
    oracle="""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
               round(CAST(sum(l.l_extendedprice * (1 - l.l_discount))
                          AS DOUBLE), 2) AS revenue
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE ((n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')
            OR (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate <  TIMESTAMP '1999-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — volume shipping between two trading nations,
    by direction and ship year.

    Scale: the OR-of-nation-pairs cannot be split per side without
    losing the cross terms, but each side CAN be pre-filtered to the
    two-nation union — supplier and customer are joined to the
    broadcast-hinted nation dim and filtered to {19, 18} before
    touching the facts, so the big lineitem⋈orders shuffle carries
    only rows that can possibly qualify. The filtered supplier/
    customer frames scale with the corpus, so they carry NO broadcast
    hint — AQE broadcasts them when their runtime size allows and
    shuffle-joins otherwise (SCALE.md regime 2). The date range pushes
    to the lineitem scan."""
    t = load_tables(
        spark,
        sf_dir,
        ("supplier", "lineitem", "orders", "customer", "nation"),
    )
    pair = ("NATION_19", "NATION_18")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name").isin(*pair))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(t["nation"].filter(F.col("n_name").isin(*pair))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1999-01-01")
    )
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    oracle="""
        SELECT o_year,
               round(round(CAST(sum(CASE WHEN supp_nation = 'NATION_5'
                                         THEN volume ELSE 0 END)
                                 AS DOUBLE), 2)
                     / round(CAST(sum(volume) AS DOUBLE), 2),
                     4) AS mkt_share
        FROM (SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                     l.l_extendedprice * (1 - l.l_discount) AS volume,
                     n1.n_name AS supp_nation
              FROM part p
              JOIN lineitem l ON p.p_partkey = l.l_partkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN orders o   ON o.o_orderkey = l.l_orderkey
              JOIN customer c ON c.c_custkey = o.o_custkey
              JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
              JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
              JOIN region r   ON r.r_regionkey = n2.n_regionkey
              WHERE r.r_name = 'EUROPE' AND p.p_type = 'PROMO')
        GROUP BY o_year ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — national market share: NATION_5's share of
    European PROMO-part order volume, per order year.

    Scale: the seven-relation star collapses to facts + dims. Only
    nation/region (fixed cardinality) carry broadcast hints; the
    filtered part, supplier, and customer frames scale with the
    corpus, so join strategy is left to AQE's runtime size check
    (SCALE.md regime 2). The customer→nation→region chain folds into
    one pruned ``c_custkey`` set (the region predicate never touches
    the fact rows); the supplier dim carries its nation name for the
    conditional numerator. Numerator and denominator ride ONE
    map-side-combined aggregation (Q14's conditional-numerator
    pattern) — never two passes. Both sums round before the ratio so
    partial-agg order can't wiggle the 4th decimal."""
    t = load_tables(
        spark,
        sf_dir,
        (
            "part",
            "lineitem",
            "supplier",
            "orders",
            "customer",
            "nation",
            "region",
        ),
    )
    parts = t["part"].filter(F.col("p_type") == "PROMO").select("p_partkey")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(
            F.broadcast(t["nation"]),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    vol = _rev()
    num = F.sum(
        F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0)
    )
    return (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.round(num, 2) / F.round(F.sum(vol), 2), 4
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle="""
        SELECT nation, o_year,
               round(CAST(sum(amount_u) AS BIGINT) / 10000.0, 2)
                   AS sum_profit
        FROM (SELECT n.n_name AS nation,
                     CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
                     CAST(round(l.l_extendedprice
                                * (100 - CAST(round(l.l_discount * 100)
                                              AS BIGINT))) AS BIGINT)
                       - CAST(round(p.p_retailprice * 100) AS BIGINT)
                         * CAST(l.l_quantity AS BIGINT) AS amount_u
              FROM part p
              JOIN lineitem l ON p.p_partkey = l.l_partkey
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN orders o   ON o.o_orderkey = l.l_orderkey
              JOIN nation n   ON s.s_nationkey = n.n_nationkey
              WHERE p.p_name LIKE '%red%')
        GROUP BY nation, o_year
        ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-type profit: per supplier nation and
    order year, profit on parts whose name contains "red". With no
    partsupp, supply cost is the ``p_retailprice``-derived proxy
    ``0.01 × retail × quantity`` — the amount expression keeps Q9's
    two-table arithmetic (lineitem × part columns in one row). The
    per-row amount is computed in exact 10⁻⁴-dollar integers
    (price-cents × discount-percent minus retail-cents × quantity):
    at sf0.01 the plain double formulation really did land one
    (nation, year) sum on a half-cent rounding boundary, so
    cross-engine aggregation order flipped the 2nd decimal.

    Scale: part (name-filtered, 2 columns) and supplier⋈nation scale
    with the corpus, so neither is broadcast-hinted — AQE picks the
    strategy from runtime sizes (SCALE.md regime 2; only the fixed
    25-row nation keeps a hint). The only big shuffle is
    lineitem⋈orders on orderkey, then a (25 × years)-group aggregate
    with map-side combine. The LIKE '%red%' predicate pushes to the
    part scan (contains → parquet-row-group level)."""
    t = load_tables(
        spark,
        sf_dir,
        ("part", "lineitem", "supplier", "orders", "nation"),
    )
    parts = (
        t["part"]
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    amount_u = F.round(
        F.col("l_extendedprice") * (100 - disc_pct)
    ).cast("long") - F.round(F.col("p_retailprice") * 100).cast(
        "long"
    ) * F.col("l_quantity").cast("long")
    return (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(amount_u) / 10000.0, 2).alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle="""
        WITH v AS (
            SELECT l.l_partkey AS partkey,
                   CAST(sum(CAST(round(l.l_extendedprice * 100)
                                 AS BIGINT)) AS BIGINT) AS cents
            FROM lineitem l
            JOIN supplier s ON s.s_suppkey = l.l_suppkey
            JOIN nation n ON n.n_nationkey = s.s_nationkey
            WHERE n.n_name IN ('NATION_19', 'NATION_18')
            GROUP BY 1
        )
        SELECT partkey, round(cents / 100.0, 2) AS value
        FROM v
        WHERE cents * 1000 > (SELECT CAST(sum(cents) AS BIGINT) FROM v)
        ORDER BY cents DESC, partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — important stock: parts whose shipped value
    from two nations' suppliers exceeds 0.1% of those nations' total
    (partsupp-less: "stock value" is observed lineitem value).

    The correlated form would re-run the global sum per HAVING row;
    here the total is ONE scalar aggregate broadcast back over the
    per-part rows (same lowering as Q22's threshold). All comparisons
    are integer cents — a sum of 2-decimal doubles is order-dependent
    in the last ulp, and a part sitting exactly on the 0.1% boundary
    must not flip between engines. ``cents * 1000 > total`` is the
    exact integer form of ``value > 0.001 * total``.

    Scale: the nation filter (broadcast-hinted, 25 rows) prunes the
    supplier dim BEFORE the fact scan; the filtered supplier frame
    scales with the corpus, so its fact join is left to AQE (SCALE.md
    regime 2). One groupBy(partkey) shuffle; the global total
    re-aggregates the (small) per-part result, not the facts, and the
    one-row threshold keeps its hint."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier", "nation"))
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(
                    F.col("n_name").isin("NATION_19", "NATION_18")
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    cents_row = F.round(F.col("l_extendedprice") * 100).cast("long")
    v = (
        t["lineitem"]
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents_row).alias("cents"))
    )
    total = v.agg(F.sum("cents").alias("__total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("cents") * 1000 > F.col("__total"))
        .select(
            "partkey",
            F.round(F.col("cents") / 100.0, 2).alias("value"),
            "cents",
        )
        .orderBy(F.col("cents").desc(), "partkey")
        .drop("cents")
    )


@query(
    "tpch_q13_customer_distribution",
    oracle="""
        SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
        FROM (SELECT c.c_custkey,
                     CAST(count(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c
              LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                   AND o.o_orderpriority <> '1-URGENT'
              GROUP BY c.c_custkey)
        GROUP BY c_count ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_customer_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13 shape — customer order-count distribution: histogram
    of how many non-urgent orders each customer placed, INCLUDING
    zero-order customers (the left join's whole point; the priority
    filter must live in the join condition, not WHERE, or the zeros
    vanish).

    Scale: the priority predicate filters orders BEFORE the join (for
    an outer join Catalyst can only push the right-side predicate when
    it's written on the right side — doing it explicitly keeps the
    shuffle small). Then two aggregations: per-customer counts on the
    custkey exchange, and the tiny histogram re-agg."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q15_top_supplier",
    oracle="""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(sum(CAST(round(l_extendedprice
                                       * (100 - CAST(round(l_discount
                                                           * 100)
                                                     AS BIGINT)))
                                 AS BIGINT)) AS BIGINT) AS rev_cents
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s.s_suppkey, s.s_name,
               round(rev.rev_cents / 10000.0, 2) AS total_revenue
        FROM supplier s JOIN rev ON s.s_suppkey = rev.supplier_no
        WHERE rev.rev_cents = (SELECT max(rev_cents) FROM rev)
        ORDER BY s.s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — top supplier: the supplier(s) with maximum
    quarter revenue (the original's view + scalar max subquery).

    The argmax equality runs on exact integers:
    ``round(price × (100 − round(discount×100)))`` is
    price-cents × discount-percent — both factors are exact small
    integers, the per-row product is computed identically on both
    engines, and integer sums are order-free. Comparing rounded
    double sums instead could crown a different supplier per engine
    when two sums straddle a half-cent boundary.

    Scale: one groupBy(suppkey) over the date-pruned scan; the max is
    a scalar aggregate OF THE PER-SUPPLIER RESULT (supplier-count
    rows, not facts) — a one-row frame that keeps its broadcast hint.
    The supplier name lookup scales with the corpus, so it is left to
    AQE (SCALE.md regime 2)."""
    t = load_tables(spark, sf_dir, ("supplier", "lineitem"))
    disc_pct = F.round(F.col("l_discount") * 100).cast("long")
    rev_cents_row = F.round(
        F.col("l_extendedprice") * (100 - disc_pct)
    ).cast("long")
    rev = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1997-04-01")
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev_cents_row).alias("rev_cents"))
    )
    mx = rev.agg(F.max("rev_cents").alias("__max"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_cents") == F.col("__max"))
        .join(t["supplier"], F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_cents") / 10000.0, 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_supplier_part_count",
    oracle="""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT)
                   AS supplier_cnt
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
        ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_part_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q16 shape — how many distinct suppliers ship parts of
    each (brand, type, size) combination, excluding an attribute band
    and a supplier denylist (the original's complaint-comment NOT IN;
    the driver schema has no comments, so negative account balance is
    the denylist predicate).

    Scale: the NOT IN lowers to a LEFT ANTI join (``s_suppkey`` is
    never NULL, so no null-aware anti-join plan); the filtered part
    dim and the supplier denylist both scale with the corpus, so
    neither is broadcast-hinted — AQE picks broadcast when runtime
    sizes allow (SCALE.md regime 2). count(DISTINCT) expands to the
    standard two-phase distinct aggregate — partial per-partition
    dedup before the group shuffle."""
    t = load_tables(spark, sf_dir, ("lineitem", "part", "supplier"))
    parts = t["part"].filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
    )
    deny = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        t["lineitem"]
        .join(deny, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


@query(
    "tpch_q17_small_quantity_revenue",
    oracle="""
        SELECT round(CAST(sum(CAST(round(l.l_extendedprice * 100)
                                   AS BIGINT)) AS BIGINT)
                     / 700.0, 2) AS avg_yearly,
               CAST(count(*) AS BIGINT) AS n_small
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#3'
          AND l.l_quantity < (SELECT 0.4 * avg(l2.l_quantity)
                              FROM lineitem l2
                              WHERE l2.l_partkey = p.p_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q17 shape — small-quantity-order revenue: revenue lost
    if orders below 40% of a part's average quantity weren't taken.

    SQLite evaluates the correlated AVG subquery per outer row; the
    cluster plan computes per-part averages ONCE (a part-count-sized
    aggregate that broadcasts) and joins — the classic Q17
    decorrelation. The threshold compare is safe cross-engine without
    rounding: quantities are integral-valued, so sum (hence avg =
    exact_sum / count) is exact in IEEE double regardless of
    aggregation order. Revenue sums in integer cents.

    Scale: per-part avg aggregates the UNFILTERED lineitem (the
    subquery has no brand predicate — only parts that can match need
    it, so the avg input is semi-join-pruned by the brand parts
    first). The brand-part set and the per-partkey averages both
    scale with the corpus, so neither is broadcast-hinted — AQE
    decides from runtime sizes (SCALE.md regime 2); the final global
    agg is one row."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    parts = (
        t["part"].filter(F.col("p_brand") == "Brand#3").select("p_partkey")
    )
    avgs = (
        t["lineitem"]
        .join(
            parts,
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("__avg_qty"))
        .withColumnRenamed("l_partkey", "__pk")
    )
    cents_row = F.round(F.col("l_extendedprice") * 100).cast("long")
    return (
        t["lineitem"]
        .join(parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(avgs, F.col("l_partkey") == F.col("__pk"))
        .filter(F.col("l_quantity") < 0.4 * F.col("__avg_qty"))
        .agg(
            F.round(F.sum(cents_row) / 700.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@query(
    "tpch_q20_potential_promotion",
    oracle="""
        WITH g AS (
            SELECT l_suppkey AS suppkey, l_partkey AS partkey,
                   CAST(sum(l_quantity) AS BIGINT) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
              AND l_partkey IN (SELECT p_partkey FROM part
                                WHERE p_name LIKE 'red%')
            GROUP BY 1, 2
        ), w AS (
            SELECT suppkey, qty,
                   CAST(sum(qty) OVER (PARTITION BY partkey) AS BIGINT)
                       AS part_total
            FROM g
        )
        SELECT s.s_name, n.n_name AS nation
        FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_name IN ('NATION_19', 'NATION_18', 'NATION_15',
                           'NATION_8')
          AND s.s_suppkey IN (SELECT suppkey FROM w
                              WHERE qty * 5 > part_total)
        ORDER BY s.s_name
    """,
)
def tpch_q20_potential_promotion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q20 shape — potential part promotion: suppliers in a
    nation set who shipped more than 20% of a year's volume of some
    "red" part (partsupp-less: excess-stock becomes dominant-shipper;
    the nested IN → correlated-agg chain is identical).

    The inner correlated aggregate ("this supplier's quantity vs the
    part's total") lowers to a window sum over the ALREADY-GROUPED
    (supplier, part) rows — aggregate once, window over the same
    partkey-compatible exchange, never re-scan. ``qty × 5 >
    part_total`` keeps the 20% threshold in exact integers.

    Scale: the red-part IN is a semi-join pruning the fact scan along
    with the date pushdown; the groupBy carries (suppkey, partkey);
    the qualifying-supplier set (≤ supplier count) semi-joins the
    nation-filtered supplier dim. The red-part and qualifying frames
    scale with the corpus, so neither is broadcast-hinted (SCALE.md
    regime 2); only the fixed nation dim keeps its hint."""
    t = load_tables(
        spark, sf_dir, ("lineitem", "part", "supplier", "nation")
    )
    red = t["part"].filter(F.col("p_name").like("red%")).select("p_partkey")
    g = (
        t["lineitem"]
        .filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(
            red,
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(
            F.col("l_suppkey").alias("suppkey"),
            F.col("l_partkey").alias("partkey"),
        )
        .agg(F.sum("l_quantity").cast("long").alias("qty"))
    )
    part_total = F.sum("qty").over(W.partitionBy("partkey"))
    qualifying = (
        g.withColumn("part_total", part_total)
        .filter(F.col("qty") * 5 > F.col("part_total"))
        .select("suppkey")
        .distinct()
    )
    return (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(
                    F.col("n_name").isin(
                        "NATION_19", "NATION_18", "NATION_15", "NATION_8"
                    )
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            qualifying,
            F.col("s_suppkey") == F.col("suppkey"),
            "left_semi",
        )
        .select("s_name", F.col("n_name").alias("nation"))
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
        SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
        FROM supplier s
        JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
        JOIN orders o ON o.o_orderkey = l1.l_orderkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE o.o_orderstatus = 'F'
          AND n.n_name IN ('NATION_19', 'NATION_18', 'NATION_15',
                           'NATION_8')
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate
                                                + INTERVAL 365 DAY)
        GROUP BY s.s_name
        ORDER BY numwait DESC, s.s_name
        LIMIT 25
    """,
)
def tpch_q21_waiting_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q21 shape — suppliers who kept orders waiting: for
    finished multi-supplier orders, the supplier who was the ONLY one
    to ship late (> 1 year after ordering), counted per late lineitem.

    SQLite evaluates EXISTS + NOT EXISTS as two correlated probes per
    row — two extra lineitem self-joins on a cluster. Both collapse
    into per-order supplier statistics computed in one pass:

        per (orderkey, suppkey):  any_late, n_late_rows
        per (orderkey):           n_suppliers, n_late_suppliers

    A row group qualifies iff ``any_late ∧ n_suppliers > 1 ∧
    n_late_suppliers = 1`` — "someone else exists" and "no one else
    late" in one predicate; the supplier's qualifying-row count is
    ``n_late_rows``. Status 'F' filters before the per-order pass
    (every correlated row shares l1's order, hence its status).

    Scale: ONE shuffle on orderkey serves both the (orderkey, suppkey)
    aggregate and the order-level window (prefix-compatible keys reuse
    the exchange); the nation dim keeps its broadcast hint while the
    nation-filtered supplier frame scales with the corpus and is left
    to AQE (SCALE.md regime 2); top-25 is TakeOrderedAndProject."""
    t = load_tables(
        spark, sf_dir, ("supplier", "lineitem", "orders", "nation")
    )
    o = t["orders"].filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        "INTERVAL 365 DAYS"
    )
    per_supp = (
        t["lineitem"]
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(late.cast("int")).alias("any_late"),
            F.sum(late.cast("long")).alias("n_late_rows"),
        )
    )
    wo = W.partitionBy("l_orderkey")
    qualified = (
        per_supp.withColumn("n_suppliers", F.count(F.lit(1)).over(wo))
        .withColumn("n_late_suppliers", F.sum("any_late").over(wo))
        .filter(
            (F.col("any_late") == 1)
            & (F.col("n_suppliers") > 1)
            & (F.col("n_late_suppliers") == 1)
        )
    )
    supp = (
        t["supplier"]
        .join(
            F.broadcast(
                t["nation"].filter(
                    F.col("n_name").isin(
                        "NATION_19", "NATION_18", "NATION_15", "NATION_8"
                    )
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        qualified.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(25)
    )
