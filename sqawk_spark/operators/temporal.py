"""Temporal joins Spark lacks natively: as-of and range.

Both are standard analytics operators (kdb's ``aj``, DuckDB's ``ASOF
JOIN``, range joins in every time-series engine) that Catalyst has no
physical operator for — a naive translation becomes a
BroadcastNestedLoopJoin over an inequality. The re-expressions here
are the two canonical scalable shapes:

- **as-of** = one window pass: partition by the equality key, order by
  time, ``last(..., ignorenulls)`` over a frame ending just before the
  current row. One shuffle on the key, no join at all.
- **range** = bucket join: quantize time to buckets the width of the
  range, replicate the probe side to its 3 candidate buckets
  (JVM-side explode), equi-join on bucket, then apply the exact
  predicate. Turns the inequality join into an equi-join whose
  fan-out is bounded by bucket occupancy.

The events table has no duplicate (user_id, ts) pairs at any SF
(verified), so both operators are fully deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

RANGE_US = 300_000_000  # ±5 minutes


@query(
    "events_asof_join",
    oracle="""
        SELECT c.event_id, c.user_id,
               epoch_us(c.ts) AS ts_us,
               c.value AS click_value,
               p.event_id AS purchase_event_id,
               p.value AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts > p.ts
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click gets the user's most recent STRICTLY
    earlier purchase (or NULLs if none). Oracle: DuckDB's native ASOF
    LEFT JOIN — an independent implementation of the same semantics.

    Spark shape: no join at all. One window partitioned by user_id,
    ordered by ts, frame ending at the previous row; non-purchase rows
    contribute NULL so ``last(..., ignorenulls=True)`` carries the
    latest purchase forward. One shuffle on user_id — the equality
    key — so it scales exactly like any keyed aggregation; kdb calls
    this operator ``aj``, and this is its textbook Spark lowering."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    is_p = F.col("event_type") == "purchase"
    # Tie-break: at equal ts a purchase must sort AFTER the click so
    # the `-1` frame end excludes it — the oracle's ASOF condition is
    # STRICT (c.ts > p.ts); ordering by ts alone would let arbitrary
    # tie order decide membership. event_id makes within-type ties
    # deterministic too.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", is_p.cast("int"), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    enriched = ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        "event_type",
        F.last(F.when(is_p, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("purchase_event_id"),
        F.last(F.when(is_p, F.col("value")), ignorenulls=True)
        .over(w)
        .alias("purchase_value"),
    )
    return enriched.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("click_value"),
        "purchase_event_id",
        "purchase_value",
    )


@query(
    "events_asof_tolerance",
    oracle="""
        SELECT c.event_id, c.user_id,
               epoch_us(c.ts) AS ts_us,
               CASE WHEN p.ts >= c.ts - INTERVAL '1 hour'
                    THEN p.event_id END AS purchase_event_id,
               CASE WHEN p.ts >= c.ts - INTERVAL '1 hour'
                    THEN p.value END AS purchase_value
        FROM (SELECT * FROM events WHERE event_type = 'click') c
        ASOF LEFT JOIN
             (SELECT * FROM events WHERE event_type = 'purchase') p
          ON c.user_id = p.user_id AND c.ts > p.ts
    """,
)
def events_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a lookback tolerance (kdb ``wj``'s bounded
    window, pandas ``merge_asof(tolerance=...)``): the most recent
    earlier purchase counts only within 1 hour of the click —
    stale matches become NULLs instead of silently ancient context.

    Identical plan to events_asof_join (one keyed window, no join);
    the window additionally carries the matched purchase's timestamp
    forward so the tolerance check is a plain column comparison."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"]
    is_p = F.col("event_type") == "purchase"
    # same strict-inequality tie-break as events_asof_join: equal-ts
    # purchases sort after the click and fall outside the `-1` frame
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", is_p.cast("int"), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = lambda c: F.last(F.when(is_p, c), ignorenulls=True).over(w)  # noqa: E731
    enriched = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        carry(F.col("event_id")).alias("p_id"),
        carry(F.col("value")).alias("p_value"),
        carry(F.col("ts")).alias("p_ts"),
    )
    in_tol = F.col("p_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR")
    return enriched.filter(F.col("event_type") == "click").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.when(in_tol, F.col("p_id")).alias("purchase_event_id"),
        F.when(in_tol, F.col("p_value")).alias("purchase_value"),
    )


@query(
    "events_range_join",
    oracle=f"""
        SELECT e.event_id,
               epoch_us(e.ts) AS ts_us,
               CAST(count(o.event_id) AS BIGINT) AS n_nearby,
               round(sum(o.value), 2) AS nearby_value
        FROM (SELECT * FROM events WHERE event_type = 'error') e
        LEFT JOIN events o
          ON o.ts BETWEEN e.ts - INTERVAL '5 minutes'
                      AND e.ts + INTERVAL '5 minutes'
         AND o.event_id <> e.event_id
        GROUP BY 1, 2
    """,
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: each error event counts and sums all events within
    ±5 minutes (any user, excluding itself). The oracle states it as
    the naive inequality join — fine for DuckDB at test SF, a
    nested-loop disaster at scale.

    Spark shape: quantize ts to 5-minute buckets; an error in bucket b
    can only match events in buckets {{b-1, b, b+1}}, so the error
    side explodes to those 3 probe buckets (tiny side replicated,
    JVM-side) and the match becomes an EQUI-join on bucket + the
    exact |Δts| filter. Candidate volume is bounded by 3× bucket
    occupancy — linear in data, no nested loop (pinned in
    tests/test_plans.py). Zero-match errors come back via the final
    left join against the error set."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        "value",
        "event_type",
    )
    bucket = (F.col("ts_us") / RANGE_US).cast("long")
    others = ev.select("event_id", "ts_us", "value", bucket.alias("bkt"))
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("ts_us").alias("err_ts"),
        bucket.alias("b"),
    )
    probes = errors.select(
        "err_id",
        "err_ts",
        F.explode(
            F.array(F.col("b") - 1, F.col("b"), F.col("b") + 1)
        ).alias("bkt"),
    )
    cand = (
        probes.join(others, "bkt")
        .filter(
            (F.abs(F.col("ts_us") - F.col("err_ts")) <= RANGE_US)
            & (F.col("event_id") != F.col("err_id"))
        )
        .groupBy("err_id")
        .agg(
            F.count("*").alias("n_nearby"),
            F.round(F.sum("value"), 2).alias("nearby_value"),
        )
    )
    return (
        errors.join(cand, "err_id", "left")
        .select(
            F.col("err_id").alias("event_id"),
            F.col("err_ts").alias("ts_us"),
            F.coalesce(F.col("n_nearby"), F.lit(0)).alias("n_nearby"),
            "nearby_value",
        )
    )


@query(
    "events_multires_rollup",
    oracle="""
        WITH b AS (
            SELECT event_type, value,
                   epoch_us(time_bucket(INTERVAL '1 minute', ts)) AS m,
                   epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS h,
                   epoch_us(time_bucket(INTERVAL '1 day', ts)) AS d
            FROM events
        )
        SELECT CASE WHEN GROUPING(m) = 0 THEN 'minute'
                    WHEN GROUPING(h) = 0 THEN 'hour'
                    ELSE 'day' END AS resolution,
               coalesce(m, h, d) AS bucket_us,
               event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               round(sum(value), 2) AS total_value
        FROM b
        GROUP BY GROUPING SETS ((m, event_type), (h, event_type),
                                (d, event_type))
    """,
)
def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the same events
    aggregated at minute, hour, and day resolution in ONE scan and ONE
    shuffle — GROUPING SETS expands the three levels map-side, so the
    fact table is never re-read per resolution (a UNION of three
    aggregations would scan it three times; at 100 TB that is the
    whole cost). This is the batch shape of a timeseries engine's
    multi-resolution rollup; the streaming variant is the same
    expression behind three windowed sinks."""
    t = load_tables(spark, sf_dir, ("events",))
    b = t["events"].select(
        "event_type",
        "value",
        F.unix_micros(F.date_trunc("minute", F.col("ts"))).alias("m"),
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("h"),
        F.unix_micros(F.date_trunc("day", F.col("ts"))).alias("d"),
    )
    g = b.groupingSets(
        [["m", "event_type"], ["h", "event_type"], ["d", "event_type"]],
        "m",
        "h",
        "d",
        "event_type",
    )
    # grouping() is only legal inside the aggregate list — carry the
    # level flags out of the agg, then derive the resolution label
    agged = g.agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.grouping("m").alias("gm"),
        F.grouping("h").alias("gh"),
    )
    return agged.select(
        F.when(F.col("gm") == 0, "minute")
        .when(F.col("gh") == 0, "hour")
        .otherwise("day")
        .alias("resolution"),
        F.coalesce("m", "h", "d").alias("bucket_us"),
        "event_type",
        "n_events",
        "total_value",
    )


@query(
    "events_rolling_stats",
    oracle="""
        SELECT event_id, user_id,
               epoch_us(ts) AS ts_us,
               CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
               round(sum(value) OVER w, 2) AS value_last_hour
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY ts
            RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
        )
    """,
)
def events_rolling_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-hour activity features (the classic
    time-series feature-engineering shape): for every event, how many
    events and how much value the same user produced in the preceding
    hour, inclusive. An event-time RANGE frame — the frame is defined
    by VALUE distance on the (microsecond) timestamp, so sparse and
    bursty users get correct windows where a ROWS frame would not.

    One shuffle on user_id, sort within partition; per-user row counts
    are bounded (~activity per user), so no window partition can
    outgrow an executor — the same scaling argument as every keyed
    window here."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count("*").over(w).alias("n_last_hour"),
        F.round(F.sum("value").over(w), 2).alias("value_last_hour"),
    )


@query(
    "events_funnel",
    oracle="""
        WITH s AS (
            SELECT user_id, min(ts) AS s_ts FROM events
            WHERE event_type = 'signup' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS c_ts
            FROM events e JOIN s ON e.user_id = s.user_id
            WHERE e.event_type = 'click' AND e.ts > s.s_ts
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS p_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
            GROUP BY 1
        )
        SELECT s.user_id,
               epoch_us(s.s_ts) AS signup_us,
               epoch_us(c.c_ts) AS click_us,
               epoch_us(p.p_ts) AS purchase_us
        FROM s
        LEFT JOIN c ON s.user_id = c.user_id
        LEFT JOIN p ON c.user_id = p.user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel per user: first signup, first click
    AFTER that signup, first purchase AFTER that click (NULL where the
    user never advances). The ordering constraint is what makes this a
    funnel rather than three independent mins — each stage's timestamp
    must strictly follow the previous stage's.

    Shape: three keyed min-aggregations chained by user_id joins —
    every shuffle is on user_id, stage outputs are one row per
    qualifying user, so each join's build side only shrinks. No
    windows, no sort of the full event stream."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select(
        "user_id", "event_type", F.unix_micros("ts").alias("ts_us")
    )
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("signup_us"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts_us") > F.col("signup_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("click_us"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts_us") > F.col("click_us"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("purchase_us"))
    )
    return (
        s.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "signup_us", "click_us", "purchase_us")
    )


@query(
    "events_user_features",
    oracle="""
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_purchases,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_clicks,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_errors,
               round(CAST(sum(CASE WHEN event_type = 'purchase' THEN value
                                   ELSE 0 END) AS DOUBLE), 2)
                   AS purchase_value,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS active_days,
               epoch_us(min(ts)) AS first_seen_us,
               epoch_us(max(ts)) - epoch_us(min(ts)) AS tenure_us
        FROM events
        GROUP BY user_id
    """,
)
def events_user_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user feature row — the aggregate a training pipeline joins
    onto interaction data: event counts by type, purchase revenue,
    distinct active days, first-seen timestamp, tenure.

    One hash aggregation keyed on user_id: conditional counts are
    map-side-combined sums; the single COUNT(DISTINCT date) rides the
    same shuffle via Spark's expand (a bounded ×2 of the input rows,
    the standard cost of one exact distinct alongside plain aggs).
    No second scan, no join, no window."""
    t = load_tables(spark, sf_dir, ("events",))

    def flag(tp):
        return F.sum(
            F.when(F.col("event_type") == tp, 1).otherwise(0)
        ).cast("long")

    return t["events"].groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        flag("purchase").alias("n_purchases"),
        flag("click").alias("n_clicks"),
        flag("error").alias("n_errors"),
        F.round(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase", F.col("value")
                ).otherwise(0.0)
            ),
            2,
        ).alias("purchase_value"),
        F.countDistinct(F.to_date("ts")).cast("long").alias("active_days"),
        F.unix_micros(F.min("ts")).alias("first_seen_us"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "tenure_us"
        ),
    )


@query(
    "events_retention",
    oracle="""
        WITH cohort AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
            FROM events GROUP BY user_id
        ),
        activity AS (
            SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day
            FROM events
        )
        SELECT c.cohort_day,
               CAST(date_diff('day', c.cohort_day, a.active_day) AS INTEGER)
                   AS day_offset,
               CAST(count(*) AS BIGINT) AS n_active_users
        FROM activity a JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active day,
    counted on each later active day — the engagement table behind
    every retention curve.

    Three user-keyed stages that all shuffle on the same key
    (first-seen aggregate, distinct active days, cohort join), so at
    scale one exchange's partitioning is reused; the final matrix is
    days × offsets — tiny. The (user, day) distinct happens BEFORE the
    join, so the join input is already collapsed."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select("user_id", F.to_date("ts").alias("d"))
    cohort = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    activity = ev.distinct().withColumnRenamed("d", "active_day")
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active_users"))
    )


@query(
    "events_anomaly_zscore",
    oracle="""
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS h, event_type,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        scored AS (
            SELECT h, event_type, cnt,
                   avg(cnt) OVER w AS mu,
                   stddev(cnt) OVER w AS sd
            FROM hourly
            WINDOW w AS (PARTITION BY event_type ORDER BY h
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT epoch_us(h) AS hour_start, event_type,
               CAST(cnt AS BIGINT) AS cnt,
               round((cnt - mu) / NULLIF(sd, 0), 2) AS zscore,
               coalesce(abs((cnt - mu) / NULLIF(sd, 0)) > 3, FALSE)
                   AS is_anomaly
        FROM scored
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-volume anomaly detection — the data-quality monitor a
    pipeline runs on every batch: hourly event counts per type scored
    against the trailing 24 hours' mean/stddev, |z| > 3 flagged.

    Two cheap stages: the hourly aggregate collapses the corpus to
    (hours × types) rows, and the trailing window runs over THAT tiny
    series (partitioned by type — never a corpus-sized window). At
    100 TB the expensive part stays the map-side-combined count."""
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("h"), "event_type"
        )
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-24, -1)
    )
    z = (F.col("cnt") - F.avg("cnt").over(w)) / F.nullif(
        F.stddev("cnt").over(w), F.lit(0)
    )
    return hourly.select(
        F.unix_micros("h").alias("hour_start"),
        "event_type",
        F.col("cnt").cast("long").alias("cnt"),
        F.round(z, 2).alias("zscore"),
        F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "cdc_scd2_history",
    oracle="""
        SELECT o_custkey,
               round(o_totalprice, 2) AS price,
               strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
               strftime(lead(o_orderdate) OVER w, '%Y-%m-%d')
                   AS valid_to,
               (lead(o_orderdate) OVER w IS NULL) AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    """,
)
def cdc_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 history — the warehouse
    pattern that turns a change stream into validity intervals: each
    version of a key carries [valid_from, valid_to) from its own
    timestamp to the NEXT version's, with the open (current) version
    flagged. Orders stand in as per-customer attribute versions; the
    (date, orderkey) tie-break keeps interval order total.

    Expressed as one lead() window — the declarative lowering of the
    MERGE-with-row-versioning dance imperative SCD2 loaders do.
    Scale: one shuffle on the key, sort within partitions; no join,
    no self-join (the naive formulation joins the table to itself on
    version-adjacency and shuffles twice)."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return t["orders"].select(
        "o_custkey",
        F.round("o_totalprice", 2).alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


@query(
    "events_gap_fill",
    oracle="""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        spans AS (
            SELECT event_type, min(h) AS h0, max(h) AS h1
            FROM hourly GROUP BY event_type
        ),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(h0, h1,
                                          INTERVAL '1 hour')) AS h
            FROM spans
        )
        SELECT g.event_type,
               epoch_us(g.h) AS hour_us,
               coalesce(hh.cnt, 0) AS cnt,
               (hh.cnt IS NULL) AS filled
        FROM grid g LEFT JOIN hourly hh USING (event_type, h)
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling — the hypertable/timeseries primitive
    dashboards and anomaly detectors need: densify each series onto a
    complete hourly grid between its own first and last points, with
    missing hours emitted as explicit zero rows (flagged), so
    downstream window math (moving averages, z-scores) sees a uniform
    clock instead of silently skipping quiet hours.

    The grid comes from sequence()/explode over each series' span —
    generated, never stored; the fill is one LEFT join of grid
    against the hourly rollup on (series, hour). Scale: the rollup
    collapses the corpus first (map-side partial), so both join sides
    are O(series × hours), not O(events); the grid side is tiny and
    broadcasts. Timestamps ride as epoch-micro longs — integer-exact
    cross-engine."""
    t = load_tables(spark, sf_dir, ("events",))
    hourly = (
        t["events"]
        .groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
        )
        .agg(F.count("*").alias("cnt"))
    )
    grid = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence(
                    "h0", "h1", F.expr("INTERVAL 1 HOUR")
                )
            ).alias("h"),
        )
    )
    return grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        F.unix_micros(F.col("h")).alias("hour_us"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
        F.col("cnt").isNull().alias("filled"),
    )


@query(
    "events_markov_transitions",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        ),
        c AS (
            SELECT event_type AS src_type, next_type AS dst_type,
                   count(*) AS n
            FROM seq WHERE next_type IS NOT NULL
            GROUP BY 1, 2
        ),
        t AS (SELECT src_type, sum(n) AS tot FROM c GROUP BY 1)
        SELECT c.src_type, c.dst_type, CAST(c.n AS BIGINT) AS n,
               round(c.n * 1.0 / t.tot, 6) AS prob
        FROM c JOIN t USING (src_type)
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — P(next event type | current type) — the behavioral
    fingerprint behind funnel diagnostics, bot detection (near-
    deterministic transition rows), and synthetic-session generation.

    Shape: ONE window (lead over user_id, the natural partition key)
    + two keyed aggregations over the |types|² transition table —
    tiny, value-domain-sized. The probability divides two exact
    integers, rounded identically on both engines; ties in ts are
    broken by event_id so the lead order is engine-deterministic.

    Scale: the window shuffles on user_id (same key every sessionize
    op uses — one exchange, reusable across the family); the
    transition matrix itself is |event types|², independent of corpus
    size — the canonical small-result/big-scan aggregation."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        F.col("event_type").alias("src_type"),
        F.lead("event_type").over(w).alias("dst_type"),
    )
    c = (
        seq.filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n"))
    )
    tot = c.groupBy("src_type").agg(F.sum("n").alias("tot"))
    return c.join(F.broadcast(tot), "src_type").select(
        "src_type",
        "dst_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.col("tot"), 6).alias("prob"),
    )


@query(
    "events_attribution_last_touch",
    oracle="""
        WITH carried AS (
            SELECT event_id, user_id, event_type, value,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id
                             ORDER BY ts,
                                      CAST(event_type = 'purchase'
                                           AS INTEGER),
                                      event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS touch_type
            FROM events
        )
        SELECT coalesce(touch_type, '(direct)') AS touch_type,
               CAST(count(*) AS BIGINT) AS n_conversions,
               round(sum(value), 2) AS attributed_value
        FROM carried
        WHERE event_type = 'purchase'
        GROUP BY 1
    """,
)
def events_attribution_last_touch(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Last-touch attribution: every purchase credits the user's most
    recent preceding NON-purchase event type (or '(direct)' when the
    purchase is the user's first event) — the standard marketing /
    funnel attribution model, aggregated to credited conversions and
    value per touch type.

    Same carry-forward idiom as events_asof_join: one window per
    user_id ordered by (ts, is_purchase, event_id) — the is_purchase
    tie-break keeps a same-timestamp purchase from crediting itself —
    with a frame ending at the previous row so the attribution is
    STRICTLY earlier; ``last(..., ignorenulls=True)`` carries the
    latest touch forward past intervening purchases.

    Scale: one shuffle on user_id + one value-domain-sized aggregate;
    the double sum is rounded identically on both engines (registry
    float discipline)."""
    t = load_tables(spark, sf_dir, ("events",))
    is_p = F.col("event_type") == "purchase"
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", is_p.cast("int"), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carried = t["events"].select(
        "event_type",
        "value",
        F.last(F.when(~is_p, F.col("event_type")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return (
        carried.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.coalesce(F.col("touch_type"), F.lit("(direct)")).alias(
                "touch_type"
            )
        )
        .agg(
            F.count("*").cast("long").alias("n_conversions"),
            F.round(F.sum("value"), 2).alias("attributed_value"),
        )
    )


@query(
    "events_rfm_scores",
    oracle="""
        WITH mx AS (SELECT max(epoch_us(ts)) AS corpus_hi FROM events),
        u AS (
            SELECT user_id,
                   CAST((mx.corpus_hi - max(epoch_us(ts)))
                        // 86400000000 AS BIGINT) AS recency_days,
                   CAST(count(*) AS BIGINT) AS frequency,
                   CAST(round(round(sum(value), 2), 0) AS BIGINT)
                       AS monetary_usd
            FROM events, mx
            GROUP BY user_id, mx.corpus_hi
        ),
        n AS (SELECT count(*) AS n_users FROM u),
        hr AS (SELECT recency_days AS v, count(*) AS c FROM u GROUP BY 1),
        hf AS (SELECT frequency AS v, count(*) AS c FROM u GROUP BY 1),
        hm AS (SELECT monetary_usd AS v, count(*) AS c FROM u GROUP BY 1),
        br AS (
            SELECT v, coalesce(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS below
            FROM hr
        ),
        bf AS (
            SELECT v, coalesce(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS below
            FROM hf
        ),
        bm AS (
            SELECT v, coalesce(sum(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS below
            FROM hm
        )
        SELECT u.user_id, u.recency_days, u.frequency, u.monetary_usd,
               CAST(5 - (5 * br.below) // n.n_users AS INTEGER) AS r_score,
               CAST(1 + (5 * bf.below) // n.n_users AS INTEGER) AS f_score,
               CAST(1 + (5 * bm.below) // n.n_users AS INTEGER) AS m_score,
               CAST((5 - (5 * br.below) // n.n_users) * 100
                    + (1 + (5 * bf.below) // n.n_users) * 10
                    + (1 + (5 * bm.below) // n.n_users) AS INTEGER)
                   AS rfm_cell
        FROM u
        JOIN br ON br.v = u.recency_days
        JOIN bf ON bf.v = u.frequency
        JOIN bm ON bm.v = u.monetary_usd, n
    """,
)
def events_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) quintile scoring per user
    — the classic behavioral feature-engineering rollup: days since
    last event, event count, and whole-unit spend, each mapped to a
    1-5 quintile by EXACT corpus rank (5 = most recent recency, 5 =
    highest frequency/monetary), plus the combined 3-digit RFM cell.

    Quintiles use the value-HISTOGRAM prefix-sum pattern
    (sample_curriculum_buckets): each metric is quantized to a
    value-bounded domain FIRST — recency to whole days, monetary to
    whole currency units, frequency is already a small integer — so
    the cumulative "users below" window runs over a domain-sized
    histogram, never the user table, and ties share a score (a pure
    function of the value: deterministic on both engines, no
    ntile-on-ties ambiguity). Score arithmetic is integer floor
    division throughout.

    Scale: one user-keyed aggregate over the events scan, three
    domain-sized histograms with prefix sums, three broadcast joins
    back. The user table itself never globally sorts."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    mx = ev.agg(F.max("ts_us").alias("corpus_hi"))
    u = (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("user_id", "corpus_hi")
        .agg(
            F.max("ts_us").alias("last_us"),
            F.count("*").alias("frequency"),
            F.round(F.sum("value"), 2).alias("spend"),
        )
        .select(
            "user_id",
            F.expr("(corpus_hi - last_us) div 86400000000")
            .cast("long")
            .alias("recency_days"),
            F.col("frequency").cast("long").alias("frequency"),
            F.round(F.col("spend"), 0).cast("long").alias("monetary_usd"),
        )
    )
    n = u.agg(F.count("*").alias("n_users"))

    def below_table(metric: str) -> DataFrame:
        h = u.groupBy(F.col(metric).alias("v")).agg(
            F.count("*").alias("c")
        )
        w = W.orderBy("v").rowsBetween(W.unboundedPreceding, -1)
        return h.select(
            "v", F.coalesce(F.sum("c").over(w), F.lit(0)).alias("below")
        )

    br = below_table("recency_days").withColumnRenamed("below", "below_r")
    bf = below_table("frequency").withColumnRenamed("below", "below_f")
    bm = below_table("monetary_usd").withColumnRenamed("below", "below_m")
    scored = (
        u.join(F.broadcast(br), u["recency_days"] == br["v"])
        .drop("v")
        .join(F.broadcast(bf), u["frequency"] == bf["v"])
        .drop("v")
        .join(F.broadcast(bm), u["monetary_usd"] == bm["v"])
        .drop("v")
        .crossJoin(F.broadcast(n))
    )
    r = F.expr("5 - (5 * below_r) div n_users").cast("int")
    f = F.expr("1 + (5 * below_f) div n_users").cast("int")
    m = F.expr("1 + (5 * below_m) div n_users").cast("int")
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_usd",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        (r * 100 + f * 10 + m).cast("int").alias("rfm_cell"),
    )


@query(
    "events_transition_entropy",
    oracle="""
        WITH seq AS (
            SELECT user_id, event_type AS src,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS dst
            FROM events
        ),
        tc AS (
            SELECT user_id, src, dst, count(*) AS c
            FROM seq WHERE dst IS NOT NULL
            GROUP BY user_id, src, dst
        ),
        terms AS (
            SELECT user_id, c,
                   c * CAST(round(ln(CAST(c AS DOUBLE)) * 1000000)
                            AS BIGINT) AS clnc_micro
            FROM tc
        )
        SELECT user_id,
               CAST(sum(c) AS BIGINT) AS n_transitions,
               CAST(count(*) AS BIGINT) AS n_distinct_transitions,
               round(ln(CAST(sum(c) AS DOUBLE))
                     - sum(clnc_micro) / (sum(c) * 1000000.0),
                     4) AS entropy_nats
        FROM terms GROUP BY user_id
    """,
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy over (event, next-event) transition
    pairs — the bot/script detector: automation replays the same
    transition loop (entropy → 0 as sequences determinize), organic
    users spread mass across the transition matrix. The per-user twin
    of events_markov_transitions' corpus matrix, and the events-table
    analog of text_entropy_unigram's self-distribution entropy —
    same H = ln(n) − (1/n)·Σ c·ln(c) identity, so ln() runs only on
    INTEGER counts and the micro-nat sums are exact and
    aggregation-order-free on both engines.

    Scale: one lead window on user_id (the shared sessionize
    exchange), one (user, src, dst)-keyed count with map-side combine,
    one user-keyed rollup. Users with a single event have no
    transitions and drop out on both engines identically."""
    t = load_tables(spark, sf_dir, ("events",))
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    )
    tc = (
        seq.filter(F.col("dst").isNotNull())
        .groupBy("user_id", "src", "dst")
        .agg(F.count("*").alias("c"))
    )
    terms = tc.select(
        "user_id",
        "c",
        (
            F.col("c")
            * F.round(F.log(F.col("c").cast("double")) * 1_000_000).cast(
                "long"
            )
        ).alias("clnc_micro"),
    )
    return terms.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_transitions"),
        F.count("*").cast("long").alias("n_distinct_transitions"),
        F.round(
            F.log(F.sum("c").cast("double"))
            - F.sum("clnc_micro") / (F.sum("c") * 1_000_000.0),
            4,
        ).alias("entropy_nats"),
    )


@query(
    "events_user_growth",
    oracle="""
        WITH firsts AS (
            SELECT user_id, min(CAST(ts AS DATE)) AS first_day
            FROM events GROUP BY user_id
        ),
        new_by_day AS (
            SELECT first_day AS day, count(*) AS n_new
            FROM firsts GROUP BY first_day
        ),
        active AS (
            SELECT CAST(ts AS DATE) AS day,
                   count(DISTINCT user_id) AS n_active
            FROM events GROUP BY 1
        )
        SELECT CAST(strftime(a.day, '%Y-%m-%d') AS VARCHAR) AS day,
               CAST(coalesce(n.n_new, 0) AS BIGINT) AS n_new_users,
               CAST(a.n_active AS BIGINT) AS n_active_users,
               CAST(coalesce(sum(n.n_new) OVER (
                   ORDER BY a.day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), 0) AS BIGINT) AS cumulative_users
        FROM active a LEFT JOIN new_by_day n ON n.day = a.day
    """,
)
def events_user_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily user-growth curve: new users (first-seen that day),
    active users, and the cumulative distinct-user count — the
    retention/DAU dashboard primitive. The cumulative distinct is
    EXACT without any distinct-over-window machinery via the identity
    |users seen ≤ d| = Σ_{d'≤d} |first-seen on d'|: one user-keyed
    min aggregate, then a prefix sum over the DAY histogram — the
    value-domain window pattern (days, not events, and certainly not
    users) shared with sample_curriculum_buckets and the RFM scorer.

    Scale: two keyed aggregates over the events scan (user_id, then
    day — both map-side combinable; the exact per-day distinct rides
    Spark's expand), a days-sized window, one broadcast-sized join.
    Nothing user- or event-cardinality-sized ever sorts."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select(
        "user_id", F.to_date("ts").alias("day")
    )
    firsts = ev.groupBy("user_id").agg(F.min("day").alias("first_day"))
    new_by_day = firsts.groupBy(
        F.col("first_day").alias("day")
    ).agg(F.count("*").alias("n_new"))
    active = ev.groupBy("day").agg(
        F.countDistinct("user_id").alias("n_active")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    joined = active.join(F.broadcast(new_by_day), "day", "left")
    return joined.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("long").alias(
            "n_new_users"
        ),
        F.col("n_active").cast("long").alias("n_active_users"),
        F.coalesce(
            F.sum("n_new").over(w), F.lit(0)
        ).cast("long").alias("cumulative_users"),
    )
