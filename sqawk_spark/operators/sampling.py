"""Deterministic sampling and dataset splitting for training
pipelines.

Everything here is hash-bucketed, never ``rand()``: a split decided by
``md5(key)`` is reproducible across reruns, engines, executor counts,
and partitionings — re-ingesting the corpus next month puts every
document in the same split, which is what makes held-out sets valid.
Both operators share the bucketing expression with their DuckDB
oracles (md5 is md5 in both engines), so the assignment is checked
value-for-value, not just statistically.

Scale: both are single-scan map-side expressions; the stratified
variant adds one tiny per-stratum aggregate that broadcasts. No
operator here shuffles the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

# 16 bits of the md5 → bucket. The modulo is negligibly biased
# (65536 % N buckets are 1/65536 heavier); the SAME bias exists in
# both engines so parity is exact, and no split boundary cares.
_N_BUCKETS = 100
_N_BUCKETS_FINE = 10000


def _bucket_col(key, n: int):
    """Spark side: first 4 hex chars of md5(key) as an int, mod n."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10)
        .cast("int")
        % n
    )


def _bucket_sql(key: str, n: int) -> str:
    """DuckDB side of the same expression."""
    return (
        f"CAST(concat('0x', substr(md5(CAST({key} AS VARCHAR)), 1, 4))"
        f" AS INTEGER) % {n}"
    )


@query(
    "sample_split",
    oracle=f"""
        SELECT doc_id,
               CASE WHEN {_bucket_sql('doc_id', _N_BUCKETS)} < 90 THEN 'train'
                    WHEN {_bucket_sql('doc_id', _N_BUCKETS)} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
)
def sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test split, decided per document by hashing
    its id. One scan, no shuffle, no random state; adding documents
    never moves existing ones between splits."""
    t = load_tables(spark, sf_dir, ("documents",))
    b = _bucket_col(F.col("doc_id"), _N_BUCKETS)
    return t["documents"].select(
        "doc_id",
        F.when(b < 90, "train").when(b < 95, "val").otherwise("test")
        .alias("split"),
    )


@query(
    "sample_stratified_balanced",
    oracle=f"""
        WITH counts AS (
            SELECT source, count(*) AS cnt FROM documents GROUP BY source
        ),
        target AS (SELECT min(cnt) AS tgt FROM counts)
        SELECT d.doc_id, d.source
        FROM documents d
        JOIN counts c ON d.source = c.source
        CROSS JOIN target
        WHERE {_bucket_sql('d.doc_id', _N_BUCKETS_FINE)}
              < (tgt * {_N_BUCKETS_FINE}) // c.cnt
    """,
)
def sample_stratified_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balanced downsampling: per-stratum (source) keep-rate =
    rarest-stratum size / stratum size, applied as an integer bucket
    threshold on the document hash. The common corpus-rebalancing
    step before training, made deterministic.

    Plan shape: one aggregate over the strata (a handful of rows,
    broadcast back), then a single filtered scan. The corpus itself
    is never shuffled, and the kept set is stable under reruns and
    repartitioning. Keep-rates are approximate within 1/10000
    (integer threshold), exact in expectation."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    counts = docs.groupBy("source").agg(F.count("*").alias("cnt"))
    target = counts.agg(F.min("cnt").alias("tgt"))
    b = _bucket_col(F.col("doc_id"), _N_BUCKETS_FINE)
    return (
        docs.join(F.broadcast(counts), "source")
        .join(F.broadcast(target))
        .filter(
            # floor division matches the oracle's `//` exactly
            b
            < F.floor(
                (F.col("tgt") * _N_BUCKETS_FINE).cast("long")
                / F.col("cnt").cast("long")
            )
        )
        .select("doc_id", "source")
    )


_SHUFFLE_SALT = ":shuffle:42"

# Bucket = integer value of the first 4 hex chars of the salted md5.
# Two properties make the numbering correct and deterministic:
#   1. the bucket is a PURE FUNCTION of the row (a prefix of the sort
#      key), so the count pass and the ranking pass agree on membership
#      no matter how Spark partitions either job — unlike
#      repartitionByRange, whose sampled boundaries differ between jobs
#      (RangePartitioner seeds its reservoir RNG with the RDD id);
#   2. md5 hex is lowercase fixed-width, so lexicographic order of the
#      prefix equals numeric order of the bucket: ordering by
#      (bucket, h, doc_id) IS ordering by (h, doc_id).
# 65536 buckets ≈ 1.5 GB/bucket at 100 TB — each within-bucket sort
# fits one task; the count pass collects ≤65536 rows to the driver.
_N_SHUFFLE_BUCKETS = 1 << 16


def deterministic_shuffle(df: DataFrame, key) -> DataFrame:
    """Assign each row a stable 1-based ``shuffle_pos`` ordered by
    ``md5(key || salt)`` with ``key`` as tie-break.

    Two-phase global rank without a global window: per-bucket counts
    (tiny collect, cumulative bases broadcast back) + per-bucket
    row_number. Both phases key on the hash-prefix bucket, a pure
    function of the row, so they cannot disagree across jobs — the
    failure mode that made the earlier repartitionByRange +
    partition-offset formulation non-reproducible at scale (boundary
    rows swapped partitions between the stats job and the output job).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    hashed = df.withColumn(
        "__h", F.md5(F.concat(key.cast("string"), F.lit(_SHUFFLE_SALT)))
    ).withColumn(
        "__b",
        F.conv(F.substring("__h", 1, 4), 16, 10).cast("int"),
    )
    counts = hashed.groupBy("__b").agg(F.count("*").alias("__n")).collect()
    bases, acc = [], 0
    for r in sorted(counts, key=lambda r: r["__b"]):
        bases.append((r["__b"], acc))
        acc += r["__n"]
    base_df = spark.createDataFrame(bases or [(0, 0)], "__b int, __base long")
    w = Window.partitionBy("__b").orderBy("__h", key)
    return (
        hashed.join(F.broadcast(base_df), "__b")
        .withColumn(
            "shuffle_pos",
            (F.col("__base") + F.row_number().over(w)).cast("long"),
        )
        .drop("__h", "__b", "__base")
    )


@query(
    "sample_shuffle_deterministic",
    oracle=f"""
        SELECT doc_id,
               CAST(row_number() OVER (
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '{_SHUFFLE_SALT}'),
                            doc_id
               ) AS BIGINT) AS shuffle_pos
        FROM documents
    """,
)
def sample_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-order shuffle: every document gets a
    stable global position ordered by a salted hash — reproducible
    across reruns, engines, and executor counts, unlike ORDER BY
    random().

    The scalable layout, not a global window: hash-prefix bucketing
    (see :func:`deterministic_shuffle`) gives a per-bucket window plus
    a broadcast base-offset table. The oracle is the single-node
    formulation (row_number over the same total order); equality
    proves the two-phase numbering IS the global rank."""
    t = load_tables(spark, sf_dir, ("documents",))
    return deterministic_shuffle(
        t["documents"].select("doc_id"), F.col("doc_id")
    ).select("doc_id", "shuffle_pos")


@query(
    "sample_importance_weighted",
    oracle="""
        WITH w AS (
            SELECT doc_id, n_chars, lang,
                   least(1.0, n_chars / 400.0) AS keep_w,
                   CAST(concat('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                        AS BIGINT) AS h
            FROM documents
        )
        SELECT doc_id, lang,
               round(keep_w, 6) AS keep_w
        FROM w
        WHERE h < keep_w * 4294967296.0
    """,
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance-weighted corpus sampling — keep each document with
    probability proportional to a per-document quality weight (here
    length-based, capped at 1.0: the up-weight-long-documents policy
    most pretraining mixes use a variant of). Acceptance is
    hash-thresholded: keep iff the first 32 md5 bits of the doc id,
    as an integer, fall below weight·2³². Deterministic — the same
    document survives on any engine, partitioning, or rerun (the same
    md5 idiom as the split/stratified samplers), unlike rand()-based
    Bernoulli sampling, and the expected kept fraction equals the
    mean weight exactly.

    The weight·2³² product and comparison run in f64 (exact for
    integers < 2⁵³ and identical cross-engine), so there is no
    boundary ambiguity the oracle could disagree on.

    Scale: map-only — one scan, predicate inside codegen, no shuffle,
    no driver traffic; re-weighting the mix is a constant change, not
    a recompute of any index."""
    t = load_tables(spark, sf_dir, ("documents",))
    keep_w = F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        t["documents"]
        .select(
            "doc_id",
            "lang",
            keep_w.alias("keep_w"),
            h.alias("h"),
        )
        .filter(F.col("h") < F.col("keep_w") * 4294967296.0)
        .select("doc_id", "lang", F.round("keep_w", 6).alias("keep_w"))
    )


@query(
    "sample_lang_temperature",
    oracle="""
        WITH s AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_l
            FROM documents GROUP BY 1
        ), tot AS (
            SELECT CAST(sum(CAST(round(sqrt(n_l) * 1000000) AS BIGINT))
                        AS BIGINT) AS sumw,
                   CAST(sum(n_l) AS BIGINT) // 2 AS n_target
            FROM s
        ), rates AS (
            SELECT s.lang,
                   least(1.0,
                         (tot.n_target
                          * CAST(round(sqrt(s.n_l) * 1000000) AS BIGINT))
                         / (tot.sumw * 1.0 * s.n_l)) AS r
            FROM s, tot
        )
        SELECT d.doc_id, d.lang, round(rates.r, 6) AS keep_rate
        FROM documents d JOIN rates ON d.lang = rates.lang
        WHERE CAST(concat('0x',
                   substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) < rates.r * 4294967296.0
    """,
)
def sample_lang_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing (α = 0.5) — the multilingual
    pretraining sampler: per-language keep rates proportional to
    n^α / n, so low-resource languages are up-weighted relative to
    their corpus share while the total stays at the target size
    (half the corpus here). The mBERT/XLM-R exponent-sampling recipe
    as a deterministic engine operator.

    Determinism at the rate boundary: weights are
    ``round(sqrt(n)·10⁶)`` integers, so the weight SUM is exact and
    order-free (a sum of raw sqrt doubles would be order-dependent in
    the last ulp — and one ulp at the threshold flips a document);
    the rate is one integer×integer product divided by another, both
    < 2⁵³, hence bit-identical everywhere. Acceptance is the md5
    hash-threshold idiom shared with the other samplers — the same
    document survives on any engine, partitioning, or rerun.

    Scale: one 5-row language aggregate, rates broadcast back, accept
    predicate inside codegen — no shuffle of the corpus, no driver
    traffic; retuning α or the target is a constant change."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    w = F.round(F.sqrt(F.col("n_l")) * 1_000_000).cast("long")
    s = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    # floor EXPLICITLY on both sides: Spark's double-divide + cast
    # truncates while DuckDB's CAST(x/2.0 AS BIGINT) rounds half-even,
    # so an odd corpus count would put the two engines one document
    # apart at every rate boundary. floor()/`//` agree everywhere.
    tot = s.agg(
        F.sum(w).alias("sumw"),
        F.floor(F.sum("n_l") / 2).cast("long").alias("n_target"),
    )
    rates = (
        s.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.least(
                F.lit(1.0),
                (F.col("n_target") * w)
                / (F.col("sumw") * 1.0 * F.col("n_l")),
            ).alias("r"),
        )
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(h < F.col("r") * 4294967296.0)
        .select("doc_id", "lang", F.round("r", 6).alias("keep_rate"))
    )


@query(
    "sample_curriculum_buckets",
    oracle="""
        WITH h AS (
            SELECT n_chars, CAST(count(*) AS BIGINT) AS c
            FROM documents GROUP BY 1
        ),
        cum AS (
            SELECT n_chars,
                   CAST(coalesce(sum(c) OVER (ORDER BY n_chars
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS below
            FROM h
        ),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
        SELECT d.doc_id, d.n_chars,
               CAST((4 * cum.below) // tot.n AS INTEGER) AS bucket
        FROM documents d
        JOIN cum ON d.n_chars = cum.n_chars
        CROSS JOIN tot
    """,
)
def sample_curriculum_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum quartile assignment by document length — EXACT
    corpus quantiles without a global sort, the pattern every
    length-ordered curriculum or bucketed-batching schedule needs.

    A naive ``ntile(4) OVER (ORDER BY n_chars)`` is a single-partition
    total sort AND nondeterministic on ties. Instead: aggregate the
    corpus into a VALUE HISTOGRAM (one row per distinct length — the
    value domain, not the corpus), take a running count over that tiny
    table, and assign ``bucket = 4·|{docs shorter}| ÷ N`` (integer
    division — exact, engine-identical). Ties share a length, hence a
    bucket: the assignment is a pure function of the document's value,
    deterministic across engines, partitionings, and reruns.

    Scale: one map-side-combinable histogram aggregate (distinct
    lengths ≪ corpus — a value-bounded domain), one window over the
    HISTOGRAM (thousands of rows, not the corpus), and one join back
    keyed on n_chars that AQE broadcasts. The corpus itself never
    sorts and never shuffles."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    from pyspark.sql import Window as W

    h = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    w = (
        W.orderBy("n_chars")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = h.select(
        "n_chars",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("below"),
    )
    tot = docs.agg(F.count(F.lit(1)).alias("n"))
    return (
        docs.select("doc_id", "n_chars")
        .join(F.broadcast(cum), "n_chars")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_chars",
            F.expr("CAST((4 * below) DIV n AS INT)").alias("bucket"),
        )
    )


# Efraimidis–Spirakis weighted sampling without replacement: give row
# i the key u_i^(1/w_i) with u_i uniform, keep the k largest keys —
# provably equivalent to drawing k rows sequentially without
# replacement with probability ∝ weight. We rank by the monotone
# equivalent ln(u)/w (descending), with u derived from 52 md5 bits so
# the draw is a pure function of the row.
#
# Cross-engine exactness: h < 2^52, so h + 0.5 is an EXACT double
# (ulp ≤ 0.5 over the whole range) and u = (h+0.5)/2^52 is one exact
# IEEE divide — both engines start from bit-identical doubles. ln()
# is the only library call (each engine ≤1 ulp but not necessarily
# the SAME ulp); the key is rounded to integer nano-units, so a
# cross-engine flip needs the true value within ~1e-9 ulp-widths of a
# .5 boundary — ~1e-9 probability per corpus, not per row. Ranks are
# then integer-ordered with a doc_id tie-break: order-free.
_WOR_SALT = ":wor:42"
_WOR_K = 200
_WOR_SALT_BUCKETS = 8
_WOR_DENOM = 4503599627370496.0  # 2^52, exact
_WOR_SCALE = 1000000000.0  # nano-units: |key| ≤ 36e9, well inside int64


@query(
    "sample_weighted_reservoir",
    oracle=f"""
        WITH keyed AS (
            SELECT doc_id, n_chars,
                   CAST(round(
                       ln((CAST(concat('0x',
                               substr(md5(CAST(doc_id AS VARCHAR)
                                          || '{_WOR_SALT}'), 1, 13))
                               AS BIGINT) + 0.5) / {_WOR_DENOM!r})
                       / n_chars * {_WOR_SCALE!r}) AS BIGINT) AS key_u
            FROM documents WHERE n_chars > 0
        ),
        ranked AS (
            SELECT doc_id, n_chars, key_u,
                   row_number() OVER (ORDER BY key_u DESC, doc_id) AS rn
            FROM keyed
        )
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars, key_u,
               CAST(rn AS INTEGER) AS rank
        FROM ranked WHERE rn <= {_WOR_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sample WITHOUT replacement (k = 200, weight =
    document length) via the Efraimidis–Spirakis key ``u^(1/w)`` —
    the draw behind "pick a fixed-size, length-weighted subset for
    annotation/eval" that a with-replacement or Bernoulli sampler
    can't provide (those give a random-SIZED or duplicated sample).

    Unlike a sequential reservoir, the E-S formulation is
    embarrassingly parallel: the key is a pure per-row function
    (salted md5 bits → uniform → ln(u)/w in integer nano-units, see
    module comment for the exactness argument), and without-
    replacement selection is just global top-k over keys. The same
    md5 derivation makes the drawn set identical across engines,
    reruns, and partitionings.

    Scale: one map-only keying scan, then the exact two-phase salted
    top-k (``window_rank``'s proof): per-salt-bucket row_number keeps
    ≤ 8·k candidates, the final global window orders 1 600 rows, not
    the corpus. No global sort, no corpus shuffle — at 100 TB the
    exchange carries only the per-bucket survivors."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir, ("documents",))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"),
                           F.lit(_WOR_SALT))),
            1, 13,
        ),
        16, 10,
    ).cast("long")
    keyed = (
        t["documents"]
        .filter(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "n_chars",
            F.round(
                F.log((h + 0.5) / _WOR_DENOM)
                / F.col("n_chars") * _WOR_SCALE
            ).cast("long").alias("key_u"),
        )
    )
    order = (F.col("key_u").desc(), "doc_id")
    salted = keyed.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(_WOR_SALT_BUCKETS))
    )
    wl = W.partitionBy("salt").orderBy(*order)
    cand = (
        salted.withColumn("lrn", F.row_number().over(wl))
        .filter(F.col("lrn") <= _WOR_K)
    )
    w = W.orderBy(*order)
    return (
        cand.select(
            "doc_id",
            "n_chars",
            "key_u",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= _WOR_K)
    )


def _cluster_safe_split_sql() -> str:
    # imported lazily: dedup's CTE constants are module-level strings
    from sqawk_spark.operators.dedup import _COMPONENT_CTES, _SHINGLE_CTES

    return f"""
        WITH RECURSIVE {_SHINGLE_CTES},
        {_COMPONENT_CTES}
        SELECT d.doc_id,
               CAST(coalesce(c.canon, d.doc_id) AS BIGINT) AS split_key,
               CASE WHEN CAST(concat('0x',
                        substr(md5(CAST(coalesce(c.canon, d.doc_id)
                                        AS VARCHAR)), 1, 4))
                        AS INTEGER) % {_N_BUCKETS} < 90
                    THEN 'train' ELSE 'val' END AS split
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
    """


@query("sample_split_cluster_safe", oracle=_cluster_safe_split_sql())
def sample_split_cluster_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: hash the near-dup CLUSTER, not
    the document. A plain per-doc hash split puts two near-identical
    documents on opposite sides of the split ~2·p·(1-p) of the time,
    and every such pair leaks training text into the held-out set —
    the classic way eval numbers go quietly stale. Here every member
    of a duplicate cluster inherits the cluster's canonical doc_id as
    its split key (singletons key on themselves), so a cluster moves
    to one side atomically; tests/test_extensions.py asserts no
    near-dup pair ever straddles the split.

    Reuses ``dedup_clusters``'s connected components (and therefore
    the session-persisted shingle index and pair caches — running
    dedup then splitting costs one extra broadcast-sized join, not a
    recompute), then the same md5-bucket acceptance idiom as
    ``sample_split`` keyed on the canonical id.

    Scale: the component table is pair-graph-sized (far smaller than
    the corpus — the MAX_DF cap keeps the near-dup graph sparse), so
    the left join broadcasts under AQE; the split predicate itself is
    map-side. No corpus shuffle beyond what the shared dedup pass
    already did."""
    from sqawk_spark.operators.dedup import dedup_clusters

    t = load_tables(spark, sf_dir, ("documents",))
    comp = dedup_clusters(spark, sf_dir).select(
        "doc_id", F.col("canonical_doc_id").alias("canon")
    )
    key = F.coalesce(F.col("canon"), F.col("doc_id"))
    return (
        t["documents"]
        .select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            key.alias("split_key"),
            F.when(_bucket_col(key, _N_BUCKETS) < 90, "train")
            .otherwise("val")
            .alias("split"),
        )
    )


_TIME_SPLIT_PCT = 80  # train fraction of the time RANGE, in percent


@query(
    "sample_time_split",
    oracle=f"""
        WITH b AS (
            SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
            FROM events
        ),
        cut AS (
            SELECT lo + ((hi - lo) * {_TIME_SPLIT_PCT}) // 100 AS cut_us
            FROM b
        )
        SELECT e.event_id, epoch_us(e.ts) AS ts_us,
               CASE WHEN epoch_us(e.ts) <= c.cut_us
                    THEN 'train' ELSE 'eval' END AS split
        FROM events e, cut c
    """,
)
def sample_time_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal train/eval split: everything in the first 80% of the
    corpus's TIME RANGE trains, the rest evaluates — the
    leakage-free-by-construction split for forecasting and any model
    whose eval must be strictly in the training data's future
    (max(train ts) <= cut < min(eval ts) holds by definition of the
    cut, unlike hash splits, which interleave time).

    The cut is pure integer arithmetic on epoch-microseconds
    (lo + (hi−lo)·80 // 100), exact on both engines; range-based
    rather than quantile-based deliberately — a quantile cut needs a
    global order statistic, while the range cut is two scalars from
    one min/max aggregate, broadcast back.

    Scale: one agg to a 1-row frame, one broadcast, one map-only
    labeling pass — the corpus never shuffles. Complements the hash
    family (sample_split / stratified / cluster_safe): time is the
    one axis hashes must NOT be used to split on."""
    t = load_tables(spark, sf_dir, ("events",))
    ev = t["events"].select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    )
    b = ev.agg(
        F.min("ts_us").alias("lo"), F.max("ts_us").alias("hi")
    ).select(
        (
            F.col("lo")
            + F.expr(f"((hi - lo) * {_TIME_SPLIT_PCT}) div 100")
        ).alias("cut_us")
    )
    return ev.crossJoin(F.broadcast(b)).select(
        "event_id",
        "ts_us",
        F.when(F.col("ts_us") <= F.col("cut_us"), "train")
        .otherwise("eval")
        .alias("split"),
    )
