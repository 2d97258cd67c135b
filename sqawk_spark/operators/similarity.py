"""Embedding similarity search (approximate nearest neighbor).

Two paths over the ``embeddings`` table (``array<float>``, 64-dim):

- brute-force cosine top-k — the exactness baseline: broadcast the
  (small) query set against the corpus, JVM-side dot products via
  zip_with/aggregate, per-query top-k via window. Linear in corpus
  size; the broadcast keeps it a single scan with no shuffle of the
  corpus at any SF.
- LSH-bucketed top-k — the 100 TB path: random-hyperplane signatures
  (deterministic, hash-derived hyperplanes — no driver-side random
  state to ship), bucket join, top-k within bucket. Probes a fixed
  number of buckets per query instead of the whole corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

N_QUERIES = 10  # query set: vec_id < 10
TOP_K = 5


def _dot(a: str, b: str):
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _normed(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.select("vec_id", "v", F.sqrt(_dot("v", "v")).alias("nrm"))


@query(
    "ann_cosine_topk",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
            SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e
        ),
        sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6)
                       AS cosine
            FROM n q JOIN n c ON q.vec_id < {N_QUERIES}
                             AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS INTEGER) AS rank
        FROM sims
        QUALIFY rank <= {TOP_K}
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: exact baseline for ANN.

    Scoring is an Arrow-batched numpy matmul (mapInPandas): the query
    matrix (small, fixed) is captured in the closure — the executor-
    side analog of a broadcast — and each corpus batch is scored
    against all queries in one BLAS call. This beats per-pair
    zip_with/aggregate by ~4× even at 2k vectors (interpreted
    higher-order lambdas) and is the shape that scales: one scan of
    the corpus, no join, no shuffle until the (tiny) top-k window.

    Ranking happens on the ROUNDED similarity with neighbor_id as the
    tie-break, so rank order is engine-independent (raw doubles can
    differ in the last ulp between engines)."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]

    # the query set is tiny and fixed: collect once, close over it
    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [r["vec_id"] for r in q_rows]
    q_vecs = [list(r["embedding"]) for r in q_rows]

    def score(batches):
        import numpy as np
        import pandas as _pd

        qm = np.array(q_vecs, dtype=np.float64)  # (Q, D)
        qn = np.sqrt((qm * qm).sum(axis=1))  # (Q,)
        qid = np.array(q_ids, dtype=np.int64)
        for pdf in batches:
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)  # (B, D)
            cn = np.sqrt((cm * cm).sum(axis=1))
            sims = (qm @ cm.T) / (qn[:, None] * cn[None, :])  # (Q, B)
            B = len(pdf)
            yield _pd.DataFrame(
                {
                    "query_id": np.repeat(qid, B),
                    "neighbor_id": np.tile(
                        pdf["vec_id"].to_numpy(np.int64), len(qid)
                    ),
                    "cosine": np.round(sims.ravel(), 6),
                }
            )

    sims = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    sims = sims.filter(F.col("query_id") != F.col("neighbor_id"))
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return sims.select(
        "query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= TOP_K)


RANGE_THRESHOLD = 0.35


@query(
    "ann_range_search",
    oracle=f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        ),
        n AS (
            SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e
        ),
        sims AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   round(list_inner_product(q.v, c.v) / (q.nrm * c.nrm), 6)
                       AS cosine
            FROM n q JOIN n c ON q.vec_id < {N_QUERIES}
                             AND q.vec_id <> c.vec_id
        )
        SELECT query_id, neighbor_id, cosine
        FROM sims WHERE cosine >= {RANGE_THRESHOLD}
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range search: every corpus vector with cosine >= threshold of
    each query — the retrieval primitive behind "find all documents
    similar enough to X" (dedup sweeps, semantic recall audits), where
    top-k's fixed k is the wrong contract.

    Same single-scan Arrow/BLAS shape as ann_cosine_topk: queries ride
    in the closure, the corpus is scanned once, no join, no shuffle at
    all (the threshold filter happens inside the Arrow batch, so only
    true matches ever leave the worker). The filter compares the
    ROUNDED similarity so the >= boundary is engine-independent."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"]

    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = [r["vec_id"] for r in q_rows]
    q_vecs = [list(r["embedding"]) for r in q_rows]
    threshold = RANGE_THRESHOLD

    def score(batches):
        import numpy as np
        import pandas as _pd

        qm = np.array(q_vecs, dtype=np.float64)
        qn = np.sqrt((qm * qm).sum(axis=1))
        qid = np.array(q_ids, dtype=np.int64)
        for pdf in batches:
            cm = np.array(list(pdf["embedding"]), dtype=np.float64)
            cn = np.sqrt((cm * cm).sum(axis=1))
            sims = np.round((qm @ cm.T) / (qn[:, None] * cn[None, :]), 6)
            qi, ci = np.nonzero(sims >= threshold)
            cid = pdf["vec_id"].to_numpy(np.int64)
            yield _pd.DataFrame(
                {
                    "query_id": qid[qi],
                    "neighbor_id": cid[ci],
                    "cosine": sims[qi, ci],
                }
            )

    sims = emb.select("vec_id", "embedding").mapInPandas(
        score, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    return sims.filter(F.col("query_id") != F.col("neighbor_id"))


@query("ann_lsh_topk", oracle=None)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN: random-hyperplane signatures → bucket join →
    top-k within bucket.

    Hyperplane components are ±1 from sha256 parity of (table, plane,
    dim) — a ~3 KB deterministic model captured in the closure (no
    random state, stable across runs). All T×P projections happen in
    ONE Arrow-batched numpy matmul pass over the corpus — a previous
    pure-column formulation (48 interpreted zip_with lambdas per row)
    was measured ~15× slower at sf0.01. Only (vec_id, tbl, sig) rows
    enter the bucket join; vectors rejoin afterwards for exact
    rescoring of the candidate set. 6-bit signatures × 12 tables with
    hamming-1 MULTI-PROBE on the query side (each query also probes
    the 6 buckets one bit-flip away — the standard multi-probe trick:
    more recall per table instead of more tables). Tuned for this
    corpus's near-orthogonal vectors (top-1 cosine ≈ 0.45 → per-bit
    agreement ≈ 0.65): measured recall ≥ 0.90 vs the exact baseline
    at sf0.001/0.01/0.1 (asserted ≥ 0.8 in tests/test_extensions.py)
    at a ~0.74 candidate fraction — an isotropic corpus is ANN's
    worst case; clustered production embeddings hit the same recall
    at far smaller probe fractions. Approximate by design →
    rows-only check; the exactness oracle is ann_cosine_topk."""
    import hashlib

    import numpy as _np

    n_planes, n_tables = 6, 12
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    # the query set is tiny and fixed: collect it once, derive BOTH
    # the rescore matrix and the probe signatures driver-side so the
    # corpus-wide signature pass below runs exactly once (both sides
    # of the bucket join deriving from it doubled the corpus matmul)
    q_rows = (
        emb.filter(F.col("vec_id") < N_QUERIES).select("vec_id", "v").collect()
    )
    q_ids = [r["vec_id"] for r in q_rows]
    q_vecs = [list(r["v"]) for r in q_rows]
    dim = len(q_vecs[0])

    hmat = _np.array(
        [
            [
                1.0
                if hashlib.sha256(f"{tb}:{p}:{j}".encode()).digest()[0] & 1
                else -1.0
                for j in range(dim)
            ]
            for tb in range(n_tables)
            for p in range(n_planes)
        ]
    )  # (T*P, D)

    def sign_batches(batches):
        import numpy as np
        import pandas as _pd

        weights = 1 << np.arange(n_planes, dtype=np.int64)
        for pdf in batches:
            m = np.array(list(pdf["v"]), dtype=np.float64)  # (B, D)
            bits = (m @ hmat.T > 0).reshape(len(pdf), n_tables, n_planes)
            sigs = (bits * weights).sum(axis=2)  # (B, T)
            yield _pd.DataFrame(
                {
                    "vec_id": np.repeat(
                        pdf["vec_id"].to_numpy(np.int64), n_tables
                    ),
                    "tbl": np.tile(
                        np.arange(n_tables, dtype=np.int32), len(pdf)
                    ),
                    "sig": sigs.astype(np.int64).ravel(),
                }
            )

    stacked = emb.mapInPandas(
        sign_batches, schema="vec_id bigint, tbl int, sig bigint"
    )
    # multi-probe, computed driver-side from the collected queries:
    # each query probes its own bucket plus the n_planes buckets one
    # bit-flip away, per table — 10 × 12 × 7 = 840 tiny rows,
    # broadcast against the single corpus signature pass
    qm_sig = _np.array(q_vecs, dtype=_np.float64)
    qbits = (qm_sig @ hmat.T > 0).reshape(len(q_ids), n_tables, n_planes)
    qsigs = (qbits * (1 << _np.arange(n_planes, dtype=_np.int64))).sum(axis=2)
    probe_rows = [
        (int(qid), int(tb), int(sig) ^ flip)
        for i, qid in enumerate(q_ids)
        for tb, sig in enumerate(qsigs[i])
        for flip in [0] + [1 << b for b in range(n_planes)]
    ]
    probes = spark.createDataFrame(
        probe_rows, "query_id bigint, tbl int, sig bigint"
    )
    c = stacked.select(F.col("vec_id").alias("neighbor_id"), "tbl", "sig")
    cand = (
        c.join(F.broadcast(probes), ["tbl", "sig"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )

    # exact rescoring: join candidate ids with the NEIGHBOR vectors
    # only; the 10-query matrix rides the closure and each Arrow batch
    # scores in one vectorized pass (an interpreted zip_with fold per
    # pair was measured ~10× slower on the ~10⁶-pair candidate set)
    def rescore(batches):
        import numpy as np
        import pandas as pd

        qm = np.array(q_vecs, dtype=np.float64)
        qm = qm / np.sqrt((qm * qm).sum(axis=1))[:, None]
        qpos = {qid: i for i, qid in enumerate(q_ids)}
        for pdf in batches:
            vm = np.array(list(pdf["v"]), dtype=np.float64)
            vm = vm / np.sqrt((vm * vm).sum(axis=1))[:, None]
            qi = pdf["query_id"].map(qpos).to_numpy(np.int64)
            cos = (qm[qi] * vm).sum(axis=1)
            yield pd.DataFrame(
                {
                    "query_id": pdf["query_id"],
                    "neighbor_id": pdf["neighbor_id"],
                    "cosine": np.round(cos, 6),
                }
            )

    cv = emb.select(F.col("vec_id").alias("neighbor_id"), "v")
    sims = cand.join(cv, "neighbor_id").mapInPandas(
        rescore, schema="query_id bigint, neighbor_id bigint, cosine double"
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return sims.select(
        "query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= TOP_K)


@query("ann_ivf_topk", oracle=None)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: partition the corpus into K clusters
    with Lloyd's k-means, probe only the NPROBE clusters nearest each
    query.

    The 100 TB shape: the centroid "model" is K×D doubles (tiny,
    driver-resident, broadcast into closures) while the corpus is only
    ever scanned. Each k-means iteration is ONE Arrow-batched numpy
    pass that emits per-batch partial sums — K rows of D doubles per
    batch (map-side combine in the classic sense), so what crosses to
    the driver per iteration is K×num_batches tiny rows, independent
    of corpus size; there is no wide shuffle anywhere in the fit. The
    probe join keys on cluster id, so each query touches ~NPROBE/K of
    the data instead of all of it. On a real cluster the assignment
    output would be written bucketed by cluster id, making the probe
    join a pruned scan with zero shuffle.

    Deterministic: seeds are the K lowest corpus vec_ids outside the
    query set; ties in assignment break toward the lower cluster id
    (numpy argmax); no random state anywhere.

    Recall comes from two knobs: queries probe their ``n_probe``
    nearest clusters AND each corpus vector is indexed under its
    ``n_assign`` nearest clusters (multi-assignment — the IVF analog
    of multi-probe: boundary vectors appear in the neighboring cell
    too, so near-boundary neighbors aren't lost). K=16 / probe 6 /
    assign 2 / 5 Lloyd iterations measures recall 0.86-0.94 vs the
    exact baseline across sf0.001/0.01/0.1 (asserted ≥ 0.8 in
    tests/test_extensions.py) at a ~0.6 probe fraction — isotropic
    vectors are the worst case; clustered production embeddings get
    the same recall probing far less. Approximate by design →
    rows-only check."""
    n_clusters, n_probe, n_iters, n_assign = 16, 6, 5, 2
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    seed_rows = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .orderBy("vec_id")
        .limit(n_clusters)
        .collect()
    )
    seeds = [list(r["v"]) for r in seed_rows]

    def assigner(centroids, top):
        # closure-captured centroid matrix: the executor-side "model";
        # emits each vector under its `top` nearest clusters
        def assign(batches):
            import numpy as np
            import pandas as _pd

            cm = np.array(centroids, dtype=np.float64)  # (K, D)
            cn = np.sqrt((cm * cm).sum(axis=1))
            for pdf in batches:
                vm = np.array(list(pdf["v"]), dtype=np.float64)
                vn = np.sqrt((vm * vm).sum(axis=1))
                sims = (vm @ cm.T) / (vn[:, None] * cn[None, :])
                near = np.argsort(-sims, axis=1)[:, :top]  # (B, top)
                yield _pd.DataFrame(
                    {
                        "vec_id": np.repeat(pdf["vec_id"].to_numpy(), top),
                        "cluster": near.astype("int32").ravel(),
                    }
                )

        return assign

    schema = "vec_id bigint, cluster int"

    def partial_summer(centroids):
        # assign + per-batch partial sums in one pass: the iteration's
        # entire executor→driver traffic is K rows per Arrow batch
        def run(batches):
            import numpy as np
            import pandas as _pd

            cm = np.array(centroids, dtype=np.float64)  # (K, D)
            cn = np.sqrt((cm * cm).sum(axis=1))
            k, d = cm.shape
            sums = np.zeros((k, d))
            counts = np.zeros(k, dtype=np.int64)
            for pdf in batches:
                vm = np.array(list(pdf["v"]), dtype=np.float64)
                vn = np.sqrt((vm * vm).sum(axis=1))
                sims = (vm @ cm.T) / (vn[:, None] * cn[None, :])
                a = sims.argmax(axis=1)
                np.add.at(sums, a, vm)
                counts += np.bincount(a, minlength=k)
            yield _pd.DataFrame(
                {
                    "cluster": np.arange(k, dtype=np.int32),
                    "s": list(sums),
                    "n": counts,
                }
            )

        return run

    import numpy as _np

    refined = [list(s) for s in seeds]
    for _ in range(n_iters):
        parts = emb.mapInPandas(
            partial_summer(refined),
            schema="cluster int, s array<double>, n bigint",
        ).collect()
        sums = _np.zeros((n_clusters, len(refined[0])))
        counts = _np.zeros(n_clusters, dtype=_np.int64)
        for r in parts:
            sums[r["cluster"]] += _np.array(r["s"])
            counts[r["cluster"]] += r["n"]
        for c in range(n_clusters):
            if counts[c] > 0:  # empty cluster keeps its old centroid
                refined[c] = list(sums[c] / counts[c])

    assigned = emb.mapInPandas(assigner(refined, n_assign), schema=schema)

    # probe table: for each query, its NPROBE nearest refined centroids
    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    cm = _np.array(refined)
    cn = _np.sqrt((cm * cm).sum(axis=1))
    probe_pairs = []
    for r in q_rows:
        qv = _np.array(list(r["v"]))
        sims = (cm @ qv) / (cn * _np.sqrt(qv @ qv))
        for c in sims.argsort()[::-1][:n_probe]:
            probe_pairs.append((r["vec_id"], int(c)))
    probes = spark.createDataFrame(probe_pairs, "query_id long, cluster int")

    qn = _normed(spark, sf_dir)
    q = qn.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    # multi-assignment means a (query, vector) pair can surface from
    # several probed cells — dedupe on the narrow id pair BEFORE the
    # vectors join so each candidate is rescored once
    cand_ids = (
        assigned.join(F.broadcast(probes), "cluster")
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    cand = (
        cand_ids.join(
            qn.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("v").alias("cv"),
                F.col("nrm").alias("cn"),
            ),
            F.col("vec_id") == F.col("neighbor_id"),
        )
        .join(F.broadcast(q), "query_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    sims = cand.select(
        "query_id",
        "neighbor_id",
        F.round(_dot("qv", "cv") / (F.col("qn") * F.col("cn")), 6).alias(
            "cosine"
        ),
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return sims.select(
        "query_id", "neighbor_id", "cosine", F.row_number().over(w).alias("rank")
    ).filter(F.col("rank") <= TOP_K)


@query(
    "embedding_quantize_int8",
    oracle="""
        WITH v AS (
            SELECT vec_id,
                   list_transform(embedding,
                                  x -> CAST(x AS DOUBLE)) AS v
            FROM embeddings
        ),
        m AS (
            SELECT vec_id, v,
                   list_max(list_transform(v, x -> abs(x))) AS absmax
            FROM v
        ),
        q AS (
            SELECT vec_id, absmax,
                   list_transform(v, x -> CASE WHEN absmax = 0 THEN 0
                       ELSE CAST(round(x / (absmax / 127.0)) AS BIGINT)
                       END) AS q
            FROM m
        )
        SELECT vec_id,
               round(absmax / 127.0, 9) AS scale,
               CAST(list_sum(q) AS BIGINT) AS q_sum,
               CAST(list_sum(list_transform(q, x -> abs(x)))
                    AS BIGINT) AS q_l1,
               CAST(list_sum(list_transform(q, (x, i) -> x * i))
                    AS BIGINT) AS q_pos
        FROM q
    """,
)
def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of an embedding column — the
    storage/serving compression step every vector pipeline runs before
    shipping embeddings to an index: per-vector scale = max|v|/127,
    q_i = round(v_i/scale) ∈ [-127, 127] (no clamp needed: |v_i| ≤
    max|v| makes |q_i| ≤ 127 exactly; a zero vector quantizes to all
    zeros by the CASE guard).

    Emitted per vector: the scale and three integer checksums that pin
    every quantized value — plain sum, L1 mass, and a 1-based
    position-weighted sum (catches any permutation the first two would
    miss). All arithmetic runs in f64 after an exact f32→f64 cast, so
    both engines compute bit-identical scales and quotients.

    Scale: map-only — one scan, per-row array expressions inside
    whole-stage codegen, no shuffle, no UDF, no driver traffic. At
    100 TB this is exactly bytes-in/bytes-out."""
    t = load_tables(spark, sf_dir, ("embeddings",), spread=("embeddings",))
    return (
        t["embeddings"]
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v"),
        )
        .withColumn(
            "absmax", F.expr("array_max(transform(v, x -> abs(x)))")
        )
        .withColumn(
            "q",
            F.expr(
                "transform(v, x -> CASE WHEN absmax = 0.0D THEN 0L"
                " ELSE CAST(round(x / (absmax / 127.0D)) AS BIGINT) END)"
            ),
        )
        .select(
            "vec_id",
            F.round(F.col("absmax") / 127.0, 9).alias("scale"),
            F.expr("aggregate(q, 0L, (acc, x) -> acc + x)").alias("q_sum"),
            F.expr("aggregate(q, 0L, (acc, x) -> acc + abs(x))").alias(
                "q_l1"
            ),
            F.expr(
                "aggregate(zip_with(q, sequence(1, size(q)),"
                " (a, i) -> a * CAST(i AS BIGINT)), 0L,"
                " (acc, x) -> acc + x)"
            ).alias("q_pos"),
        )
    )


@query(
    "embedding_centroid_by_label",
    oracle="""
        WITH e AS (
            SELECT label, t.pos,
                   CAST(round(CAST(embedding[t.pos] AS DOUBLE)
                              * 10000000) AS BIGINT) AS val
            FROM embeddings,
                 unnest(range(1, len(embedding) + 1)) AS t(pos)
        ),
        agg AS (
            SELECT label, pos,
                   CAST(sum(val) AS BIGINT) AS s,
                   CAST(count(*) AS BIGINT) AS n
            FROM e GROUP BY label, pos
        )
        SELECT label,
               CAST(pos AS INTEGER) AS dim,
               round(s / (n * 10000000.0), 6) AS centroid,
               n AS n_vectors
        FROM agg
    """,
)
def embedding_centroid_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids — the class-prototype step
    behind nearest-centroid classification, cluster summarization,
    and IVF coarse quantizers: one (label, dimension) mean over the
    corpus.

    Cross-engine float discipline (same idiom as the perplexity LM):
    each f32 component is cast exactly to f64 and scaled to an
    integer (round ×1e7) BEFORE aggregation, so the per-cell sums are
    exact integer arithmetic — identical under any partial-agg order
    on any engine; only the final mean divides and rounds.

    Scale: posexplode fans each vector into D rows but they combine
    map-side immediately (partial_sum keyed on label×dim — the
    shuffle moves labels × D cells, not the corpus), which is the
    formulation that beats driver-side vector averaging the moment
    the corpus outgrows one machine. 1-based dim matches DuckDB's
    WITH ORDINALITY."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"].select(
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x ->"
                " CAST(round(CAST(x AS DOUBLE) * 10000000) AS BIGINT))"
            )
        ).alias("pos0", "val"),
    )
    return (
        e.groupBy("label", (F.col("pos0") + 1).alias("dim"))
        .agg(F.sum("val").alias("s"), F.count("*").alias("n"))
        .select(
            "label",
            F.col("dim").cast("int").alias("dim"),
            F.round(F.col("s") / (F.col("n") * 10_000_000.0), 6).alias(
                "centroid"
            ),
            F.col("n").alias("n_vectors"),
        )
    )


@query("ann_pq_topk", oracle=None)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (the third index family beside LSH
    and IVF): split D=64 into M=8 orthogonal 8-dim subspaces, learn
    K=64 sub-centroids per subspace (6-bit codes — 8 codes ≈ 6 bytes
    per vector vs the 512-byte float64 row, an ~85× scan
    compression), score queries against CODES via asymmetric
    distance (ADC), then rescore the candidate set exactly.

    ADC is algebraically exact over the reconstruction: subspaces are
    disjoint coordinates, so both the inner product and the squared
    norm of a reconstructed vector are SUMS of per-subspace
    lookup-table entries — each query carries an M×K dot-product LUT
    and shares one M×K norm table, and scoring a code is M table
    adds, never a D-dim float op. That is the property that makes PQ
    the billion-scale index layout: the scan touches 8-byte codes,
    not 512-byte vectors.

    Training mirrors the IVF fit: per-subspace Lloyd iterations as
    ONE Arrow-batched pass emitting M×K partial sums per batch —
    driver traffic is independent of corpus size; no shuffle
    anywhere in the fit. Seeds are the sub-vectors of the K lowest
    non-query vec_ids; assignment ties break toward the lower code
    (argmin) — fully deterministic, no random state.

    Recall: ADC ranking alone is lossy by design (quantization error
    on an isotropic worst-case corpus — 4-bit codes measured only
    0.54); 6-bit codes with exact rescoring of the top 8×K ADC
    candidates measure recall 0.86 at both sf0.001 and sf0.01 vs the
    brute-force baseline (asserted ≥ 0.8 in
    tests/test_extensions.py). Approximate by design → rows-only
    driver check; the exactness baseline is ann_cosine_topk."""
    m_sub, k_codes, n_iters, d = 8, 64, 4, 64
    sub_d = d // m_sub
    cand_mult = 8
    t = load_tables(spark, sf_dir, ("embeddings",))
    emb = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    seed_rows = (
        emb.filter(F.col("vec_id") >= N_QUERIES)
        .orderBy("vec_id")
        .limit(k_codes)
        .collect()
    )
    import numpy as _np

    # codebooks[m]: (K, sub_d) — initialized from the seed rows' m-th
    # sub-vector, refined by Lloyd iterations below
    books = [
        _np.array([list(r["v"])[m * sub_d : (m + 1) * sub_d] for r in seed_rows])
        for m in range(m_sub)
    ]

    def partial_summer(books_in):
        def run(batches):
            import numpy as np
            import pandas as _pd

            bks = [np.array(b, dtype=np.float64) for b in books_in]
            m, k, sd = len(bks), bks[0].shape[0], bks[0].shape[1]
            sums = np.zeros((m, k, sd))
            counts = np.zeros((m, k), dtype=np.int64)
            for pdf in batches:
                vm = np.array(list(pdf["v"]), dtype=np.float64)
                for mi in range(m):
                    sub = vm[:, mi * sd : (mi + 1) * sd]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * sub @ bks[mi].T
                        + (bks[mi] * bks[mi]).sum(axis=1)[None, :]
                    )
                    a = d2.argmin(axis=1)
                    np.add.at(sums[mi], a, sub)
                    counts[mi] += np.bincount(a, minlength=k)
            yield _pd.DataFrame(
                {
                    "m": np.repeat(np.arange(m, dtype=np.int32), k),
                    "c": np.tile(np.arange(k, dtype=np.int32), m),
                    "s": [list(x) for mi in range(m) for x in sums[mi]],
                    "n": counts.ravel(),
                }
            )

        return run

    for _ in range(n_iters):
        parts = emb.filter(F.col("vec_id") >= N_QUERIES).mapInPandas(
            partial_summer([b.tolist() for b in books]),
            schema="m int, c int, s array<double>, n bigint",
        ).collect()
        sums = _np.zeros((m_sub, k_codes, sub_d))
        counts = _np.zeros((m_sub, k_codes), dtype=_np.int64)
        for r in parts:
            sums[r["m"], r["c"]] += _np.array(r["s"])
            counts[r["m"], r["c"]] += r["n"]
        for mi in range(m_sub):
            for c in range(k_codes):
                if counts[mi, c] > 0:
                    books[mi][c] = sums[mi, c] / counts[mi, c]

    books_l = [b.tolist() for b in books]

    q_rows = emb.filter(F.col("vec_id") < N_QUERIES).collect()
    q_ids = [r["vec_id"] for r in q_rows]
    q_vecs = [list(r["v"]) for r in q_rows]

    def adc_scorer():
        def run(batches):
            import numpy as np
            import pandas as _pd

            bks = [np.array(b, dtype=np.float64) for b in books_l]
            qm = np.array(q_vecs, dtype=np.float64)  # (Q, D)
            qn = np.sqrt((qm * qm).sum(axis=1))
            qid = np.array(q_ids, dtype=np.int64)
            nq = len(qid)
            # LUT[q, m, k] = <q_sub_m, book_m[k]>; NORM2[m, k] = |c|²
            lut = np.stack(
                [
                    qm[:, mi * sub_d : (mi + 1) * sub_d] @ bks[mi].T
                    for mi in range(m_sub)
                ],
                axis=1,
            )  # (Q, M, K)
            norm2 = np.stack(
                [(bks[mi] * bks[mi]).sum(axis=1) for mi in range(m_sub)]
            )  # (M, K)
            for pdf in batches:
                vm = np.array(list(pdf["v"]), dtype=np.float64)
                bsz = len(pdf)
                codes = np.empty((bsz, m_sub), dtype=np.int64)
                for mi in range(m_sub):
                    sub = vm[:, mi * sub_d : (mi + 1) * sub_d]
                    d2 = (
                        (sub * sub).sum(axis=1)[:, None]
                        - 2.0 * sub @ bks[mi].T
                        + norm2[mi][None, :]
                    )
                    codes[:, mi] = d2.argmin(axis=1)
                # reconstruction dot/norm as per-subspace LUT sums
                dots = np.zeros((nq, bsz))
                rn2 = np.zeros(bsz)
                for mi in range(m_sub):
                    dots += lut[:, mi, codes[:, mi]]
                    rn2 += norm2[mi, codes[:, mi]]
                adc = dots / (qn[:, None] * np.sqrt(rn2)[None, :])
                yield _pd.DataFrame(
                    {
                        "query_id": np.repeat(qid, bsz),
                        "neighbor_id": np.tile(
                            pdf["vec_id"].to_numpy(np.int64), nq
                        ),
                        "adc": np.round(adc.ravel(), 6),
                    }
                )

        return run

    adc = emb.mapInPandas(
        adc_scorer(), schema="query_id bigint, neighbor_id bigint, adc double"
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    wa = W.partitionBy("query_id").orderBy(F.col("adc").desc(), "neighbor_id")
    cands = (
        adc.withColumn("arank", F.row_number().over(wa))
        .filter(F.col("arank") <= cand_mult * TOP_K)
        .select("query_id", "neighbor_id")
    )
    # exact rescoring of the candidate set (LSH's pattern): broadcast
    # the small candidate list into a join with the true vectors
    nv = _normed(spark, sf_dir)
    qn_df = nv.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qnrm"),
    ).filter(F.col("query_id") < N_QUERIES)
    cv = nv.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cnrm"),
    )
    scored = (
        cands.join(F.broadcast(qn_df), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot("qv", "cv") / (F.col("qnrm") * F.col("cnrm")), 6
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), "neighbor_id")
    return scored.select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.row_number().over(w).alias("rank"),
    ).filter(F.col("rank") <= TOP_K)


_GRAM_SCALE = 1_000_000


@query(
    "embedding_gram_matrix",
    oracle=f"""
        WITH q AS (
            SELECT vec_id, t.pos AS p,
                   CAST(round(CAST(embedding[t.pos] AS DOUBLE)
                              * {_GRAM_SCALE}) AS BIGINT) AS v
            FROM embeddings,
                 unnest(range(1, len(embedding) + 1)) AS t(pos)
        )
        SELECT CAST(a.p AS INTEGER) AS i,
               CAST(b.p AS INTEGER) AS j,
               CAST(sum(a.v * b.v) AS BIGINT) AS gram,
               CAST(count(*) AS BIGINT) AS n_vectors
        FROM q a JOIN q b ON a.vec_id = b.vec_id AND a.p <= b.p
        GROUP BY a.p, b.p
    """,
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Gram matrix ΣvvT over the embedding corpus — the
    one-pass sufficient statistic behind PCA/whitening/OPQ rotation
    learning: everything those need from 100 TB of vectors is this
    D×D matrix plus the mean, both map-side-combinable.

    Cross-engine float discipline (the centroid entry's idiom): each
    f32 component is cast exactly to f64 and scaled to an integer
    (round ×1e6) BEFORE any multiplication, so every product and sum
    is exact int64 arithmetic — identical under any partial-agg order
    (|q| ≤ ~10⁶ ⇒ products ≤ 10¹², corpus sums fit int64 up to ~10⁶
    vectors per cell; a larger corpus shards the sum by vec_id range
    first).

    Scale: ONE Arrow-batched pass — each batch contributes QᵀQ via a
    single int64 GEMM (object-dtype numpy: exact, overflow-safe), each
    PARTITION emits at most D(D+1)/2 = 2080 upper-triangle cells, and
    the only shuffle is those per-partition partials → 2080 rows.
    Corpus rows never reach an exchange; driver sees nothing until
    the caller collects the D×D result. The posexplode-pairs
    formulation would multiply rows ×4096 before the map-side combine
    — this shape does the combine inside the GEMM instead."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"].select(
        "vec_id",
        F.expr(
            f"transform(embedding, x ->"
            f" CAST(round(CAST(x AS DOUBLE) * {_GRAM_SCALE}) AS BIGINT))"
        ).alias("q"),
    )

    def run(batches):
        import numpy as np
        import pandas as _pd

        acc = None
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            # int64 GEMM per Arrow batch is exact: |q| ≤ ~10⁶ ⇒
            # products ≤ 10¹², batch sums ≤ rows×10¹² ≪ 2⁶³ at any
            # realistic batch size; the cross-batch accumulator is
            # object dtype (Python ints), so the per-partition total
            # can't overflow no matter how many batches stream through
            Q = np.stack([np.asarray(r, dtype=np.int64) for r in pdf["q"]])
            part = (Q.T @ Q).astype(object)
            acc = part if acc is None else acc + part
            n += len(pdf)
        if acc is None:
            return
        d = acc.shape[0]
        iu = [(i, j) for i in range(d) for j in range(i, d)]
        yield _pd.DataFrame(
            {
                "i": [i + 1 for i, _ in iu],
                "j": [j + 1 for _, j in iu],
                "gram": [int(acc[i, j]) for i, j in iu],
                "n_vectors": [n] * len(iu),
            }
        )

    partial = e.select("q").mapInPandas(
        run, schema="i int, j int, gram long, n_vectors long"
    )
    return partial.groupBy("i", "j").agg(
        F.sum("gram").alias("gram"),
        F.sum("n_vectors").alias("n_vectors"),
    )


PCA_K = 8


@query("embedding_pca_project", oracle=None)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection of the embedding corpus to K=8 components —
    the dimensionality-reduction step before cheap clustering /
    visualization / coarse ANN. Rows-only by design: eigenvectors of
    a symmetric matrix are unique only up to sign and degenerate
    subspace rotation, so cross-engine value equality is the wrong
    contract — the pytest instead asserts the linear-algebra
    invariants (orthonormal components, descending explained
    variance, per-component projected variance = eigenvalue, total
    variance preserved; tests/test_extensions.py).

    Two-stage shape (the distributed-PCA canon): stage 1 collects the
    D×D Gram cells and the D mean sums (driver traffic = 2080 + 64
    numbers — bounded like the IVF/BPE driver loops, NOT corpus-
    sized), eigendecomposes the 64×64 covariance driver-side; stage 2
    broadcasts the K×D component matrix in the task closure and
    projects the corpus in one map-only Arrow pass — no shuffle, no
    driver traffic."""
    import numpy as np

    gram_rows = embedding_gram_matrix(spark, sf_dir).collect()
    d = max(r["j"] for r in gram_rows)
    n = gram_rows[0]["n_vectors"]
    G = np.zeros((d, d), dtype=np.float64)
    for r in gram_rows:
        G[r["i"] - 1, r["j"] - 1] = r["gram"]
        G[r["j"] - 1, r["i"] - 1] = r["gram"]
    t = load_tables(spark, sf_dir, ("embeddings",))
    sums = (
        t["embeddings"]
        .select(
            F.posexplode(
                F.expr(
                    f"transform(embedding, x -> CAST(round("
                    f"CAST(x AS DOUBLE) * {_GRAM_SCALE}) AS BIGINT))"
                )
            ).alias("p", "v")
        )
        .groupBy("p")
        .agg(F.sum("v").alias("s"))
        .collect()
    )
    s = np.zeros(d, dtype=np.float64)
    for r in sums:
        s[r["p"]] = r["s"]
    # covariance in original (unscaled) units; exact ints → f64 once
    cov = (G - np.outer(s, s) / n) / (n * float(_GRAM_SCALE) ** 2)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:PCA_K]
    comps = evecs[:, order].T.copy()  # K×D
    mean = (s / n / _GRAM_SCALE).copy()

    e = t["embeddings"].select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def project(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            if not len(pdf):
                continue
            V = _np.array([list(r) for r in pdf["v"]], dtype=_np.float64)
            P = _np.round((V - mean) @ comps.T, 6)
            nb, k = P.shape
            # long form: one (vec_id, component, value) row per cell —
            # scalar columns only, per the driver canonicalizer contract
            # (pandas sort_values crashes on list cells; VERDICT r06 #1)
            yield _pd.DataFrame(
                {
                    "vec_id": _np.repeat(pdf["vec_id"].to_numpy(), k),
                    "component": _np.tile(
                        _np.arange(1, k + 1, dtype=_np.int32), nb
                    ),
                    "value": P.reshape(-1),
                }
            )

    return e.mapInPandas(
        project, schema="vec_id long, component int, value double"
    )


KNN_K = 3
KNN_BLOCKS = 4


@query(
    "embedding_knn_graph",
    oracle=f"""
        WITH q AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(round(
                       CAST(x AS DOUBLE) * {_GRAM_SCALE}) AS BIGINT)) AS v
            FROM embeddings
        ),
        n AS (
            SELECT vec_id, v,
                   sqrt(CAST(list_inner_product(v, v) AS DOUBLE)) AS nrm
            FROM q
        ),
        sims AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   round(CAST(list_inner_product(a.v, b.v) AS DOUBLE)
                         / (a.nrm * b.nrm), 6) AS cosine
            FROM n a JOIN n b ON a.vec_id <> b.vec_id
        )
        SELECT query_id, neighbor_id, cosine,
               CAST(row_number() OVER (
                   PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
               ) AS INTEGER) AS rank
        FROM sims
        QUALIFY rank <= {KNN_K}
    """,
)
def embedding_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact k-nearest-neighbor graph over the whole embedding corpus
    (every vector is a query) — the substrate for graph-based
    semantic dedup, cluster discovery, and HNSW/NN-descent seeding.

    Shape: 2-D BLOCKED all-pairs, the canonical distributed exact-kNN
    plan. Vectors are hashed into B blocks; each side is replicated B
    ways so every (query-block, corpus-block) pair cogroups into its
    own task, which scores an (n/B × n/B) tile with ONE float64 GEMM
    and emits only its per-query top-k. A global per-query window then
    merges the B·k candidates — correct because any global top-k
    neighbor is top-k within its tile under the same total order.
    Communication is 2·n·B rows in + n·B·k candidate rows out — never
    the n² similarity matrix, which exists only tile-by-tile in
    task-local memory. FLOPs stay O(n²·D): inherent to EXACT kNN —
    the approximate entries (ann_lsh_topk / ann_ivf_topk / ann_pq_topk)
    are the sub-quadratic path; B grows as n/B tiles are sized to
    executor memory (B = {KNN_BLOCKS} here at test scale).

    Cross-engine float discipline (gram-matrix idiom): components are
    integer-scaled (round ×1e6) BEFORE any arithmetic, so every dot
    product is a sum of exact integers ≤ 64·10¹² < 2^53 — exact in
    float64 GEMM and in DuckDB alike; the one double division is
    computed from identical integers on both engines, and ranking
    uses the ROUNDED cosine with a neighbor_id tie-break."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    vecs = t["embeddings"].select(
        "vec_id",
        F.expr(
            f"transform(embedding, x ->"
            f" CAST(round(CAST(x AS DOUBLE) * {_GRAM_SCALE}) AS BIGINT))"
        ).alias("v"),
        # cast to INT to match the explode(sequence(...)) replication
        # column: cogroup pairs the two sides by grouping-KEY equality
        # at the binary-row level, so a bigint 0 on one side and an
        # int 0 on the other silently pair with NOTHING — tiles run
        # against an empty side and queries lose all candidates
        F.pmod(F.xxhash64("vec_id"), F.lit(KNN_BLOCKS))
        .cast("int")
        .alias("blk"),
    )
    rep = F.explode(
        F.sequence(F.lit(0), F.lit(KNN_BLOCKS - 1))
    ).alias("other")
    # queries replicated across corpus blocks; corpus replicated
    # across query blocks — tile key is (query_block, corpus_block)
    q_side = vecs.select(
        "vec_id", "v", F.col("blk").alias("qb"), rep
    ).withColumnRenamed("other", "cb")
    c_side = vecs.select(
        "vec_id", "v", F.col("blk").alias("cb"), rep
    ).withColumnRenamed("other", "qb")

    def tile(qpdf, cpdf):
        import numpy as np
        import pandas as _pd

        if not len(qpdf) or not len(cpdf):
            return _pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "cosine": []}
            )
        # integer-valued float64: products ≤ 1e12, 64-dim sums
        # ≤ 6.4e13 < 2^53 — GEMM is exact
        Q = np.array(list(qpdf["v"]), dtype=np.float64)
        C = np.array(list(cpdf["v"]), dtype=np.float64)
        qn = np.sqrt((Q * Q).sum(axis=1))
        cn = np.sqrt((C * C).sum(axis=1))
        sims = np.round((Q @ C.T) / (qn[:, None] * cn[None, :]), 6)
        qid = qpdf["vec_id"].to_numpy(np.int64)
        cid = cpdf["vec_id"].to_numpy(np.int64)
        out_q, out_c, out_s = [], [], []
        for i in range(len(qid)):
            row = sims[i]
            mask = cid != qid[i]
            ns, vs = cid[mask], row[mask]
            # top-k by (cosine DESC, neighbor_id ASC): lexsort's last
            # key is primary
            order = np.lexsort((ns, -vs))[:KNN_K]
            out_q.extend([qid[i]] * len(order))
            out_c.extend(ns[order])
            out_s.extend(vs[order])
        return _pd.DataFrame(
            {"query_id": out_q, "neighbor_id": out_c, "cosine": out_s}
        )

    cand = (
        q_side.groupby("qb", "cb")
        .cogroup(c_side.groupby("qb", "cb"))
        .applyInPandas(
            tile, schema="query_id long, neighbor_id long, cosine double"
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return cand.select(
        "query_id",
        "neighbor_id",
        "cosine",
        F.row_number().over(w).alias("rank"),
    ).filter(F.col("rank") <= KNN_K)


_OUTLIER_K = 5
_OUTLIER_SCALE = 1_000_000
_OUTLIER_SALT = 8


@query(
    "embedding_outlier_by_label",
    oracle=f"""
        WITH v AS (
            SELECT vec_id, label, i AS dim,
                   CAST(round(CAST(embedding[i] AS DOUBLE)
                              * {_OUTLIER_SCALE}) AS BIGINT) AS x
            FROM embeddings,
                 UNNEST(generate_series(1, len(embedding))) u(i)
        ),
        c AS (
            SELECT label, dim, CAST(sum(x) AS BIGINT) AS s
            FROM v GROUP BY 1, 2
        ),
        nc AS (
            SELECT label, CAST(sum(s * s) AS BIGINT) AS nrm
            FROM c GROUP BY 1
        ),
        per AS (
            SELECT v.vec_id, v.label,
                   CAST(sum(v.x * c.s) AS BIGINT) AS num,
                   CAST(sum(v.x * v.x) AS BIGINT) AS nv
            FROM v JOIN c ON v.label = c.label AND v.dim = c.dim
            GROUP BY 1, 2
        ),
        scored AS (
            SELECT p.vec_id, p.label,
                   round(p.num / sqrt(p.nv * 1.0 * nc.nrm), 6)
                       AS cos_centroid
            FROM per p JOIN nc ON p.label = nc.label
        )
        SELECT vec_id, label, cos_centroid,
               CAST(rk AS INTEGER) AS rank
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY label ORDER BY cos_centroid, vec_id) AS rk
            FROM scored
        ) WHERE rk <= {_OUTLIER_K}
    """,
)
def embedding_outlier_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-outlier scan — the mislabeled-data detector: for each
    label, the {_OUTLIER_K} vectors LEAST aligned with their own
    label's centroid direction (lowest cosine to the per-label
    component-sum vector; cosine to the sum equals cosine to the
    mean). The standard first pass when auditing classification /
    clustering labels at corpus scale.

    Exactness: components scale to integers (×1e6) before any
    aggregation, so centroid sums, dot products, and norms are exact
    integer arithmetic on both engines (products stay ≳10³ below
    int64 overflow for any realistic corpus: |x| ≤ ~5·10⁵ per the
    unit-ish embedding range, and per-label sums are random-walk
    sized); the single float step is the final
    ``round(num/sqrt(nv·nc), 6)`` on identical integers, with
    vec_id breaking rounded ties.

    Scale: the exploded (vec, dim) stream combines map-side into
    label×D centroid cells (the ``embedding_centroid_by_label``
    shuffle); scoring joins each vector's D cells against the
    broadcast-sized centroid table. The per-label bottom-k is the
    exact TWO-PHASE salted pattern (same as ``window_rank``): a
    (label, salt) window prunes to k per salt bucket, then the final
    per-label window ranks ≤ {_OUTLIER_SALT}·{_OUTLIER_K} survivors —
    no label's full vector set ever funnels through one partition."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    v = t["embeddings"].select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, x ->"
                f" CAST(round(CAST(x AS DOUBLE) * {_OUTLIER_SCALE}) AS BIGINT))"
            )
        ).alias("pos0", "x"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("dim"), "x")
    c = v.groupBy("label", "dim").agg(F.sum("x").alias("s"))
    nc = c.groupBy("label").agg(F.sum(F.col("s") * F.col("s")).alias("nrm"))
    per = (
        v.join(F.broadcast(c), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.col("x") * F.col("s")).alias("num"),
            F.sum(F.col("x") * F.col("x")).alias("nv"),
        )
    )
    scored = per.join(F.broadcast(nc), "label").select(
        "vec_id",
        "label",
        F.round(
            F.col("num") / F.sqrt(F.col("nv") * 1.0 * F.col("nrm")), 6
        ).alias("cos_centroid"),
    )
    salted = scored.withColumn(
        "salt", F.pmod(F.xxhash64("vec_id"), F.lit(_OUTLIER_SALT))
    )
    w1 = W.partitionBy("label", "salt").orderBy("cos_centroid", "vec_id")
    pruned = salted.withColumn("r1", F.row_number().over(w1)).filter(
        F.col("r1") <= _OUTLIER_K
    )
    w2 = W.partitionBy("label").orderBy("cos_centroid", "vec_id")
    return (
        pruned.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= _OUTLIER_K)
        .select("vec_id", "label", "cos_centroid", "rank")
    )


# --- deterministic ANN recall twins (driver-verifiable) ------------------
#
# The production ANN entries (ann_lsh_topk / ann_ivf_topk / ann_pq_topk)
# are rows-only by design: their models ride driver-side state (Lloyd
# iterations, Arrow matmuls) a SQL oracle cannot replay. These twins
# close that gap (VERDICT r06 "Next round" #6): each re-expresses one
# index family with a FULLY deterministic, SQL-expressible model —
# md5-parity hyperplanes for LSH, first-K seeded centroids for IVF,
# first-K seeded sub-codebooks for PQ — quantizes every vector to
# integers (round ×1e6) so all signatures / assignments / distances are
# exact integer arithmetic on BOTH engines, and returns per-query
# recall@k of the approximate candidate ranking against the exact
# top-k over the same quantized vectors. The driver hash-checks the
# recall integers value-for-value against DuckDB running the identical
# pipeline — converting "trust the pytest recall assertion" into a
# driver-visible green row.
#
# Integer-exactness bound: |x| < 0.6 → |valq| ≤ 6e5; squared sums over
# 64 dims ≤ 64·3.6e11 ≈ 2.3e13 and L2 distances ≤ ~9e13, all far below
# 2^53, so DuckDB's DOUBLE-typed list_inner_product over BIGINT lists
# is exact and Spark's BIGINT aggregate matches it bit-for-bit.
#
# Scale posture: the explode×planes / corpus×centroid formulations here
# are the VERIFICATION path (plan-transparent, no UDF); at 100 TB the
# production path is the Arrow-matmul entries these twins validate.

_REC_SCALE = 1_000_000
_RL_TABLES, _RL_PLANES = 4, 4  # 4 tables × 4-bit signatures
_IVF_K, _IVF_NPROBE = 16, 4
_PQ_M, _PQ_SUBD, _PQ_CODES, _PQ_CANDS = 8, 8, 16, 20

_QUANT_CTES = f"""
        v AS (
            SELECT vec_id,
                   list_transform(embedding, x -> CAST(round(
                       CAST(x AS DOUBLE) * {_REC_SCALE}) AS BIGINT)) AS vq
            FROM embeddings
        ),
        n AS (
            SELECT vec_id, vq,
                   CAST(list_inner_product(vq, vq) AS BIGINT) AS n2
            FROM v
        )"""


def _exact_topk_ctes(corpus_pred: str) -> str:
    """Exact quantized-cosine top-k CTEs (DuckDB side)."""
    return f"""
        exact AS (
            SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
                   round(CAST(list_inner_product(a.vq, b.vq) AS DOUBLE)
                         / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)),
                         6) AS cosine
            FROM n a JOIN n b
              ON a.vec_id < {N_QUERIES} AND {corpus_pred}
        ),
        exact_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rk
                FROM exact
            ) WHERE rk <= {TOP_K}
        )"""


_RECALL_TAIL = f"""
        hits AS (
            SELECT l.query_id, count(*) AS h
            FROM approx_topk l JOIN exact_topk x
              ON l.query_id = x.query_id AND l.neighbor_id = x.neighbor_id
            GROUP BY l.query_id
        )
        SELECT q.query_id,
               CAST(coalesce(h.h, 0) AS BIGINT) AS hits,
               CAST({TOP_K} AS INTEGER) AS k,
               round(coalesce(h.h, 0) / {TOP_K}.0, 2) AS recall_at_k
        FROM (SELECT vec_id AS query_id FROM n
              WHERE vec_id < {N_QUERIES}) q
        LEFT JOIN hits h ON q.query_id = h.query_id"""


def _quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, vq array<bigint>, n2 bigint) — round(x·1e6) vectors."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    return t["embeddings"].select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> CAST(round("
            f"CAST(x AS DOUBLE) * {_REC_SCALE}) AS BIGINT))"
        ).alias("vq"),
    ).withColumn(
        "n2",
        F.expr("aggregate(zip_with(vq, vq, (a, b) -> a * b),"
               " 0L, (acc, x) -> acc + x)"),
    )


def _int_cosine(a: str, b: str, n2a: str, n2b: str):
    """round(dot/sqrt(n2a·n2b), 6) from quantized integer vectors —
    one double division over identical integers on both engines."""
    dot = F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
        f" 0L, (acc, x) -> acc + x)"
    )
    return F.round(
        dot / F.sqrt(F.col(n2a).cast("double") * F.col(n2b)), 6
    )


def _exact_topk_df(nq: DataFrame, corpus: DataFrame) -> DataFrame:
    """Exact quantized-cosine top-k (Spark side): broadcast the tiny
    query set against the corpus — one scan, no corpus shuffle."""
    q = nq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vq").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    sims = F.broadcast(q).crossJoin(c).filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "neighbor_id",
        _int_cosine("qv", "cv", "qn2", "cn2").alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )


def _recall_output(
    nq: DataFrame, approx_topk: DataFrame, exact_topk: DataFrame
) -> DataFrame:
    hits = approx_topk.join(
        exact_topk, ["query_id", "neighbor_id"]
    ).groupBy("query_id").agg(F.count("*").alias("h"))
    qs = nq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    return qs.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("hits"),
        F.lit(TOP_K).cast("int").alias("k"),
        F.round(F.coalesce(F.col("h"), F.lit(0)) / float(TOP_K), 2).alias(
            "recall_at_k"
        ),
    )


@query(
    "ann_lsh_recall",
    oracle=f"""
        WITH {_QUANT_CTES},
        e AS (
            SELECT vec_id, t.pos, vq[t.pos] AS valq
            FROM v, unnest(range(1, 65)) AS t(pos)
        ),
        signs AS (
            SELECT p.p, d.pos,
                   CASE WHEN CAST(concat('0x', substr(md5(
                            p.p::VARCHAR || ':' || d.pos::VARCHAR), 1, 1))
                        AS INTEGER) % 2 = 0 THEN 1 ELSE -1 END AS s
            FROM unnest(range(0, {_RL_TABLES * _RL_PLANES})) AS p(p),
                 unnest(range(1, 65)) AS d(pos)
        ),
        dots AS (
            SELECT e.vec_id, s.p, sum(s.s * e.valq) AS dot
            FROM e JOIN signs s ON e.pos = s.pos
            GROUP BY e.vec_id, s.p
        ),
        sigs AS (
            SELECT vec_id, p // {_RL_PLANES} AS tbl,
                   CAST(sum(CASE WHEN dot >= 0
                            THEN (1 << CAST(p % {_RL_PLANES} AS INTEGER))
                            ELSE 0 END) AS INTEGER) AS sig
            FROM dots GROUP BY vec_id, p // {_RL_PLANES}
        ),
        cand AS (
            SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
            FROM sigs q JOIN sigs c ON q.tbl = c.tbl AND q.sig = c.sig
            WHERE q.vec_id < {N_QUERIES} AND c.vec_id <> q.vec_id
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   round(CAST(list_inner_product(a.vq, b.vq) AS DOUBLE)
                         / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)),
                         6) AS cosine
            FROM cand JOIN n a ON a.vec_id = cand.query_id
                      JOIN n b ON b.vec_id = cand.neighbor_id
        ),
        approx_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rk
                FROM scored
            ) WHERE rk <= {TOP_K}
        ),
        {_exact_topk_ctes(f"b.vec_id <> a.vec_id")},
        {_RECALL_TAIL}
    """,
)
def ann_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable LSH recall@k: sign-random-projection LSH with
    md5-parity hyperplanes (±1 per (plane, dim) from the first md5 hex
    digit's parity — no random state, recomputable in ANSI SQL),
    4 tables × 4-bit signatures over round(x·1e6)
    integer vectors; candidates share any table signature; exact
    quantized-cosine rescoring; output = per-query |LSH top-k ∩ exact
    top-k|. Every step is exact integer arithmetic until the one final
    double division, so DuckDB replays the pipeline bit-for-bit — the
    driver-checkable twin of the rows-only ann_lsh_topk (whose Arrow
    matmul + multi-probe model is the production path at 100 TB).

    Plan: the signature pass is explode×planes (n·64 rows joined to a
    broadcast 1,024-row sign table, two keyed partial aggs) — heavier
    than the matmul but fully Catalyst-visible; the bucket join keys on
    (tbl, sig) with the 20-row query side broadcast; rescoring joins
    candidates back to the persisted quantized vectors."""
    nq = _quantized(spark, sf_dir)
    n_planes_total = _RL_TABLES * _RL_PLANES

    # r11: the ±1 hyperplane table is a FIXED, data-independent 16×64
    # md5-parity matrix — compute it on the driver (hashlib md5 over
    # the same "p:pos" strings the oracle hashes) and inline each
    # plane's sign vector as an array literal, so every dot product is
    # one zip_with/aggregate over the row's own vq array. The previous
    # form exploded the corpus ×64, fanned it ×16 through a broadcast
    # join, and re-assembled with TWO hash aggregations (n·1024
    # intermediate rows); all of that was recomputing a constant per
    # row pair (guide §1.2 step 1, §4.1 "built-ins over UDF-shaped
    # plans"). Integer arithmetic is exact, so the per-plane dot and
    # the signature bits are bit-identical to the old aggregation
    # order and to the oracle.
    import hashlib

    signs_const = [
        [
            1
            if int(
                hashlib.md5(f"{p}:{pos}".encode()).hexdigest()[0], 16
            )
            % 2
            == 0
            else -1
            for pos in range(1, 65)
        ]
        for p in range(n_planes_total)
    ]
    sig_cols = []
    for tbl in range(_RL_TABLES):
        bit_terms = []
        for b in range(_RL_PLANES):
            sv = ",".join(
                f"{s}L" for s in signs_const[tbl * _RL_PLANES + b]
            )
            # slice(vq, 1, 64): zip_with null-pads on length mismatch
            # (a >64-dim embedding would NULL the whole dot and zero
            # every signature bit — silent recall collapse); slicing
            # reproduces the old pos-join's truncate-to-64 semantics
            # for any future embedding dimension (ADVICE r11 #2).
            dot = (
                f"aggregate(zip_with(slice(vq, 1, 64), array({sv}),"
                f" (x, s) -> x * s), 0L, (acc, x) -> acc + x)"
            )
            bit_terms.append(
                f"(CASE WHEN {dot} >= 0 THEN {1 << b} ELSE 0 END)"
            )
        sig_cols.append(
            F.struct(
                F.lit(tbl).cast("long").alias("tbl"),
                F.expr(" + ".join(bit_terms)).cast("int").alias("sig"),
            )
        )
    sigs = nq.select(
        "vec_id", F.explode(F.array(*sig_cols)).alias("ts")
    ).select("vec_id", F.col("ts.tbl").alias("tbl"), F.col("ts.sig").alias("sig"))
    qsigs = sigs.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "tbl", "sig"
    )
    cand = (
        sigs.join(F.broadcast(qsigs), ["tbl", "sig"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = nq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vq").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    cv = nq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _int_cosine("qv", "cv", "qn2", "cn2").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    approx_topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_topk = _exact_topk_df(nq, nq)
    return _recall_output(nq, approx_topk, exact_topk)


@query(
    "ann_ivf_recall",
    oracle=f"""
        WITH {_QUANT_CTES},
        cent AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, vq, n2
            FROM (SELECT vec_id, vq, n2 FROM n
                  WHERE vec_id >= {N_QUERIES}
                  ORDER BY vec_id LIMIT {_IVF_K})
        ),
        assign AS (
            SELECT vec_id, cid FROM (
                SELECT c.vec_id, k.cid,
                       row_number() OVER (PARTITION BY c.vec_id ORDER BY
                           c.n2 + k.n2
                           - 2 * CAST(list_inner_product(c.vq, k.vq)
                                 AS BIGINT),
                           k.cid) AS rk
                FROM n c, cent k WHERE c.vec_id >= {N_QUERIES}
            ) WHERE rk = 1
        ),
        probe AS (
            SELECT vec_id AS query_id, cid FROM (
                SELECT q.vec_id, k.cid,
                       row_number() OVER (PARTITION BY q.vec_id ORDER BY
                           q.n2 + k.n2
                           - 2 * CAST(list_inner_product(q.vq, k.vq)
                                 AS BIGINT),
                           k.cid) AS rk
                FROM n q, cent k WHERE q.vec_id < {N_QUERIES}
            ) WHERE rk <= {_IVF_NPROBE}
        ),
        cand AS (
            SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
            FROM probe p JOIN assign a ON p.cid = a.cid
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   round(CAST(list_inner_product(a.vq, b.vq) AS DOUBLE)
                         / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)),
                         6) AS cosine
            FROM cand JOIN n a ON a.vec_id = cand.query_id
                      JOIN n b ON b.vec_id = cand.neighbor_id
        ),
        approx_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rk
                FROM scored
            ) WHERE rk <= {TOP_K}
        ),
        {_exact_topk_ctes(f"b.vec_id >= {N_QUERIES}")},
        {_RECALL_TAIL}
    """,
)
def ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable IVF recall@k: a seeded coarse quantizer — the
    16 lowest non-query vec_ids ARE the centroids (no Lloyd rounds, so
    the model is a pure function of the data that ANSI SQL can rebuild)
    — assigns every corpus vector to its nearest cell by exact integer
    L2 distance over round(x·1e6) vectors (ties to the lower cell id);
    each query probes its 4 nearest cells; candidates rescore by exact
    quantized cosine; output = per-query |IVF top-k ∩ exact top-k| with
    the exact baseline restricted to the indexed corpus (vec_id ≥ 10,
    queries are not in the index — same contract as ann_ivf_topk).

    The driver-checkable twin of the rows-only ann_ivf_topk: that entry
    carries the real Lloyd-refined codebook via Arrow partial sums (the
    production path); this one pins the probe/assign/rescore plumbing
    with a bit-identical DuckDB replay.

    Plan: the K×D centroid model is collected once (16 rows — the IVF
    "model is tiny" property) and broadcast into a corpus×16 distance
    scan; assignment is one partitioned window; candidates shuffle on
    cell id only."""
    nq = _quantized(spark, sf_dir)
    corpus = nq.filter(F.col("vec_id") >= N_QUERIES)

    cent_rows = (
        corpus.orderBy("vec_id").limit(_IVF_K).select("vec_id", "vq", "n2")
        .collect()
    )
    cent = spark.createDataFrame(
        [
            (i, list(r["vq"]), int(r["n2"]))
            for i, r in enumerate(cent_rows)
        ],
        "cid int, kv array<bigint>, kn2 bigint",
    )

    def _dist_int(v: str, kv: str, n2: str, kn2: str):
        dot = F.expr(
            f"aggregate(zip_with({v}, {kv}, (x, y) -> x * y),"
            f" 0L, (acc, x) -> acc + x)"
        )
        return F.col(n2) + F.col(kn2) - 2 * dot

    wv = W.partitionBy("vec_id").orderBy("d2", "cid")
    assign = (
        corpus.crossJoin(F.broadcast(cent))
        .select(
            "vec_id",
            "cid",
            _dist_int("vq", "kv", "n2", "kn2").alias("d2"),
        )
        .withColumn("rk", F.row_number().over(wv))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    probe = (
        nq.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            "cid",
            _dist_int("vq", "kv", "n2", "kn2").alias("d2"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("d2", "cid")
            ),
        )
        .filter(F.col("rk") <= _IVF_NPROBE)
        .select("query_id", "cid")
    )
    cand = (
        assign.join(F.broadcast(probe), "cid")
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    qv = nq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vq").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    cv = nq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _int_cosine("qv", "cv", "qn2", "cn2").alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), "neighbor_id"
    )
    approx_topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_topk = _exact_topk_df(nq, corpus)
    return _recall_output(nq, approx_topk, exact_topk)


@query(
    "ann_pq_recall",
    oracle=f"""
        WITH {_QUANT_CTES},
        e AS (
            SELECT vec_id, t.pos, vq[t.pos] AS valq
            FROM v, unnest(range(1, 65)) AS t(pos)
        ),
        cb AS (
            SELECT row_number() OVER (ORDER BY vec_id) - 1 AS k, vec_id
            FROM (SELECT vec_id FROM n WHERE vec_id >= {N_QUERIES}
                  ORDER BY vec_id LIMIT {_PQ_CODES})
        ),
        ce AS (
            SELECT cb.k, (t.pos - 1) // {_PQ_SUBD} AS m, t.pos,
                   v.vq[t.pos] AS cval
            FROM cb JOIN v ON v.vec_id = cb.vec_id,
                 unnest(range(1, 65)) AS t(pos)
        ),
        xe AS (
            SELECT vec_id, (pos - 1) // {_PQ_SUBD} AS m, pos, valq
            FROM e WHERE vec_id >= {N_QUERIES}
        ),
        subdist AS (
            SELECT x.vec_id, x.m, c.k,
                   sum((x.valq - c.cval) * (x.valq - c.cval)) AS d2
            FROM xe x JOIN ce c ON x.pos = c.pos
            GROUP BY x.vec_id, x.m, c.k
        ),
        codes AS (
            SELECT vec_id, m, k FROM (
                SELECT vec_id, m, k,
                       row_number() OVER (PARTITION BY vec_id, m
                           ORDER BY d2, k) AS rk
                FROM subdist
            ) WHERE rk = 1
        ),
        lut AS (
            SELECT q.vec_id AS query_id, c.m, c.k,
                   sum(q.valq * c.cval) AS ip
            FROM e q JOIN ce c ON q.pos = c.pos
            WHERE q.vec_id < {N_QUERIES}
            GROUP BY q.vec_id, c.m, c.k
        ),
        cnorm AS (
            SELECT k, m, sum(cval * cval) AS nn FROM ce GROUP BY k, m
        ),
        adc AS (
            SELECT l.query_id, cd.vec_id AS neighbor_id,
                   sum(l.ip) AS dotr, sum(cn.nn) AS n2r
            FROM codes cd
            JOIN lut l ON cd.m = l.m AND cd.k = l.k
            JOIN cnorm cn ON cn.m = cd.m AND cn.k = cd.k
            GROUP BY l.query_id, cd.vec_id
        ),
        cand AS (
            SELECT query_id, neighbor_id FROM (
                SELECT adc.query_id, adc.neighbor_id,
                       row_number() OVER (PARTITION BY adc.query_id
                           ORDER BY round(CAST(adc.dotr AS DOUBLE)
                               / sqrt(CAST(q.n2 AS DOUBLE)
                                      * CAST(adc.n2r AS DOUBLE)), 6) DESC,
                           adc.neighbor_id) AS rk
                FROM adc JOIN n q ON q.vec_id = adc.query_id
                WHERE adc.n2r > 0
            ) WHERE rk <= {_PQ_CANDS}
        ),
        scored AS (
            SELECT cand.query_id, cand.neighbor_id,
                   round(CAST(list_inner_product(a.vq, b.vq) AS DOUBLE)
                         / sqrt(CAST(a.n2 AS DOUBLE) * CAST(b.n2 AS DOUBLE)),
                         6) AS cosine
            FROM cand JOIN n a ON a.vec_id = cand.query_id
                      JOIN n b ON b.vec_id = cand.neighbor_id
        ),
        approx_topk AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       row_number() OVER (PARTITION BY query_id
                           ORDER BY cosine DESC, neighbor_id) AS rk
                FROM scored
            ) WHERE rk <= {TOP_K}
        ),
        {_exact_topk_ctes(f"b.vec_id >= {N_QUERIES}")},
        {_RECALL_TAIL}
    """,
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable PQ recall@k: product quantization with a
    seeded codebook — the 16 lowest non-query vectors' sub-vectors ARE
    the per-subspace codes (no Lloyd refinement, so ANSI SQL rebuilds
    the identical model) over 8 subspaces × 8 dims of round(x·1e6)
    integer vectors. Corpus vectors encode to their nearest code per
    subspace (exact integer L2, ties to the lower code); queries score
    codes via the classic ADC decomposition — disjoint subspaces make
    both the inner product and the reconstructed norm exact SUMS of
    per-(subspace, code) lookup-table integers — the top 20 ADC
    candidates rescore exactly, and the output is per-query |PQ top-k ∩
    exact top-k| against the indexed corpus (vec_id ≥ 10).

    The driver-checkable twin of the rows-only ann_pq_topk (Lloyd-
    refined 6-bit codes scored in Arrow batches — the production scan
    at 100 TB); this pins encode/LUT/ADC/rescore with a bit-identical
    DuckDB replay: every quantity before the final division is an
    integer, so partial-agg order cannot move a single code.

    Plan: the 1,024-row exploded codebook and the 10-query LUT
    broadcast; encoding is one keyed partial agg over corpus×codes
    rows; ADC is a broadcast join keyed on (subspace, code) plus one
    keyed sum — no corpus-sized shuffle anywhere."""
    nq = _quantized(spark, sf_dir)

    cb_rows = (
        nq.filter(F.col("vec_id") >= N_QUERIES)
        .orderBy("vec_id")
        .limit(_PQ_CODES)
        .select("vq")
        .collect()
    )
    ce_rows = [
        (k, (pos - 1) // _PQ_SUBD, pos, int(r["vq"][pos - 1]))
        for k, r in enumerate(cb_rows)
        for pos in range(1, 65)
    ]
    ce = spark.createDataFrame(
        ce_rows, "k int, m int, pos int, cval bigint"
    )

    e = nq.select(
        "vec_id", F.posexplode("vq").alias("pos0", "valq")
    ).select("vec_id", (F.col("pos0") + 1).alias("pos"), "valq")
    xe = e.filter(F.col("vec_id") >= N_QUERIES).withColumn(
        "m", ((F.col("pos") - 1) / _PQ_SUBD).cast("int")
    )
    subdist = (
        xe.join(F.broadcast(ce), ["pos", "m"])
        .groupBy("vec_id", "m", "k")
        .agg(
            F.sum(
                (F.col("valq") - F.col("cval"))
                * (F.col("valq") - F.col("cval"))
            ).alias("d2")
        )
    )
    codes = (
        subdist.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("vec_id", "m").orderBy("d2", "k")
            ),
        )
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", "k")
    )
    lut = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(ce), "pos")
        .groupBy(F.col("vec_id").alias("query_id"), "m", "k")
        .agg(F.sum(F.col("valq") * F.col("cval")).alias("ip"))
    )
    cnorm = ce.groupBy("k", "m").agg(
        F.sum(F.col("cval") * F.col("cval")).alias("nn")
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "k"])
        .join(F.broadcast(cnorm), ["m", "k"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("ip").alias("dotr"), F.sum("nn").alias("n2r"))
    )
    qn = nq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("n2").alias("qn2")
    )
    cand = (
        adc.filter(F.col("n2r") > 0)
        .join(F.broadcast(qn), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.col("dotr")
                / F.sqrt(F.col("qn2").cast("double") * F.col("n2r")),
                6,
            ).alias("adc_score"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("adc_score").desc(), "neighbor_id"
                )
            ),
        )
        .filter(F.col("rk") <= _PQ_CANDS)
        .select("query_id", "neighbor_id")
    )
    qv = nq.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("vq").alias("qv"),
        F.col("n2").alias("qn2"),
    )
    cv = nq.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("vq").alias("cv"),
        F.col("n2").alias("cn2"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _int_cosine("qv", "cv", "qn2", "cn2").alias("cosine"),
        )
    )
    approx_topk = (
        scored.withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("cosine").desc(), "neighbor_id"
                )
            ),
        )
        .filter(F.col("rk") <= TOP_K)
        .select("query_id", "neighbor_id")
    )
    exact_topk = _exact_topk_df(nq, nq.filter(F.col("vec_id") >= N_QUERIES))
    return _recall_output(nq, approx_topk, exact_topk)


_VAR_SCALE = 10_000  # per-dim stats quantizer: round(x*1e4)


@query(
    "embedding_variance_by_dim",
    oracle=f"""
        WITH e AS (
            SELECT CAST(t.pos AS INTEGER) AS dim,
                   CAST(round(CAST(embedding[t.pos] AS DOUBLE)
                              * {_VAR_SCALE}) AS BIGINT) AS q
            FROM embeddings,
                 unnest(range(1, len(embedding) + 1)) AS t(pos)
        )
        SELECT dim,
               CAST(count(*) AS BIGINT) AS n,
               round(CAST(sum(q) AS BIGINT)
                     / (count(*) * {_VAR_SCALE}.0), 6) AS mean,
               round((CAST(sum(q * q) AS BIGINT) * 1.0 / count(*)
                      - (CAST(sum(q) AS BIGINT) * 1.0 / count(*))
                        * (CAST(sum(q) AS BIGINT) * 1.0 / count(*)))
                     / ({_VAR_SCALE}.0 * {_VAR_SCALE}.0), 6) AS variance,
               round(min(q) / {_VAR_SCALE}.0, 4) AS vmin,
               round(max(q) / {_VAR_SCALE}.0, 4) AS vmax
        FROM e GROUP BY dim
    """,
)
def embedding_variance_by_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension corpus statistics of the embedding column — mean,
    population variance, min, max per coordinate: the feature-scaling
    / whitening-diagnostics pass every vector pipeline runs before
    indexing (dead dimensions → candidates for truncation; variance
    outliers → normalization bugs upstream).

    Cross-engine float discipline: components quantize to round(x·1e4)
    integers BEFORE aggregation, so sum and sum-of-squares are exact
    integer arithmetic (|q| ≤ 6e3 → Σq² ≤ ~7e10 per dim even at 10⁶
    rows per dim — far inside int64 and f64-exact range); the variance
    uses E[q²] − E[q]² on those exact integers, divided and rounded
    once, identically on both engines.

    Scale: posexplode fans D rows per vector but partial aggregation
    combines them map-side immediately — the shuffle carries D=64
    cells × partitions, not the corpus. One scan, one keyed agg,
    nothing else."""
    t = load_tables(spark, sf_dir, ("embeddings",))
    e = t["embeddings"].select(
        F.posexplode(
            F.expr(
                f"transform(embedding, x ->"
                f" CAST(round(CAST(x AS DOUBLE) * {_VAR_SCALE}) AS BIGINT))"
            )
        ).alias("pos0", "q")
    ).select((F.col("pos0") + 1).cast("int").alias("dim"), "q")
    n = F.count("*")
    s = F.sum("q")
    ss = F.sum(F.col("q") * F.col("q"))
    return e.groupBy("dim").agg(
        n.cast("long").alias("n"),
        F.round(s / (n * float(_VAR_SCALE)), 6).alias("mean"),
        F.round(
            (ss * 1.0 / n - (s * 1.0 / n) * (s * 1.0 / n))
            / (float(_VAR_SCALE) * float(_VAR_SCALE)),
            6,
        ).alias("variance"),
        F.round(F.min("q") / float(_VAR_SCALE), 4).alias("vmin"),
        F.round(F.max("q") / float(_VAR_SCALE), 4).alias("vmax"),
    )
