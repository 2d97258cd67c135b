"""Graph analytics over the near-duplicate pair graph.

A corpus-scale pipeline does not stop at pair generation: the dup
graph itself carries signal. Connected components (``dedup_clusters``)
answer "which docs are the same"; centrality answers "which doc is the
HUB" — the canonical/original copy that many variants orbit, the same
role harmonic centrality plays in CommonCrawl's host-level quality
ranking. PageRank here runs as the classic bounded-round iterative
Spark computation: K unrolled sparse matrix-vector rounds, each ONE
join + ONE aggregation keyed on node id.

Exactness discipline: every quantity is an integer — ranks live in
1e-12 units of probability mass, contributions are floor divisions
(`div` in Spark, `//` in DuckDB, both truncating on non-negative
operands), and the damping step is ``(17·sum) div 20``. There is no
float anywhere, so partial-aggregation order cannot move a rank by
even one unit and the DuckDB oracle (the same recurrence unrolled as
chained CTEs) matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sqawk_spark.operators.registry import query

_PR_SCALE = 1_000_000_000_000  # rank units: 1e-12 of total mass
_PR_ROUNDS = 3


def _pagerank_oracle() -> str:
    from sqawk_spark.operators.dedup import _SHINGLE_CTES

    step = """
    r{k} AS (
        SELECT e.dst AS doc_id,
               (3 * {scale} // (20 * nn.n))
                   + (17 * sum(p.r // d.deg)) // 20 AS r
        FROM edges e
        JOIN r{j} p ON e.src = p.doc_id
        JOIN deg d ON e.src = d.src, nn
        GROUP BY e.dst, nn.n
    )"""
    chain = ",".join(
        step.format(k=k, j=k - 1, scale=_PR_SCALE)
        for k in range(1, _PR_ROUNDS + 1)
    )
    return f"""
        WITH {_SHINGLE_CTES},
        edges AS (
            SELECT doc_a AS src, doc_b AS dst FROM near_dups
            UNION ALL
            SELECT doc_b, doc_a FROM near_dups
        ),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
        nn AS (SELECT count(*) AS n FROM deg),
        r0 AS (SELECT src AS doc_id, {_PR_SCALE} // nn.n AS r FROM deg, nn),
        {chain}
        SELECT f.doc_id,
               CAST(d.deg AS BIGINT) AS deg,
               CAST(f.r AS BIGINT) AS rank_micro
        FROM r{_PR_ROUNDS} f JOIN deg d ON f.doc_id = d.src
    """


@query("graph_pagerank_dupgraph", oracle=_pagerank_oracle())
def graph_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup graph — hub scoring for duplicate
    families. Three damped power-iteration rounds (d = 0.85 as the
    exact rational 17/20) over the symmetric near-dup edge list;
    output is (doc_id, deg, rank_micro) for every document with at
    least one near-duplicate, rank in 1e-12 mass units. Dangling
    nodes cannot exist (the node set is the edge endpoints of a
    symmetric graph), which is what makes the plain recurrence exact
    without a dangling-mass redistribution term.

    Iterative-computation shape: the edge list joins its degree table
    ONCE and the result persists; each round is then one equi-join of
    the current rank vector against that frame plus one sum keyed on
    the destination — the sparse matrix-vector product. Rounds are a
    compile-time constant (unrolled into the plan, no driver
    synchronization per round beyond the single node-count scalar),
    exactly how the component label-propagation fallback iterates.

    Scale: the near-dup graph is pair-stream-sized — orders below the
    corpus (MAX_DF keeps it sparse) — so at 100 TB the rank vector
    and edges shuffle on well-hashed node ids; nothing is quadratic,
    nothing collects but one COUNT scalar. The shared ``_PAIRS_CACHE``
    means a session that already ran dedup pays only the K rounds."""
    from pyspark import StorageLevel

    from sqawk_spark.operators.dedup import _PAIRS_CACHE, _jaccard_pairs

    key = (id(spark), sf_dir)
    if key not in _PAIRS_CACHE:
        _PAIRS_CACHE[key] = (
            _jaccard_pairs(spark, sf_dir)
            .select("doc_a", "doc_b")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
    pairs = _PAIRS_CACHE[key]
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # one scalar to the driver: the node count (sets the teleport term)
    n = deg.count()
    teleport = 3 * _PR_SCALE // (20 * n)

    edges_deg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    ranks = deg.select(
        F.col("src").alias("doc_id"), F.lit(_PR_SCALE // n).alias("r")
    )
    for _ in range(_PR_ROUNDS):
        contrib = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["doc_id"])
            .select("dst", F.expr("r div deg").alias("c"))
        )
        ranks = (
            contrib.groupBy("dst")
            .agg(F.sum("c").alias("s"))
            .select(
                F.col("dst").alias("doc_id"),
                (F.lit(teleport) + F.expr("(17 * s) div 20")).alias("r"),
            )
        )
    return ranks.join(deg, ranks["doc_id"] == deg["src"]).select(
        "doc_id",
        F.col("deg").cast("long").alias("deg"),
        F.col("r").cast("long").alias("rank_micro"),
    )
