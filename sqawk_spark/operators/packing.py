"""Training-pipeline assembly operators: sequence packing and
eval-set contamination checking.

Both are the steps a pretraining data pipeline runs AFTER cleaning
and dedup (reference scope ends at query/serialize — these extend the
engine the way SURVEY.md §6 describes):

- sequence packing assigns every document its byte..er, token offsets
  in the deterministic concatenated token stream and the fixed-size
  training sequence ("pack") that stream position falls into — the
  GPT-style concat-and-chunk layout;
- contamination checking joins the corpus against a held-out eval
  split on shared n-grams, surfacing corpus documents that would leak
  eval content into training.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sqawk_spark.operators.dedup import MAX_DF, NGRAM, _shingle_index
from sqawk_spark.operators.registry import query
from sqawk_spark.operators.tables import load_tables

PACK_TOKENS = 512  # training sequence length (tokens per pack)
_PACK_BUCKETS = 32  # distributed prefix-sum fan-out

# Contamination: a corpus doc is flagged when it contains at least
# this share of an eval document's distinct n-grams.
CONTAM_CONTAINMENT = 0.5
_EVAL_BUCKETS = 20  # md5 bucket 0 of 20 → ~5% eval split

# CTE chain shared by the contamination-scan oracle and the
# decontaminated-corpus oracle (which anti-joins `overlap` instead of
# reporting it)
_CONTAM_CTES = f"""toks AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS t,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                       1, 4)) AS INTEGER) % {_EVAL_BUCKETS} = 0 AS is_eval
            FROM documents
        ),
        grams AS (
            SELECT DISTINCT doc_id, is_eval,
                   t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS g
            FROM toks, UNNEST(generate_series(1, len(t) - {NGRAM - 1}))
                 AS u(i)
        ),
        keep AS (
            SELECT g FROM grams GROUP BY g HAVING count(*) <= {MAX_DF}
        ),
        filtered AS (
            SELECT doc_id, is_eval, g FROM grams
            WHERE g IN (SELECT g FROM keep)
        ),
        eval_sizes AS (
            SELECT doc_id, count(*) AS sz FROM filtered
            WHERE is_eval GROUP BY doc_id
        ),
        overlap AS (
            SELECT c.doc_id AS corpus_doc_id, e.doc_id AS eval_doc_id,
                   count(*) AS n_common
            FROM filtered c JOIN filtered e ON c.g = e.g
            WHERE NOT c.is_eval AND e.is_eval
            GROUP BY 1, 2
        )"""


def _hash_key():
    """Deterministic shuffle order for packing: first 4 hex chars of
    md5(doc_id) as an int (same cross-engine idiom as sampling.py).
    Re-ingesting the corpus reproduces the same order — and therefore
    byte-identical packs — on any engine or partitioning."""
    return F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("int")


@query(
    "pack_sequences",
    oracle=f"""
        WITH t AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                       1, 4)) AS INTEGER) AS h,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
            FROM documents
        ),
        o AS (
            SELECT doc_id, n_tokens,
                   sum(n_tokens) OVER (ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev
            FROM t
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(coalesce(prev, 0) AS BIGINT) AS start_offset,
               CAST(coalesce(prev, 0) // {PACK_TOKENS} AS BIGINT) AS pack_id,
               CAST(coalesce(prev, 0) % {PACK_TOKENS} AS BIGINT)
                   AS offset_in_pack
        FROM o
    """,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (VERDICT r1 #8): documents
    are laid out in a deterministic md5-shuffled order, token counts
    accumulate into a global offset, and ``pack_id = offset //
    {PACK_TOKENS}`` names the fixed-length training sequence each
    document starts in (documents may straddle packs — the standard
    GPT pretraining layout, no padding waste).

    The cumulative sum is a DISTRIBUTED prefix sum, not a global
    ordered window (which would move the corpus to one partition —
    the WindowExec warning at 100 TB): docs bucket by the top bits of
    the same hash key (buckets partition the global order), each
    bucket cumsums in parallel, and the ≤{_PACK_BUCKETS}-row table of
    per-bucket totals turns into broadcast bucket base offsets. The
    oracle states the same thing as one flat window, which DuckDB can
    afford at test SF.
    """
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select(
        "doc_id",
        _hash_key().alias("h"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    # bucket = top bits of the order key → buckets partition the order
    docs = docs.withColumn("bkt", (F.col("h") / (65536 // _PACK_BUCKETS)).cast("int"))

    totals = docs.groupBy("bkt").agg(F.sum("n_tokens").alias("tot"))
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    bases = totals.select(
        "bkt", F.coalesce(F.sum("tot").over(wb), F.lit(0)).alias("base")
    )

    win = W.partitionBy("bkt").orderBy("h", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    local = docs.withColumn(
        "local_prev", F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
    )
    start = (F.col("base") + F.col("local_prev")).alias("start_offset")
    return (
        local.join(F.broadcast(bases), "bkt")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            start,
            F.floor((F.col("base") + F.col("local_prev")) / PACK_TOKENS)
            .cast("long")
            .alias("pack_id"),
            ((F.col("base") + F.col("local_prev")) % PACK_TOKENS)
            .cast("long")
            .alias("offset_in_pack"),
        )
    )


@query(
    "contamination_check",
    oracle=f"""
        WITH {_CONTAM_CTES}
        SELECT corpus_doc_id, eval_doc_id,
               CAST(n_common AS BIGINT) AS n_common,
               round(n_common * 1.0 / sz, 6) AS containment
        FROM overlap JOIN eval_sizes ON eval_doc_id = eval_sizes.doc_id
        WHERE n_common * 1.0 / sz >= {CONTAM_CONTAINMENT}
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination scan (VERDICT r1 #8): which corpus
    documents contain ≥{CONTAM_CONTAINMENT:.0%} of some eval
    document's distinct {NGRAM}-grams? (The planted near-duplicates
    make this non-vacuous: an eval doc's near-twin in the corpus is
    exactly the leak this catches.)

    Reuses the persisted inverted shingle index from dedup (grams
    hashed to 8-byte longs, MAX_DF stop-shingle cap): the overlap
    join is corpus-side index × eval-side index on gram id — the
    eval side is ~1/{_EVAL_BUCKETS} of the corpus, so the join is a
    pruned index lookup, never corpus × corpus. The md5-bucket eval
    split is the same deterministic assignment sampling.py uses, so
    the split itself is reproducible at any scale."""
    idx = _shingle_index(spark, sf_dir)
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % _EVAL_BUCKETS
        == 0
    )
    tagged = idx.withColumn("is_eval", is_eval)
    ev = tagged.filter("is_eval").select(
        F.col("doc_id").alias("eval_doc_id"), "g"
    )
    corpus = tagged.filter(~F.col("is_eval")).select(
        F.col("doc_id").alias("corpus_doc_id"), "g"
    )
    eval_sizes = ev.groupBy("eval_doc_id").agg(F.count("*").alias("sz"))
    overlap = (
        corpus.join(ev, "g")
        .groupBy("corpus_doc_id", "eval_doc_id")
        .agg(F.count("*").alias("n_common"))
    )
    return (
        overlap.join(F.broadcast(eval_sizes), "eval_doc_id")
        .filter(F.col("n_common") / F.col("sz") >= CONTAM_CONTAINMENT)
        .select(
            "corpus_doc_id",
            "eval_doc_id",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(F.col("n_common") / F.col("sz"), 6).alias("containment"),
        )
    )


@query(
    "contamination_decontaminate",
    oracle=f"""
        WITH {_CONTAM_CTES},
        contaminated AS (
            SELECT DISTINCT corpus_doc_id
            FROM overlap JOIN eval_sizes ON eval_doc_id = eval_sizes.doc_id
            WHERE n_common * 1.0 / sz >= {CONTAM_CONTAINMENT}
        )
        SELECT doc_id FROM toks
        WHERE NOT is_eval
          AND doc_id NOT IN (SELECT corpus_doc_id FROM contaminated)
    """,
)
def contamination_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination step's actual deliverable: the training
    corpus with eval docs and every contaminated document removed — an
    anti-join of the corpus against the contamination scan's flagged
    ids.

    The flagged set is a tiny fraction of the corpus, so the anti-join
    broadcasts it; the expensive part (the index-lookup overlap join)
    is shared with contamination_check and, at scale, computed once
    per eval-set release, not per consumer."""
    flagged = contamination_check(spark, sf_dir).select(
        F.col("corpus_doc_id").alias("doc_id")
    ).distinct()
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % _EVAL_BUCKETS
        == 0
    )
    t = load_tables(spark, sf_dir, ("documents",))
    corpus = t["documents"].select("doc_id").filter(~is_eval)
    return corpus.join(F.broadcast(flagged), "doc_id", "left_anti")


_STOP_EN_SQL = ", ".join(f"'{w}'" for w in (
    "the", "a", "of", "and", "to", "in", "is", "it"
))


@query(
    "pipeline_end_to_end",
    oracle=f"""
        WITH {_CONTAM_CTES},
        contaminated AS (
            SELECT DISTINCT corpus_doc_id
            FROM overlap JOIN eval_sizes ON eval_doc_id = eval_sizes.doc_id
            WHERE n_common * 1.0 / sz >= {CONTAM_CONTAINMENT}
        ),
        q AS (
            SELECT d.doc_id, d.lang, t.is_eval,
                   len(t.t) AS n,
                   len(list_filter(t.t,
                       x -> list_contains([{_STOP_EN_SQL}], x))) AS stop_cnt,
                   len(list_distinct(t.t)) AS n_distinct
            FROM documents d JOIN toks t ON d.doc_id = t.doc_id
        ),
        fp AS (
            SELECT doc_id,
                   md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))
                       AS f
            FROM documents
        ),
        canon AS (SELECT f, min(doc_id) AS canonical FROM fp GROUP BY f),
        verdict AS (
            SELECT q.doc_id,
                   CASE
                       WHEN n < 20 THEN 'too_short'
                       WHEN lang NOT IN ('en', 'es') THEN 'lang_filtered'
                       WHEN stop_cnt * 100 < n THEN 'low_stopword'
                       WHEN n_distinct * 5 < n * 2 THEN 'repetitious'
                       WHEN is_eval THEN 'eval_holdout'
                       WHEN q.doc_id IN (SELECT corpus_doc_id
                                         FROM contaminated)
                           THEN 'contaminated'
                       WHEN q.doc_id <> c.canonical THEN 'duplicate'
                       ELSE 'keep'
                   END AS reason,
                   n AS n_tokens
            FROM q JOIN fp ON q.doc_id = fp.doc_id
                 JOIN canon c ON fp.f = c.f
        ),
        keepers AS (
            SELECT doc_id, n_tokens,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                       1, 4)) AS INTEGER) AS h
            FROM verdict WHERE reason = 'keep'
        ),
        packed AS (
            SELECT doc_id,
                   coalesce(sum(n_tokens) OVER (ORDER BY h, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS prev
            FROM keepers
        )
        SELECT v.doc_id, v.reason,
               v.reason = 'keep' AS keep,
               CAST(v.n_tokens AS BIGINT) AS n_tokens,
               CAST(p.prev // {PACK_TOKENS} AS BIGINT) AS pack_id
        FROM verdict v LEFT JOIN packed p ON v.doc_id = p.doc_id
    """,
)
def pipeline_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole preprocessing pipeline as ONE declarative plan — the
    reason this engine exists: quality gates → eval holdout →
    contamination scan → exact dedup → sequence packing, composed so
    Catalyst sees a single DAG (shared scans dedupe, filters push,
    every stage's partial output flows straight into the next — no
    materialization between "steps" the way a script-per-stage
    pipeline pays).

    Per-document verdict precedence: first failing quality rule, then
    eval_holdout, contaminated, duplicate (non-canonical fingerprint),
    else keep — and keepers get their pack assignment from the same
    bucketed two-phase prefix sum pack_sequences uses. One oracle
    checks every stage's interaction end to end."""
    from sqawk_spark.operators.textstats import STOP_EN, _tokens

    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"]
    tk = _tokens()
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % _EVAL_BUCKETS
        == 0
    )
    fingerprint = F.md5(
        F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    )
    base = docs.select(
        "doc_id",
        "lang",
        is_eval.alias("is_eval"),
        F.size(tk).alias("n"),
        F.size(F.filter(tk, lambda x: x.isin(*STOP_EN))).alias("stop_cnt"),
        F.size(F.array_distinct(tk)).alias("n_distinct"),
        fingerprint.alias("f"),
    )
    canonical = F.min("doc_id").over(W.partitionBy("f"))
    flagged = contamination_check(spark, sf_dir).select(
        F.col("corpus_doc_id").alias("doc_id")
    ).distinct().withColumn("contaminated", F.lit(True))
    verdict = (
        base.withColumn("canonical", canonical)
        .join(F.broadcast(flagged), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("n") < 20, "too_short")
            .when(~F.col("lang").isin("en", "es"), "lang_filtered")
            .when(F.col("stop_cnt") * 100 < F.col("n"), "low_stopword")
            .when(F.col("n_distinct") * 5 < F.col("n") * 2, "repetitious")
            .when(F.col("is_eval"), "eval_holdout")
            .when(F.col("contaminated"), "contaminated")
            .when(F.col("doc_id") != F.col("canonical"), "duplicate")
            .otherwise("keep")
            .alias("reason"),
            F.col("n").cast("long").alias("n_tokens"),
        )
    )
    # r11: the verdict frame feeds BOTH the final output and the
    # packing branch; without a materialization point the whole
    # subtree — including the contamination scan — evaluated twice
    # per run (measured: pipeline ≈ 2×verdict + packing).
    # localCheckpoint is per-run (each build recomputes from parquet;
    # nothing survives the query) and the frame is three narrow
    # columns per document — the cheapest possible cut point. At
    # 100 TB this is the same "materialize the small decision table,
    # not the corpus" move as guide §8.
    #
    # r12: eager=False (ADVICE r11 #4) — the eager form executed the
    # whole contamination subtree at BUILDER time, so explain-only
    # consumers (plan capture, test_plans) paid a real job just to
    # print a plan. The lazy checkpoint still cuts the plan to a
    # LogicalRDD and still computes the subtree exactly once per
    # execution (the checkpoint RDD is persisted on first
    # materialization inside the action, so the second consumer branch
    # reads storage instead of re-deriving); the cost simply moves
    # from build time into the action, where it belongs.
    verdict = verdict.localCheckpoint(eager=False)
    keepers = verdict.filter(F.col("reason") == "keep").select(
        "doc_id", "n_tokens", _hash_key().alias("h")
    ).withColumn(
        "bkt", (F.col("h") / (65536 // _PACK_BUCKETS)).cast("int")
    )
    totals = keepers.groupBy("bkt").agg(F.sum("n_tokens").alias("tot"))
    wb = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    bases = totals.select(
        "bkt", F.coalesce(F.sum("tot").over(wb), F.lit(0)).alias("base")
    )
    win = W.partitionBy("bkt").orderBy("h", "doc_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    packed = (
        keepers.withColumn(
            "local_prev", F.coalesce(F.sum("n_tokens").over(win), F.lit(0))
        )
        .join(F.broadcast(bases), "bkt")
        .select(
            "doc_id",
            F.floor((F.col("base") + F.col("local_prev")) / PACK_TOKENS)
            .cast("long")
            .alias("pack_id"),
        )
    )
    return verdict.join(packed, "doc_id", "left").select(
        "doc_id",
        "reason",
        (F.col("reason") == "keep").alias("keep"),
        "n_tokens",
        "pack_id",
    )


CHUNK_TOKENS = 32  # tokens per retrieval/training chunk
CHUNK_STRIDE = 24  # chunk start stride (CHUNK_TOKENS - overlap of 8)


@query(
    "doc_chunk_overlap",
    oracle=f"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_split_to_array(trim(text), '\\s+') AS t
            FROM documents
        ),
        st AS (
            SELECT doc_id, t,
                   unnest(range(0,
                       {CHUNK_STRIDE} * CAST(greatest(
                           (len(t) - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                               // {CHUNK_STRIDE}, 0) AS BIGINT) + 1,
                       {CHUNK_STRIDE})) AS s
            FROM toks
        )
        SELECT doc_id,
               CAST(s // {CHUNK_STRIDE} AS INTEGER) AS chunk_id,
               array_to_string(t[s + 1 : s + {CHUNK_TOKENS}], ' ')
                   AS chunk_text,
               CAST(least({CHUNK_TOKENS}, len(t) - s) AS INTEGER)
                   AS n_tokens
        FROM st
    """,
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking — the RAG/pretraining step
    that splits every document into fixed-size token windows with
    overlap (32-token chunks every 24 tokens → 8 tokens of overlap),
    so no sentence is ever split without context on one side. The
    last chunk start is the smallest one whose window reaches the end
    of the document — a trailing start fully contained in the
    previous window would duplicate tokens without adding any, so it
    is never emitted (docs of ≤ CHUNK_TOKENS tokens yield exactly one
    chunk).

    Chunk starts are `sequence(0, n_tokens-1, stride)`, the chunk is
    an `slice` of the token array, all inside one whole-stage-codegen
    projection. Scale: map-only — one scan, no shuffle, no join; the
    explode fan-out is n/stride rows per doc (bounded, ~1.3× token
    count in characters), and chunks inherit the input partitioning,
    so a downstream embed/write step starts co-located. At 100 TB this is
    the canonical narrow transform."""
    t = load_tables(spark, sf_dir, ("documents",), spread=("documents",))
    return chunk_documents(t["documents"])


def chunk_documents(docs: DataFrame) -> DataFrame:
    """The chunking core over any (doc_id, text) frame — shared by the
    registry builder and the edge-case unit tests so the tested logic
    IS the shipped logic."""
    toks = docs.select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("t")
    )
    max_k = F.greatest(
        F.floor(
            (F.size("t") - CHUNK_TOKENS + CHUNK_STRIDE - 1)
            / F.lit(CHUNK_STRIDE)
        ),
        F.lit(0),
    ).cast("long")
    st = toks.select(
        "doc_id",
        "t",
        F.explode(
            F.sequence(F.lit(0), CHUNK_STRIDE * max_k, F.lit(CHUNK_STRIDE))
        ).alias("s"),
    )
    return st.select(
        "doc_id",
        (F.col("s") / CHUNK_STRIDE).cast("int").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("t"), F.col("s") + 1, F.lit(CHUNK_TOKENS)), " "
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS), F.size("t") - F.col("s"))
        .cast("int")
        .alias("n_tokens"),
    )


_NF_BUCKETS = 64  # independent next-fit streams (one task each)


@query(
    "pack_nextfit_bins",
    oracle=f"""
        WITH RECURSIVE t AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                       1, 4)) AS INTEGER) AS h,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n
            FROM documents
        ),
        ord AS (
            SELECT doc_id, h, n, h // {65536 // _NF_BUCKETS} AS bkt,
                   row_number() OVER (
                       PARTITION BY h // {65536 // _NF_BUCKETS}
                       ORDER BY h, doc_id) AS rn
            FROM t
        ),
        walk(bkt, rn, doc_id, n, bin, off) AS (
            SELECT bkt, rn, doc_id, n, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.bkt, o.rn, o.doc_id, o.n,
                   CASE WHEN w.off + w.n + o.n <= {PACK_TOKENS}
                        THEN w.bin ELSE w.bin + 1 END,
                   CASE WHEN w.off + w.n + o.n <= {PACK_TOKENS}
                        THEN w.off + w.n ELSE CAST(0 AS BIGINT) END
            FROM walk w JOIN ord o ON o.bkt = w.bkt AND o.rn = w.rn + 1
        )
        SELECT doc_id, CAST(bkt AS INTEGER) AS bucket,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(bin AS BIGINT) AS bin_in_bucket,
               CAST(off AS BIGINT) AS offset_in_bin
        FROM walk
    """,
)
def pack_nextfit_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEXT-FIT bin packing — the no-straddle alternative to
    ``pack_sequences``: documents never split across training
    sequences; a document that would overflow the current
    {PACK_TOKENS}-token bin closes it and opens the next (oversized
    docs get a bin alone). This is the packing used when sequences
    must not cross document boundaries (contrastive batches, encoder
    training, anything where attention must not leak between docs);
    the cost is padding waste, which callers measure directly from
    ``offset_in_bin + n_tokens``.

    Packing is INHERENTLY sequential — bin state depends on every
    prior placement — so the scale design shards the corpus into
    {_NF_BUCKETS} deterministic hash buckets (the same md5 order key
    as ``pack_sequences``: buckets partition the global order) and
    runs one exact next-fit stream per bucket as an Arrow-batched
    ``applyInPandas`` task. Each task is a linear loop over its
    bucket; buckets are independent, so the stage parallelizes to
    min({_NF_BUCKETS}, cores) with zero cross-task coordination and
    no driver traffic. At 100 TB raise _NF_BUCKETS to the task-count
    target — the semantics (per-bucket bin ids) are unchanged by
    construction.

    The oracle is the SAME recurrence as a recursive CTE walking each
    bucket row-by-row — affordable at test SF, and bit-identical
    because every quantity is an integer and the order key is the
    shared cross-engine md5 idiom."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select(
        "doc_id",
        _hash_key().alias("h"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
    ).withColumn("bkt", (F.col("h") / (65536 // _NF_BUCKETS)).cast("int"))

    cap = PACK_TOKENS

    def pack_bucket(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
        bins, offs = [], []
        bin_i, off, prev_n = 0, 0, None
        for n in pdf["n"]:
            n = int(n)
            if prev_n is None:
                bin_i, off = 0, 0
            elif off + prev_n + n <= cap:
                off = off + prev_n
            else:
                bin_i, off = bin_i + 1, 0
            bins.append(bin_i)
            offs.append(off)
            prev_n = n
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bkt"].astype("int32"),
                "n_tokens": pdf["n"].astype("int64"),
                "bin_in_bucket": pd.Series(bins, dtype="int64"),
                "offset_in_bin": pd.Series(offs, dtype="int64"),
            }
        )

    return docs.groupBy("bkt").applyInPandas(
        pack_bucket,
        "doc_id long, bucket int, n_tokens long, "
        "bin_in_bucket long, offset_in_bin long",
    )


@query(
    "pack_firstfit_bins",
    oracle=f"""
        WITH RECURSIVE t AS (
            SELECT doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                       1, 4)) AS INTEGER) AS h,
                   len(regexp_split_to_array(trim(text), '\\s+')) AS n
            FROM documents
        ),
        ord AS (
            SELECT doc_id, h, n, h // {65536 // _NF_BUCKETS} AS bkt,
                   row_number() OVER (
                       PARTITION BY h // {65536 // _NF_BUCKETS}
                       ORDER BY n DESC, doc_id) AS rn
            FROM t
        ),
        walk(bkt, rn, doc_id, n, loads, bin, off) AS (
            SELECT bkt, rn, doc_id, n, [CAST(n AS BIGINT)],
                   CAST(0 AS BIGINT), CAST(0 AS BIGINT)
            FROM ord WHERE rn = 1
            UNION ALL
            SELECT o.bkt, o.rn, o.doc_id, o.n,
                   CASE WHEN fit.fidx IS NOT NULL
                        THEN w.loads[1:fit.fidx-1]
                             || [w.loads[fit.fidx] + o.n]
                             || w.loads[fit.fidx+1:]
                        ELSE w.loads || [CAST(o.n AS BIGINT)] END,
                   CAST(coalesce(fit.fidx, len(w.loads) + 1) - 1
                        AS BIGINT),
                   CAST(CASE WHEN fit.fidx IS NOT NULL
                             THEN w.loads[fit.fidx] ELSE 0 END AS BIGINT)
            FROM walk w
            JOIN ord o ON o.bkt = w.bkt AND o.rn = w.rn + 1,
            LATERAL (SELECT list_min(list_filter(
                         list_transform(w.loads,
                             (x, ix) -> CASE WHEN x + o.n <= {PACK_TOKENS}
                                        THEN ix END),
                         y -> y IS NOT NULL)) AS fidx) fit
        )
        SELECT doc_id, CAST(bkt AS INTEGER) AS bucket,
               CAST(n AS BIGINT) AS n_tokens,
               CAST(bin AS BIGINT) AS bin_in_bucket,
               CAST(off AS BIGINT) AS offset_in_bin
        FROM walk
    """,
)
def pack_firstfit_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST-FIT-DECREASING bin packing — the padding-waste optimizer
    over pack_nextfit_bins: within each shard, documents are placed
    LARGEST-FIRST into the first {PACK_TOKENS}-token bin with room
    (classic FFD, ≤ 11/9·OPT + 1 bins), so small documents backfill
    the gaps big ones leave instead of forcing new bins. Use when the
    padding budget matters more than preserving stream order; the
    no-straddle guarantee is the same.

    Scale design is identical to next-fit: FFD is inherently
    sequential, so the corpus shards into {_NF_BUCKETS} deterministic
    md5 hash buckets and one exact FFD loop runs per bucket as an
    Arrow-batched ``applyInPandas`` task — independent tasks, no
    cross-task state, no driver traffic. Raise _NF_BUCKETS to the
    task-count target at cluster scale.

    The oracle replays the identical recurrence as a DuckDB recursive
    CTE whose state is the LIST of open-bin loads — the first-fit
    index is list_min over an indexed lambda, the load update a list
    splice — bit-identical because every quantity is an integer and
    the within-bucket order (n DESC, doc_id) is engine-free."""
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select(
        "doc_id",
        _hash_key().alias("h"),
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n"),
    ).withColumn("bkt", (F.col("h") / (65536 // _NF_BUCKETS)).cast("int"))

    cap = PACK_TOKENS

    def pack_bucket(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []
        bins, offs = [], []
        for n in pdf["n"]:
            n = int(n)
            placed = False
            for i, ld in enumerate(loads):
                if ld + n <= cap:
                    bins.append(i)
                    offs.append(ld)
                    loads[i] = ld + n
                    placed = True
                    break
            if not placed:
                bins.append(len(loads))
                offs.append(0)
                loads.append(n)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "bucket": pdf["bkt"].astype("int32"),
                "n_tokens": pdf["n"].astype("int64"),
                "bin_in_bucket": pd.Series(bins, dtype="int64"),
                "offset_in_bin": pd.Series(offs, dtype="int64"),
            }
        )

    return docs.groupBy("bkt").applyInPandas(
        pack_bucket,
        "doc_id long, bucket int, n_tokens long, "
        "bin_in_bucket long, offset_in_bin long",
    )
