"""Every registered query must match its DuckDB oracle at sf0.001.

This is a local mirror of the driver's t2 correctness gate (which runs
at sf0.01); catching dialect/type drift here keeps the gate green.
"""

from __future__ import annotations

import pytest

import sqawk_spark.operators as operators
from sqawk_spark.operators.registry import REGISTRY

operators.load_all()

from tests.oracle_check import compare

ORACLE_CHECKED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    compare(spark, sf_dir, spec.builder, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    from tests.oracle_check import assert_atomic_schema

    df = REGISTRY[name].builder(spark, sf_dir)
    # rows-only entries still flow through the driver canonicalizer
    # (it hashes the Spark side even without an oracle) — the atomic-
    # column ban applies to every registry entry, not just oracled ones
    assert_atomic_schema(df)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_groups_frame_emulation_matches_native_sqlite(spark, sf_dir):
    """window_groups_frame emulates GROUPS via dense_rank + RANGE
    (neither Spark nor DuckDB implements GROUPS); real SQLite does —
    assert value equality against its NATIVE GROUPS frame."""
    import sqlite3

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT p_partkey, p_size, p_brand,"
        " CAST(round(p_retailprice*100) AS BIGINT)"
        f" FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    sq = sqlite3.connect(":memory:")
    sq.execute(
        "create table part (p_partkey int, p_size int, p_brand text,"
        " cents int)"
    )
    sq.executemany("insert into part values (?,?,?,?)", rows)
    want = sorted(
        sq.execute(
            """
            select p_partkey, p_size, sum(cents) over (
                partition by p_brand order by p_size
                groups between 1 preceding and 1 following) from part
            """
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in REGISTRY["window_groups_frame"].builder(spark, sf_dir).collect()
    )
    assert got == want


def test_groups_exclude_entry_matches_native_sqlite(spark, sf_dir):
    """window_groups_exclude's five emulated EXCLUDE columns (three
    sum-subtraction, two min/max directional-decomposition) must
    equal real SQLite's native GROUPS ... EXCLUDE output."""
    import sqlite3

    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        "SELECT p_partkey, p_size, p_brand,"
        " CAST(round(p_retailprice*100) AS BIGINT)"
        f" FROM '{sf_dir}/part.parquet'"
    ).fetchall()
    sq = sqlite3.connect(":memory:")
    sq.execute(
        "create table part (p_partkey int, p_size int, p_brand text,"
        " cents int)"
    )
    sq.executemany("insert into part values (?,?,?,?)", rows)
    frame = (
        "partition by p_brand order by p_size "
        "groups between 1 preceding and 1 following"
    )
    want = sorted(
        sq.execute(
            f"""
            select p_partkey, p_size,
                sum(cents) over ({frame} exclude group),
                sum(cents) over ({frame} exclude ties),
                sum(cents) over ({frame} exclude current row),
                min(cents) over ({frame} exclude group),
                max(cents) over ({frame} exclude current row)
            from part
            """
        ).fetchall()
    )
    got = sorted(
        tuple(r)
        for r in REGISTRY["window_groups_exclude"]
        .builder(spark, sf_dir)
        .collect()
    )
    assert got == want


def test_lang_temperature_odd_corpus_count_matches_oracle(spark, tmp_path):
    """n_target must floor(total/2) on BOTH engines: with an odd
    document count Spark's truncating cast and DuckDB's half-even
    rounding CAST disagreed by one, shifting every keep rate (ADVICE
    r05). 103 docs: 51.5 → round-half-even 52 vs floor 51."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 103
    pa_table = pa.table(
        {
            "doc_id": list(range(n)),
            "lang": [["en", "fr", "de"][i % 3] for i in range(n)],
        }
    )
    pq.write_table(pa_table, str(tmp_path / "documents.parquet"))
    spec = REGISTRY["sample_lang_temperature"]
    compare(spark, str(tmp_path), spec.builder, spec.oracle)


def test_short_documents_match_oracles(spark, tmp_path):
    """Docs shorter than the gram width used to CRASH the Spark side:
    sequence() descends when stop < start, so the unguarded shingle /
    bigram / trigram transforms reached slice(t, 0, n) — while the
    DuckDB oracles' ascending-only generate_series silently produced
    no grams. The guards make both engines agree: short docs simply
    contribute nothing. Latent at driver SFs (every synthetic doc is
    long); this corpus pins it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    texts = [
        "one",
        "two words",
        "three little words",
        "a longer document with enough words to form shingles here",
        "a longer document with enough words to form shingles here",
        "",
    ]
    pa_table = pa.table(
        {
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa_table, str(tmp_path / "documents.parquet"))
    for name in (
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "text_repetition_stats",
        "text_perplexity_bigram",
    ):
        spec = REGISTRY[name]
        compare(spark, str(tmp_path), spec.builder, spec.oracle)
