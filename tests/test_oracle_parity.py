"""Every registered query must match its DuckDB oracle at sf0.001.

This is a local mirror of the driver's t2 correctness gate (which runs
at sf0.01); catching dialect/type drift here keeps the gate green.
"""

from __future__ import annotations

import pytest

import sqawk_spark.operators.relational  # noqa: F401 — populate registry
from sqawk_spark.operators.registry import REGISTRY

try:
    import sqawk_spark.operators.dedup  # noqa: F401
    import sqawk_spark.operators.similarity  # noqa: F401
    import sqawk_spark.operators.textstats  # noqa: F401
    import sqawk_spark.operators.multimodal  # noqa: F401
    import sqawk_spark.streaming.windows  # noqa: F401
except ImportError:
    pass

from tests.oracle_check import compare

ORACLE_CHECKED = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_CHECKED)
def test_oracle_parity(spark, sf_dir, name):
    spec = REGISTRY[name]
    compare(spark, sf_dir, spec.builder, spec.oracle)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = REGISTRY[name].builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
