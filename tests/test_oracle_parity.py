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
    df = REGISTRY[name].builder(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
