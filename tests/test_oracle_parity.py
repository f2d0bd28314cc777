"""The local mirror of the driver's t2 gate: every registered query with an
oracle must hash-match DuckDB at sf0.001; rows-only queries must execute and
return a sane row count. (SURVEY.md §5 — driver-defined test strategy.)"""

from __future__ import annotations

import pytest

from biglake_iceberg_python_spark.plans.check import compare, duckdb_connect
from biglake_iceberg_python_spark.plans.registry import load_all, resolve_oracle

REGISTRY = load_all()


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    return duckdb_connect(sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_parity(name, spark, sf_dir, oracle_con):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    sql = resolve_oracle(spec, sf_dir)
    if sql is None:
        assert df.count() >= 0  # executes; semantics asserted in test_operators
        return
    result = compare(df, oracle_con, sql)
    assert result["ok"], {k: v for k, v in result.items() if k != "ok"}
