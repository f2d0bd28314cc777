"""Central query registry.

Every operator the engine claims lands here as a :class:`QuerySpec`:
a named Spark callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are SQL-expressible) an ANSI-SQL oracle string DuckDB can run over
the same parquet tables. ``__spark_entry__.py`` exposes the registry to the
driver; ``bench.py`` and the pytest harness iterate it too, so one
registration gives correctness gate + bench + tests.

Column-name contract: the driver sorts columns by name before value-hashing,
so the Spark callable and oracle SQL must produce identical column names —
every spec is written with explicit aliases on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}

# Modules that register queries on import. Order is the SURVEY.md §2 order.
_QUERY_MODULES = [
    "biglake_iceberg_python_spark.operators.relational",
    "biglake_iceberg_python_spark.sources.readers",
    "biglake_iceberg_python_spark.operators.joins",
    "biglake_iceberg_python_spark.operators.tpch",
    "biglake_iceberg_python_spark.operators.aggregates",
    "biglake_iceberg_python_spark.operators.windows",
    "biglake_iceberg_python_spark.operators.setops",
    "biglake_iceberg_python_spark.operators.scalars",
    "biglake_iceberg_python_spark.operators.udfs",
    "biglake_iceberg_python_spark.operators.eventflow",
    "biglake_iceberg_python_spark.operators.business",
    "biglake_iceberg_python_spark.operators.dedup",
    "biglake_iceberg_python_spark.operators.pipeline",
    "biglake_iceberg_python_spark.operators.similarity",
    "biglake_iceberg_python_spark.operators.textstats",
    "biglake_iceberg_python_spark.operators.multimodal",
    "biglake_iceberg_python_spark.lakehouse.queries",
    "biglake_iceberg_python_spark.streaming.queries",
]

_loaded = False


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module so the registry is fully populated."""
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        _loaded = True
    return REGISTRY


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def all_oracle_sql() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
