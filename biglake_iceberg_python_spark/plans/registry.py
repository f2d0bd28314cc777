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
import logging
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
    "biglake_iceberg_python_spark.sources.pyds",
    "biglake_iceberg_python_spark.operators.joins",
    "biglake_iceberg_python_spark.operators.tpch",
    "biglake_iceberg_python_spark.operators.aggregates",
    "biglake_iceberg_python_spark.operators.windows",
    "biglake_iceberg_python_spark.operators.setops",
    "biglake_iceberg_python_spark.operators.scalars",
    "biglake_iceberg_python_spark.operators.udfs",
    "biglake_iceberg_python_spark.operators.eventflow",
    "biglake_iceberg_python_spark.operators.business",
    "biglake_iceberg_python_spark.operators.graph",
    "biglake_iceberg_python_spark.operators.dedup",
    "biglake_iceberg_python_spark.operators.pipeline",
    "biglake_iceberg_python_spark.operators.curation",
    "biglake_iceberg_python_spark.operators.ml",
    "biglake_iceberg_python_spark.operators.similarity",
    "biglake_iceberg_python_spark.operators.textstats",
    "biglake_iceberg_python_spark.operators.retrieval",
    "biglake_iceberg_python_spark.operators.multimodal",
    "biglake_iceberg_python_spark.lakehouse.queries",
    "biglake_iceberg_python_spark.streaming.queries",
]

_loaded = False

# The grading driver verifies the FIRST 50 registered queries each round
# (registration order). Everything outside the window stays pinned by
# tests/test_oracle_parity.py's full sweep, which runs every registered
# query against its oracle regardless of ordering.
#
# Provenance of this rotation (round 4, per round-3 VERDICT "Next round"
# #1): after rounds 1–3, 100 of 198 queries had never had a driver-verified
# row. This window takes 49 of those 100, prioritized exactly as the
# verdict directed — the full lakehouse family first (the reference's core
# A2–A12 surface, zero driver evidence in 3 rounds), then setops, UDFs, the
# round-3 streaming additions, sql_parameterized / sql_pipe_syntax /
# util_observe_metrics, and the Python DataSource + remaining scalar
# batteries to fill to 50. `scalar_math` — round 3's ONE red row (a
# round-on-raw-DOUBLE halfway disagreement between DuckDB builds, fixed
# this round with a decimal-exact round on both sides) — stays in per the
# verdict's "never rotate a red row out" rule. Round 5 takes the remaining
# ~50 never-verified names (eventflow, business, graph, curation, ml,
# tpch Q2/Q11/Q20, join extras).
_PRIORITY_WINDOW = [
    # lakehouse family (reference core surface; 23 queries)
    "lakehouse_roundtrip",
    "lakehouse_insert_overwrite",
    "lakehouse_merge_upsert",
    "lakehouse_delete_where",
    "lakehouse_update_where",
    "lakehouse_time_travel",
    "lakehouse_metadata_log",
    "lakehouse_tblproperties",
    "lakehouse_catalog_introspection",
    "lakehouse_bucketed_join",
    "lakehouse_compaction",
    "lakehouse_schema_evolution",
    "lakehouse_incremental_read",
    "lakehouse_snapshot_diff",
    "lakehouse_hidden_partitioning",
    "lakehouse_manifest_pruning",
    "lakehouse_expire_snapshots",
    "lakehouse_zorder_layout",
    "lakehouse_branch_tags",
    "lakehouse_scd2_dimension",
    "lakehouse_cdc_apply",
    "lakehouse_mor_delete",
    "lakehouse_rollback",
    # set operations (6)
    "set_union_all",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "set_intersect_all",
    "set_except_all",
    # UDF surface (6)
    "udf_pandas_scalar",
    "udf_grouped_map",
    "udf_python_scalar",
    "udf_python_udtf",
    "udf_arrow_scalar",
    "udf_map_in_arrow",
    # round-3 streaming additions (5)
    "stream_tumbling_update",
    "stream_dedup_rocksdb",
    "stream_late_data_drop",
    "stream_restart_exactly_once",
    "stream_stream_left_join",
    # SQL surface extras (3)
    "sql_parameterized",
    "sql_pipe_syntax",
    "util_observe_metrics",
    # Python DataSource sources (2)
    "source_python_datasource",
    "source_python_datasource_stream",
    # remaining scalar batteries (4)
    "scalar_variant",
    "scalar_collation",
    "scalar_try_arithmetic",
    "scalar_bitwise",
    # round-3 red row, re-verified with its decimal-round fix (1)
    "scalar_math",
]

# ROUND-5 ROTATION PREP (numbers computed at round-4 close; recompute if
# the registry changes):
#   registry 304; ever-driver-verified after r1+r3: 98; r4 window: 50
#   → never-driver-verified pool after r4 (assuming window greens): 157.
# By family: events ×20 (the exact-moment statistics battery), agg ×16,
# curate ×16, text ×11, lakehouse ×9, source ×9, sql ×8, sim ×7, join ×6,
# ml ×6, dedup ×5, udf ×5, multimodal ×4, stream ×4, plus the long tail
# (tpch Q2/Q11/Q20, graph, cohort/funnel/business singles, window_nth).
# Round 5 should take the 50 OLDEST never-verified names first —
# curate/eventflow/business/graph/ml families registered in rounds 2-3 —
# before this round's additions; keep any r4 red row in place per the
# "never rotate a red row out" rule. Rounds 6-7 absorb the remainder
# (~107), prioritizing hash-matched queries over rows-only ones.


def load_all() -> dict[str, QuerySpec]:
    """Import every operator module, then order the registry so the
    round's priority window occupies the driver-verified prefix.

    The window guard is deliberately NON-FATAL: a name in the window that no
    module registered is logged and skipped, never raised — a single typo
    must not brick the whole registry (and with it bench, tests, and every
    driver artifact). tests/test_registry.py asserts the window is exactly
    registered, so a stray name still fails CI loudly.
    """
    global _loaded
    if not _loaded:
        for mod in _QUERY_MODULES:
            importlib.import_module(mod)
        missing = [n for n in _PRIORITY_WINDOW if n not in REGISTRY]
        if missing:
            logging.getLogger(__name__).warning(
                "priority window names not registered — skipping: %s", missing
            )
        ordered = {n: REGISTRY[n] for n in _PRIORITY_WINDOW if n in REGISTRY}
        ordered.update(
            (n, s) for n, s in REGISTRY.items() if n not in ordered
        )
        REGISTRY.clear()
        REGISTRY.update(ordered)
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
