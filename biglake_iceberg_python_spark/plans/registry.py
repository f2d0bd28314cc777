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
import os
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The grading driver always compares Spark vs oracle at sf0.01 and calls the
# contract's ``oracle_sql()`` with no sf argument — data-dependent oracle
# BUILDERS resolve against this dir unless the harness (pytest / driver_sim /
# bench_vs_duckdb) overrides it to the sf it actually compares at.
DRIVER_ORACLE_SF_DIR = "/root/testdata/sf0.01"
_ORACLE_SF_ENV = "SPARK_GRAFT_ORACLE_SF_DIR"


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # include in bench.py headline set
    doc: str = ""
    # Data-dependent oracle: ``(sf_dir) -> SQL``. Used by the exact-by-
    # construction transcendental queries, whose micro-nat literal tables are
    # derived from the data (a bounded histogram) by ONE shared Python
    # function and inlined into BOTH the Spark plan and the oracle SQL — so
    # no engine ever rounds a raw libm double. Mutually exclusive with
    # ``oracle``; resolve via :func:`resolve_oracle`.
    oracle_builder: Callable[[str], str] | None = None

    def has_oracle(self) -> bool:
        return self.oracle is not None or self.oracle_builder is not None


# Builder results memoized per (query, sf_dir): each builder scans parquet
# to derive its literal table, and the lint/parity tests resolve the same
# oracle several times per session. Safe because the testdata under a given
# sf_dir is immutable for the life of a process (tests that craft their own
# tables write to a fresh tmp_path, i.e. a new key).
_BUILDER_CACHE: dict[tuple[str, str], str] = {}


def resolve_oracle(spec: QuerySpec, sf_dir: str) -> str | None:
    """The oracle SQL to run against the parquet tables under ``sf_dir``."""
    if spec.oracle_builder is not None:
        key = (spec.name, sf_dir)
        if key not in _BUILDER_CACHE:
            _BUILDER_CACHE[key] = spec.oracle_builder(sf_dir)
        return _BUILDER_CACHE[key]
    return spec.oracle


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
# Provenance of this rotation (round 14, per round-13 VERDICT "Next round"
# #2): the optimization rounds touched query internals that only the
# driver's official t2 hash-match can certify, so the window leads with
# every round-13/14-optimized path, then fills with the stalest cohort.
# Staleness recomputed from CORRECTNESS_r01..r13 (histogram r3x4 / r5x5 /
# r7x45 / r8x46 / r9x48 / r10x50 / r11x50 / r12x50 / r13x50; the r3/r5
# residue is the rows-only/approximate set that never hash-passes by
# design -- rows-only names have windowed before: r03 carried
# dedup_minhash_lsh, r08 dedup_minhash_oph).
#   * 16 optimized/touched paths: the round-13 verdict's 11 (q21, graph x4,
#     dedup x3, text_lm_perplexity, sim_hybrid_rrf -- plus the shared-bm25
#     inheritor curate_quality_weighted_sample) and the round-14 rewrites
#     (BPE trainer/encoder driver-literal argmax, bm25/agg_unpivot widen
#     projection, stream_tumbling_window as the events schema-cache probe).
#   * 3 r3-stale + 5 r5-stale (the full remaining pre-r7 residue).
#   * 26 of the 45 r7-stale names, preferring families whose shared
#     helpers round 14 touched (dedup tokenizer/shingle consumers x7),
#     then the pandas-UDF x3, streaming x5, similarity x8 and as-of x3
#     batteries. 16 + 8 + 26 = 50.
_PRIORITY_WINDOW = [
    # round-13/14 optimized paths (16)
    "tpch_q21_waiting_supplier",
    "graph_pagerank",
    "graph_kcore",
    "graph_triangle_count",
    "graph_resource_allocation",
    "dedup_minhash_lsh",
    "dedup_minhash_oph",
    "dedup_substring_spans",
    "text_lm_perplexity",
    "sim_hybrid_rrf",
    "curate_quality_weighted_sample",
    "text_bpe_train_merges",
    "text_bpe_encode",
    "text_bm25_search",
    "agg_unpivot",
    "stream_tumbling_window",
    # r3-stale residue (3)
    "agg_approx",
    "dedup_simhash",
    "sim_ann_lsh",
    # r5-stale residue (5)
    "ml_coreset_kcenter",
    "ml_kmeans_embeddings",
    "ml_logistic_newton",
    "ml_pca_power",
    "ml_quality_distill",
    # r7-stale: dedup family (7) -- consumers of the round-14-touched
    # tokenizer/shingle/load helpers
    "dedup_cluster_representative",
    "dedup_containment",
    "dedup_fuzzy_levenshtein",
    "dedup_lsh_tuning_curve",
    "dedup_paragraph_exact",
    "dedup_semantic_ivf",
    "dedup_trigram_similarity",
    # r7-stale: pandas-UDF battery (3)
    "udf_pandas_grouped_agg",
    "udf_pandas_scalar_iter",
    "udf_udtf_polymorphic_analyze",
    # r7-stale: streaming battery (5)
    "stream_file_sink_manifest",
    "stream_join_then_window",
    "stream_stateful_timeout_session",
    "stream_topk_trending",
    "stream_windowed_dau",
    # r7-stale: similarity battery (8)
    "sim_ivf_index_persisted",
    "sim_matryoshka_rescore",
    "sim_mips_transform",
    "sim_mmr_diversify",
    "sim_pq_adc",
    "sim_quantize_int8",
    "sim_range_search",
    "sim_recall_eval",
    # r7-stale: as-of join family (3)
    "join_asof_forward",
    "join_asof_nearest",
    "join_asof_tolerance",
]


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
    oracle_builder: Callable[[str], str] | None = None,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        if oracle is not None and oracle_builder is not None:
            raise ValueError(f"{name}: oracle and oracle_builder are exclusive")
        REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tags, bench=bench,
            doc=(fn.__doc__ or "").strip(), oracle_builder=oracle_builder,
        )
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in load_all().items()}


def all_oracle_sql() -> dict[str, str]:
    """Driver contract: oracle SQL per query, builders resolved at the
    driver's comparison sf (env-overridable for local harnesses).

    The builder oracles are DATA-DEPENDENT (their micro-nat literal tables
    come from the parquet under ``sf_dir``), so a driver comparing at any
    other sf without setting ``SPARK_GRAFT_ORACLE_SF_DIR`` would get
    literal tables derived from the wrong data — silent dropped-row hash
    mismatches. Fail loudly instead: the resolved dir must exist — but
    only when a registered spec actually HAS an oracle_builder (round-9
    ADVICE: data-free environments — docs/lint tooling over the static
    oracle inventory — must still be able to enumerate; today builders
    always exist, so the driver path is unchanged)."""
    sf_dir = os.environ.get(_ORACLE_SF_ENV, DRIVER_ORACLE_SF_DIR)
    specs = load_all()
    needs_data = any(s.oracle_builder is not None for s in specs.values())
    if needs_data and not os.path.isdir(sf_dir):
        raise FileNotFoundError(
            f"oracle sf_dir {sf_dir!r} does not exist; set {_ORACLE_SF_ENV} "
            "to the directory the driver compares at (builder oracles "
            "derive literal tables from that data)"
        )
    return {
        name: resolve_oracle(spec, sf_dir)
        for name, spec in specs.items()
        if spec.has_oracle()
    }
