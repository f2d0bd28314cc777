from biglake_iceberg_python_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    all_oracle_sql,
    all_queries,
    load_all,
    query,
)

__all__ = ["REGISTRY", "QuerySpec", "all_queries", "all_oracle_sql", "load_all", "query"]
