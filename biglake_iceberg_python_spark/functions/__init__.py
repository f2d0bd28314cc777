from biglake_iceberg_python_spark.functions.exprs import (
    dsum,
    davg,
    ts_s,
)

__all__ = ["dsum", "davg", "ts_s"]
