"""Sources: parquet scans over the driver testdata (reference parity: A6).

The reference's only source is a schema-inferred parquet glob read
(pyspark_jobs/iceberg_table_creation.py:77). Here every query reads the
driver-generated TPC-H-ish tables the same way; CSV/JSON readers live in
``readers.py``.

Scale notes: ``spark.read.parquet`` gives the vectorized columnar reader,
footer-driven schema, predicate pushdown and column pruning for free — at
100 TB the same call reads a partitioned directory tree and Catalyst prunes
partitions from the filters. Nothing here collects to the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any realistic scale factor (TPC-H
# region=5 rows, nation=25 rows always; supplier/part grow slowly).
BROADCAST_DIMS = ("region", "nation")


def load_table(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = False
) -> DataFrame:
    """Read one testdata table (vectorized parquet scan, schema from footer).

    ``events.ts`` has shipped in two encodings across driver rounds:
    TIMESTAMP(NANOS) (which Spark 4 refuses by default — read as a
    nanosecond long via the legacy conf and converted with exact integer
    division) and plain TIMESTAMP(MICROS) (read natively). The loader
    checks the footer-inferred dtype and only converts when the column
    arrives as a bigint, so both generations of testdata work unchanged.

    ``widen=True``: repartition to full core count when the scan's natural
    split count is degenerate (the testdata ships single-row-group files, so
    a scan-bound aggregation would otherwise run one-threaded). On real
    multi-row-group / multi-file data the condition never fires and no
    shuffle is added — use it only for scan-dominated aggregations, never
    before a join (the join's own hash exchange would make it a double
    shuffle).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    if widen:
        df = load_table(spark, sf_dir, name)
        cores = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < max(2, cores // 2):
            df = df.repartition(cores)
        return df
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # TIMESTAMP_NTZ via pure epoch arithmetic — NOT
            # timestamp_micros(), whose rendering depends on the session
            # timezone: the driver may run with any local TZ, and the other
            # tables already read as NTZ.
            df = df.withColumn(
                "ts",
                F.expr(
                    "timestampadd(MICROSECOND, ts div 1000,"
                    " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
                ),
            )
        return df
    return spark.read.parquet(path)


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}
