"""End-to-end replica of the reference's own pipeline on its own fixture
(SURVEY.md §5: "mtcars-fixture test replicating the reference pipeline").

Reference flow (pyspark_jobs/iceberg_table_creation.py:58-85): namespace →
CREATE TABLE with the 12-column declared schema → read mt_cars.parquet →
temp view → INSERT INTO ... SELECT * with implicit positional casts
(double→float narrowing, am int→float widening — SURVEY.md §1.3). Expected
row count 32 (README.md:546 numRows) and first row per notebook cell 7.
"""

from __future__ import annotations

import os
import uuid

import pytest

MTCARS = "/root/reference/data/mt_cars.parquet"

# Declared DDL from the reference (iceberg_table_creation.py:71).
MTCARS_DDL = (
    "model STRING, mpg FLOAT, cyl INT, disp FLOAT, hp INT, drat FLOAT, "
    "wt FLOAT, qsec FLOAT, vs INT, am FLOAT, gear INT, carb INT"
)
MTCARS_COLS = [c.split()[0] for c in MTCARS_DDL.split(", ")]


@pytest.mark.skipif(not os.path.exists(MTCARS), reason="reference fixture absent")
def test_mtcars_pipeline_roundtrip(spark):
    from biglake_iceberg_python_spark.lakehouse.catalog import (
        LakehouseCatalog,
        run_reference_pipeline,
    )

    db = f"mtcars_{uuid.uuid4().hex[:8]}"
    df = run_reference_pipeline(
        spark,
        source_parquet=MTCARS,
        db=db,
        table="cars",
        schema_ddl=MTCARS_DDL,
        columns=MTCARS_COLS,
    )
    rows = df.orderBy("model").collect()
    try:
        # numRows parity (README.md:546).
        assert len(rows) == 32

        # Declared-schema casts applied (SURVEY.md §1.3): narrowed FLOATs and
        # the widened am int→float.
        dtypes = dict(df.dtypes)
        assert dtypes["mpg"] == "float"
        assert dtypes["am"] == "float"
        assert dtypes["vs"] == "int"

        # Golden first row (notebook cell 7 / FIXTURES.md §1).
        mazda = next(r for r in rows if r["model"] == "Mazda RX4")
        assert mazda["cyl"] == 6 and mazda["hp"] == 110
        assert abs(mazda["mpg"] - 21.0) < 1e-6
        assert mazda["am"] == pytest.approx(1.0)  # int 1 widened to 1.0
    finally:
        LakehouseCatalog(spark).drop_namespace(db)


def test_iceberg_table_format_smoke(spark, tmp_path, monkeypatch):
    """Stretch path (round-3 VERDICT #8): with the iceberg-spark-runtime
    jar present, the SAME LakehouseCatalog DDL surface must run with
    TABLE_FORMAT='iceberg' against a hadoop-type Iceberg catalog — the
    parity claim is one env var away from tested. Skips cleanly (and
    loudly) when the jar is absent, which is this sandbox's permanent
    state."""
    from biglake_iceberg_python_spark.lakehouse import catalog as catmod

    if not catmod.iceberg_available(spark):
        pytest.skip("iceberg-spark-runtime jar absent in this environment")

    spark.conf.set(
        "spark.sql.catalog.ice", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.ice.warehouse", str(tmp_path / "wh"))
    monkeypatch.setattr(catmod, "TABLE_FORMAT", "iceberg")
    cat = catmod.LakehouseCatalog(spark, catalog="ice")
    cat.create_namespace("db")
    try:
        cat.create_table(
            "db", "t", "id BIGINT, v DOUBLE", properties={"smoke": "true"}
        )
        spark.sql("INSERT INTO ice.db.t VALUES (1, 2.0), (2, 4.0)")
        assert cat.table("db", "t").count() == 2
        # Real Iceberg metadata tables exist on this path (the emulation
        # boundary documented in README.md disappears).
        assert spark.sql("SELECT * FROM ice.db.t.snapshots").count() >= 1
    finally:
        cat.drop_table("db", "t")
        cat.drop_namespace("db")
