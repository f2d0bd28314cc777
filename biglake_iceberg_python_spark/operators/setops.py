"""Set operations: UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL].

Contract-mandated surface (SURVEY.md §2 Part B); the reference has none.

Scale notes: UNION ALL is a zero-shuffle concatenation of partitions;
UNION/INTERSECT/EXCEPT imply a dedup/anti shuffle on the full row. Keep the
projected column set minimal before a distinct set op — the shuffle carries
the whole row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from biglake_iceberg_python_spark.plans.registry import query
from biglake_iceberg_python_spark.sources.tables import load_table


def _high_value_custkeys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("custkey")
    )


def _urgent_custkeys(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )


_HIGH = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000"
_URGENT = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"


@query(
    "set_union_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS appearances
    FROM (({_HIGH}) UNION ALL ({_URGENT}))
    GROUP BY custkey
    """,
    tags=("setop",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics, no shuffle) then count appearances."""
    u = _high_value_custkeys(spark, sf_dir).unionAll(_urgent_custkeys(spark, sf_dir))
    return u.groupBy("custkey").agg(F.count(F.lit(1)).alias("appearances"))


@query(
    "set_union_distinct",
    oracle=f"""
    SELECT COUNT(*) AS n_customers
    FROM (({_HIGH}) UNION ({_URGENT}))
    """,
    tags=("setop",),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): distinct customers in either set."""
    u = (
        _high_value_custkeys(spark, sf_dir)
        .union(_urgent_custkeys(spark, sf_dir))
        .distinct()
    )
    return u.agg(F.count(F.lit(1)).alias("n_customers"))


@query(
    "set_intersect",
    oracle=f"""
    SELECT custkey FROM (({_HIGH}) INTERSECT ({_URGENT}))
    """,
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers with BOTH a high-value and an urgent order."""
    return _high_value_custkeys(spark, sf_dir).intersect(
        _urgent_custkeys(spark, sf_dir)
    )


@query(
    "set_except",
    oracle=f"""
    SELECT custkey FROM (({_HIGH}) EXCEPT ({_URGENT}))
    """,
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): high-value customers who never placed an
    urgent order — ``subtract`` is Spark's EXCEPT DISTINCT (``exceptAll``
    followed by distinct would wrongly keep keys whose left multiplicity
    merely exceeds the right)."""
    return _high_value_custkeys(spark, sf_dir).subtract(
        _urgent_custkeys(spark, sf_dir)
    )


@query(
    "set_intersect_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS n
    FROM (({_HIGH}) INTERSECT ALL ({_URGENT}))
    GROUP BY custkey
    """,
    tags=("setop",),
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: multiplicity = min of the two sides),
    aggregated to counts so the multiset itself is what's verified."""
    ia = _high_value_custkeys(spark, sf_dir).intersectAll(
        _urgent_custkeys(spark, sf_dir)
    )
    return ia.groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_except_all",
    oracle=f"""
    SELECT custkey, COUNT(*) AS n
    FROM (({_HIGH}) EXCEPT ALL ({_URGENT}))
    GROUP BY custkey
    """,
    tags=("setop",),
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: multiplicity = max(0, left - right))."""
    ea = _high_value_custkeys(spark, sf_dir).exceptAll(_urgent_custkeys(spark, sf_dir))
    return ea.groupBy("custkey").agg(F.count(F.lit(1)).alias("n"))
