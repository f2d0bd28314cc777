"""Similarity search over embedding vectors (SURVEY.md §2B [EXT]).

Three operators over the ``embeddings`` table (array<float>, 64-dim):

  * sim_bruteforce_topk — exact cosine top-k, the correctness baseline
  * sim_ann_lsh         — random-hyperplane LSH bucketed ANN (scale path)
  * sim_label_centroids — vector aggregation (per-label mean vector)

Scale notes: brute force is O(|Q|·|C|) — valid only because Q is tiny
(broadcast); the plan keeps the big candidate side streaming with no
shuffle, computes dot products inside codegen (zip_with + aggregate — no
Python), and takes per-query top-k through a WindowGroupLimit rather than a
global sort. The LSH variant buckets both sides by deterministic hyperplane
sign bits so each query only scores its bucket — the 100 TB shape (candidate
generation by equi-join on a short key). An IVF variant would follow the
same plan with learned centroids as the bucket key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from biglake_iceberg_python_spark.plans.registry import query
from biglake_iceberg_python_spark.sources.tables import load_table

_N_QUERIES = 5  # vec_id < 5 are the query vectors
_TOP_K = 10
# Multi-table hyperplane LSH: L tables of k planes each. Collision prob for
# a pair at angle θ is (1-θ/π)^k per table; with the corpus' top-1 cosines
# (~0.35 → p≈0.61) k=4, L=16 gives ≥0.9 recall. k grows with log(corpus),
# L buys recall linearly in cost.
_LSH_K = 4
_LSH_L = 16
_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double — bit-identical to DuckDB's
    list_dot_product over double lists (same order, same IEEE ops)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _as_double(col: str) -> Column:
    return F.transform(F.col(col), lambda x: x.cast("double"))


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < {_N_QUERIES}
    ), c AS (
      SELECT vec_id AS cid, label, embedding::DOUBLE[] AS cv
      FROM embeddings
    ), scored AS (
      SELECT
        q.qid, c.cid, c.label,
        list_dot_product(q.qv, c.cv)
          / sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(c.cv, c.cv))
          AS cosine
      FROM q CROSS JOIN c
      WHERE q.qid <> c.cid
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                   ORDER BY cosine DESC, cid) AS rk
      FROM scored
    )
    SELECT qid, cid, label, cosine, rk FROM ranked WHERE rk <= {_TOP_K}
    """,
    tags=("llm", "similarity", "knn"),
    bench=True,
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: tiny broadcast query set × streaming candidates.

    The candidate side never shuffles for the join (queries broadcast); the
    only shuffle is the per-query top-k window over |Q|·k rows. Dot products
    are a codegen fold — identical arithmetic order to the DuckDB oracle, so
    scores hash-match exactly with no tolerance.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), _as_double("embedding").alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("cid"), "label", _as_double("embedding").alias("cv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("qid") != F.col("cid"))
        .select(
            "qid",
            "cid",
            "label",
            (
                _dot(F.col("qv"), F.col("cv"))
                / F.sqrt(
                    _dot(F.col("qv"), F.col("qv")) * _dot(F.col("cv"), F.col("cv"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOP_K
    )


def _plane(global_j: int) -> Column:
    """Deterministic pseudo-random hyperplane (no RNG — a fixed integer
    lattice, so reruns and resized clusters agree bit-for-bit)."""
    return F.array(
        *[
            F.lit(
                (((global_j + 1) * 73856093 + d * 19349663 + global_j * d * 83492791)
                 % 2001 - 1000) / 1000.0
            )
            for d in range(_DIM)
        ]
    )


def _lsh_table_buckets(vec_col: str) -> Column:
    """array of (table, bucket) structs: for each of the _LSH_L tables, the
    _LSH_K sign bits of the vector against that table's hyperplanes."""
    entries = []
    for t in range(_LSH_L):
        bucket = F.lit(0)
        for j in range(_LSH_K):
            proj = _dot(F.col(vec_col), _plane(t * _LSH_K + j))
            bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        entries.append(
            F.struct(F.lit(t).alias("tbl"), bucket.alias("bucket"))
        )
    return F.array(*entries)


@query(
    "sim_ann_lsh",
    oracle=None,  # approximate by design → rows-only; recall vs brute force
    # is asserted in tests/test_operators.py.
    tags=("llm", "similarity", "ann", "lsh"),
)
def sim_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: multi-table random-hyperplane LSH — each side gets L
    (table, bucket) keys; candidates are pairs colliding in ANY table.

    The join is an equi-join on (table, bucket) with the tiny query side
    broadcast, then distinct pairs are scored exactly. Scale: candidate
    volume per query ≈ L·|C|/2^k — tune k to log(corpus) and L to the
    recall target; the plan shape (explode → equi-join → distinct → score →
    per-query top-k) is unchanged at any corpus size, and no pairwise scan
    ever happens.
    """
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select("vec_id", "label", _as_double("embedding").alias("v"))
    keys = vecs.select(
        "vec_id", F.explode(_lsh_table_buckets("v")).alias("tb")
    ).select("vec_id", "tb.tbl", "tb.bucket")

    q_keys = keys.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("qid"), "tbl", "bucket"
    )
    cand = (
        F.broadcast(q_keys)
        .join(keys.withColumnRenamed("vec_id", "cid"), ["tbl", "bucket"])
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
        .distinct()
    )

    q = vecs.select(F.col("vec_id").alias("qid"), F.col("v").alias("qv"))
    c = vecs.select(F.col("vec_id").alias("cid"), "label", F.col("v").alias("cv"))
    scored = (
        cand.join(F.broadcast(q), "qid")
        .join(c, "cid")
        .select(
            "qid",
            "cid",
            "label",
            (
                _dot(F.col("qv"), F.col("cv"))
                / F.sqrt(
                    _dot(F.col("qv"), F.col("qv")) * _dot(F.col("cv"), F.col("cv"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("cid"))
    return scored.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= _TOP_K
    )


@query(
    "sim_label_centroids",
    oracle="""
    WITH expanded AS (
      SELECT
        label,
        generate_subscripts(embedding, 1) AS dim,
        CAST(unnest(embedding) AS DOUBLE) AS comp
      FROM embeddings
    )
    SELECT
      label,
      CAST(COUNT(*) / 64 AS BIGINT) AS n_vectors,
      CAST(SUM(CAST(comp AS DECIMAL(30,12))) AS DOUBLE) AS sum_all_components,
      MAX(comp) AS max_component
    FROM expanded
    GROUP BY label
    """,
    tags=("llm", "similarity", "vector-agg"),
)
def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector aggregation: per-label component sums (the centroid numerator
    — the building block of IVF/k-means partitioning for ANN at scale).

    posexplode → (label, dim) partial sums map-side → one shuffle. Component
    sums use the exact-decimal path (scale 12: float components are ~1e-1,
    and float→double→decimal(30,12) is exact for these magnitudes... see
    tests for the parity assertion).
    """
    e = load_table(spark, sf_dir, "embeddings")
    expanded = e.select(
        "label", F.posexplode(_as_double("embedding")).alias("dim", "comp")
    )
    return expanded.groupBy("label").agg(
        (F.count(F.lit(1)) / _DIM).cast("long").alias("n_vectors"),
        F.sum(F.col("comp").cast("decimal(30,12)")).cast("double").alias(
            "sum_all_components"
        ),
        F.max("comp").alias("max_component"),
    )


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
      SELECT vec_id, label, embedding::DOUBLE[] AS ev FROM embeddings
    ), pairs AS (
      SELECT
        a.vec_id AS vec_a, b.vec_id AS vec_b,
        CAST(a.label = b.label AS INTEGER) AS same_label,
        list_dot_product(a.ev, b.ev)
          / sqrt(list_dot_product(a.ev, a.ev) * list_dot_product(b.ev, b.ev))
          AS cosine
      FROM v a JOIN v b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, same_label, cosine
    FROM pairs WHERE cosine >= 0.5
    """,
    tags=("llm", "dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (cosine >= 0.5), exact.

    Exhaustive pairwise scoring via a broadcast self-join — exact by
    definition, which is what lets the oracle verify it, and affordable to
    ~1e4 vectors per broadcast block. At 100 TB corpus scale the SAME
    threshold semantics run behind the multi-table LSH candidate generator
    (sim_ann_lsh's plan) so only bucket-mates are scored; this operator is
    the ground-truth/verification tier of that pipeline.
    """
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(
        F.col("vec_id").alias("vec_a"),
        F.col("label").alias("la"),
        _as_double("embedding").alias("va"),
    )
    b = e.select(
        F.col("vec_id").alias("vec_b"),
        F.col("label").alias("lb"),
        _as_double("embedding").alias("vb"),
    )
    cos = _dot(F.col("va"), F.col("vb")) / F.sqrt(
        _dot(F.col("va"), F.col("va")) * _dot(F.col("vb"), F.col("vb"))
    )
    return (
        F.broadcast(a)
        .join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a",
            "vec_b",
            (F.col("la") == F.col("lb")).cast("int").alias("same_label"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.5)
    )
