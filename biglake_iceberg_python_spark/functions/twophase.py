"""Two-phase global rank / cumulative sum — no single-partition data pass.

``Window.orderBy(...)`` with no partitionBy funnels every row through ONE
task; fine for value-domain-bounded tables (calendar days, deciles, bucket
tables) but a scale-killer over entity-proportional rollups (per-supplier,
per-part, per-customer — O(SF) rows). This module provides the general form
of the trick `pack_token_shards` and `events_peak_concurrency` use inline:

1. bucket rows by VALUE RANGE of the (long) ordering key — the bucket index
   is a pure function of the row's key and the broadcast global min/max, so
   it is deterministic under any partitioning;
2. rank / running-sum WITHIN each bucket (ordinary hash-partitioned
   windows, parallel);
3. let only the per-bucket totals — ``n_buckets`` rows, a constant, never
   O(rows) — cross an ordered window for the exclusive prefix (base)
   offsets, broadcast back.

Global rank = bucket base count + within-bucket row_number; global running
sum = bucket base sum + within-bucket running sum. Both are exact because
buckets partition the key range in order and all sums are decimal/long.

Key-domain bound: ``(max_key - min_key) * n_buckets`` must fit int64 —
callers pass micro/centi-unit long keys whose global range stays well under
2^50 (documented per call site), leaving 2^12-bucket headroom of 2^62.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_N_BUCKETS = 4096


def two_phase_rank(
    df: DataFrame,
    key: Column,
    tie: str,
    cums: Mapping[str, Column] | None = None,
    partition_cols: tuple[str, ...] = (),
    n_buckets: int = _N_BUCKETS,
) -> DataFrame:
    """Add ``rk`` (1-based rank by ``key`` ASC, ``tie`` ASC) and one
    ``cum_<alias>`` running sum per ``cums`` entry, with no window ever
    seeing more than ``n_buckets`` rows (per ``partition_cols`` group) or
    one bucket's worth of data.

    ``key`` must evaluate to LONG; order descending by passing the negated
    key. ``tie`` must be unique within a ``partition_cols`` group. ``cums``
    values should already be exact types (decimal/long) — the running sum
    is exact partial-sum addition, bit-identical to a direct global window.
    """
    cums = dict(cums or {})
    part = list(partition_cols)
    for alias, col in cums.items():
        df = df.withColumn(f"__m_{alias}", col)
    df = df.withColumn("__key", key)

    mm = df.groupBy(*part).agg(
        F.min("__key").alias("__mn"), F.max("__key").alias("__mx")
    )
    if part:
        df = df.join(F.broadcast(mm), part)
    else:
        df = df.crossJoin(F.broadcast(mm))
    df = (
        df.withColumn(
            "__num", (F.col("__key") - F.col("__mn")) * F.lit(n_buckets)
        )
        .withColumn("__den", F.col("__mx") - F.col("__mn") + F.lit(1))
        # exact int64 floor division — no double rounding for keys > 2^53
        .withColumn("__bucket", F.expr("__num div __den"))
        .drop("__mn", "__mx", "__num", "__den")
    )

    w_in = Window.partitionBy(*part, "__bucket").orderBy("__key", tie)
    w_in_cum = w_in.rowsBetween(Window.unboundedPreceding, 0)
    df = df.withColumn("__rn_loc", F.row_number().over(w_in))
    for alias in cums:
        df = df.withColumn(
            f"__cum_loc_{alias}", F.sum(f"__m_{alias}").over(w_in_cum)
        )

    per_bucket = df.groupBy(*part, "__bucket").agg(
        F.count(F.lit(1)).alias("__bn"),
        *[F.sum(f"__m_{a}").alias(f"__bsum_{a}") for a in cums],
    )
    # The only ordered pass without a data-sized partition key: ≤ n_buckets
    # rows per partition_cols group.
    w_b = (
        Window.partitionBy(*part)
        .orderBy("__bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = per_bucket.select(
        *part,
        "__bucket",
        F.coalesce(F.sum("__bn").over(w_b), F.lit(0)).alias("__base_n"),
        *[
            F.coalesce(F.sum(f"__bsum_{a}").over(w_b), F.lit(0) * F.col(f"__bsum_{a}"))
            .alias(f"__base_{a}")
            for a in cums
        ],
    )
    df = df.join(F.broadcast(bases), [*part, "__bucket"])
    df = df.withColumn("rk", F.col("__base_n") + F.col("__rn_loc"))
    for alias in cums:
        df = df.withColumn(
            f"cum_{alias}",
            F.col(f"__base_{alias}") + F.col(f"__cum_loc_{alias}"),
        )
    drop = (
        ["__key", "__bucket", "__rn_loc", "__base_n"]
        + [f"__m_{a}" for a in cums]
        + [f"__cum_loc_{a}" for a in cums]
        + [f"__base_{a}" for a in cums]
    )
    return df.drop(*drop)
