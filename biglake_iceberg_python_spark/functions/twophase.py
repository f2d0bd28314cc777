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
2^50 (documented per call site), leaving 2^12-bucket headroom of 2^62. The
bound is now GUARDED, not just documented: the per-group min/max aggregate
recomputes the product with try_ arithmetic and raises on overflow instead
of letting non-ANSI int64 wraparound produce silently-wrong ranks.

NULL keys are rejected loudly too: a NULL ordering key would get a NULL
``__bucket`` and vanish in the equi-join back onto the bucket bases —
silently losing rows where a naive global window would rank NULLS FIRST.
No call site feeds NULLs; the guard turns a future violation into an error
instead of a wrong answer. (Both guards live on already-materialized tiny
or per-row codegen paths — no extra shuffle, no measurable cost.)
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

    ``key`` must evaluate to LONG and NON-NULL (NULL keys raise — see the
    module docstring); order descending by passing the negated key. ``tie``
    must be unique within a ``partition_cols`` group. ``cums`` values
    should already be exact types (decimal/long) — the running sum is
    exact partial-sum addition, bit-identical to a direct global window.
    """
    cums = dict(cums or {})
    part = list(partition_cols)
    mtypes: dict[str, str] = {}
    for alias, col in cums.items():
        df = df.withColumn(f"__m_{alias}", col)
        mtypes[alias] = df.schema[f"__m_{alias}"].dataType.simpleString()
    df = df.withColumn(
        "__key",
        F.when(key.isNotNull(), key).otherwise(
            F.raise_error(
                F.lit(
                    "two_phase_rank: NULL ordering key — NULL rows would be"
                    " silently dropped by the bucket join"
                )
            )
        ),
    )

    mm = df.groupBy(*part).agg(
        F.min("__key").alias("__mn"), F.max("__key").alias("__mx")
    )
    # Loud int64 guard for the documented (max-min)*n_buckets bound: try_
    # arithmetic yields NULL exactly when the real multiply would wrap.
    # `__mn IS NULL` passes the guard: a global (no partition_cols) min/max
    # over an EMPTY input yields one all-NULL row — legal (the cross join
    # below then matches nothing and the result is empty, as before the
    # guard), not an overflow.
    mm = mm.withColumn(
        "__mx",
        F.when(
            F.expr(
                f"__mn IS NULL OR try_multiply(try_subtract(__mx, __mn),"
                f" CAST({n_buckets} AS BIGINT)) IS NOT NULL"
            ),
            F.col("__mx"),
        ).otherwise(
            F.raise_error(
                F.lit(
                    "two_phase_rank: (max_key - min_key) * n_buckets"
                    " overflows int64 — key domain violates the documented"
                    " bound"
                )
            )
        ),
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
        # Typed zero, NOT `0 * __bsum`: the first bucket's sum is NULL when
        # its measures are all NULL, and multiplying by it would NULL every
        # cum_<alias> in the group — the naive window resumes non-null
        # partial sums at the first non-null measure, and so must we.
        *[
            F.coalesce(
                F.sum(f"__bsum_{a}").over(w_b), F.lit(0).cast(mtypes[a])
            ).alias(f"__base_{a}")
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
