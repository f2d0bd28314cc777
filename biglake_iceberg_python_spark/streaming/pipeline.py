"""Structured Streaming plumbing: chunked file-source replay of the
``events`` table (SURVEY.md §2B streaming rows; M3 in the build plan).

The driver testdata is static parquet, so streams are simulated the
standard way: split events into N files in a temp dir, stream them with
``maxFilesPerTrigger=1`` → N deterministic micro-batches. Everything
downstream (watermarks, windows, stateful dedup, foreachBatch sinks) is
exactly the code that would run against Kafka/files in production — only
the source line changes.

Scale notes: a file-source stream partitions each micro-batch like any
parquet scan; stateful operators shuffle on their keys with state kept in
the state store (RocksDB on a real cluster). Watermarks bound that state —
every windowed query here sets one.
"""

from __future__ import annotations

import os
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery


# Staged-chunk cache: the replay input is a pure function of
# (sf_dir, n_chunks, inject_dup_every, flush_sentinel, ordered), so queries
# sharing a config reuse one on-disk staging — each call still gets a FRESH
# checkpoint dir (a checkpoint is per-query state and must never be shared).
_STAGED: dict[tuple[str, int, int | None, bool, bool], str] = {}

# Event type of the watermark-flush sentinel row (see stage_event_chunks).
# Consumers running APPEND output filter it out AFTER withWatermark so it
# advances the watermark without entering any aggregate.
SENTINEL_EVENT_TYPE = "__flush__"

# How far past the last real event the sentinel sits. Must exceed every
# consumer's watermark delay + longest window/gap so the final watermark
# passes every window end and all state flushes + evicts.
_SENTINEL_HORIZON_S = 2 * 24 * 3600


def stage_event_chunks(
    spark: SparkSession,
    sf_dir: str,
    n_chunks: int = 4,
    inject_dup_every: int | None = None,
    flush_sentinel: bool = False,
    ordered: bool = True,
) -> tuple[str, str]:
    """Write events as ``n_chunks`` parquet files for replay (cached per
    config).

    ``inject_dup_every=k`` duplicates every k-th event (same event_id) to
    exercise stateful dedup. ``flush_sentinel=True`` appends one extra
    chunk holding a single ``SENTINEL_EVENT_TYPE`` row 2 days past the max
    event time — the standard trick to close out APPEND-mode windows on a
    finite replay: the sentinel batch advances the watermark beyond every
    real window's end, so the engine finalizes, emits, and evicts them all
    before the availableNow trigger terminates. On a live stream new
    events play this role and no sentinel is needed.

    ``ordered=False`` stages the same time-contiguous chunks but permutes
    their ARRIVAL order (odd-index chunks first, then even) — the
    out-of-order arrival case: a late chunk lands after the watermark has
    already advanced past it, so the late-data query exercises watermark
    DROPS rather than a clean ordered replay. (The events table's natural
    row order is itself time-sorted, so disorder must come from arrival
    order, not row order.)
    Returns (input_dir, checkpoint_dir).
    """
    # Watermarks require TIMESTAMP (an instant), not TIMESTAMP_NTZ. Pin the
    # session to UTC so the NTZ→instant cast and every downstream
    # window-start rendering are timezone-independent, whatever TZ the host
    # session was built with. Must happen on every call (cached or not).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (sf_dir, n_chunks, inject_dup_every, flush_sentinel, ordered)
    cached = _STAGED.get(key)
    if cached is not None and os.path.isdir(cached):
        ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
        return cached, ckpt
    base = tempfile.mkdtemp(prefix="stream_events_")
    input_dir = os.path.join(base, "input")
    checkpoint_dir = os.path.join(base, "checkpoint")
    os.makedirs(input_dir)
    # Stage with pyarrow, not a Spark write job: this is test-harness
    # plumbing (simulating a stream source from static parquet), so the
    # ~seconds of Spark job overhead would be pure bench noise. The ns→µs
    # truncation matches Spark's `ts div 1000`; tagging the column UTC
    # makes Spark read it as TIMESTAMP (an instant) — identical to the
    # previous NTZ-cast-under-UTC-session staging, which watermarks need.
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    # DEAD-LETTER at ingestion (round-10 events parity sweep, extending
    # the round-9 stateful-sessionization fix to the whole streaming
    # surface): an event with no event-time cannot participate in ANY
    # watermark-driven computation — Spark's window() silently drops it,
    # NaT kills applyInPandasWithState, and each oracle would have to
    # guess which partial fate it met. Dropping it at the source mirrors
    # production (route to a dead-letter queue, alert, reprocess) and
    # every stream oracle carries the matching `WHERE ts IS NOT NULL`.
    import pyarrow.compute as pc

    t = t.filter(pc.is_valid(t.column("ts")))
    # Non-finite measures reduce to NULL at ingestion (round-10 NaN/Inf
    # probe): NaN orders ABOVE everything on both engines so it slips
    # `> 0` guards, and DuckDB's DECIMAL casts raise where Spark ANSI-off
    # NULLs — the missing-measure (NULL value) semantics are already
    # parity-verified, so non-finite folds into that class. Oracle twin:
    # `* REPLACE (CASE WHEN isfinite(value) ...)` in every stream oracle.
    # is_finite AND |v| < 1e4 (round-10 out-of-range probe): a FINITE
    # 5e16 measure overflows the DECIMAL(18,2) cents cast — DuckDB and
    # Spark-ANSI raise, Spark ANSI-off silently NULLs — and even modest
    # out-of-domain values overflow the exact-moment family's int64 sums
    # of squared cents (DuckDB's HUGEINT-to-BIGINT cast raises, Spark
    # wraps). The cap is the int64 moment budget, an order of magnitude
    # above the genuine domain ceiling (~560). Same fold as
    # eventflow._timed_events; oracle twin carries the matching cap.
    vidx = t.schema.get_field_index("value")
    vcol = t.column("value")
    ok = pc.and_kleene(
        pc.is_finite(vcol), pc.less(pc.abs(vcol), 1.0e4)
    )
    t = t.set_column(vidx, "value", pc.if_else(ok, vcol, None))
    idx = t.schema.get_field_index("ts")
    ts_utc = t.column("ts").cast(pa.timestamp("us"), safe=False).cast(
        pa.timestamp("us", tz="UTC")
    )
    t = t.set_column(idx, "ts", ts_utc)
    if inject_dup_every:
        ids = t.column("event_id").to_numpy()
        t = pa.concat_tables([t, t.filter(pa.array(ids % inject_dup_every == 0))])
    # Event-time-ordered replay: sort by ts (AFTER dup injection, so an
    # injected duplicate lands at its original event time), slice into
    # contiguous time ranges, and stage with strictly increasing mtimes —
    # Spark's file source orders files by (mtime, path)
    # (FileStreamSource.fetchAllFiles sorts by modification time; behavior
    # verified on the pinned pyspark 4.1.x — tests/test_streaming_state.py
    # would fail loudly if an upgrade changed it), so chunk i replays
    # before chunk i+1. This models a quasi-ordered production stream
    # (Kafka with bounded disorder) and is what lets the windowed queries
    # run APPEND output with a minutes-scale watermark: chunk i+1's min ts
    # >= chunk i's max ts, so nothing is ever late, while the watermark
    # still finalizes + evicts old windows batch by batch.
    # (ts, event_id) — not ts alone: chunk bounds are row-index slices, so
    # a global same-µs tie straddling a boundary would make the chunk
    # assignment depend on sort stability, and the watermark-progression
    # oracle (stream_late_data_drop) replays chunking with the same
    # two-key ORDER BY. Generated data has unique ts today; the tie-break
    # removes the latent assumption. (Injected duplicates tie on BOTH
    # keys, but the two copies are identical rows — either order stages
    # the same bytes.)
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    bounds = [n * i // n_chunks for i in range(n_chunks + 1)]
    now = time.time()
    # Arrival order: identity for the ordered replay; odds-then-evens for
    # the out-of-order case (chunk 1 and 3 arrive before 0 and 2, so the
    # watermark races ahead and the even chunks arrive late).
    arrival = (
        list(range(n_chunks))
        if ordered
        else [i for i in range(n_chunks) if i % 2] + [i for i in range(n_chunks) if not i % 2]
    )
    for pos, i in enumerate(arrival):
        path = os.path.join(input_dir, f"chunk_{i:03d}.parquet")
        pq.write_table(t.slice(bounds[i], bounds[i + 1] - bounds[i]), path)
        os.utime(path, (now + 10 * pos, now + 10 * pos))
    if flush_sentinel:
        import pyarrow.compute as pc

        # Empty stage (0-row events table, or every row dead-lettered):
        # pc.max is NULL — anchor the sentinel at epoch 0 so the stream
        # still gets its one watermark-advancing row and terminates with
        # an empty result, matching the oracle's empty scan. (Round-10
        # empty-table parity axis: 11 streaming queries crashed here on
        # None + int.)
        max_us = pc.max(t.column("ts")).cast(pa.int64()).as_py() or 0
        sentinel_ts = pa.scalar(
            max_us + _SENTINEL_HORIZON_S * 1_000_000, pa.timestamp("us", tz="UTC")
        )
        row = {
            "event_id": [-1],
            "ts": [sentinel_ts],
            "user_id": [-1],
            "event_type": [SENTINEL_EVENT_TYPE],
            "value": [0.0],
            "props": [""],
        }
        sent = pa.table(
            {f.name: pa.array(row[f.name], f.type) for f in t.schema},
            schema=t.schema,
        )
        path = os.path.join(input_dir, f"chunk_{n_chunks:03d}_flush.parquet")
        pq.write_table(sent, path)
        os.utime(path, (now + 10 * n_chunks, now + 10 * n_chunks))
    _STAGED[key] = input_dir
    return input_dir, checkpoint_dir


_SCHEMA_CACHE: dict[str, object] = {}


def read_event_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over the staged chunks, one file per trigger.

    The staged schema is cached per input dir — file-source streams require
    a user-supplied schema, and re-inferring it is a full footer-listing
    Spark job per query for a schema that never changes within a staging.
    """
    schema = _SCHEMA_CACHE.get(input_dir)
    if schema is None:
        schema = spark.read.parquet(input_dir).schema
        _SCHEMA_CACHE[input_dir] = schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def run_stream_to_memory(
    sdf: DataFrame, name: str, output_mode: str, checkpoint_dir: str
) -> StreamingQuery:
    """Run the streaming query to completion (availableNow) into a memory
    sink table called ``name``; returns the terminated query so callers
    (tests) can inspect ``lastProgress`` state-store metrics — e.g. assert
    that the watermark actually evicted finalized windows.

    State-store partition count is pinned low for the replay: each
    micro-batch pays a fixed cost per state partition, and the replay's
    state is tiny. On a real cluster this would be sized to executor count
    (it is fixed at the first checkpoint for the life of the query).
    """
    spark = sdf.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return q
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_stream_foreach_batch(
    sdf: DataFrame, batch_fn, checkpoint_dir: str
) -> StreamingQuery:
    """Run the stream to completion through a foreachBatch sink; returns
    the terminated query so callers can assert offset/progress telemetry
    (e.g. that a restarted run processed only the new files)."""
    q = (
        sdf.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
