"""Time-window aggregation surface (SURVEY §2.9 — additive scope;
the reference is batch-only, `ANNCode.py` has no streaming).

Each builder takes *any* events DataFrame — batch or streaming — and
returns the same logical plan: Spark's ``window``/``session_window``
operators are mode-agnostic, so the DuckDB-oracle-checked batch run
and the ``readStream`` run in ``tests/test_streaming.py`` exercise one
code path. Watermarking is applied only when the input is streaming
(batch DataFrames reject ``withWatermark`` semantics silently — we
keep the plan identical instead).

Scale notes: windowed counts shuffle on (window, group-key) — at
100 TB the state store, not the shuffle, is the constraint; watermark
``LATE_THRESHOLD`` bounds state retention, and session windows merge
in the state store (AQE does not apply to streaming stateful ops, so
``spark.sql.shuffle.partitions`` must be sized up front).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TUMBLE = "10 minutes"
SLIDE_LEN = "10 minutes"
SLIDE_STEP = "5 minutes"
SESSION_GAP = "5 minutes"
LATE_THRESHOLD = "15 minutes"
DEDUP_BUCKET = "1 minute"
JOIN_WINDOW = "30 minutes"


def _maybe_watermark(events: DataFrame, ts_col: str, late: str) -> DataFrame:
    if events.isStreaming:
        # Parquet fixtures carry naive timestamps (TIMESTAMP_NTZ);
        # event-time watermarks require TIMESTAMP. The session TZ is
        # pinned to UTC (session.get_spark), so the cast preserves
        # values and batch/stream plans stay comparable.
        from pyspark.sql.types import TimestampNTZType

        if isinstance(events.schema[ts_col].dataType, TimestampNTZType):
            events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        return events.withWatermark(ts_col, late)
    return events


def tumbling_counts(events: DataFrame, ts_col: str = "ts", late: str = LATE_THRESHOLD) -> DataFrame:
    """Tumbling 10-minute windows × event_type: count + exact value
    sum (DECIMAL — order-independent, FIXTURES.md §C)."""
    ev = _maybe_watermark(events, ts_col, late)
    w = F.window(F.col(ts_col), TUMBLE)
    return (
        ev.groupBy(w.alias("win"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("__sv"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
            F.col("__sv").cast("double").alias("sum_value"),
        )
    )


def sliding_counts(events: DataFrame, ts_col: str = "ts", late: str = LATE_THRESHOLD) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute step): every event
    lands in length/step = 2 windows."""
    ev = _maybe_watermark(events, ts_col, late)
    w = F.window(F.col(ts_col), SLIDE_LEN, SLIDE_STEP)
    return (
        ev.groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n_events",
        )
    )


def dedup_events(
    events: DataFrame, ts_col: str = "ts", late: str = LATE_THRESHOLD
) -> DataFrame:
    """Streaming-capable deduplication: at most one row per (user,
    event_type, 1-minute bucket). Batch input runs a plain distinct;
    streaming input runs ``dropDuplicatesWithinWatermark`` so dedup
    state is bounded by the watermark instead of growing forever —
    the semantics a 100 TB ingest pipeline needs (duplicates arrive
    close together in event time; state for old buckets is dropped).
    Output carries only the (deterministic) key columns."""
    ev = _maybe_watermark(events, ts_col, late)
    # the watermarked event-time column must survive until the dedup
    # operator sees it; it is dropped from the (deterministic) output
    keyed = ev.select(
        "user_id",
        "event_type",
        F.window(F.col(ts_col), DEDUP_BUCKET).start.alias("minute_start"),
        F.col(ts_col).alias("__ts"),
    )
    keys = ["user_id", "event_type", "minute_start"]
    if events.isStreaming:
        return keyed.dropDuplicatesWithinWatermark(keys).drop("__ts")
    return keyed.dropDuplicates(keys).drop("__ts")


def click_purchase_join(
    events: DataFrame, ts_col: str = "ts", late: str = LATE_THRESHOLD
) -> DataFrame:
    """Stream-stream (self) interval join: every purchase within
    ``JOIN_WINDOW`` after a click by the same user. Batch input is a
    plain range-condition join; streaming input is Spark's
    watermarked stream-stream join, where the interval bound is what
    lets the state store expire old clicks. One builder, both modes."""
    ev = _maybe_watermark(events, ts_col, late)
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col(ts_col).alias("purchase_ts"),
    )
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr(f"INTERVAL {JOIN_WINDOW}"))
    )
    return clicks.join(purchases, cond).select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
    )


def session_windows(events: DataFrame, ts_col: str = "ts", late: str = LATE_THRESHOLD) -> DataFrame:
    """Per-user session windows with a 5-minute inactivity gap:
    session end = last event + gap (Spark ``session_window``
    semantics; the DuckDB oracle rebuilds the same islands with a
    lag/running-sum gaps-and-islands plan)."""
    ev = _maybe_watermark(events, ts_col, late)
    sw = F.session_window(F.col(ts_col), SESSION_GAP)
    return (
        ev.groupBy(sw.alias("sess"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("__sv"),
        )
        .select(
            "user_id",
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "n_events",
            F.col("__sv").cast("double").alias("sum_value"),
        )
    )


def cms_user_counts(
    events: DataFrame, late: str = LATE_THRESHOLD
) -> DataFrame:
    """(d, bucket, c): count-min sketch of per-user event frequencies
    — the streaming member of the sketch family (``registry_text.
    q_cms_heavy_hitters`` is the batch document-token form with the
    same constants). A stateless explode into (depth, bucket) keys
    followed by ONE incremental count aggregate whose state is the
    fixed 4×512 counter table — the canonical bounded-state streaming
    aggregation: state size is O(DEPTH·W) forever, however many users
    or events flow through. Mode-agnostic (no event-time window, so
    no watermark is needed; ``late`` is accepted for the shared
    batch≡stream test harness signature and ignored)."""
    from ..functions.text import HASH_P, poly_hash
    from ..registry_text import CMS_A, CMS_B, CMS_DEPTH, CMS_W

    hashed = events.select(
        poly_hash(F.col("user_id").cast("string")).alias("h")
    )
    rows = hashed.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        (
                            (F.lit(CMS_A[d]) * F.col("h") + F.lit(CMS_B[d]))
                            % F.lit(HASH_P)
                            % F.lit(CMS_W)
                        ).alias("bucket"),
                    )
                    for d in range(CMS_DEPTH)
                ]
            )
        ).alias("db")
    ).select("db.d", "db.bucket")
    return rows.groupBy("d", "bucket").agg(F.count("*").alias("c"))


def hll_user_registers(events: DataFrame, late: str = LATE_THRESHOLD) -> DataFrame:
    """(bucket, m): HyperLogLog register table of DISTINCT user_ids —
    the streaming twin of ``registry_text.q_hll_distinct_tokens``
    (same 256 registers, same lowbias32-family mix, ONE copy of the
    arithmetic via ``registry_text.hll_registers``). The register
    build is a max-aggregate: idempotent and monotone, so it runs
    unchanged as an incremental stateful aggregation whose state is
    the fixed ≤m-row register table — bounded-memory distinct
    counting, the streaming substitute for ``countDistinct`` at
    100 TB (which would hold every key in state). Mode-agnostic (no
    event-time window → no watermark; ``late`` is accepted for the
    shared batch≡stream harness signature and ignored). Finalization
    (harmonic sum → estimate) is a ≤m-row batch read of the sink."""
    from ..functions.text import poly_hash
    from ..registry_text import hll_registers

    return hll_registers(
        events.select(poly_hash(F.col("user_id").cast("string")).alias("v"))
    )


#: quantile-sketch universe for the events value column: cents of a
#: value measured in [0, ~560] — 2^16 cents covers it with the guard
#: raising if the generator ever drifts past $655.36.
QUANTILE_EVENT_UNIVERSE_BITS = 16


def quantile_value_sketch(
    events: DataFrame, late: str = LATE_THRESHOLD
) -> DataFrame:
    """(bucket, c): the fixed-universe quantile sketch of the events
    ``value`` column (micro-quantized to cents) — the rank-statistics
    member of the streaming sketch family next to CMS counts and HLL
    registers. One incremental count aggregate whose state is at most
    ``2^QUANTILE_SKETCH_BITS`` rows forever (``operators/quantile``),
    and per-shard/per-day sketches merge by addition
    (``quantile_merge_halves`` is the proof). Mode-agnostic: no
    event-time window, no watermark; ``late`` is accepted for the
    shared batch≡stream test harness signature and ignored."""
    from ..operators.quantile import quantile_sketch

    cents = events.select(
        F.floor(F.col("value").cast("double") * 100).cast("bigint").alias("cents")
    )
    return quantile_sketch(
        cents, "cents", universe_bits=QUANTILE_EVENT_UNIVERSE_BITS
    )
