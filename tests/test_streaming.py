"""Structured Streaming surface (SURVEY §2.9): the window builders
must produce, when fed the fixture events through readStream in
several micro-batches, exactly what the batch plan (already
DuckDB-oracle-checked via the registry) produces; and the stateful
incremental top-K must converge to the batch window-rank top-K
(W3 ≡ W1, the reference's heap-vs-full-sort invariant).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.stateful import (
    streaming_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.windows import (
    session_windows,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_small, tmp_path_factory):
    """Fixture events re-written as 4 parquet files so availableNow
    consumes them as several micro-batches (maxFilesPerTrigger=1)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_small, "events").repartition(4).write.mode("overwrite").parquet(out)
    return out


def _run_stream(spark, stream_dir, build, name):
    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        build(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


#: replayed files are not time-ordered, so the equality tests use a
#: watermark wider than the fixture's time span (late rows kept); the
#: default 15-minute threshold is exercised by the late-drop test.
WIDE = "60 days"


@pytest.mark.parametrize(
    "fn,cols",
    [
        (tumbling_counts, ["win_start", "win_end", "event_type", "n_events", "sum_value"]),
        (sliding_counts, ["win_start", "win_end", "event_type", "n_events"]),
        (session_windows, ["user_id", "sess_start", "sess_end", "n_events", "sum_value"]),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_equals_batch(spark, sf_small, stream_dir, fn, cols):
    batch = fn(load_table(spark, sf_small, "events"))
    name = f"mem_{fn.__name__}"
    streamed = _run_stream(spark, stream_dir, lambda ev: fn(ev, late=WIDE), name)
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_session_watermark_drops_late(spark, sf_small, stream_dir):
    """With the default 15-minute watermark and out-of-time-order
    micro-batches, the session operator must drop rows behind the
    watermark — fewer events survive than in batch."""
    streamed = _run_stream(
        spark, stream_dir, session_windows, "mem_session_late"
    )
    batch_total = load_table(spark, sf_small, "events").count()
    stream_total = streamed.agg(F.sum("n_events")).first()[0]
    assert stream_total < batch_total


def test_streaming_topk_converges(spark, sf_small, stream_dir):
    """After all micro-batches, the per-user state equals the batch
    top-K by (value desc, event_id asc)."""
    k = 5
    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        streaming_topk(stream, k=k)
        .writeStream.format("memory")
        .queryName("mem_topk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one emission per trigger. The heap only
    # improves as state accumulates, so for each (user, rank) the
    # final entry is the maximum over emissions under the heap's own
    # total order (value desc, event_id asc) — no reliance on sink
    # row ordering.
    final = (
        spark.table("mem_topk")
        .groupBy("user_id", "rank")
        .agg(
            F.max(
                F.struct(F.col("value"), (-F.col("event_id")).alias("nid"))
            ).alias("s")
        )
        .select(
            "user_id",
            "rank",
            (-F.col("s.nid")).cast("bigint").alias("event_id"),
            F.col("s.value").alias("value"),
        )
    )

    events = load_table(spark, sf_small, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    expected = (
        events.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("user_id", "rank", "event_id", "value")
    )
    assert _rows(final, ["user_id", "rank", "event_id", "value"]) == _rows(
        expected, ["user_id", "rank", "event_id", "value"]
    )
