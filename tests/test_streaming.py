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
    click_purchase_join,
    dedup_events,
    session_windows,
    sliding_counts,
    tumbling_counts,
    cms_user_counts,
    hll_user_registers,
    quantile_value_sketch,
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


def _run_stream_append(spark, stream_dir, build, name):
    """Append-mode runner (dedup and stream-stream joins reject
    complete mode)."""
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
        .outputMode("append")
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
        (cms_user_counts, ["d", "bucket", "c"]),
        (hll_user_registers, ["bucket", "m"]),
        (quantile_value_sketch, ["bucket", "c"]),
    ],
    ids=["tumbling", "sliding", "session", "cms", "hll", "quantile"],
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


def test_stream_dedup_equals_batch(spark, sf_small, stream_dir):
    """dropDuplicatesWithinWatermark over multi-batch replay produces
    the batch distinct (wide watermark: every duplicate arrives within
    it)."""
    cols = ["user_id", "event_type", "minute_start"]
    batch = dedup_events(load_table(spark, sf_small, "events"))
    streamed = _run_stream_append(
        spark, stream_dir, lambda ev: dedup_events(ev, late=WIDE), "mem_dedup"
    )
    assert _rows(streamed, cols) == _rows(batch, cols)


def test_stream_interval_join_equals_batch(spark, sf_small, stream_dir):
    """The watermarked stream-stream self interval join converges to
    the batch range join on the same events."""
    cols = ["user_id", "click_id", "click_ts", "purchase_id", "purchase_ts"]
    batch = click_purchase_join(load_table(spark, sf_small, "events"))
    streamed = _run_stream_append(
        spark, stream_dir, lambda ev: click_purchase_join(ev, late=WIDE), "mem_ssjoin"
    )
    assert _rows(batch, cols) == _rows(streamed, cols)
    assert streamed.count() > 0


def test_stream_dedup_drops_duplicate_across_batches(spark, tmp_path):
    """Multi-batch progression: an exact duplicate key arriving in a
    later micro-batch (within the watermark) is dropped; a new key is
    kept."""
    import os
    import shutil

    batches = {
        1: [(1, "click", "2024-01-01 10:00:10", 100, 1.0)],
        2: [(1, "click", "2024-01-01 10:00:40", 101, 1.0),   # same minute: dup
            (2, "view", "2024-01-01 10:01:00", 102, 1.0)],   # new key
    }
    stream_dir = str(tmp_path / "dedup_stream")
    os.makedirs(stream_dir)
    for i, rows in batches.items():
        tmp = str(tmp_path / f"d{i}")
        spark.createDataFrame(
            rows, "user_id bigint, event_type string, ts string, event_id bigint, value double"
        ).select(
            "user_id", "event_type",
            F.col("ts").cast("timestamp").alias("ts"), "event_id", "value",
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = os.path.join(stream_dir, f"d{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    streamed = _run_stream_append(spark, stream_dir, dedup_events, "mem_dedup_prog")
    got = sorted(
        (r["user_id"], r["event_type"], str(r["minute_start"]))
        for r in streamed.collect()
    )
    assert got == [
        (1, "click", "2024-01-01 10:00:00"),
        (2, "view", "2024-01-01 10:01:00"),
    ]


@pytest.mark.slow  # watermark off-by-one property drain (~47s): slow tier
def test_tumbling_watermark_incremental_progression(spark, tmp_path):
    """True incremental execution: hand-built micro-batches with a
    controlled out-of-order row, run in APPEND mode so results are
    emitted exactly when the watermark passes a window's end.

    Batch timeline (10-minute tumble, 15-minute watermark; the
    watermark in effect during batch N is derived from data through
    batch N-1):
      b1: 10:00, 10:02, 10:40      → watermark 10:25 from b2 on
      b2: 11:00                    → closes [10:00,10:10) with n=2;
                                     watermark 10:45 from b3 on
      b3: 10:01 (LATE — behind the 10:45 watermark: must be dropped,
          NOT resurrect the already-closed 10:00 window), 11:30
      b4: 12:00                    → watermark 11:15, closes the
                                     [10:40) and [11:00) windows
    The same rows as one batch query count 3 events in [10:00,10:10) —
    the difference is precisely the dropped late row, and a
    non-dropped late row would also show up as a duplicate emission
    for the closed window."""
    import os
    import shutil

    rows = {
        1: [("2024-01-01 10:00:00", "A", 1.0), ("2024-01-01 10:02:00", "A", 1.0),
            ("2024-01-01 10:40:00", "A", 1.0)],
        2: [("2024-01-01 11:00:00", "A", 1.0)],
        3: [("2024-01-01 10:01:00", "A", 1.0), ("2024-01-01 11:30:00", "A", 1.0)],
        4: [("2024-01-01 12:00:00", "A", 1.0)],
    }
    stream_dir = str(tmp_path / "stream")
    os.makedirs(stream_dir)
    for i, batch in rows.items():
        tmp = str(tmp_path / f"w{i}")
        df = spark.createDataFrame(
            batch, "ts string, event_type string, value double"
        ).select(F.col("ts").cast("timestamp").alias("ts"), "event_type", "value")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        dst = os.path.join(stream_dir, f"b{i}.parquet")
        shutil.copy(os.path.join(tmp, part), dst)
        # file-source batches are ordered by modification time — pin it
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))

    file_schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(file_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    q = (
        tumbling_counts(stream)  # default 15-minute watermark
        .writeStream.format("memory")
        .queryName("mem_tumble_incr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        (str(r["win_start"]), r["n_events"])
        for r in spark.table("mem_tumble_incr").collect()
    )
    # only watermark-closed windows are emitted, exactly once each
    # (availableNow ends with an empty batch whose 11:45 watermark
    # also closes the 11:30 window; the 12:00 window stays open and
    # unemitted). The late 10:01 row is neither in the 10:00 window's
    # count nor a duplicate resurrection of that closed window.
    assert got == [
        ("2024-01-01 10:00:00", 2),
        ("2024-01-01 10:40:00", 1),
        ("2024-01-01 11:00:00", 1),
        ("2024-01-01 11:30:00", 1),
    ]
    # the identical rows as one batch: the 10:00 window counts 3
    batch_counts = {
        str(r["win_start"]): r["n_events"]
        for r in tumbling_counts(spark.read.parquet(stream_dir)).collect()
    }
    assert batch_counts["2024-01-01 10:00:00"] == 3


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


def test_streaming_ann_topk_converges(spark, sf_small, tmp_path):
    """Feeding the query vectors through readStream in several
    micro-batches, the final per-query heap equals the batch exact
    cosine top-K (the oracle-checked form of stream_ann_topk)."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
        queries_view,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.stateful import (
        streaming_ann_topk,
    )

    k = 10
    qdir = str(tmp_path / "qstream")
    queries_view(spark, sf_small).repartition(4).write.mode("overwrite").parquet(qdir)
    corpus = load_table(spark, sf_small, "embeddings")
    schema = spark.read.parquet(qdir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(qdir)
    )
    q = (
        streaming_ann_topk(stream, corpus, k=k)
        .writeStream.format("memory")
        .queryName("mem_ann_topk")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode emits per trigger; per (query, rank) the heap only
    # improves, so the final entry is the max under (score desc,
    # neighbor_id asc)
    final = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in (
            spark.table("mem_ann_topk")
            .groupBy("query_id", "rank")
            .agg(
                F.max(
                    F.struct(F.col("score"), (-F.col("neighbor_id")).alias("nid"))
                ).alias("s")
            )
            .select(
                "query_id",
                "rank",
                (-F.col("s.nid")).cast("bigint").alias("neighbor_id"),
                F.col("s.score").alias("score"),
            )
            .collect()
        )
    }
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
        exact_topk,
    )

    batch = {
        (r.query_id, r.rank): (r.neighbor_id, r.score)
        for r in exact_topk(
            queries_view(spark, sf_small), corpus, k, metric="cosine"
        ).collect()
    }
    assert final == batch


def test_streaming_ivf_ingest_assign_equals_batch(spark, sf_small, tmp_path):
    """Continuous index maintenance: the STATELESS cell assignment
    (quantizer as a literal — no join, no aggregation, no state) run
    over a multi-batch embedding stream in append mode produces
    exactly the batch assignment of the same rows. This is the plan a
    production ingest pipeline runs per micro-batch before appending
    to the cell-partitioned store."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        assign_cells_stateless,
        ivf_centroids,
    )

    corpus = load_table(spark, sf_small, "embeddings")
    cents = ivf_centroids(corpus)
    rows = [(r.centroid_id, r.cvec) for r in cents.collect()]
    newdir = str(tmp_path / "ingest")
    batch_src = corpus.where(F.col("vec_id") % 10 == 3)
    batch_src.repartition(4).write.mode("overwrite").parquet(newdir)
    schema = spark.read.parquet(newdir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(newdir)
    )
    q = (
        assign_cells_stateless(stream, rows)
        .writeStream.format("memory")
        .queryName("mem_ivf_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.id, r.cell) for r in spark.table("mem_ivf_ingest").collect()
    }
    expected = {
        (r.id, r.cell)
        for r in assign_cells_stateless(spark.read.parquet(newdir), rows).collect()
    }
    assert streamed == expected and len(streamed) == batch_src.count()


def test_streaming_ingest_end_to_end_equals_batch(spark, sf_small, tmp_path):
    """The full continuous-ingest loop (r07 verdict #5): CDC change
    stream -> foreachBatch -> cell-partitioned delta store ->
    merge-on-read serve. After the stream drains, the served top-K
    must equal the same change set applied as ONE batch
    (mutated_topk) — last-wins keys on the data's seq, so the state
    is independent of micro-batch chopping."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.mutate import (
        mutated_topk,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        ivf_centroids,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.ingest import (
        change_stream_fixture,
        delta_latest,
        serve_fresh_topk,
        start_delta_ingest,
    )

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
        queries_view,
    )

    corpus = load_table(spark, sf_small, "embeddings")
    queries = queries_view(spark, sf_small)
    changes = change_stream_fixture(corpus)

    src = str(tmp_path / "src")
    delta = str(tmp_path / "delta")
    ckpt = str(tmp_path / "ckpt")
    changes.repartition(4).write.parquet(src)
    rows = [(r.centroid_id, r.cvec) for r in ivf_centroids(corpus).collect()]
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_delta_ingest(stream, rows, delta, ckpt)
    q.awaitTermination(300)
    # at least 2 micro-batches ran and the store is cell-partitioned
    import os

    batches = {r.batch_id for r in spark.read.parquet(delta).select("batch_id").distinct().collect()}
    assert len(batches) >= 2
    assert any(d.startswith("cell=") for d in os.listdir(delta))

    served = serve_fresh_topk(
        queries, corpus, delta_latest(spark, delta), 10
    ).toPandas().sort_values(["query_id", "rank"], ignore_index=True)

    # batch twin: resolve last-wins directly, then one-shot merge
    latest = changes.orderBy(F.col("seq").desc(), F.col("op").asc()).dropDuplicates(
        ["vec_id"]
    )
    ups = latest.where(F.col("op") == "upsert").select("vec_id", "embedding")
    dels = latest.where(F.col("op") == "delete").select("vec_id")
    want = mutated_topk(queries, corpus, ups, dels, 10).toPandas().sort_values(
        ["query_id", "rank"], ignore_index=True
    )
    assert served.equals(want)


def test_streaming_neardup_equals_batch(spark, sf_small, tmp_path):
    """Batch ≡ stream for the continuous near-dup filter: the REAL
    foreachBatch ingest (4 ascending-id micro-batches over the sketch
    store) produces the same per-doc decision log as the one-shot
    conservative-filter form — decisions key on (existing ∪
    smaller-id) partners, never on batch boundaries."""
    import os

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        INC_MOD,
        INC_REM,
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        init_neardup_store,
        neardup_decisions,
        read_decisions,
        start_neardup_ingest,
        write_ordered_stream_source,
    )

    docs = load_table(spark, sf_small, "documents")
    inc_pred = F.col("doc_id") % INC_MOD == INC_REM

    root = str(tmp_path / "neardup")
    src, store, ckpt = (os.path.join(root, d) for d in ("src", "store", "ckpt"))
    init_neardup_store(docs.where(~inc_pred), store, n=SHINGLE_N)
    write_ordered_stream_source(docs.where(inc_pred).select("doc_id", "text"), src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_neardup_ingest(stream, store, ckpt, n=SHINGLE_N, threshold=MINHASH_TAU)
    assert q.awaitTermination(300), "ingest did not drain"

    # the stream really ran as >1 micro-batch
    n_batches = (
        spark.read.parquet(f"{store}/decisions")
        .select("batch_id")
        .distinct()
        .count()
    )
    assert n_batches >= 2

    streamed = {
        (r.doc_id, r.is_near_dup, r.keep)
        for r in read_decisions(spark, store).collect()
    }
    batch = {
        (r.doc_id, r.is_near_dup, r.keep)
        for r in neardup_decisions(
            docs, INC_MOD, INC_REM, n=SHINGLE_N, threshold=MINHASH_TAU
        ).collect()
    }
    assert streamed == batch
    assert any(d for (_, d, _) in streamed), "fixture has no near-dups"


def test_streaming_neardup_rejects_out_of_order_source(spark, sf_small, tmp_path):
    """The ordering contract is enforced in code (r11): a source whose
    micro-batches are NOT ascending doc_id ranges fails the streaming
    query loud (the guard raises) instead of silently producing a
    decision log that no longer equals the batch form."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        INC_MOD,
        INC_REM,
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        init_neardup_store,
        start_neardup_ingest,
        write_ordered_stream_source,
    )

    docs = load_table(spark, sf_small, "documents")
    inc_pred = F.col("doc_id") % INC_MOD == INC_REM
    root = str(tmp_path / "neardup_ooo")
    src, store, ckpt = (os.path.join(root, d) for d in ("src", "store", "ckpt"))
    init_neardup_store(docs.where(~inc_pred), store, n=SHINGLE_N)
    write_ordered_stream_source(docs.where(inc_pred).select("doc_id", "text"), src)
    # shuffle arrival order: swap the mtimes of the first and last
    # range files so the file source delivers a LATER id range first
    parts = sorted(p for p in os.listdir(src) if p.endswith(".parquet"))
    assert len(parts) >= 2
    os.utime(os.path.join(src, parts[0]), (1_700_000_100, 1_700_000_100))
    os.utime(os.path.join(src, parts[-1]), (1_700_000_000, 1_700_000_000))
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_neardup_ingest(stream, store, ckpt, n=SHINGLE_N, threshold=MINHASH_TAU)
    try:
        q.awaitTermination(300)
        raised = False
    except StreamingQueryException as e:
        raised = "ordering contract violated" in str(e)
    assert raised, "out-of-order source must fail the query loud"


def test_streaming_neardup_batch_retry_is_idempotent(spark, sf_small, tmp_path):
    """A micro-batch retried after a failure replaces its own
    batch_id partitions instead of double-appending (r10 ADVICE):
    running the same batch twice leaves the decision log and the
    sketch store byte-identical in row multiset."""
    import os

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        INC_MOD,
        INC_REM,
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        init_neardup_store,
        process_neardup_batch,
        read_decisions,
    )

    docs = load_table(spark, sf_small, "documents")
    inc_pred = F.col("doc_id") % INC_MOD == INC_REM
    root = str(tmp_path / "neardup_retry")
    store = os.path.join(root, "store")
    init_neardup_store(docs.where(~inc_pred), store, n=SHINGLE_N)
    batch = docs.where(inc_pred).select("doc_id", "text").localCheckpoint(eager=True)

    process_neardup_batch(batch, 0, store, n=SHINGLE_N, threshold=MINHASH_TAU)
    first_dec = sorted(
        (r.doc_id, r.is_near_dup, r.keep)
        for r in read_decisions(spark, store).collect()
    )
    first_bands = spark.read.parquet(f"{store}/bands").count()
    # the retry: same batch_id, same rows — must be a no-op overall
    process_neardup_batch(batch, 0, store, n=SHINGLE_N, threshold=MINHASH_TAU)
    second_dec = sorted(
        (r.doc_id, r.is_near_dup, r.keep)
        for r in read_decisions(spark, store).collect()
    )
    assert second_dec == first_dec, "retry duplicated decision rows"
    assert spark.read.parquet(f"{store}/bands").count() == first_bands
    # and a NEXT batch with smaller ids still trips the guard
    import pytest

    with pytest.raises(ValueError, match="ordering contract violated"):
        process_neardup_batch(batch, 1, store, n=SHINGLE_N, threshold=MINHASH_TAU)


def test_streaming_neardup_corrupt_decision_log_fails_loud(spark, sf_small, tmp_path):
    """r11 ADVICE #1: a decisions log that EXISTS but cannot be read
    (corrupt footer here) must fail the batch, not be treated as
    'first batch' — the old blanket except silently disabled the
    ordering contract on any read failure."""
    import os

    import pytest

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        INC_MOD,
        INC_REM,
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        init_neardup_store,
        process_neardup_batch,
    )

    docs = load_table(spark, sf_small, "documents")
    inc_pred = F.col("doc_id") % INC_MOD == INC_REM
    store = str(tmp_path / "neardup_corrupt" / "store")
    init_neardup_store(docs.where(~inc_pred), store, n=SHINGLE_N)
    # plant a decisions dir whose only file is NOT parquet
    dec = os.path.join(store, "decisions")
    os.makedirs(dec, exist_ok=True)
    with open(os.path.join(dec, "part-corrupt.parquet"), "wb") as fh:
        fh.write(b"this is not a parquet file")
    batch = docs.where(inc_pred).select("doc_id", "text").localCheckpoint(eager=True)
    with pytest.raises(Exception) as exc:
        process_neardup_batch(batch, 0, store, n=SHINGLE_N, threshold=MINHASH_TAU)
    # and it must be the read failure surfacing, not the ordering error
    assert "ordering contract violated" not in str(exc.value)


def test_streaming_neardup_reorder_buffer_drains_disordered_source(
    spark, sf_small, tmp_path
):
    """VERDICT r11 #3 (constructive half): a SHUFFLED source with
    bounded disorder (a) genuinely violates the ordered contract —
    the plain path's guard rejects it (red) — and (b) drains through
    the watermark reorder buffer + final flush to the SAME decision
    log as the one-shot batch form (green)."""
    import os

    from pyspark.errors.exceptions.captured import StreamingQueryException

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        INC_MOD,
        INC_REM,
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        NEARDUP_LATENESS,
        flush_neardup_buffer,
        init_neardup_store,
        neardup_decisions,
        read_decisions,
        start_neardup_ingest,
        start_neardup_ingest_reordered,
        write_disordered_stream_source,
    )

    docs = load_table(spark, sf_small, "documents")
    inc_pred = F.col("doc_id") % INC_MOD == INC_REM
    incoming = docs.where(inc_pred).select("doc_id", "text")
    root = str(tmp_path / "neardup_reorder")
    src = os.path.join(root, "src")
    write_disordered_stream_source(incoming, src)

    # the disorder is real: some later file carries a smaller id than
    # an earlier file's max
    parts = sorted(p for p in os.listdir(src) if p.endswith(".parquet"))
    maxima, minima = [], []
    for p in parts:
        ids = [r.doc_id for r in spark.read.parquet(os.path.join(src, p)).collect()]
        maxima.append(max(ids))
        minima.append(min(ids))
    assert any(
        minima[i + 1] <= maxima[i] for i in range(len(parts) - 1)
    ), "fixture source is not actually disordered"

    schema = spark.read.parquet(src).schema

    # (a) RED: the ordered path rejects the shuffled source
    store_red = os.path.join(root, "store_red")
    init_neardup_store(docs.where(~inc_pred), store_red, n=SHINGLE_N)
    q = start_neardup_ingest(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        store_red,
        os.path.join(root, "ckpt_red"),
        n=SHINGLE_N,
        threshold=MINHASH_TAU,
    )
    try:
        q.awaitTermination(300)
        raised = False
    except StreamingQueryException as e:
        raised = "ordering contract violated" in str(e)
    assert raised, "ordered path must reject the disordered source"

    # (b) GREEN: the reorder buffer drains it to the batch form
    store = os.path.join(root, "store")
    init_neardup_store(docs.where(~inc_pred), store, n=SHINGLE_N)
    q = start_neardup_ingest_reordered(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        store,
        os.path.join(root, "ckpt"),
        n=SHINGLE_N,
        threshold=MINHASH_TAU,
        lateness=NEARDUP_LATENESS,
    )
    assert q.awaitTermination(300), "reordered ingest did not drain"
    flush_neardup_buffer(
        spark, store, n=SHINGLE_N, threshold=MINHASH_TAU, lateness=NEARDUP_LATENESS
    )

    streamed = {
        (r.doc_id, r.is_near_dup, r.keep)
        for r in read_decisions(spark, store).collect()
    }
    batch = {
        (r.doc_id, r.is_near_dup, r.keep)
        for r in neardup_decisions(
            docs, INC_MOD, INC_REM, n=SHINGLE_N, threshold=MINHASH_TAU
        ).collect()
    }
    assert streamed == batch
    # the buffer really released across >1 batch (not one big flush)
    n_release_batches = (
        spark.read.parquet(f"{store}/decisions").select("batch_id").distinct().count()
    )
    assert n_release_batches >= 2


def test_streaming_neardup_reorder_buffer_lateness_violation_fails_loud(
    spark, sf_small, tmp_path
):
    """Disorder beyond the declared lateness bound must raise (the
    range was already released), never silently drop the arrival."""
    import os

    import pytest

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        init_neardup_store,
        process_reordered_batch,
    )

    docs = load_table(spark, sf_small, "documents")
    store = str(tmp_path / "neardup_late" / "store")
    init_neardup_store(docs.where(F.col("doc_id") < 10), store, n=SHINGLE_N)
    hi = docs.where(F.col("doc_id") >= 400).select("doc_id", "text")
    lo = docs.where(F.col("doc_id") < 100).select("doc_id", "text")
    process_reordered_batch(
        hi.localCheckpoint(eager=True), 0, store,
        n=SHINGLE_N, threshold=MINHASH_TAU, lateness=50,
    )
    with pytest.raises(ValueError, match="lateness bound violated"):
        process_reordered_batch(
            lo.localCheckpoint(eager=True), 1, store,
            n=SHINGLE_N, threshold=MINHASH_TAU, lateness=50,
        )


def test_streaming_neardup_reordered_release_is_retry_idempotent(
    spark, sf_small, tmp_path
):
    """A retried reordered batch recomputes the IDENTICAL release
    range from the arrivals store alone — decision log and sketch
    store are byte-identical in row multiset after the retry."""
    import os

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_dedup import (
        INC_MOD,
        INC_REM,
        MINHASH_TAU,
        SHINGLE_N,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.neardup import (
        init_neardup_store,
        process_reordered_batch,
        read_decisions,
    )

    docs = load_table(spark, sf_small, "documents")
    inc_pred = F.col("doc_id") % INC_MOD == INC_REM
    store = str(tmp_path / "neardup_reorder_retry" / "store")
    init_neardup_store(docs.where(~inc_pred), store, n=SHINGLE_N)
    incoming = docs.where(inc_pred).select("doc_id", "text")
    ids = sorted(r.doc_id for r in incoming.select("doc_id").collect())
    half = ids[len(ids) // 2]
    b0 = incoming.where(F.col("doc_id") <= half).localCheckpoint(eager=True)
    b1 = incoming.where(F.col("doc_id") > half).localCheckpoint(eager=True)

    process_reordered_batch(b0, 0, store, n=SHINGLE_N, threshold=MINHASH_TAU, lateness=20)
    process_reordered_batch(b1, 1, store, n=SHINGLE_N, threshold=MINHASH_TAU, lateness=20)
    first = sorted(
        (r.doc_id, r.is_near_dup, r.keep)
        for r in read_decisions(spark, store).collect()
    )
    bands_n = spark.read.parquet(f"{store}/bands").count()
    # retry the SECOND batch
    process_reordered_batch(b1, 1, store, n=SHINGLE_N, threshold=MINHASH_TAU, lateness=20)
    second = sorted(
        (r.doc_id, r.is_near_dup, r.keep)
        for r in read_decisions(spark, store).collect()
    )
    assert second == first
    assert spark.read.parquet(f"{store}/bands").count() == bands_n


def test_streaming_spann_closure_routing_equals_batch(spark, sf_small, tmp_path):
    """SPANN continuous ingest (r12): the stateless closure router
    (quantizer as a literal, posting set as a pure projection +
    generator — no join, no state) over a multi-batch stream emits
    exactly the batch ``closure_cells`` posting set of the same rows,
    replication included."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
        spann as SP,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        ivf_centroids,
    )

    corpus = load_table(spark, sf_small, "embeddings")
    cents = ivf_centroids(corpus)
    rows = [(r.centroid_id, r.cvec) for r in cents.collect()]
    newdir = str(tmp_path / "spann_ingest")
    batch_src = corpus.where(F.col("vec_id") % 10 == 3)
    batch_src.repartition(4).write.mode("overwrite").parquet(newdir)
    schema = spark.read.parquet(newdir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(newdir)
    )
    q = (
        SP.closure_cells_stateless(stream, rows)
        .writeStream.format("memory")
        .queryName("mem_spann_ingest")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.id, r.cell) for r in spark.table("mem_spann_ingest").collect()
    }
    expected = {
        (r.vec_id, r.cell)
        for r in SP.closure_cells(
            spark.read.parquet(newdir), cents, SP.SPANN_EPS, SP.SPANN_MAX_REPLICAS
        ).collect()
    }
    assert streamed == expected
    assert len(streamed) > batch_src.count()  # replication actually happened


def test_spann_ingest_routes_deletes_to_sentinel(spark, sf_small, tmp_path):
    """CDC delete rows carry no embedding, so the closure router must
    not drop them (an inner explode would) nor guess cells: each lands
    exactly once in the sentinel cell -1 tombstone partition, and the
    final store is invariant to how the stream was chopped."""
    import os

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        ivf_centroids,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.streaming.ingest import (
        change_stream_fixture,
        start_spann_delta_ingest,
    )

    corpus = load_table(spark, sf_small, "embeddings")
    rows = [(r.centroid_id, r.cvec) for r in ivf_centroids(corpus).collect()]
    changes = change_stream_fixture(corpus)
    n_deletes = changes.where(F.col("op") == "delete").count()
    assert n_deletes > 0
    stats = {}
    for label, mfpt in (("chopped", 1), ("whole", 100)):
        src = str(tmp_path / f"src_{label}")
        delta = str(tmp_path / f"delta_{label}")
        ckpt = str(tmp_path / f"ckpt_{label}")
        changes.repartition(4).write.parquet(src)
        schema = spark.read.parquet(src).schema
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", mfpt)
            .parquet(src)
        )
        q = start_spann_delta_ingest(stream, rows, delta, ckpt)
        assert q.awaitTermination(180)
        store = spark.read.parquet(delta)
        dels = store.where(F.col("op") == "delete")
        assert dels.count() == n_deletes
        assert {r.cell for r in dels.select("cell").distinct().collect()} == {-1}
        stats[label] = sorted(
            (r.cell, r.n)
            for r in store.groupBy("cell")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert os.path.isdir(os.path.join(delta, "cell=-1"))
    assert stats["chopped"] == stats["whole"]
