"""Unit tests for the custom join operators (SURVEY §2.3 J4) on
adversarial inputs the fixture tables don't contain."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.relational import (
    range_join_count,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(minutes=minute)


def test_range_join_duplicate_left_rows(spark):
    """Two left rows sharing (key, timestamp) must EACH get the true
    follower count, not a doubled one (the grouped count previously
    credited every duplicate's join matches to every other duplicate)."""
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(0)),
            (2, "u1", _ts(0)),   # exact duplicate of row 1's (key, ts)
            (3, "u1", _ts(30)),
        ],
        "row_id int, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _ts(5)),
            ("u1", _ts(10)),
            ("u1", _ts(90)),     # outside the 1h window of rows 1/2
        ],
        "user_id string, ts timestamp",
    )
    out = range_join_count(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        max_gap_seconds=3600,
    )
    got = {r["row_id"]: r["n_followers"] for r in out.collect()}
    # rows 1 and 2: followers at +5m, +10m, +30m? right has no +30 —
    # right rows are (+5, +10, +90): the first two are within 1h.
    # row 3 (t=30m): +90m is within (30, 90] minutes → 1 follower.
    assert got == {1: 2, 2: 2, 3: 1}


def test_range_join_boundary_exclusive_inclusive(spark):
    """Window is (left_ts, left_ts + gap]: a right row exactly at
    left_ts does not count; exactly at left_ts + gap does."""
    left = spark.createDataFrame(
        [(1, "u", _ts(0))], "row_id int, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("u", _ts(0)), ("u", dt.datetime(2024, 1, 1, 1, 0, 0))],
        "user_id string, ts timestamp",
    )
    out = range_join_count(
        left, right, key="user_id", left_ts="ts", right_ts="ts",
        max_gap_seconds=3600,
    )
    assert out.collect()[0]["n_followers"] == 1


def test_refine_replica_collected_guards_oversized_corpus(spark):
    """The single-stream replica oracle collects the corpus to the
    driver; an oversized corpus must raise instead of attempting the
    collect. (The default ``refine_replica`` is corpus-partitioned and
    has no such ceiling.)"""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine_replica import (
        refine_replica_collected,
    )

    corpus = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(seed=7) for _ in range(4)]).alias("embedding"),
    )
    queries = spark.range(2).select(
        F.col("id").alias("query_id"),
        F.array(*[F.rand(seed=9) for _ in range(4)]).alias("embedding"),
    )
    with pytest.raises(ValueError, match="collects the corpus"):
        refine_replica_collected(
            queries, corpus, "cos-l1", 5, keep_m=6, max_corpus_rows=10
        )


def test_parallel_global_rank_equals_window_rank(spark):
    """The bucket-decomposed exact rank (operators/relational.
    parallel_global_rank) must equal the single-partition window form
    on adversarial keys: duplicates, negatives, a heavy mode (every
    row in one percentile bucket), and bucket counts that don't divide
    the row count."""
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.relational import (
        parallel_global_rank,
    )

    rng = random.Random(1234)
    rows = [
        (i, rng.choice([rng.randint(-50, 50), 7, 7, 7, None]))
        for i in range(997)
    ]  # duplicates, a heavy mode, AND NULL keys (must rank last)
    df = spark.createDataFrame(rows, ["id", "key"])
    for buckets in (1, 4, 32):
        got = {
            r.id: r.rnk
            for r in parallel_global_rank(df, "key", "id", "rnk", buckets).collect()
        }
        w = Window.orderBy(F.col("key").desc(), F.col("id").asc())
        want = {
            r.id: r.rnk
            for r in df.withColumn("rnk", F.row_number().over(w)).collect()
        }
        assert got == want, f"buckets={buckets}: mismatch"


def test_parallel_global_rank_splits_memoized_no_repeat_jobs(spark, sf_small):
    """r07 verdict #2 (what's wrong): plan-ONLY re-construction used to
    re-run the percentile+checkpoint jobs every time. The splits are
    now session-memoized: a second construction over the same (frame,
    key) launches ZERO new Spark jobs."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.relational import (
        parallel_global_rank,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
        load_table,
    )

    df = load_table(spark, sf_small, "events")
    parallel_global_rank(df, "value", "event_id")  # first build pays the split job
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None) or [])
    out = parallel_global_rank(df, "value", "event_id")  # plan-only rebuild
    after = set(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # no job ran at construction time
    assert out.columns  # the plan itself is intact
