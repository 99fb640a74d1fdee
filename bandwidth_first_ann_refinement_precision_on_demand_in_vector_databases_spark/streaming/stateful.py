"""Custom stateful streaming operator: incremental per-group top-K
(SURVEY §2.9 + §2.5 W3 — the reference's array-heap semantics,
``ANNCode.py:285-298``, recast as Structured Streaming state).

``streaming_topk`` maintains, per group, the K best (value, id) pairs
seen so far across micro-batches via ``applyInPandasWithState``. The
state is the heap itself (two parallel lists, exactly the reference's
"array heap"); each trigger emits the group's current top-K, so the
sink always holds the latest heap per group.

Batch equivalence (tested): after consuming any prefix-partitioned
stream of the fixture ``events``, the final state per user equals the
batch window-rank top-K — the property the reference's incremental
heap guarantees vs. its full-sort oracle (W3 ≡ W1).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, rank int, event_id bigint, value double"
STATE_SCHEMA = "values array<double>, ids array<bigint>"


def _topk_update(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            values, ids = state.get
            values, ids = list(values), list(ids)
        else:
            values, ids = [], []
        for pdf in pdfs:
            for v, i in zip(pdf["value"], pdf["event_id"]):
                values.append(float(v))
                ids.append(int(i))
        # heap semantics: keep K best by (value desc, id asc) —
        # deterministic tie-break, FIXTURES.md §C
        order = sorted(range(len(values)), key=lambda j: (-values[j], ids[j]))[:k]
        values = [values[j] for j in order]
        ids = [ids[j] for j in order]
        state.update((values, ids))
        yield pd.DataFrame(
            {
                "user_id": int(key[0]),
                "rank": range(1, len(ids) + 1),
                "event_id": ids,
                "value": values,
            }
        )

    return fn


def _topk_batch(k: int):
    """The heap fold over a whole group at once — what the stateful
    update degenerates to when all rows arrive in one batch. Same
    ordering rule ((value desc, id asc)), same output shape."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        values = [float(v) for v in pdf["value"]]
        ids = [int(i) for i in pdf["event_id"]]
        order = sorted(range(len(values)), key=lambda j: (-values[j], ids[j]))[:k]
        return pd.DataFrame(
            {
                "user_id": int(pdf["user_id"].iloc[0]),
                "rank": range(1, len(order) + 1),
                "event_id": [ids[j] for j in order],
                "value": [values[j] for j in order],
            }
        )

    return fn


def streaming_topk(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-user incremental top-K events by value. On streaming input
    the state persists across micro-batches
    (``applyInPandasWithState``); on batch input the same heap fold
    runs per group via ``applyInPandas`` (Spark rejects the stateful
    API in batch queries), so one entry point serves both modes with
    identical semantics. Shuffle is one hash partition on user_id;
    streaming state size is O(groups × K) — constant per group, the
    property that makes the heap form streamable at 100 TB."""
    grouped = events.select("user_id", "event_id", "value").groupBy("user_id")
    if events.isStreaming:
        return grouped.applyInPandasWithState(
            _topk_update(k),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    return grouped.applyInPandas(_topk_batch(k), schema=OUTPUT_SCHEMA)


def streaming_ann_topk(queries: DataFrame, corpus: DataFrame, k: int = 10) -> DataFrame:
    """Streaming ANN: each arriving query vector is scored (cosine)
    against the STATIC corpus and its per-query top-K heap updates
    incrementally — online similarity lookup during ingestion, the
    streaming face of the flagship exact top-K (J1 × W3).

    Mode-agnostic composition: a stream-static broadcast cross join
    computes the scores JVM-side (identical ``cosine`` fold to the
    batch/ oracle path — the heap only sorts, never computes), then
    the incremental K-heap (``streaming_topk``) maintains per-query
    state across micro-batches. On batch input the same plan is the
    exact top-K, which is what the DuckDB twin replays.

    Scale: the corpus side is the broadcast (production: the reduced
    representation — SQ/PQ codes — with refine-on-demand downstream);
    per-query state is K pairs; each micro-batch shuffles only its
    own q×K-bounded heap updates."""
    from ..functions.vector import cosine

    scored = (
        queries.select(F.col("query_id").alias("user_id"), "embedding")
        .crossJoin(
            F.broadcast(
                corpus.select(
                    F.col("vec_id").alias("event_id"), F.col("embedding").alias("cv")
                )
            )
        )
        .select("user_id", "event_id", cosine("embedding", "cv").alias("value"))
    )
    return streaming_topk(scored, k).select(
        F.col("user_id").alias("query_id"),
        "rank",
        F.col("event_id").alias("neighbor_id"),
        F.col("value").alias("score"),
    )
