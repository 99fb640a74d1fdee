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


def streaming_topk(events: DataFrame, k: int = 5) -> DataFrame:
    """Per-user incremental top-K events by value. Works on streaming
    input (state persists across micro-batches) and on batch input
    (single "batch" of state). Shuffle is one hash partition on
    user_id; state size is O(groups × K) — constant per group, the
    property that makes the heap form streamable at 100 TB."""
    return events.select("user_id", "event_id", "value").groupBy("user_id").applyInPandasWithState(
        _topk_update(k),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
