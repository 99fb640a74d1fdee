"""Time-window query suite (SURVEY §2.9). The window builders are
mode-agnostic — identical plans serve batch and ``readStream`` input —
so the registry declares the batch form with exact DuckDB oracles
(``time_bucket`` / gaps-and-islands twins), and
``tests/test_streaming.py`` proves the same plans produce the same
results when fed through Structured Streaming with watermarks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .sources.fixtures import load_table
from .streaming.windows import (
    click_purchase_join,
    dedup_events,
    session_windows,
    sliding_counts,
    tumbling_counts,
)


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


SQL_TUMBLING = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS win_start,
       time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS win_end,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2, 3
"""


def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


SQL_SLIDING = """
WITH b AS (SELECT event_type, time_bucket(INTERVAL '5 minutes', ts) AS b0 FROM events),
x AS (
  SELECT event_type, b0 AS win_start FROM b
  UNION ALL
  SELECT event_type, b0 - INTERVAL '5 minutes' AS win_start FROM b
)
SELECT win_start, win_start + INTERVAL '10 minutes' AS win_end, event_type,
       count(*) AS n_events
FROM x GROUP BY 1, 2, 3
"""


def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(load_table(spark, sf_dir, "events"))


# Spark session_window: an event exactly gap after the previous one
# starts a NEW session (windows are [start, last+gap)), hence >= in
# the island break below.
SQL_SESSION = """
WITH o AS (
  SELECT user_id, ts, value,
    CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
         THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM o
)
SELECT user_id,
       min(ts) AS sess_start,
       max(ts) + INTERVAL '5 minutes' AS sess_end,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_events(load_table(spark, sf_dir, "events"))


SQL_STREAM_DEDUP = """
SELECT DISTINCT user_id, event_type,
       time_bucket(INTERVAL '1 minute', ts) AS minute_start
FROM events
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return click_purchase_join(load_table(spark, sf_dir, "events"))


SQL_INTERVAL_JOIN = """
SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
       p.event_id AS purchase_id, p.ts AS purchase_ts
FROM events c JOIN events p
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL '30 minutes'
"""


STREAMING_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_tumbling_counts": q_tumbling,
    "stream_sliding_counts": q_sliding,
    "stream_session_windows": q_session,
    "stream_dedup_events": q_dedup,
    "stream_interval_join": q_interval_join,
}

STREAMING_ORACLES: dict[str, str] = {
    "stream_tumbling_counts": SQL_TUMBLING,
    "stream_sliding_counts": SQL_SLIDING,
    "stream_session_windows": SQL_SESSION,
    "stream_dedup_events": SQL_STREAM_DEDUP,
    "stream_interval_join": SQL_INTERVAL_JOIN,
}
