"""Sweep orchestration (SURVEY §2.11 O1/O2).

The reference's ``sweep_and_plot`` (``ANNCode.py:729-789``) loops a
parameter grid ``m_keeps × deltas`` (δ only for Hoeffding modes),
recomputing the reduced corpus per m and appending one metrics row per
configuration to a CSV. Here the grid drives a union of lazy metric
DataFrames — one Spark job graph, executed together — and the CSV sink
(S6) is a plain DataFrame write.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame

from ..operators.refine import refine_metrics
from ..operators.refine_replica import refine_replica, replica_metrics


def sweep_metrics(
    queries: DataFrame,
    corpus: DataFrame,
    mode: str,
    k: int,
    m_keeps: list[int],
    deltas: list[float] | None = None,
    exact_replica: bool = False,
    dim: int = 64,
) -> DataFrame:
    """Metrics rows for a (mode, m_keep, delta) grid.

    ``exact_replica=True`` uses the order-sensitive replica (reference
    byte accounting); default uses the scalable fixed-τ₀ path.
    """
    deltas_in = (deltas or [0.7]) if "hoeff" in mode else [None]
    frames = []
    for m in m_keeps:
        for d in deltas_in:
            if exact_replica:
                n_corpus = corpus.count()
                rep = refine_replica(queries, corpus, mode, k, m, d)
                frames.append(replica_metrics(rep, mode, k, m, n_corpus, dim, d))
            else:
                frames.append(refine_metrics(queries, corpus, mode, k, m, d, dim=dim))
    return reduce(lambda a, b: a.unionByName(b), frames)


def write_metrics_csv(metrics: DataFrame, out_dir: str) -> None:
    """S6: CSV sink with the reference's sweep header
    (``mode,m_keep,delta,recall,save,fpr`` — ``ANNCode.py:735``)."""
    (
        metrics.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .csv(out_dir)
    )
