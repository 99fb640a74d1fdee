"""Sweep orchestration (SURVEY §2.11 O1/O2).

The reference's ``sweep_and_plot`` (``ANNCode.py:729-789``) loops a
parameter grid ``m_keeps × deltas`` (δ only for Hoeffding modes),
recomputing the reduced corpus per m and appending one metrics row per
configuration to a CSV. Here the grid drives a union of lazy metric
DataFrames — one Spark job graph, executed together — and the CSV sink
(S6) is a plain DataFrame write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators import refine as refine_mod
from ..operators.refine import _refine_metrics_with_frames
from ..operators.refine_replica import refine_replica, replica_metrics

SWEEP_SCHEMA = (
    "mode string, m_keep int, delta double, recall double, save double, fpr double"
)


def sweep_metrics(
    queries: DataFrame,
    corpus: DataFrame,
    mode: str,
    k: int,
    m_keeps: list[int],
    deltas: list[float] | None = None,
    exact_replica: bool = False,
    dim: int | None = None,
    keep_e: int = 5,
    compress_level: int | None = None,
) -> DataFrame:
    """Metrics rows for a (mode, m_keep, delta) grid.

    ``exact_replica=True`` uses the order-sensitive replica (reference
    byte accounting); default uses the scalable fixed-τ₀ path.
    ``compress_level`` ≥ 0 recomputes the bit-plane compression model
    per ``m`` and overrides the reduced-pass bytes with measured
    compressed bytes/vec (``ANNCode.py:746-748, 831-833``), which is
    how the combined early-reject × compression saving is composed.

    Each ``m_keep`` is executed eagerly (the reference sweep is eager
    too, ``ANNCode.py:743-780``) and its persisted intermediates —
    the prepared corpus and the scored scalar frames — are released
    before the next ``m`` starts, so long grids don't accumulate
    cached partitions across configurations. δ points within one ``m``
    deliberately share the cached prepared corpus.
    """
    from ..operators.compression import avg_reduced_bytes_per_vec

    spark = queries.sparkSession
    if dim is None:
        from ..operators.simsearch import embedding_dim

        dim = embedding_dim(corpus)
    deltas_in = (deltas or [0.7]) if "hoeff" in mode else [None]
    rows = []
    for m in m_keeps:
        prepared = (
            None
            if exact_replica
            else refine_mod.prepare_corpus_cached(corpus, m, mode, cache_key=None)
        )
        override = (
            avg_reduced_bytes_per_vec(corpus, keep_e, m, level=compress_level)
            if compress_level is not None
            else None
        )
        for d in deltas_in:
            if exact_replica:
                n_corpus = corpus.count()
                rep = refine_replica(queries, corpus, mode, k, m, d)
                frame, intermediates = replica_metrics(rep, mode, k, m, n_corpus, dim, d), []
            else:
                frame, intermediates = _refine_metrics_with_frames(
                    queries, corpus, mode, k, m, d, keep_e, override, dim,
                    None, prepared,
                )
            rows.extend(frame.collect())
            for f in intermediates:
                f.unpersist()
        if prepared is not None:
            prepared.unpersist()
    return spark.createDataFrame(rows, schema=SWEEP_SCHEMA)


def write_metrics_csv(metrics: DataFrame, out_dir: str) -> None:
    """S6: CSV sink with the reference's sweep header
    (``mode,m_keep,delta,recall,save,fpr`` — ``ANNCode.py:735``)."""
    (
        metrics.coalesce(1)
        .write.mode("overwrite")
        .option("header", "true")
        .csv(out_dir)
    )
