"""Evaluation metrics (SURVEY §2.4 A1–A3, §2.3 J3).

* Recall@K — mean over queries of |GT ∩ pred| / K
  (reference ``recall_at_k``, ``ANNCode.py:651-660``; set
  intersection becomes an equi-join J3 + count).
* Bandwidth accounting — bytes of the reduced pass plus full-precision
  fetches vs. the all-full baseline (``ANNCode.py:316-319, 368``).
* FPR — fetched-but-not-final candidates over all candidates
  (``ANNCode.py:364-365, 369``; set difference becomes an anti-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(ground: DataFrame, preds: DataFrame, k: int) -> DataFrame:
    """A1: both inputs are top-K frames (query_id, rank, neighbor_id, …).

    Returns a 1-row DataFrame ``(k INT, recall DOUBLE)``. Queries with
    zero hits still count in the mean (left join from the ground-truth
    query set), matching the reference's plain average.
    """
    hits = (
        ground.select("query_id", "neighbor_id")
        .join(preds.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "inner")
        .groupBy("query_id")
        .agg(F.count("*").alias("n_hits"))
    )
    per_query = (
        ground.select("query_id")
        .distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))).alias("recall_q"),
        )
    )
    return per_query.agg(
        F.lit(k).alias("k"), F.avg("recall_q").alias("recall")
    )


def fpr(
    fetched: DataFrame,
    final_topk: DataFrame,
    n_corpus: int,
    n_queries: int,
) -> DataFrame:
    """A3: per-candidate false-positive rate.

    ``fetched`` = (query_id, neighbor_id) pairs whose full-precision
    vector was read; unnecessary = fetched ∖ final (anti-join, the
    distributed form of ``ANNCode.py:364-365``); denominator N·|Q|.
    """
    unnecessary = fetched.select("query_id", "neighbor_id").join(
        final_topk.select("query_id", "neighbor_id"),
        ["query_id", "neighbor_id"],
        "left_anti",
    )
    denom = float(n_corpus * n_queries)
    return unnecessary.agg((F.count("*") / F.lit(denom)).alias("fpr"))


def bandwidth_saving(
    n_fetched_full: int | float,
    n_corpus: int,
    n_queries: int,
    dim: int,
    keep_m: int,
    keep_e: int = 5,
    red_bytes_override: float | None = None,
) -> float:
    """A2: bandwidth saving of the two-phase scan vs. all-full baseline.

    Bytes model (``ANNCode.py:316-319``): reduced pass costs
    ``(1+keep_e+keep_m)·D/8`` bytes per candidate (or the compressed
    override, ``ANNCode.py:693-704``); every full fetch costs
    ``16·D/8``; baseline reads full precision for every candidate.
    """
    b_full = 16.0 * dim / 8.0
    b_red = red_bytes_override if red_bytes_override is not None else (1 + keep_e + keep_m) * dim / 8.0
    total = b_red * n_corpus * n_queries + b_full * float(n_fetched_full)
    baseline = b_full * n_corpus * n_queries
    return 1.0 - total / baseline
