"""Graded retrieval metrics (MRR@K, nDCG@K) — hand-computed truths
plus the degenerate cases (perfect ranking, zero relevant)."""

from __future__ import annotations

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.metrics import (
    _dcg_discount_micro,
    ranking_metrics,
)

K = 3


def _frames(spark, ann_rows, exact_rows):
    ann = spark.createDataFrame(
        ann_rows, "query_id bigint, rank int, neighbor_id bigint"
    )
    exact = spark.createDataFrame(
        exact_rows, "query_id bigint, neighbor_id bigint"
    )
    return ann, exact


def test_hand_computed_single_query(spark):
    # exact top-3 = {10, 20, 30}; predictions: irrelevant at rank 1,
    # relevant at ranks 2 and 3
    ann, exact = _frames(
        spark,
        [(1, 1, 99), (1, 2, 20), (1, 3, 10)],
        [(1, 10), (1, 20), (1, 30)],
    )
    row = ranking_metrics(ann, exact, K).collect()[0]
    disc = _dcg_discount_micro(K)
    idcg = sum(disc)
    ndcg_micro = ((disc[1] + disc[2]) * 1_000_000) // idcg
    assert row["mrr"] == 0.5  # first relevant at rank 2
    assert row["ndcg_at_k"] == round(ndcg_micro / 1_000_000.0, 6)
    assert row["n_queries"] == 1


def test_perfect_ranking_is_one(spark):
    ann, exact = _frames(
        spark,
        [(1, 1, 10), (1, 2, 20), (1, 3, 30)],
        [(1, 10), (1, 20), (1, 30)],
    )
    row = ranking_metrics(ann, exact, K).collect()[0]
    assert (row["mrr"], row["ndcg_at_k"]) == (1.0, 1.0)


def test_no_relevant_counts_as_zero_in_mean(spark):
    # query 1 perfect, query 2 finds nothing → means halve
    ann, exact = _frames(
        spark,
        [(1, 1, 10), (1, 2, 20), (1, 3, 30), (2, 1, 98), (2, 2, 97), (2, 3, 96)],
        [(1, 10), (1, 20), (1, 30), (2, 40), (2, 50), (2, 60)],
    )
    row = ranking_metrics(ann, exact, K).collect()[0]
    assert (row["mrr"], row["ndcg_at_k"], row["n_queries"]) == (0.5, 0.5, 2)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _python_replica(ann_rows, exact_rows, k):
    """Pure-python ranking_metrics: the same micro-unit integer
    arithmetic, written independently of the Spark plan."""
    disc = _dcg_discount_micro(k)
    idcg = sum(disc)
    exact_by_q = {}
    for q, n in exact_rows:
        exact_by_q.setdefault(q, set()).add(n)
    per_q = {}
    for q, rank, n in ann_rows:
        if n in exact_by_q.get(q, ()):
            dcg, first = per_q.get(q, (0, None))
            dcg += disc[rank - 1]
            first = rank if first is None else min(first, rank)
            per_q[q] = (dcg, first)
    rr_sum = ndcg_sum = 0
    for q in exact_by_q:
        dcg, first = per_q.get(q, (0, None))
        ndcg_sum += (dcg * 1_000_000) // idcg
        rr_sum += 1_000_000 // first if first else 0
    n = len(exact_by_q)

    def round_half_up(x: float, nd: int = 6) -> float:
        # Spark's F.round is HALF_UP; python round() is banker's —
        # they differ exactly on .5 ties (found by hypothesis:
        # 296081/2e6 = 0.1480405 → 0.148041 vs 0.14804)
        from decimal import ROUND_HALF_UP, Decimal

        return float(Decimal(repr(x)).quantize(Decimal(f"1e-{nd}"), ROUND_HALF_UP))

    return (
        round_half_up(rr_sum / (n * 1_000_000.0)),
        round_half_up(ndcg_sum / (n * 1_000_000.0)),
        n,
    )


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.data())
def test_matches_python_replica_on_random_rankings(spark, data):
    k = data.draw(st.integers(min_value=2, max_value=8), label="k")
    n_q = data.draw(st.integers(min_value=1, max_value=4), label="n_q")
    ann_rows, exact_rows = [], []
    for q in range(n_q):
        universe = list(range(100, 160))
        perm = data.draw(st.permutations(universe), label=f"perm{q}")
        exact_rows += [(q, n) for n in perm[:k]]
        # predictions drawn from the whole universe — hits and misses
        pred = data.draw(st.permutations(universe), label=f"pred{q}")
        ann_rows += [(q, i + 1, n) for i, n in enumerate(pred[:k])]
    ann, exact = _frames(spark, ann_rows, exact_rows)
    row = ranking_metrics(ann, exact, k).collect()[0]
    want = _python_replica(ann_rows, exact_rows, k)
    assert (row["mrr"], row["ndcg_at_k"], row["n_queries"]) == want


def test_duplicate_inputs_cannot_inflate_ndcg(spark):
    """ADVICE r07: duplicate (query_id, neighbor_id) rows in either
    input used to multiply the relevance join and push nDCG past 1.0;
    the guard dedups exact and keeps the best rank per ann pair."""
    ann, exact = _frames(
        spark,
        # neighbor 10 predicted twice (ranks 1 and 3)
        [(1, 1, 10), (1, 2, 20), (1, 3, 10)],
        # exact list carries a duplicated relevant id
        [(1, 10), (1, 10), (1, 20), (1, 30)],
    )
    row = ranking_metrics(ann, exact, K).collect()[0]
    assert row["ndcg_at_k"] <= 1.0
    # equal to the clean-input result: neighbor 10 counted once at its
    # best rank (1), neighbor 20 at rank 2
    clean_ann, clean_exact = _frames(
        spark,
        [(1, 1, 10), (1, 2, 20)],
        [(1, 10), (1, 20), (1, 30)],
    )
    clean = ranking_metrics(clean_ann, clean_exact, K).collect()[0]
    assert (row["mrr"], row["ndcg_at_k"]) == (clean["mrr"], clean["ndcg_at_k"])
