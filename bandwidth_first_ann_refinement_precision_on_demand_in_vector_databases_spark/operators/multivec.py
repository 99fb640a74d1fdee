"""Multi-vector late-interaction scoring (ColBERT-style MaxSim) — the
re-ranking stage of the PLAID/ColBERTv2 serving architecture (Khattab
& Zaharia 2020; Santhanam et al. 2022 — public methods): a document is
a BAG of vectors, and its score against a query (also a bag) is

    MaxSim(q, d) = Σᵢ maxⱼ cos(qᵢ, dⱼ)

— each query vector claims its best-matching document vector. The
production shape is two-stage: a cheap single-vector index proposes a
per-query candidate pool, and MaxSim re-ranks ONLY the pool (scoring
q·pool·M² slice pairs, never q·N·M²). This module implements that
re-rank as a pure Column expression — the M² cosine terms unroll into
one codegen'd expression per candidate row, no explode, no shuffle
beyond the candidate join, no Python.

Multi-vector view of the fixtures: the corpus stores one D-dim vector
per doc, so the bag is derived deterministically — M contiguous
subvector slices of length D/M (the PQ subspace split,
``operators/pq.py``). A real ColBERT store would hold per-token
vectors in an ``array<array<float>>`` column; every plan here is
shape-generic in (M, D/M), so swapping the derived slices for stored
token vectors changes only the projection that builds the bag.

Scale: candidates per query are bounded by the pool (the index's
output), the pool join broadcasts queries, and the M² arithmetic is
per-row compute inside whole-stage codegen — the classic
late-interaction trade (more FLOPs per candidate, no extra data
movement).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine
from .topk import topk_per_query

#: sub-vectors per bag (slices of the stored single vector).
MV_M = 4
#: stage-1 pool floor — the r04/r05 absolute constant, kept as the
#: minimum so tiny fixtures still pool meaningfully.
MAXSIM_POOL_MIN = 50
#: stage-1 pool as a fraction of the corpus: pool = ⌈N/DEN⌉ (exact
#: integer ceil-division so the DuckDB twin reproduces it bit-for-bit).
#: Swept at sf0.1 (reports/sweep_maxsim_pool.csv, n=2000): sufficiency
#: is near-LINEAR in the pool fraction on the isotropic fixture
#: (whole-vector cosine is only weakly predictive of the 4-slice
#: MaxSim order for random unit vectors — frac 0.025→0.4 gives recall
#: 0.2475→0.6575), so a fixed-recall target prescribes a fixed
#: FRACTION here, not the r05 absolute pool whose sufficiency decayed
#: 0.46→0.2475 from sf0.01→sf0.1. Operating point DEN=5 (20% of N):
#: recall 0.51 at sf0.1 — doubled from the fixed-50 0.2475. On real
#: (clustered) embeddings stage 1 is far more predictive and the
#: needed fraction falls with N; the fraction is the honest upper
#: bound the isotropic fixture demands.
MAXSIM_POOL_DEN = 5
#: re-ranked results kept per query.
MAXSIM_K = 10


def maxsim_pool_size(n: int) -> int:
    """Stage-1 candidate-pool size for a corpus of ``n`` vectors:
    max(MAXSIM_POOL_MIN, ⌈n / MAXSIM_POOL_DEN⌉), integer-exact."""
    return max(MAXSIM_POOL_MIN, -(-int(n) // MAXSIM_POOL_DEN))


def maxsim_expr(qcol: str, dcol: str, dim: int, m: int = MV_M) -> Column:
    """Σᵢ maxⱼ cos(qᵢ, dⱼ) over the M×M contiguous-slice pairs,
    unrolled into one Column expression (M² cosine folds; each slice
    is ``slice(vec, i·sub+1, sub)``). ``dim`` must be divisible by
    ``m`` — the PQ subspace rule."""
    if dim % m != 0:
        raise ValueError(f"bag size {m} does not divide dim {dim}")
    sub = dim // m
    total: Column | None = None
    for i in range(m):
        qi = F.slice(F.col(qcol), i * sub + 1, sub)
        best: Column | None = None
        for j in range(m):
            dj = F.slice(F.col(dcol), j * sub + 1, sub)
            c = cosine(qi, dj)
            best = c if best is None else F.greatest(best, c)
        total = best if total is None else total + best
    assert total is not None
    return total


def maxsim_rerank(
    queries: DataFrame,
    corpus: DataFrame,
    candidates: DataFrame,
    k: int = MAXSIM_K,
    m: int = MV_M,
    dim: int | None = None,
) -> DataFrame:
    """(query_id, rank, neighbor_id, maxsim): late-interaction re-rank
    of a per-query candidate pool. ``candidates`` is any index's
    (query_id, neighbor_id) stream — single-vector exact top-N in the
    registered query, but IVF/LSH/graph candidates compose identically
    (the ``refine_topk(candidate_ids=...)`` pattern)."""
    if dim is None:
        from .simsearch import embedding_dim

        dim = embedding_dim(corpus)
    full = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    q = F.broadcast(queries.select("query_id", F.col("embedding").alias("qv")))
    scored = (
        candidates.join(full, "neighbor_id")
        .join(q, "query_id")
        .select(
            "query_id",
            "neighbor_id",
            maxsim_expr("qv", "embedding", dim, m).alias("score"),
        )
    )
    out = topk_per_query(scored, k, ascending=False, salted=False)
    return out.withColumnRenamed("score", "maxsim")


def maxsim_topk_exhaustive(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = MAXSIM_K,
    m: int = MV_M,
    dim: int | None = None,
) -> DataFrame:
    """Exhaustive MaxSim over the whole corpus — the GROUND-TRUTH
    plan, in the exact-top-K family (q·N·M² slice folds; at scale the
    table a pipeline materializes once to measure its candidate
    pool's sufficiency, not a serving path — serving is
    :func:`maxsim_rerank` over an index's pool)."""
    if dim is None:
        from .simsearch import embedding_dim

        dim = embedding_dim(corpus)
    from ..session import ensure_parallelism

    q = F.broadcast(queries.select("query_id", F.col("embedding").alias("qv")))
    scored = (
        ensure_parallelism(corpus)
        .crossJoin(q)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            maxsim_expr("qv", "embedding", dim, m).alias("score"),
        )
    )
    out = topk_per_query(scored, k, ascending=False)
    return out.withColumnRenamed("score", "maxsim")
