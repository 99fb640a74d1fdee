"""Dimensional generality of the index layer (round-4 verdict item).

The fixture corpus is D=64; nothing in the *operator* layer may depend
on that. These tests build LSH / IVF / PQ / the KNN graph over a D=48
synthetic corpus (48 = 6 dims per PQ subspace — not a multiple of the
old hardcoded subdim, so a lingering 64 would fail loudly) and check
the self-query invariant: every corpus vector queried against its own
corpus must return itself at rank 1.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    pq as P,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    simsearch as S,
)

DIM = 48
N = 120


@pytest.fixture(scope="module")
def corpus48(spark):
    """Deterministic D=48 corpus, decorrelated per (id, j): a large-
    multiplier hash folded through sin keeps vectors far apart (a
    periodic generator like sin(id*7+j) creates near-duplicate vectors
    and makes the self-query invariant ill-posed)."""
    df = (
        spark.range(N)
        .select(F.col("id").cast("long").alias("vec_id"))
        .withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(0, {DIM - 1}), "
                f"j -> sin(cast((vec_id * 73856093 + j * 19349663) % 100003 AS DOUBLE)))"
            ),
        )
        .persist()
    )
    df.count()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def queries48(corpus48):
    return corpus48.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _self_at_rank1(topk) -> bool:
    rows = topk.where(F.col("rank") == 1).collect()
    return len(rows) > 0 and all(r.neighbor_id == r.query_id for r in rows)


def test_embedding_dim_derivation(corpus48):
    assert S.embedding_dim(corpus48) == DIM


def test_lsh_planes_match_dim():
    assert len(S.lsh_planes(DIM)[0]) == DIM
    assert len(S.lsh_planes(64)[0]) == 64
    # memoized and deterministic
    assert S.lsh_planes(DIM) is S.lsh_planes(DIM)


def test_lsh_topk_d48(queries48, corpus48):
    out = S.lsh_topk(queries48, corpus48, 5)
    assert _self_at_rank1(out)


def test_ivf_topk_d48(queries48, corpus48):
    out = S.ivf_topk(queries48, corpus48, 5, stride=20, nprobe=2)
    assert _self_at_rank1(out)


def test_knn_graph_d48(corpus48):
    g = S.knn_graph(corpus48, 3)
    assert g.count() > 0
    # no self edges
    assert g.where(F.col("node_id") == F.col("neighbor_id")).count() == 0


def test_pq_d48(queries48, corpus48):
    assert P.pq_subdim(corpus48) == DIM // P.PQ_M
    codes = P.pq_codes(corpus48)
    # every vector gets exactly M codes
    bad = (
        codes.groupBy("vec_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") != P.PQ_M)
        .count()
    )
    assert bad == 0
    # refined (exact re-rank) path recovers self at rank 1
    out = P.pq_refined_topk(queries48, corpus48, 5)
    assert _self_at_rank1(out)


def test_pq_rejects_indivisible_dim(spark):
    df = spark.range(4).select(
        F.col("id").alias("vec_id"),
        F.expr("transform(sequence(0, 49), j -> cast(j as double))").alias(
            "embedding"
        ),
    )
    with pytest.raises(ValueError, match="does not divide"):
        P.pq_subdim(df)


def test_mrl_d48(queries48, corpus48):
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
        mrl as M,
    )

    assert M.mrl_dims(DIM) == DIM // M.MRL_DIMS_FRACTION  # 12 at D=48
    out = M.mrl_refined_topk(queries48, corpus48, 5)
    assert _self_at_rank1(out)


def test_bq_d48(queries48, corpus48):
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
        bq as B,
    )

    enc = B.bq_encode(corpus48)
    row = enc.where(F.col("id") == 0).first()
    assert len(row.words) == (DIM + B.BQ_WORD - 1) // B.BQ_WORD  # 2 words at D=48
    out = B.bq_refined_topk(queries48, corpus48, 5)
    assert _self_at_rank1(out)


def test_cascade_d48(queries48, corpus48):
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
        bq as B,
    )

    out = B.cascade_topk(queries48, corpus48, 5)
    assert _self_at_rank1(out)
