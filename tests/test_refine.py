"""Refinement invariants (SURVEY §5 item 3 — the paper's analytical
guarantees, which must hold by construction):

* zero-miss cushions (cos-l1, cos-l2, l2-sym, l2-tz) ⇒ final top-K ==
  exact top-K on the fp16 corpus, i.e. recall exactly 1.0, at any
  truncation level (paper §3.1.3-§3.1.4, §3.2.1-§3.2.2);
* saving ≤ 1, fpr ≥ 0;
* the tz bound admits no more candidates than sym (paper Eq.(36)).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    MODES,
    prepare_corpus,
    prepare_queries,
    refine_metrics,
    refine_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    topk_per_query,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

K = 10
ZERO_MISS = ("cos-l1", "cos-l2", "l2-sym", "l2-tz")


def _exact_topk_fp16(spark, sf, mode, k):
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
        _exact_score_expr,
        is_cosine,
    )

    corp = prepare_corpus(load_table(spark, sf, "embeddings"), 6, mode)
    qs = prepare_queries(queries_view(spark, sf), mode)
    pairs = (
        corp.select(F.col("vec_id").alias("neighbor_id"), "full")
        .crossJoin(F.broadcast(qs))
        .select("query_id", "neighbor_id", _exact_score_expr(is_cosine(mode)).alias("score"))
    )
    return topk_per_query(pairs, k, ascending=not is_cosine(mode))


@pytest.mark.parametrize("mode", ZERO_MISS)
@pytest.mark.parametrize("keep_m", [2, 6])
def test_zero_miss_returns_exact_topk(spark, sf_small, mode, keep_m):
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    res = refine_topk(queries, corpus, mode, K, keep_m)
    got = res.topk.toPandas().sort_values(["query_id", "rank"], ignore_index=True)
    want = (
        _exact_topk_fp16(spark, sf_small, mode, K)
        .toPandas()
        .sort_values(["query_id", "rank"], ignore_index=True)
    )
    assert got["neighbor_id"].tolist() == want["neighbor_id"].tolist()


@pytest.mark.parametrize("mode", MODES)
def test_metrics_row_shape_and_bounds(spark, sf_small, mode):
    queries = queries_view(spark, sf_small).limit(4)
    corpus = load_table(spark, sf_small, "embeddings")
    delta = 0.7 if "hoeff" in mode else None
    row = refine_metrics(queries, corpus, mode, K, keep_m=6, delta=delta).collect()[0]
    assert row["mode"] == mode and row["m_keep"] == 6
    assert 0.0 <= row["recall"] <= 1.0
    assert row["save"] <= 1.0
    assert row["fpr"] >= 0.0
    if mode in ZERO_MISS:
        assert row["recall"] == 1.0


def test_tz_tighter_than_sym(spark, sf_small):
    """Sign-aware bound ≥ symmetric bound ⇒ tz admits a subset of
    sym's survivors ⇒ tz fetches ≤ sym fetches."""
    queries = queries_view(spark, sf_small).limit(4)
    corpus = load_table(spark, sf_small, "embeddings")
    fetched = {
        mode: refine_topk(queries, corpus, mode, K, keep_m=4).fetched.count()
        for mode in ("l2-tz", "l2-sym")
    }
    assert fetched["l2-tz"] <= fetched["l2-sym"]


def test_hoeffding_delta_monotone(spark, sf_small):
    """Smaller δ ⇒ larger cushion ⇒ more fetches (less saving)."""
    queries = queries_view(spark, sf_small).limit(4)
    corpus = load_table(spark, sf_small, "embeddings")
    f_small_delta = refine_topk(queries, corpus, "cos-hoeff", K, 6, delta=1e-6).fetched.count()
    f_big_delta = refine_topk(queries, corpus, "cos-hoeff", K, 6, delta=0.7).fetched.count()
    assert f_small_delta >= f_big_delta


def test_cushion_composition_law(spark, sf_small):
    """Index × cushion composition law: the cushioned refinement over
    an index's candidate stream returns EXACTLY the exact (fp16)
    re-rank of those candidates — zero-miss relative to the stream.
    Pinned here for the IVF composition; the LSH/graph variants share
    the same refine path."""
    from pyspark.sql import functions as F

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.vector import (
        dot,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
        ivf_cushion_topk,
        prepare_corpus,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        ivf_assign,
        ivf_centroids,
        ivf_probes,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
        topk_per_query,
    )

    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    mode, keep_m = "cos-l1", 4

    res = ivf_cushion_topk(queries, corpus, mode, K, keep_m)
    got = {
        (r.query_id, r.rank, r.neighbor_id)
        for r in res.topk.collect()
    }

    # exact (fp16 'full' representation) re-rank of the SAME candidates
    cents = ivf_centroids(corpus)
    cand = (
        F.broadcast(ivf_probes(queries, cents).select("query_id", "cell"))
        .join(ivf_assign(corpus, cents).select("vec_id", "cell"), "cell")
        .select("query_id", "vec_id")
    )
    corp = prepare_corpus(corpus, keep_m, mode)
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
        prepare_queries,
    )

    qs = prepare_queries(queries, mode)
    rerank = topk_per_query(
        cand.join(corp.select("vec_id", "full"), "vec_id")
        .join(F.broadcast(qs), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            dot("full", "q").alias("score"),
        ),
        K,
        ascending=False,
        salted=False,
    )
    want = {
        (r.query_id, r.rank, r.neighbor_id) for r in rerank.collect()
    }
    assert got == want
