"""Product-quantization invariants (operators/pq.py) beyond the
oracle hash-match (tests/test_registry_oracle.py covers that):
structural properties that must hold for ANY codebook/corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    pq as P,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    simsearch as S,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    exact_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)


def test_codes_shape_and_domain(spark, sf_small):
    corpus = load_table(spark, sf_small, "embeddings")
    n = corpus.count()
    codes = P.pq_codes(corpus)
    rows = codes.collect()
    # exactly M codes per vector
    assert len(rows) == n * P.PQ_M
    # every code is a sampled-centroid id
    assert all(r.code % P.PQ_STRIDE == 0 for r in rows)
    assert {r.m for r in rows} == set(range(P.PQ_M))


def test_centroid_vectors_reconstruct_exactly_untrained(spark, sf_small):
    """With the untrained (stride-sampled) codebook, a vector that
    seeded it is its own nearest centroid in every subspace (d²=0),
    so its reconstruction must be exact — any slicing/ordering/
    flatten bug breaks this. (The trained codebook moves centroids to
    cluster means, so the sharp identity holds only at iters=0.)"""
    corpus = load_table(spark, sf_small, "embeddings")
    cb0 = P.pq_codebook(corpus, iters=0)
    recon = P.pq_reconstruct(corpus, cb0).where(F.col("vec_id") % P.PQ_STRIDE == 0)
    orig = corpus.where(F.col("vec_id") % P.PQ_STRIDE == 0).select(
        "vec_id", "embedding"
    )
    joined = recon.join(orig, "vec_id").collect()
    assert joined
    for r in joined:
        assert [float(x) for x in r.recon] == [float(x) for x in r.embedding], r.vec_id


def test_trained_codebook_lowers_distortion(spark, sf_small):
    """The point of training: total reconstruction error (ADC
    distortion) with the trained codebook is strictly below the
    stride-sampled codebook's."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.vector import (
        dist2,
    )

    corpus = load_table(spark, sf_small, "embeddings")

    def distortion(cb):
        rec = P.pq_reconstruct(corpus, cb)
        return (
            rec.join(corpus.select("vec_id", "embedding"), "vec_id")
            .select(dist2("embedding", "recon").alias("d2"))
            .agg(F.sum("d2"))
            .first()[0]
        )

    untrained = distortion(P.pq_codebook(corpus, iters=0))
    trained = distortion(P.pq_codebook(corpus))  # default iters
    assert trained < untrained


def test_refined_recall_dominates_plain_pq(spark, sf_small):
    """Exact re-ranking of the top-R·K ADC candidates can only add
    true neighbors, never lose one: every true top-K hit of the plain
    ADC ranking survives the exact re-rank (its exact distance is
    globally among the K smallest). So Recall@K(refined) ≥
    Recall@K(ADC) must hold identically, not just on average."""
    k = 10
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    exact = exact_topk(queries, corpus, k, metric="l2")
    plain = S.ann_recall(P.pq_topk(queries, corpus, k), exact, k).collect()[0]
    refined = S.ann_recall(
        P.pq_refined_topk(queries, corpus, k), exact, k
    ).collect()[0]
    assert refined.recall_at_k >= plain.recall_at_k
    assert refined.n_queries == plain.n_queries


def test_ivf_residuals_invert_exactly(spark, sf_small):
    """Residual + cell centroid must reproduce the original vector to
    within one double rounding step per coordinate ((x − c) + c is not
    exact in IEEE arithmetic in general, but its error is bounded by
    ulp(x − c)/2 ≈ 1e-17 at these magnitudes)."""
    from pyspark.sql import functions as F

    corpus = load_table(spark, sf_small, "embeddings")
    cents = P.ivfadc_centroids(corpus)
    res = P.ivf_residuals(corpus)
    cmap = {r["centroid_id"]: r["cvec"] for r in cents.collect()}
    orig = {
        r["vec_id"]: r["embedding"]
        for r in corpus.orderBy("vec_id").limit(25).collect()
    }
    got = {
        r["vec_id"]: (r["cell"], r["embedding"])
        for r in res.where(F.col("vec_id").isin(list(orig))).collect()
    }
    assert set(got) == set(orig)
    for vid, (cell, rvec) in got.items():
        cvec = cmap[cell]
        for x, rr, cc in zip(orig[vid], rvec, cvec):
            assert abs((rr + cc) - float(x)) < 1e-12


def test_ivfadc_serve_shape_and_memoization(spark, sf_small):
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    out = P.ivfpq_res_topk(queries, corpus, 5)
    assert out.columns == ["query_id", "rank", "neighbor_id", "score"]
    n_q = queries.count()
    assert out.count() == 5 * n_q
    # the residual frame and trained quantizer are built once
    assert P.ivf_residuals(corpus) is P.ivf_residuals(corpus)
    assert P.ivfadc_centroids(corpus) is P.ivfadc_centroids(corpus)
