"""PCA power-iteration operator (operators/pca.py): exact equality
against a pure-numpy/python replica of the SAME quantized algorithm
(the refine_replica discipline — strongest possible check, IEEE
doubles + integer arithmetic reproduce bit-for-bit), plus the
algebraic invariants a power iterate must satisfy."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq
import pytest

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.pca import (
    PCA_ROUNDS,
    PCA_SCALE,
    covariance_micro,
    pca_project,
    power_iteration,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
)


def _replica(emb: np.ndarray, rounds: int):
    """The registered algorithm in plain python ints + IEEE doubles."""
    n, d = emb.shape
    q = np.floor(emb.astype(np.float64) * PCA_SCALE).astype(np.int64)
    # covariance micro: BIGINT moment sums, double means, floor-quantize
    c = np.empty((d, d), dtype=np.int64)
    s = q.T.astype(object) @ q.astype(object)  # exact integer moments
    m = [float(int(q[:, i].sum())) / n / PCA_SCALE for i in range(d)]
    for i in range(d):
        for j in range(d):
            cv = float(int(s[i][j])) / 1e12 / n - m[i] * m[j]
            c[i, j] = math.floor(cv * PCA_SCALE)
    v = [int(math.floor(PCA_SCALE / math.sqrt(d)))] * d

    def matvec(vec):
        return [int(sum(int(c[i, j]) * vec[j] for j in range(d))) for i in range(d)]

    def norm(w):
        acc = 0.0
        for x in w:  # pos-order strict left fold, like both engines
            acc += float(x) * float(x)
        return math.sqrt(max(acc, 1e-24))

    for _ in range(rounds):
        w = matvec(v)
        nr = norm(w)
        v = [int(math.floor(float(x) / nr * PCA_SCALE)) for x in w]
    lam = int(math.floor(norm(matvec(v)) / PCA_SCALE))
    return c, v, lam, q


@pytest.fixture(scope="module")
def emb(sf_small):
    t = pq.read_table(f"{sf_small}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    rows = t.column("embedding").to_pylist()
    order = np.argsort(ids)
    return np.array([rows[i] for i in order], dtype=np.float64)


def test_power_iterate_matches_python_replica(spark, sf_small, emb):
    corpus = load_table(spark, sf_small, "embeddings")
    got = {
        r.pos: (r.v, r.lam)
        for r in power_iteration(
            covariance_micro(corpus), emb.shape[1], PCA_ROUNDS
        ).collect()
    }
    _, v, lam, _ = _replica(emb, PCA_ROUNDS)
    assert len(got) == emb.shape[1]
    for pos, (gv, glam) in got.items():
        assert gv == v[pos], f"pos {pos}: {gv} != {v[pos]}"
        assert glam == lam


def test_projection_matches_python_replica(spark, sf_small, emb):
    corpus = load_table(spark, sf_small, "embeddings")
    comp = power_iteration(covariance_micro(corpus), emb.shape[1], PCA_ROUNDS)
    got = {r.vec_id: r.comp for r in pca_project(corpus, comp).collect()}
    _, v, _, q = _replica(emb, PCA_ROUNDS)
    n, d = emb.shape
    mq = [int(math.floor(float(int(q[:, i].sum())) / n)) for i in range(d)]
    for vid in range(0, n, max(1, n // 25)):  # spot-check a stride
        cm = sum((int(q[vid, i]) - mq[i]) * v[i] for i in range(d))
        want = round(float(cm) / 1e12, 6) + 0.0
        assert got[vid] == want, f"vec {vid}: {got[vid]} != {want}"


def test_iterate_invariants(spark, sf_small, emb):
    """Algebraic sanity independent of the replica: the iterate is
    unit-norm in micro units (±d quantization slack), and its Rayleigh
    estimate sits inside numpy's exact eigenvalue range."""
    corpus = load_table(spark, sf_small, "embeddings")
    rows = power_iteration(
        covariance_micro(corpus), emb.shape[1], PCA_ROUNDS
    ).collect()
    v = np.array([r.v for r in sorted(rows, key=lambda r: r.pos)], dtype=np.float64)
    assert abs(np.linalg.norm(v) - PCA_SCALE) < emb.shape[1]
    lam = rows[0].lam / PCA_SCALE
    c = np.cov(emb, rowvar=False, bias=True)
    evs = np.linalg.eigvalsh(c)
    assert evs[0] - 1e-3 <= lam <= evs[-1] + 1e-3


def test_covariance_raises_past_integer_headroom(spark):
    """r08 verdict "what's wrong" #1: a corpus whose N·max|q|² exceeds
    2^63 must RAISE before the BIGINT moment sums can wrap (magnitude
    stands in for count: one coordinate with q² ≥ 2^63 violates the
    same bound a ~9e6-row corpus would)."""
    import pytest

    big = 1.0e6  # q = 1e12 (fits int64); q² = 1e24 ≫ 2^63
    rows = [(i, [big if d == 0 else 0.01 * d for d in range(8)]) for i in range(16)]
    corpus = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    with pytest.raises(ValueError, match="BIGINT-exact"):
        covariance_micro(corpus).collect()
