"""Deterministic k-means trainer (operators/kmeans.py): seeding,
stability of the centroid id set, iters=0 degeneration, and grouped
(per-subspace) training independence."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.kmeans import (
    kmeans_centroids,
)


def _points(spark, vecs, grp=0):
    rows = [(grp, i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "grp int, pid bigint, pvec array<double>")


def test_iters0_is_the_stride_sample(spark):
    vecs = np.arange(40, dtype=np.float64).reshape(20, 2)
    pts = _points(spark, vecs)
    got = {
        r.cid: r.cvec for r in kmeans_centroids(pts, stride=5, iters=0).collect()
    }
    assert set(got) == {0, 5, 10, 15}
    for cid in got:
        assert got[cid] == list(vecs[cid])


def test_centroid_ids_stable_and_deterministic(spark):
    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((60, 4))
    pts = _points(spark, vecs)
    a = {r.cid: r.cvec for r in kmeans_centroids(pts, stride=10, iters=3, dim=len(vecs[0])).collect()}
    b = {r.cid: r.cvec for r in kmeans_centroids(pts, stride=10, iters=3, dim=len(vecs[0])).collect()}
    assert set(a) == {0, 10, 20, 30, 40, 50}  # id set survives training
    assert a == b  # bit-identical across runs


def test_two_cluster_data_converges_to_cluster_means(spark):
    """Two well-separated blobs, two seeds: after training each
    centroid sits at its blob's (fixed-point) mean."""
    lo = [[0.0 + i * 0.01, 0.0] for i in range(10)]
    hi = [[100.0 + i * 0.01, 100.0] for i in range(10)]
    vecs = lo + hi  # stride-10 seeds: pid 0 (lo blob), pid 10 (hi blob)
    pts = _points(spark, vecs)
    out = {r.cid: r.cvec for r in kmeans_centroids(pts, stride=10, iters=3, dim=len(vecs[0])).collect()}
    assert set(out) == {0, 10}
    assert np.allclose(out[0], np.mean(lo, axis=0), atol=1e-5)
    assert np.allclose(out[10], np.mean(hi, axis=0), atol=1e-5)


def test_groups_train_independently(spark):
    """Two groups with different data: each group's centroids depend
    only on its own points (the PQ per-subspace contract)."""
    rng = np.random.default_rng(11)
    a_vecs = rng.standard_normal((30, 3))
    b_vecs = rng.standard_normal((30, 3)) + 5.0
    both = _points(spark, a_vecs, grp=0).union(_points(spark, b_vecs, grp=1))
    joint = {
        (r.grp, r.cid): r.cvec
        for r in kmeans_centroids(both, stride=10, iters=2, dim=3).collect()
    }
    solo = {
        (0, r.cid): r.cvec
        for r in kmeans_centroids(_points(spark, a_vecs, grp=0), stride=10, iters=2, dim=3).collect()
    }
    for key, cvec in solo.items():
        assert joint[key] == cvec


def test_dimension_mismatch_fails_loud(spark):
    """A point whose dimension disagrees with ``dim`` must raise at
    training time, not silently truncate (zip_with) or null out
    (element_at) the sums."""
    import pytest
    from py4j.protocol import Py4JJavaError

    rows = [(0, 0, [1.0, 2.0]), (0, 1, [1.0, 2.0, 3.0])]
    pts = spark.createDataFrame(rows, "grp int, pid bigint, pvec array<double>")
    with pytest.raises(Exception) as exc:
        kmeans_centroids(pts, stride=1, iters=1, dim=2).collect()
    assert "kmeans expects dimension 2" in str(exc.value)
