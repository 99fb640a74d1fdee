"""Vector-file sources vs golden files written by the test itself
(format specs from the reference loaders, ``ANNCode.py:60-158``)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
    load_bin_header_body,
    load_fvecs,
    load_matrix,
    load_vec,
    synthetic_corpus,
)

RNG = np.random.default_rng(7)
MAT = RNG.normal(size=(6, 4)).astype(np.float32)


def _collect(df):
    pdf = df.orderBy("vec_id").toPandas()
    return np.stack(pdf["embedding"].to_numpy()).astype(np.float32)


def test_load_vec(spark, tmp_path):
    path = tmp_path / "toy.vec"
    lines = [f"{MAT.shape[0]} {MAT.shape[1]}"]
    for i, row in enumerate(MAT):
        lines.append(f"tok{i} " + " ".join(repr(float(v)) for v in row))
    lines.insert(3, "shortline 1.0")  # malformed row: must be skipped
    path.write_text("\n".join(lines) + "\n")
    got = _collect(load_vec(spark, str(path), max_rows=None))
    np.testing.assert_array_equal(got, MAT)


def test_load_fvecs(spark, tmp_path):
    path = tmp_path / "toy.fvecs"
    with open(path, "wb") as f:
        for row in MAT:
            f.write(struct.pack("<i", MAT.shape[1]))
            f.write(row.tobytes())
    got = _collect(load_fvecs(spark, str(path), max_rows=None))
    np.testing.assert_array_equal(got, MAT)


def test_load_bin_header_body(spark, tmp_path):
    path = tmp_path / "toy.bin"
    with open(path, "wb") as f:
        f.write(f"{MAT.shape[0]}\n{MAT.shape[1]}\n".encode())
        f.write(MAT.tobytes())
    got = _collect(load_bin_header_body(spark, str(path), max_rows=None))
    np.testing.assert_array_equal(got, MAT)


def test_load_matrix_dispatch_int_header(spark, tmp_path):
    path = tmp_path / "toy.raw"
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", *MAT.shape))
        f.write(MAT.tobytes())
    got = _collect(load_matrix(spark, str(path), max_rows=None))
    np.testing.assert_array_equal(got, MAT)


def test_subsample_deterministic(spark, tmp_path):
    path = tmp_path / "big.fvecs"
    big = RNG.normal(size=(100, 3)).astype(np.float32)
    with open(path, "wb") as f:
        for row in big:
            f.write(struct.pack("<i", 3))
            f.write(row.tobytes())
    a = load_fvecs(spark, str(path), max_rows=10).toPandas()
    b = load_fvecs(spark, str(path), max_rows=10).toPandas()
    assert sorted(a["vec_id"]) == sorted(b["vec_id"])
    assert len(a) == 10


@pytest.mark.parametrize("partitions", [1, 4])
def test_synthetic_corpus_partition_invariant(spark, partitions):
    df = synthetic_corpus(spark, n_rows=20, dim=8, seed=42, partitions=partitions)
    got = _collect(df)
    ref = synthetic_corpus(spark, n_rows=20, dim=8, seed=42, partitions=2)
    np.testing.assert_array_equal(got, _collect(ref))


def test_load_ivecs_roundtrip(spark, tmp_path):
    """.ivecs ground-truth records [int32 K][K ids] round-trip, and
    the extension dispatches."""
    import numpy as np
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
        load_ivecs,
        load_matrix,
    )

    gt = np.array([[3, 10, 20, 30], [3, 11, 21, 31], [3, 12, 22, 32]],
                  dtype=np.int32)
    p = str(tmp_path / "gt.ivecs")
    gt.tofile(p)
    rows = {r.query_id: list(r.neighbor_ids)
            for r in load_ivecs(spark, p).collect()}
    assert rows == {0: [10, 20, 30], 1: [11, 21, 31], 2: [12, 22, 32]}
    via_dispatch = load_matrix(spark, p)
    assert via_dispatch.columns == ["query_id", "neighbor_ids"]
    assert via_dispatch.count() == 3


def test_load_ivecs_rejects_ragged(spark, tmp_path):
    import numpy as np
    import pytest
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
        load_ivecs,
    )

    bad = np.array([3, 10, 20, 30, 2, 11, 21], dtype=np.int32)
    p = str(tmp_path / "bad.ivecs")
    bad.tofile(p)
    with pytest.raises(Exception):
        load_ivecs(spark, p).collect()


def test_ann_recall_from_ivecs_groundtruth(spark, tmp_path):
    """End-to-end ivecs story: recall of an ANN result measured
    against a loaded ground-truth file."""
    import numpy as np
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        ann_recall_from_groundtruth,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
        load_ivecs,
    )

    gt = np.array([[2, 7, 8], [2, 9, 10]], dtype=np.int32)
    p = str(tmp_path / "gt2.ivecs")
    gt.tofile(p)
    gt_df = load_ivecs(spark, p)
    ann = spark.createDataFrame(
        [(0, 1, 7, 0.9), (0, 2, 99, 0.8),   # q0: 1 of 2 hit
         (1, 1, 9, 0.9), (1, 2, 10, 0.8)],  # q1: 2 of 2 hit
        "query_id bigint, rank int, neighbor_id bigint, score double",
    )
    row = ann_recall_from_groundtruth(ann, gt_df, k=2).collect()[0]
    assert row.n_queries == 2
    assert abs(row.recall_at_k - 0.75) < 1e-9


def test_load_bvecs(spark, tmp_path):
    """bigann/SIFT1B uint8 records round-trip, widened to float32."""
    import struct

    import numpy as np

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
        load_bvecs,
        load_matrix,
    )

    rng = np.random.default_rng(7)
    mat = rng.integers(0, 256, size=(9, 12), dtype=np.uint8)
    path = tmp_path / "toy.bvecs"
    with open(path, "wb") as f:
        for row in mat:
            f.write(struct.pack("<i", mat.shape[1]))
            f.write(row.tobytes())
    got = _collect(load_bvecs(spark, str(path), max_rows=None))
    np.testing.assert_array_equal(got, mat.astype(np.float32))
    via_dispatch = _collect(load_matrix(spark, str(path), max_rows=None))
    np.testing.assert_array_equal(via_dispatch, mat.astype(np.float32))
