"""Bit-accuracy of the FP16 precision core (SURVEY §5 test plan #1):
kernels checked value-by-value against independent IEEE-754 half
semantics (struct/np.float16), then the Spark UDF path against the
kernels, then the paper's analytical invariants."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.fp16 import (
    delta_from_exp_np,
    fp16_round_np,
    reduce_precision_np,
    with_fp16_rounded,
    with_reduced_precision,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.vector import (
    delta_from_exp_col,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.compression import (
    avg_reduced_bytes_per_vec,
    compressed_bytes_per_vec_np,
    pack_bitplanes_np,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
)

# interesting values: normals, subnormals, signed zero, near-overflow
SPECIALS = np.array(
    [0.0, -0.0, 1.0, -1.0, 0.1, -0.1, 6.1e-5, -6.1e-5, 5.9e-8, -5.9e-8,
     65504.0, -65504.0, 3.14159, -2.71828, 1e-7, 1023.5],
    dtype=np.float32,
)


def _scalar_truncate(x: float, keep_m: int, keep_e: int) -> tuple[float, int]:
    """Independent single-value reference: decompose the half via its
    bit pattern using struct, truncate fields arithmetically."""
    import struct

    (u,) = struct.unpack("<H", struct.pack("<e", np.float16(x)))
    sign, exp, man = u >> 15, (u >> 10) & 0x1F, u & 0x3FF
    man = (man >> (10 - keep_m)) << (10 - keep_m) if keep_m < 10 else man
    exp = (exp >> (5 - keep_e)) << (5 - keep_e) if keep_e < 5 else exp
    u2 = (sign << 15) | (exp << 10) | man
    (val,) = struct.unpack("<e", struct.pack("<H", u2))
    return float(val), exp


@pytest.mark.parametrize("keep_m", [0, 3, 6, 10])
@pytest.mark.parametrize("keep_e", [3, 5])
def test_kernel_matches_scalar_semantics(keep_m, keep_e):
    red, kept = reduce_precision_np(SPECIALS.reshape(4, 4), keep_m, keep_e)
    for x, r, e in zip(SPECIALS, red.reshape(-1), kept.reshape(-1)):
        want_val, want_exp = _scalar_truncate(float(x), keep_m, keep_e)
        assert r == np.float32(want_val) or (np.isnan(r) and np.isnan(want_val)), x
        assert int(e) == want_exp, x


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.floats(-1e4, 1e4, width=32), min_size=4, max_size=4),
    st.integers(0, 10),
)
def test_truncation_error_bounded_by_delta(vals, keep_m):
    """Paper §3.1.2: |x16 − x_reduced| ≤ Δ coordinate-wise (the whole
    zero-miss machinery rests on this)."""
    mat = np.array([vals], dtype=np.float32)
    red, kept = reduce_precision_np(mat, keep_m)
    delta = delta_from_exp_np(kept, keep_m)
    x16 = fp16_round_np(mat)
    assert np.all(np.abs(x16 - red) <= delta + 1e-12)


def test_truncation_toward_zero():
    """Mantissa truncation never increases magnitude (basis of the
    sign-aware tz bound, ``ANNCode.py:508-522``)."""
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(64, 16)).astype(np.float32)
    red, _ = reduce_precision_np(mat, 4)
    x16 = fp16_round_np(mat)
    assert np.all(np.abs(red) <= np.abs(x16))
    assert np.all(np.signbit(red) == np.signbit(x16))


def test_delta_monotone_in_truncation():
    rng = np.random.default_rng(4)
    mat = rng.normal(size=(32, 8)).astype(np.float32)
    deltas = []
    for keep_m in (10, 6, 2):
        _, kept = reduce_precision_np(mat, keep_m)
        deltas.append(delta_from_exp_np(kept, keep_m))
    assert np.all(deltas[0] <= deltas[1]) and np.all(deltas[1] <= deltas[2])


def test_spark_udf_matches_kernel(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings").limit(100)
    keep_m = 6
    out = (
        with_fp16_rounded(with_reduced_precision(emb, keep_m), out_col="vec16")
        .withColumn("delta", delta_from_exp_col("kept_exp", keep_m))
        .orderBy("vec_id")
        .toPandas()
    )
    mat = np.stack(out["embedding"].to_numpy()).astype(np.float32)
    red_want, kept_want = reduce_precision_np(mat, keep_m)
    np.testing.assert_array_equal(np.stack(out["red"].to_numpy()), red_want)
    np.testing.assert_array_equal(
        np.stack(out["kept_exp"].to_numpy()).astype(np.uint8), kept_want
    )
    np.testing.assert_array_equal(np.stack(out["vec16"].to_numpy()), fp16_round_np(mat))
    # Column-expression Δ == NumPy Δ
    np.testing.assert_allclose(
        np.stack(out["delta"].to_numpy()),
        delta_from_exp_np(kept_want, keep_m).astype(np.float64),
        rtol=0,
        atol=0,
    )


def test_bitplane_pack_shape():
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(16, 8)).astype(np.float32)
    u16 = mat.astype(np.float16).view(np.uint16)
    blob = pack_bitplanes_np(u16, keep_e=5, keep_m=6)
    n_planes = 1 + 5 + 6
    assert len(blob) == n_planes * ((u16.size + 7) // 8)
    assert pack_bitplanes_np(u16, 0, 0) != b""  # sign plane always kept


def test_compression_model_spark_vs_exact(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    exact = avg_reduced_bytes_per_vec(emb, keep_e=5, keep_m=6, exact=True)
    pdf = emb.select("embedding").toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    assert exact == pytest.approx(compressed_bytes_per_vec_np(mat, 5, 6))
    distributed = avg_reduced_bytes_per_vec(emb.repartition(4), keep_e=5, keep_m=6)
    # per-partition streams lose some ratio but stay in the same regime
    assert 0.7 * exact < distributed < 1.5 * exact
    # compression must beat the uncompressed reduced layout at default keep
    uncompressed = (1 + 5 + 6) * 64 / 8.0
    assert distributed < uncompressed


def test_compression_model_zstd_codec(spark, sf_small):
    """Paper §4.3 Fig.13 sweeps GZIP AND ZSTD: the zstd column must
    exist, beat the uncompressed reduced layout, and the distributed
    form must replicate the single-blob NumPy model's regime."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.compression import (
        compression_stats_df,
    )

    emb = load_table(spark, sf_small, "embeddings")
    exact_z = avg_reduced_bytes_per_vec(emb, keep_e=5, keep_m=6, exact=True, codec="zstd")
    pdf = emb.select("embedding").toPandas()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float32)
    assert exact_z == pytest.approx(compressed_bytes_per_vec_np(mat, 5, 6, codec="zstd"))
    row = compression_stats_df(emb.repartition(4), keep_e=5, keep_m=6).collect()[0]
    uncompressed = (1 + 5 + 6) * 64 / 8.0
    assert 0 < row["avg_comp_bytes_zstd"] < uncompressed
    assert 0.7 * exact_z < row["avg_comp_bytes_zstd"] < 1.5 * exact_z
    assert row["ratio_vs_full_zstd"] > row["ratio_vs_reduced_zstd"] > 1.0
