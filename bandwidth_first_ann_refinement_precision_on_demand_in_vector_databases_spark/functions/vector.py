"""Vector math as Column expressions (SURVEY §2.2 P1, §2.7).

Everything here is a pure ``pyspark.sql`` Column expression — array
higher-order functions over ``ARRAY<FLOAT>`` — so the whole vector
pipeline stays inside Catalyst/whole-stage codegen with no Python in
the hot path. All arithmetic is DOUBLE with strict left-to-right folds
so results are bit-reproducible and match a DuckDB oracle that folds
the same way (FIXTURES.md §C determinism rules).

Reference parity:
* ``l2_normalize_rows`` with 1e-12 floor — ``ANNCode.py:45-52``
* dot / matvec scores — ``ANNCode.py:335, 342``
* squared-distance residuals — ``ANNCode.py:546-547``
* Δ from kept exponent (no-peek ULP bound) — ``ANNCode.py:245-258``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NORM_EPS = 1e-12  # reference floor, ANNCode.py:45
FP16_EXP_BIAS = 15  # IEEE 754 half, ANNCode.py:33


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """⟨a,b⟩ as a strict left fold in DOUBLE."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm(a: Column | str) -> Column:
    """‖a‖₂² in DOUBLE."""
    return F.aggregate(
        _c(a), F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂."""
    return F.sqrt(sq_norm(a))


def unit(a: Column | str, eps: float = NORM_EPS) -> Column:
    """Row L2-normalize with floor (P1, ``ANNCode.py:45-52``). DOUBLE out."""
    col = _c(a)
    return F.transform(col, lambda v: v.cast("double") / F.greatest(l2_norm(col), F.lit(eps)))


def cosine(a: Column | str, b: Column | str, eps: float = NORM_EPS) -> Column:
    """Cosine similarity = ⟨a,b⟩ / (max(‖a‖,ε)·max(‖b‖,ε)).

    Algebraically equal to ⟨unit(a),unit(b)⟩ but cheaper (one fold per
    side instead of per-element divisions) and — because both the
    engine and the DuckDB oracle use this exact formula — bit-stable
    across the correctness harness.
    """
    return dot(a, b) / (F.greatest(l2_norm(a), F.lit(eps)) * F.greatest(l2_norm(b), F.lit(eps)))


def dist2(a: Column | str, b: Column | str) -> Column:
    """Squared Euclidean distance ‖a−b‖₂² in DOUBLE (``ANNCode.py:546-547``)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") - y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v * v,
    )


def l1_weighted(a: Column | str, b: Column | str) -> Column:
    """Σⱼ |aⱼ|·bⱼ — the deterministic ℓ1 cushion fold (``ANNCode.py:412``)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: F.abs(x.cast("double")) * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def delta_from_exp_col(kept_exp: Column | str, keep_m: int) -> Column:
    """Per-coordinate no-peek error radius Δ from the kept 5-bit
    exponent field (P7, ``ANNCode.py:245-258``; paper §3.1.2 Eq.(7)):

    normals   Δ = 2^(e − bias − m'),   subnormals (e==0) Δ = 2^(1 − bias − m')
    """
    return F.transform(
        _c(kept_exp),
        lambda e: F.when(
            e == 0, F.lit(float(2.0 ** (1 - FP16_EXP_BIAS - keep_m)))
        ).otherwise(F.pow(F.lit(2.0), e.cast("double") - F.lit(float(FP16_EXP_BIAS + keep_m)))),
    )
