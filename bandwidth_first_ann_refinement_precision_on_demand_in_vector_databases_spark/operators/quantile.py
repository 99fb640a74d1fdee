"""Fixed-universe mergeable quantile sketch — the rank-statistics
member of the sketch family (CMS counts, HLL distincts, histogram
bins; r08 verdict #3: "a rank-based sketch is the production
monitoring substrate next to CMS/HLL").

Design (the KLL-alternative the verdict names — *fixed-universe
integer quantiles*): values are integers in a declared universe
``[0, 2^universe_bits)``; the sketch keeps one BIGINT count per
dyadic bucket ``v >> (universe_bits − sketch_bits)`` — at most
``2^sketch_bits`` rows REGARDLESS of input size, built by one
map-side-combined aggregate. Unlike a data-range histogram
(``hist_merge_halves``), nothing about the sketch depends on the
data's min/max: two sketches built on any two shards, days, or
streams merge BY COUNT ADDITION into exactly the single-pass sketch —
the 100 TB rollup property — and the rank query

    quantile(φ) = min bucket with cumulative count ≥ ⌈φ·n⌉

is exact in bucket space, so the returned lower bound is within
``2^(universe_bits − sketch_bits)`` of the true φ-quantile in value
space, deterministically (no sampling, no RNG, replayable in SQL).

Scale shape: the build shuffles ≤ 2^sketch_bits rows after map-side
combine; the cumulative is a broadcast self-join over the bounded
sketch (never a single-partition window over data); extraction is a
broadcast join against a literal φ-list. Everything downstream of the
one corpus scan is O(sketch²) = O(2^24) worst case, independent of N.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default universe: 24-bit integers (covers e.g. prices in cents up
#: to $167k); callers pick the universe when they quantize.
QUANTILE_UNIVERSE_BITS = 24
#: sketch resolution: ≤ 4096 rows of state; value error ≤ 2^(U−B).
QUANTILE_SKETCH_BITS = 12
#: the registered monitoring points.
QUANTILE_PHIS = (0.25, 0.5, 0.75, 0.95)


def _bucket(value: Column, universe_bits: int, sketch_bits: int) -> Column:
    """Dyadic bucket with the universe GUARD: a value outside
    [0, 2^universe_bits) raises instead of silently folding into a
    wrong bucket (the ``write_zordered`` rule)."""
    hi = 1 << universe_bits
    ok = (value >= 0) & (value < F.lit(hi))
    return F.when(ok, F.shiftright(value, universe_bits - sketch_bits)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"quantile_sketch: value outside [0, {hi}): "),
                value.cast("string"),
            )
        )
    ).cast("int")


def quantile_sketch(
    df: DataFrame,
    value: Column | str,
    universe_bits: int = QUANTILE_UNIVERSE_BITS,
    sketch_bits: int = QUANTILE_SKETCH_BITS,
) -> DataFrame:
    """(bucket, c): the bounded-state sketch of an integer value
    column. One aggregate; the shuffle carries ≤ 2^sketch_bits rows
    per map partition."""
    v = F.col(value) if isinstance(value, str) else value
    return (
        df.select(_bucket(v.cast("bigint"), universe_bits, sketch_bits).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def merge_sketches(*sketches: DataFrame) -> DataFrame:
    """Sketch ⊎ sketch: union + count addition — the mergeability
    contract (`quantile_merge_halves` proves merged ≡ single-pass)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.sum("c").cast("bigint").alias("c"))


def sketch_quantiles(
    sketch: DataFrame,
    phis: tuple[float, ...] = QUANTILE_PHIS,
    universe_bits: int = QUANTILE_UNIVERSE_BITS,
    sketch_bits: int = QUANTILE_SKETCH_BITS,
) -> DataFrame:
    """(phi, q_bucket, q_value_lb): for each φ, the smallest bucket
    whose cumulative count reaches ⌈φ·n⌉ and its value-space lower
    bound ``bucket << (U−B)``.

    The cumulative is a ≤-self-join over the BOUNDED sketch (broadcast
    nested loop over ≤ 2^sketch_bits rows) — never a single-partition
    window over data-sized input; φ targets are exact small-integer
    arithmetic in double (identical on both engines)."""
    shift = universe_bits - sketch_bits
    a = sketch.select(F.col("bucket").alias("b"), F.col("c").alias("ca"))
    b = sketch.select(F.col("bucket").alias("b2"), F.col("c").alias("cb"))
    cum = (
        a.join(F.broadcast(b), F.col("b2") <= F.col("b"))
        .groupBy("b")
        .agg(F.sum("cb").cast("bigint").alias("cum"))
    )
    tot = sketch.agg(F.sum("c").cast("bigint").alias("n"))
    phi_lit = F.array(*[F.lit(float(p)) for p in phis])
    targets = tot.select(F.explode(phi_lit).alias("phi"), "n").select(
        "phi",
        F.ceil(F.col("phi") * F.col("n").cast("double")).cast("bigint").alias("target"),
    )
    hit = (
        F.broadcast(targets)
        .join(cum, F.col("cum") >= F.col("target"))
        .groupBy("phi")
        .agg(F.min("b").alias("q_bucket"))
    )
    return hit.select(
        "phi",
        "q_bucket",
        F.shiftleft(F.col("q_bucket").cast("bigint"), shift).alias("q_value_lb"),
    ).orderBy("phi")


# ---------------------------------------------------------------------------
# General-domain float ingestion (r09 verdict #6): the documented
# quantize-to-universe contract
# ---------------------------------------------------------------------------

def float_key(
    value: Column | str, scale: float, offset: int
) -> Column:
    """The ingestion contract for float columns: ``key =
    floor(value·scale) + offset`` — ORDER-PRESERVING on all of ℝ at
    resolution ``1/scale`` (floor is monotone; both engines floor
    toward −∞, so negatives are safe), BIGINT-exact after the floor.
    The caller declares the domain by choosing (scale, offset,
    universe_bits): the sketch's bucket guard raises on any value
    whose key falls outside [0, 2^universe_bits) — a domain violation
    fails loud instead of silently folding (the ``write_zordered``
    rule). Rank error of a sketch over keys is ≤ 2^(U−B) keys
    = 2^(U−B)/scale in ORIGINAL value units, deterministically."""
    v = F.col(value) if isinstance(value, str) else value
    return (
        F.floor(v.cast("double") * F.lit(float(scale))).cast("bigint")
        + F.lit(int(offset)).cast("bigint")
    )


def float_quantile_sketch(
    df: DataFrame,
    value: Column | str,
    scale: float,
    offset: int = 0,
    universe_bits: int = QUANTILE_UNIVERSE_BITS,
    sketch_bits: int = QUANTILE_SKETCH_BITS,
) -> DataFrame:
    """(bucket, c): the bounded sketch of a RAW float column under
    the :func:`float_key` contract — one aggregate, ≤ 2^sketch_bits
    rows, merge-by-addition like the integer form (same bucket
    space, so :func:`merge_sketches` applies unchanged)."""
    return quantile_sketch(
        df.select(float_key(value, scale, offset).alias("__k")),
        "__k",
        universe_bits,
        sketch_bits,
    )


def float_sketch_quantiles(
    sketch: DataFrame,
    scale: float,
    offset: int = 0,
    phis: tuple[float, ...] = QUANTILE_PHIS,
    universe_bits: int = QUANTILE_UNIVERSE_BITS,
    sketch_bits: int = QUANTILE_SKETCH_BITS,
) -> DataFrame:
    """(phi, q_bucket, q_value): rank extraction mapped back to
    ORIGINAL value units — ``q_value = (bucket·2^(U−B) − offset) /
    scale``, the value-space lower bound of the φ-quantile, within
    2^(U−B)/scale of the true quantile."""
    out = sketch_quantiles(sketch, phis, universe_bits, sketch_bits)
    return out.select(
        "phi",
        "q_bucket",
        F.round(
            (F.col("q_value_lb") - F.lit(int(offset))).cast("double")
            / F.lit(float(scale)),
            6,
        ).alias("q_value"),
    )
