"""PCA top-component via power iteration over the embedding
covariance — the whitening/rotation diagnostic step (OPQ-style
preprocessing, embedding-drift monitoring) made a first-class,
oracle-replayable operator.

Public method: power iteration (Mises & Pollaczek-Geiringer 1929);
the engine registers the R-ROUND ITERATE — a deterministic,
well-defined quantity on both engines (the same fixed-round contract
as the k-means quantizer, beam walks, and BPE merges) — not "the"
eigenvector, whose approach rate depends on the eigengap (tiny on the
isotropic fixture by construction).

Scale shape (the part that matters at 100 TB):

* covariance: N·d² exploded pairs but map-side-combined to d²
  partials per partition — the shuffle moves d×d matrices, not data
  (`registry.q_embedding_covariance` is the same aggregate);
* iteration: R rounds over the d²-row matrix with a broadcast d-row
  vector — corpus bytes are never touched again;
* projection: one map-side pass (explode + broadcast join + per-id
  BIGINT sum with map-side combine).

Cross-engine exactness discipline (the `embedding_covariance` /
`bm25_topn` rules): every cross-row sum is BIGINT over micro-unit
quantized integers; the only float reductions are d-element norm
folds evaluated in pos-order over an ordered list (Spark
``aggregate`` over ``array_sort(collect_list(struct))`` ≡ DuckDB
``list_sum(list_transform(list(... ORDER BY pos)))`` — both strict
left folds); scalar double arithmetic (divide, sqrt, floor) is
IEEE-deterministic on both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fixed power-iteration round budget (the registered contract).
PCA_ROUNDS = 6
#: micro-unit scale shared with the covariance quantization.
PCA_SCALE = 1_000_000


def covariance_micro(corpus: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """(i, j, c) — the d×d covariance, floor-quantized to micro-unit
    BIGINT at birth so every downstream matvec sum is integer-exact.
    Same two aggregates as ``registry.q_embedding_covariance`` (d²
    BIGINT moment partials + d means), quantized instead of rounded."""
    ex = corpus.select(
        vec_col, F.posexplode(vec_col).alias("i", "xi")
    ).select(
        vec_col,
        "i",
        F.floor(F.col("xi").cast("double") * PCA_SCALE).cast("bigint").alias("qi"),
    )
    pairs = ex.select("i", "qi", F.posexplode(vec_col).alias("j", "xj")).select(
        "i",
        "qi",
        "j",
        F.floor(F.col("xj").cast("double") * PCA_SCALE).cast("bigint").alias("qj"),
    )
    # integer-headroom guard (r08 verdict "what's wrong" #1): each
    # (i, j) moment sums N BIGINT products qi·qj — Spark wraps
    # silently past 2^63 while the SQL twin's HUGEINT sum does not.
    # Raise before the engines can diverge; checked from count/max,
    # which cannot themselves overflow.
    chk = ex.agg(
        (F.count("*") / F.countDistinct("i")).alias("n_rows"),
        F.max(F.abs("qi")).alias("mq"),
    ).collect()[0]
    if chk["mq"] is not None and int(chk["n_rows"]) * chk["mq"] * chk["mq"] >= 2**63:
        raise ValueError(
            f"covariance_micro: corpus too large for BIGINT-exact "
            f"moments at scale {PCA_SCALE} (N={int(chk['n_rows'])}, "
            f"max|q|={chk['mq']}); train on a deterministic sample "
            f"(vec_id % stride = 0) instead"
        )
    mom = pairs.groupBy("i", "j").agg(
        F.sum(F.col("qi") * F.col("qj")).alias("s"), F.count("*").alias("n")
    )
    means = ex.groupBy("i").agg(
        (F.sum("qi").cast("double") / F.count("*") / F.lit(float(PCA_SCALE))).alias(
            "mean"
        )
    )
    mi = F.broadcast(means.select(F.col("i"), F.col("mean").alias("mi")))
    mj = F.broadcast(means.select(F.col("i").alias("j"), F.col("mean").alias("mj")))
    cov = (
        F.col("s").cast("double") / F.lit(1e12) / F.col("n")
        - F.col("mi") * F.col("mj")
    )
    return (
        mom.join(mi, "i")
        .join(mj, "j")
        .select(
            "i",
            "j",
            F.floor(cov * F.lit(float(PCA_SCALE))).cast("bigint").alias("c"),
        )
    )


def _norm_over_pos(df: DataFrame, col: str) -> DataFrame:
    """One-row (nrm) frame: ‖df[col]‖₂ with the squares folded in
    pos-order — the deterministic-order reduction both engines share."""
    lst = df.agg(
        F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col(col)))).alias("pw")
    )
    sq = F.transform(
        "pw", lambda s: s.getField(col).cast("double") * s.getField(col).cast("double")
    )
    return lst.select(
        F.sqrt(
            F.greatest(
                F.aggregate(sq, F.lit(0.0), lambda a, x: a + x), F.lit(1e-24)
            )
        ).alias("nrm")
    )


def power_iteration(
    cov: DataFrame, dim: int, rounds: int = PCA_ROUNDS
) -> DataFrame:
    """(pos, v, lam) — the ``rounds``-round power iterate of the
    micro-quantized covariance, d rows. ``v`` is the micro-unit BIGINT
    eigenvector iterate (‖v‖ ≈ PCA_SCALE), ``lam`` the micro-unit
    Rayleigh estimate ‖C·v‖/‖v‖ from one final matvec. Each round's
    d-row vector is eagerly localCheckpoint'ed (the k-means iterative
    idiom) — without it the norm + update double-consume of ``w``
    doubles the plan per round (2^R blowup)."""
    spark = cov.sparkSession
    cov = cov.persist()  # R+1 matvec consumers
    v0 = math.floor(PCA_SCALE / math.sqrt(dim))
    v = spark.range(dim).select(
        F.col("id").cast("int").alias("pos"), F.lit(v0).cast("bigint").alias("v")
    )

    def matvec(vec: DataFrame) -> DataFrame:
        return (
            cov.join(F.broadcast(vec), cov["j"] == vec["pos"])
            .groupBy(cov["i"].alias("pos"))
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )

    for _ in range(rounds):
        w = matvec(v).localCheckpoint(eager=False)
        nrm = _norm_over_pos(w, "w")
        v = (
            w.crossJoin(F.broadcast(nrm))
            .select(
                "pos",
                F.floor(
                    F.col("w").cast("double")
                    / F.col("nrm")
                    * F.lit(float(PCA_SCALE))
                )
                .cast("bigint")
                .alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    w_fin = matvec(v).localCheckpoint(eager=False)
    lam = _norm_over_pos(w_fin, "w").select(
        F.floor(F.col("nrm") / F.lit(float(PCA_SCALE))).cast("bigint").alias("lam")
    )
    out = v.crossJoin(F.broadcast(lam)).select("pos", "v", "lam")
    cov.unpersist()
    return out


def pca_project(
    corpus: DataFrame,
    component: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, comp) — each vector's coordinate along the iterate:
    Σ_d (x_d − m_d)·v_d over micro-quantized terms (mean centered with
    the micro-floored mean so the sum stays BIGINT-exact; map-side
    combine, one thin shuffle of per-id partials). ``comp`` is
    reported in real units (micro² sum / 1e12), rounded once at the
    projection boundary."""
    ex = corpus.select(
        id_col, F.posexplode(vec_col).alias("pos", "x")
    ).select(
        id_col,
        "pos",
        F.floor(F.col("x").cast("double") * PCA_SCALE).cast("bigint").alias("q"),
    )
    m = ex.groupBy("pos").agg(
        F.floor(F.sum("q").cast("double") / F.count("*")).cast("bigint").alias("m")
    )
    centered = ex.join(F.broadcast(m), "pos").select(
        id_col, "pos", (F.col("q") - F.col("m")).alias("cq")
    )
    comp_micro = (
        centered.join(F.broadcast(component.select("pos", "v")), "pos")
        .groupBy(id_col)
        .agg(F.sum(F.col("cq") * F.col("v")).alias("cm"))
    )
    return comp_micro.select(
        id_col,
        (F.round(F.col("cm").cast("double") / F.lit(1e12), 6) + F.lit(0.0)).alias(
            "comp"
        ),
    )
