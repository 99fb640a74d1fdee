"""Order-sensitive exact replica of the reference refinement scan
(SURVEY §2.6 realization #2).

The reference processes each query's candidates sequentially in
best-first reduced order with an *evolving* admission threshold
(``ANNCode.py:348-363`` and per-mode twins): every accepted fetch can
tighten the threshold and reject later candidates. Bandwidth saving
and FPR — and, for the Hoeffding cushions, the result set itself —
depend on that order (W4), so the scalable fixed-τ₀ plan in
``refine.py`` cannot reproduce them exactly. This module can.

Realization: ``groupBy(query_id).applyInPandas`` — one pandas group =
one query — with the *corpus broadcast as NumPy matrices* so only the
q query rows shuffle, never the corpus. Inside the group the per-
candidate bounds are vectorized; only the threshold-update loop is
sequential (it is sequential in the math, not just the code).
Arithmetic is float32 end to end, matching the reference's dtypes.

Scale ceiling: the corpus must fit in one executor's memory
(broadcast). That is the same ceiling as the reference's own design
(whole-corpus ndarray); beyond it, use the fixed-τ₀ path, which is
shuffle-partitioned and has no such ceiling — this pairing is the
engine's documented two-path strategy.

Determinism deviation: the reference orders equal reduced scores by
NumPy quicksort internals; here ties order by ``vec_id`` — affects
byte accounting only when reduced scores collide exactly.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fp16 import (
    delta_from_exp_np,
    fp16_round_np,
    reduce_precision_np,
)
from .refine import MODES, hoeff_const, is_cosine

REPLICA_SCHEMA = (
    "query_id bigint, neighbor_ids array<bigint>, scores array<double>, "
    "n_hits bigint, n_fetched bigint, n_unnecessary bigint"
)


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return (mat / np.maximum(norms, 1e-12)).astype(np.float32)


def _corpus_pack(corpus_pdf: pd.DataFrame, mode: str, keep_m: int):
    """Precompute the per-corpus matrices a mode needs (float32)."""
    ids = corpus_pdf["vec_id"].to_numpy()
    raw = np.stack(corpus_pdf["embedding"].to_numpy()).astype(np.float32)
    red, kept = reduce_precision_np(raw, keep_m)
    delta = delta_from_exp_np(kept, keep_m)
    full16 = fp16_round_np(raw)
    pack = {"ids": ids, "delta": delta}
    if is_cosine(mode):
        pack["full"] = _normalize(full16)      # DBu (unit fp16 space)
        pack["red"] = _normalize(red)          # DBru
        if mode == "cos-l2":
            diff = pack["full"] - pack["red"]
            pack["bconst"] = np.sqrt((diff * diff).sum(axis=1)).astype(np.float32)
    else:
        pack["full"] = full16                  # DBf (value space)
        pack["red"] = red
    return pack


def _bounds_for(mode: str, q: np.ndarray, pack: dict, delta_p: float | None):
    """Vectorized per-candidate (phase1_score, admission_bound)."""
    delta = pack["delta"]
    if is_cosine(mode):
        s_hat = pack["red"] @ q
        if mode == "cos-hoeff":
            cushion = hoeff_const(delta_p) * np.linalg.norm(q[None, :] * delta, axis=1)
        elif mode == "cos-l1":
            cushion = delta @ np.abs(q)
        else:  # cos-l2
            cushion = pack["bconst"]
        return s_hat.astype(np.float32), cushion.astype(np.float32)
    a = q[None, :] - pack["red"]
    d2_hat = np.einsum("ij,ij->i", a, a)
    if mode == "l2-sym":
        t = np.maximum(np.abs(a) - delta, 0.0)
        lower = (t * t).sum(axis=1)
    elif mode == "l2-tz":
        sgn = np.where(np.signbit(pack["red"]), -1.0, 1.0).astype(np.float32)
        b = a * sgn
        shrunk = np.abs(a) - delta
        lower = np.where(
            b <= 0.0, a * a, np.where(b < delta, 0.0, shrunk * shrunk)
        ).sum(axis=1)
    else:  # l2-hoeff
        lower = d2_hat - 2.0 * hoeff_const(delta_p) * np.linalg.norm(a * delta, axis=1)
    return d2_hat.astype(np.float32), lower.astype(np.float32)


def _scan_one_query(mode: str, k: int, q: np.ndarray, pack: dict, delta_p):
    """The evolving-threshold scan for one query. Returns
    (topk_ids desc-quality, topk_scores, n_fetched, n_unnecessary, n_hits).
    """
    cos = is_cosine(mode)
    ids = pack["ids"]
    n = len(ids)
    kk = min(k, n)
    phase1, bound = _bounds_for(mode, q, pack, delta_p)
    full = pack["full"]

    # exact scores are only computed on fetch; gt needs them all (A1)
    exact_all = (full @ q) if cos else np.einsum(
        "ij,ij->i", full - q[None, :], full - q[None, :]
    )
    gt_order = np.lexsort((ids, -exact_all if cos else exact_all))
    gt_ids = set(ids[gt_order[:kk]].tolist())

    # seed: best kk by reduced score (W5), then scan the rest best-first
    order = np.lexsort((ids, -phase1 if cos else phase1))
    seed, rest = order[:kk], order[kk:]

    top_scores = exact_all[seed].astype(np.float32)
    top_ids = ids[seed].copy()
    worst_pos = int(np.argmin(top_scores)) if cos else int(np.argmax(top_scores))
    worst = float(top_scores[worst_pos])
    n_fetched = len(seed)
    fetched = list(ids[seed])

    for idx in rest:
        if cos:
            if float(phase1[idx]) + float(bound[idx]) < worst:
                continue
        else:
            if float(bound[idx]) > worst:
                continue
        sx = float(exact_all[idx])
        n_fetched += 1
        fetched.append(ids[idx])
        better = sx > worst if cos else sx < worst
        if better:
            top_scores[worst_pos] = sx
            top_ids[worst_pos] = ids[idx]
            worst_pos = int(np.argmin(top_scores)) if cos else int(np.argmax(top_scores))
            worst = float(top_scores[worst_pos])

    final_order = np.lexsort((top_ids, -top_scores if cos else top_scores))
    final_ids = top_ids[final_order]
    final_set = set(final_ids.tolist())
    n_unnecessary = sum(1 for i in fetched if i not in final_set)
    n_hits = len(gt_ids & final_set)
    return (
        final_ids.astype(np.int64),
        top_scores[final_order].astype(np.float64),
        n_fetched,
        n_unnecessary,
        n_hits,
    )


def refine_replica(
    queries: DataFrame,
    corpus: DataFrame,
    mode: str,
    k: int,
    keep_m: int,
    delta: float | None = None,
    max_corpus_rows: int = 1_000_000,
) -> DataFrame:
    """Per-query replica summary frame (one row per query).

    The replica intentionally collects the corpus to the driver and
    broadcasts it (the reference's sequential evolving-threshold scan
    is order-dependent and does not parallelize over the corpus) — a
    parity tool, not a production path. ``max_corpus_rows`` is a hard
    ceiling so a mistaken call on a large corpus fails fast instead of
    OOMing the driver."""
    if mode not in MODES:
        raise ValueError(f"unknown mode {mode!r}")
    spark = queries.sparkSession
    n_corpus = corpus.select("vec_id").limit(max_corpus_rows + 1).count()
    if n_corpus > max_corpus_rows:
        raise ValueError(
            f"refine_replica collects the corpus to the driver; corpus has "
            f"> {max_corpus_rows} rows. Use refine_topk/refine_metrics (the "
            f"distributed path) or raise max_corpus_rows explicitly."
        )
    corpus_pdf = corpus.select("vec_id", "embedding").toPandas()
    pack = _corpus_pack(corpus_pdf, mode, keep_m)
    bc = spark.sparkContext.broadcast(pack)
    cos = is_cosine(mode)

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for _, row in pdf.iterrows():
            q = np.asarray(row["embedding"], dtype=np.float32)
            if cos:
                q = (q / max(np.linalg.norm(q), 1e-12)).astype(np.float32)
            fin_ids, fin_scores, n_f, n_u, n_h = _scan_one_query(
                mode, k, q, bc.value, delta
            )
            out.append(
                {
                    "query_id": row["query_id"],
                    "neighbor_ids": list(fin_ids),
                    "scores": list(fin_scores),
                    "n_hits": n_h,
                    "n_fetched": n_f,
                    "n_unnecessary": n_u,
                }
            )
        return pd.DataFrame(out)

    return (
        queries.select("query_id", "embedding")
        .groupBy("query_id")
        .applyInPandas(per_query, schema=REPLICA_SCHEMA)
    )


def replica_topk(replica_df: DataFrame) -> DataFrame:
    """Explode the summary to the canonical top-K frame."""
    z = F.arrays_zip(
        F.col("neighbor_ids").alias("neighbor_id"), F.col("scores").alias("score")
    )
    ex = replica_df.select("query_id", F.posexplode(z).alias("pos", "pair"))
    return ex.select(
        "query_id",
        (F.col("pos") + 1).cast("int").alias("rank"),
        F.col("pair.neighbor_id").alias("neighbor_id"),
        F.col("pair.score").alias("score"),
    )


def replica_metrics(
    replica_df: DataFrame,
    mode: str,
    k: int,
    keep_m: int,
    n_corpus: int,
    dim: int,
    delta: float | None = None,
    keep_e: int = 5,
    red_bytes_override: float | None = None,
) -> DataFrame:
    """Reference-exact metrics row from the per-query summaries,
    reproducing the evolving-threshold byte accounting
    (``ANNCode.py:316-319, 368-370``)."""
    b_full = 16.0 * dim / 8.0
    b_red = (
        red_bytes_override
        if red_bytes_override is not None
        else (1 + keep_e + keep_m) * dim / 8.0
    )
    agg = replica_df.agg(
        F.count("*").alias("n_q"),
        F.sum("n_fetched").alias("fetches"),
        F.sum("n_unnecessary").alias("unnecessary"),
        F.sum("n_hits").alias("hits"),
    )
    total = F.lit(b_red) * F.lit(n_corpus) * F.col("n_q") + F.lit(b_full) * F.col("fetches")
    baseline = F.lit(b_full) * F.lit(n_corpus) * F.col("n_q")
    return agg.select(
        F.lit(mode).alias("mode"),
        F.lit(keep_m).alias("m_keep"),
        F.lit(float(delta) if delta is not None else 0.0).alias("delta"),
        (F.col("hits") / (F.col("n_q") * F.lit(float(k)))).alias("recall"),
        (F.lit(1.0) - total / baseline).alias("save"),
        (F.col("unnecessary") / (F.lit(n_corpus) * F.col("n_q"))).alias("fpr"),
    )
