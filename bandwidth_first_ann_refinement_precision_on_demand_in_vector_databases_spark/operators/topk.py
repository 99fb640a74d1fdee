"""Exact top-K similarity search (SURVEY §2.3 J1, §2.5 W1/W2).

The reference's flagship computation: for each query vector, the exact
top-K corpus neighbors under cosine similarity (unit space,
``ANNCode.py:264-271``) or squared Euclidean distance
(``ANNCode.py:274-281``).

Two physical realizations with identical results:

* ``exact_topk`` — pure DataFrame: broadcast the (small) query side
  into a cross join, score with Column expressions, then a *salted*
  two-phase top-K. Phase 1 ranks within ``(query_id, shard)`` so the
  q×N score set shuffles across q×P balanced keys instead of q skewed
  ones; phase 2 ranks the surviving q×P×k rows. This is the
  oracle-checkable plan and survives a 100× scale-up (per-query
  reducer skew is the classic failure mode it avoids).
* ``exact_topk_fast`` — ``mapInPandas`` over corpus partitions with
  the query matrix broadcast as NumPy: one BLAS matvec per partition,
  local top-K, then the tiny phase-2 merge. Same results, ~10-50×
  faster per byte; shuffle volume is O(q·P·k), independent of N.

Determinism: ties broken by ``neighbor_id`` ascending everywhere
(NumPy's argpartition tie order is unspecified; FIXTURES.md §C).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vector import cosine, dist2
from ..session import ensure_parallelism

TOPK_SCHEMA = "query_id bigint, rank int, neighbor_id bigint, score double"


def score_crossjoin(
    queries: DataFrame,
    corpus: DataFrame,
    metric: str = "cosine",
    query_col: str = "embedding",
    corpus_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """J1: θ-join of every query against every corpus vector.

    The query side is broadcast (it is always the small side —
    reference holds Q in memory per query loop, ``ANNCode.py:328-335``)
    so the corpus never shuffles: each corpus partition streams past an
    in-memory copy of Q. Returns (query_id, neighbor_id, score).
    """
    q = F.broadcast(
        queries.select(F.col("query_id"), F.col(query_col).alias("__q"))
    )
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(corpus_col).alias("__c"))
    )
    if metric == "cosine":
        score = cosine("__q", "__c")

    elif metric == "l2":
        score = dist2("__q", "__c")
    else:
        raise ValueError(f"unknown metric {metric!r}")
    return c.crossJoin(q).select("query_id", "neighbor_id", score.alias("score"))


def topk_per_query(
    scores: DataFrame,
    k: int,
    ascending: bool = False,
    salted: bool = True,
) -> DataFrame:
    """W1/W2: per-query top-K over a (query_id, neighbor_id, score) set.

    ``salted=True`` runs the two-phase plan (local rank within
    ``(query_id, shard)`` → global rank): identical output, no
    single-reducer-per-query skew at scale.
    """
    direction = F.col("score").asc() if ascending else F.col("score").desc()
    ordering = [direction, F.col("neighbor_id").asc()]

    if salted:
        local = Window.partitionBy("query_id", F.spark_partition_id()).orderBy(*ordering)
        scores = (
            scores.withColumn("__lr", F.row_number().over(local))
            .where(F.col("__lr") <= k)
            .drop("__lr")
        )

    final = Window.partitionBy("query_id").orderBy(*ordering)
    return (
        scores.withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "score")
    )


def exact_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    metric: str = "cosine",
    **score_kwargs,
) -> DataFrame:
    """Exact top-K, pure-DataFrame path. Cosine: score = cosine
    similarity, descending. L2: score = squared distance, ascending
    (reference keeps d², ``ANNCode.py:277``)."""
    scores = score_crossjoin(queries, corpus, metric=metric, **score_kwargs)
    return topk_per_query(scores, k, ascending=(metric == "l2"))


def exact_topk_pruned(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    metric: str = "cosine",
    margin: int = 8,
) -> DataFrame:
    """Exact top-K with a vectorized candidate pruner — the production
    plan behind the oracle-checked interface.

    Phase 1 (``mapInPandas``): one BLAS scoring pass per corpus
    partition selects the local top-(k+margin) candidate *ids* per
    query. Only ids leave the partition, so the shuffle is
    O(q·P·(k+margin)) longs — independent of N and of the vector width.

    Phase 2 re-scores just those candidates with the SAME Column
    expressions as ``exact_topk`` (``cosine``/``dist2`` strict DOUBLE
    folds): the candidate-id frame is broadcast back into the corpus
    scan (late materialization), so final ``(rank, score)`` values are
    bit-identical to the pure-DataFrame plan. BLAS float error can only
    affect which candidates are *seen*; the margin absorbs score
    reorderings many orders of magnitude larger than the ~1e-10
    expansion error, and the exact re-score fixes ranks and values.
    """
    spark = queries.sparkSession
    qpdf = queries.select("query_id", "embedding").toPandas()
    q_ids = qpdf["query_id"].to_numpy()
    q_mat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))
    ascending = metric == "l2"
    kk_target = k + margin

    def local_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        qn = mat_q / np.maximum(np.linalg.norm(mat_q, axis=1, keepdims=True), 1e-12)
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["vec_id"].to_numpy()
            c_mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if metric == "cosine":
                cn = c_mat / np.maximum(
                    np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12
                )
                key = -(cn @ qn.T)  # (n_c, n_q), minimize
            else:
                key = (
                    (c_mat * c_mat).sum(axis=1)[:, None]
                    - 2.0 * (c_mat @ mat_q.T)
                    + (mat_q * mat_q).sum(axis=1)[None, :]
                )
            kk = min(kk_target, key.shape[0])
            part = np.argpartition(key, kk - 1, axis=0)[:kk]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids_q.astype(np.int64), kk),
                    "neighbor_id": c_ids[part.T.ravel()].astype(np.int64),
                }
            )

    candidates = corpus.select("vec_id", "embedding").mapInPandas(
        local_candidates, schema="query_id bigint, neighbor_id bigint"
    )

    # phase 2: exact re-score of the candidate pairs only. The tiny id
    # frame broadcasts into the corpus scan — the corpus itself never
    # shuffles and its vectors are read once.
    pairs = (
        corpus.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__c"))
        .join(F.broadcast(candidates), "neighbor_id")
        .join(
            F.broadcast(queries.select("query_id", F.col("embedding").alias("__q"))),
            "query_id",
        )
    )
    score = cosine("__q", "__c") if metric == "cosine" else dist2("__q", "__c")
    scored = pairs.select("query_id", "neighbor_id", score.alias("score"))
    return topk_per_query(scored, k, ascending=ascending, salted=False)


def exact_topk_fixture_cached(
    spark, sf_dir: str, k: int, metric: str = "cosine"
) -> DataFrame:
    """Memoized+persisted exact top-K over the fixture query view,
    keyed per session by (fixture dir, metric, k): four registry
    queries (both topk_*_exact, the recall join, and every
    ann_*_recall ground truth) consume the identical frame — at
    production scale this is the ground-truth table a pipeline
    materializes once. Released by ``session.clear_caches``.

    Runs the pruned plan (``exact_topk_pruned``): identical output to
    ``exact_topk`` — same Column-fold score arithmetic on the survivors
    — behind the same oracle-checked interface, with the q×N fold
    evaluation replaced by a BLAS pruner."""
    from ..session import session_cache
    from ..sources.fixtures import load_table, queries_view

    cache = session_cache(spark, "exact_topk")
    key = (sf_dir, metric, k)
    df = cache.get(key)
    if df is None:
        df = exact_topk_pruned(
            queries_view(spark, sf_dir),
            load_table(spark, sf_dir, "embeddings"),
            k,
            metric=metric,
        ).persist()
        cache[key] = df
    return df


def exact_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    metric: str = "cosine",
    normalized: bool = False,
) -> DataFrame:
    """Exact top-K, vectorized path: per-partition BLAS + local top-K
    inside ``mapInPandas``, then a global merge of q×P×k candidates.

    ``normalized=True`` skips unit-normalization for cosine (corpus
    already in unit space). Scores are computed in float64 to match
    the Column-expression path's DOUBLE folds within fp tolerance —
    exact row/rank equality is enforced by the same
    (score, neighbor_id) tie-break.
    """
    spark = queries.sparkSession
    qpdf = queries.select("query_id", "embedding").toPandas()
    q_ids = qpdf["query_id"].to_numpy()
    q_mat = np.stack(qpdf["embedding"].to_numpy()).astype(np.float64)
    if metric == "cosine" and not normalized:
        q_mat = q_mat / np.maximum(np.linalg.norm(q_mat, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    ascending = metric == "l2"

    def local_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids_q, mat_q = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            c_ids = pdf["vec_id"].to_numpy()
            c_mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            if metric == "cosine":
                if not normalized:
                    c_mat = c_mat / np.maximum(
                        np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-12
                    )
                scores = c_mat @ mat_q.T  # (n_c, n_q)
            else:
                # ||c-q||^2 = ||c||^2 - 2 c.q + ||q||^2
                scores = (
                    (c_mat * c_mat).sum(axis=1)[:, None]
                    - 2.0 * (c_mat @ mat_q.T)
                    + (mat_q * mat_q).sum(axis=1)[None, :]
                )
            kk = min(k, scores.shape[0])
            # partial selection then exact sort of the k survivors
            key = scores if ascending else -scores
            part = np.argpartition(key, kk - 1, axis=0)[:kk]
            out_frames = []
            for j, qid in enumerate(ids_q):
                idx = part[:, j]
                sel = key[idx, j]
                order = np.lexsort((c_ids[idx], sel))
                idx = idx[order]
                out_frames.append(
                    pd.DataFrame(
                        {
                            "query_id": np.int64(qid),
                            "neighbor_id": c_ids[idx].astype(np.int64),
                            "score": scores[idx, j],
                        }
                    )
                )
            yield pd.concat(out_frames, ignore_index=True)

    candidates = corpus.select("vec_id", "embedding").mapInPandas(
        local_topk, schema="query_id bigint, neighbor_id bigint, score double"
    )
    return topk_per_query(candidates, k, ascending=ascending, salted=False)


def exact_cosine_rerank(
    cand_ids: DataFrame, corpus: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """The shared phase-2 tail of every two-stage family (BQ, IVF-BQ,
    PQ, SQ, MRL, MaxSim candidates): late-materialize full precision
    for a per-query candidate id stream and return the exact cosine
    top-K (descending, ties → neighbor_id). One contract, one place —
    the tie-break / rounding / column conventions of the re-rank must
    never diverge between families, because every family's DuckDB
    twin replays exactly this block."""
    full = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    q = F.broadcast(queries.select("query_id", F.col("embedding").alias("qv")))
    exact = (
        cand_ids.select("query_id", "neighbor_id")
        .join(full, "neighbor_id")
        .join(q, "query_id")
        .select("query_id", "neighbor_id", cosine("qv", "embedding").alias("score"))
    )
    return topk_per_query(exact, k, ascending=False, salted=False)


def exact_l2_rerank(
    cand_ids: DataFrame, corpus: DataFrame, queries: DataFrame, k: int
) -> DataFrame:
    """The L2 twin of ``exact_cosine_rerank`` — the shared phase-2
    tail of the distance-metric families (PQ, SQ, IVF-PQ, IVF-SQ):
    squared-L2 top-K (ascending, ties → neighbor_id) over a per-query
    candidate id stream, full precision fetched late."""
    from ..functions.vector import dist2

    full = corpus.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    q = F.broadcast(queries.select("query_id", F.col("embedding").alias("qv")))
    exact = (
        cand_ids.select("query_id", "neighbor_id")
        .join(full, "neighbor_id")
        .join(q, "query_id")
        .select("query_id", "neighbor_id", dist2("qv", "embedding").alias("score"))
    )
    return topk_per_query(exact, k, ascending=True, salted=False)
