"""Exact-replica path: cross-checks against the scalable path and the
paper's invariants, plus a frozen golden run on the seeded demo
corpus (SURVEY §5 items 3-4)."""

from __future__ import annotations

import pytest

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    refine_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine_replica import (
    refine_replica,
    refine_replica_collected,
    replica_metrics,
    replica_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.plans.sweep import (
    sweep_metrics,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
    synthetic_corpus,
)

K = 10
ZERO_MISS = ("cos-l1", "cos-l2", "l2-sym", "l2-tz")
ALL_MODES = ZERO_MISS + ("cos-hoeff", "l2-hoeff")


@pytest.mark.parametrize("mode", ALL_MODES)
def test_partitioned_replica_equals_collected(spark, sf_small, mode):
    """The corpus-partitioned replica is bit-identical to the
    single-stream scan — result sets, scores AND the order-sensitive
    byte accounting (n_fetched / n_unnecessary / n_hits) — for every
    mode, including the Hoeffding cushions whose *results* depend on
    scan order. Runs with a repartitioned corpus so the partial
    top-K / survivor merge is actually exercised across partitions."""
    delta = 0.7 if "hoeff" in mode else None
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings").repartition(7)
    part = (
        refine_replica(queries, corpus, mode, K, keep_m=4, delta=delta)
        .toPandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    coll = (
        refine_replica_collected(queries, corpus, mode, K, keep_m=4, delta=delta)
        .toPandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    assert len(part) == len(coll) and len(part) > 0
    for col in ("query_id", "n_hits", "n_fetched", "n_unnecessary"):
        assert part[col].tolist() == coll[col].tolist(), col
    for a, b in zip(part["neighbor_ids"], coll["neighbor_ids"]):
        assert list(a) == list(b)
    for a, b in zip(part["scores"], coll["scores"]):
        assert list(a) == list(b)


@pytest.mark.parametrize("mode", ZERO_MISS)
def test_replica_topk_equals_dataframe_path(spark, sf_small, mode):
    """Zero-miss cushions: evolving vs fixed threshold must return the
    identical final top-K (both equal the exact top-K)."""
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    rep = replica_topk(refine_replica(queries, corpus, mode, K, keep_m=4)).toPandas()
    df = refine_topk(queries, corpus, mode, K, keep_m=4).topk.toPandas()
    key = ["query_id", "rank"]
    assert (
        rep.sort_values(key)["neighbor_id"].tolist()
        == df.sort_values(key)["neighbor_id"].tolist()
    )


@pytest.mark.parametrize("mode", ZERO_MISS)
def test_replica_fetches_no_more_than_fixed_tau(spark, sf_small, mode):
    """The evolving threshold only tightens ⇒ the replica fetches a
    subset of the fixed-τ₀ path's fetch set."""
    queries = queries_view(spark, sf_small).limit(4)
    corpus = load_table(spark, sf_small, "embeddings")
    rep_fetched = (
        refine_replica(queries, corpus, mode, K, keep_m=6)
        .agg({"n_fetched": "sum"})
        .collect()[0][0]
    )
    df_fetched = refine_topk(queries, corpus, mode, K, keep_m=6).fetched.count()
    assert rep_fetched <= df_fetched


def test_replica_metrics_zero_miss_recall(spark, sf_small):
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    n = corpus.count()
    rep = refine_replica(queries, corpus, "l2-tz", K, keep_m=6)
    row = replica_metrics(rep, "l2-tz", K, 6, n, dim=64).collect()[0]
    assert row["recall"] == 1.0
    assert 0.0 <= row["fpr"] <= 1.0
    assert row["save"] <= 1.0


def test_golden_demo_metrics(spark):
    """Frozen end-to-end run on the engine's seeded demo corpus
    (reference demo shape N=2000 D=128 q=30, ``ANNCode.py:816-819``;
    engine RNG differs per-loader docs, so goldens are engine-frozen).
    Guards against silent numeric drift in the whole pipeline."""
    corpus = synthetic_corpus(spark, n_rows=500, dim=64, seed=42, partitions=4)
    queries = (
        synthetic_corpus(spark, n_rows=8, dim=64, seed=7, partitions=1)
        .withColumnRenamed("vec_id", "query_id")
    )
    rep = refine_replica(queries, corpus, "cos-l1", 20, keep_m=6)
    row = replica_metrics(rep, "cos-l1", 20, 6, 500, dim=64).collect()[0]
    assert row["recall"] == 1.0
    # frozen on first run; fails loudly if byte accounting/cushions drift
    assert row["save"] == pytest.approx(GOLDEN_COS_L1["save"], abs=1e-9)
    assert row["fpr"] == pytest.approx(GOLDEN_COS_L1["fpr"], abs=1e-9)


GOLDEN_COS_L1 = {"save": 0.14400000000000002, "fpr": 0.066}  # frozen 1st run


def test_sweep_grid_shape(spark, sf_small):
    queries = queries_view(spark, sf_small).limit(3)
    corpus = load_table(spark, sf_small, "embeddings")
    grid = sweep_metrics(queries, corpus, "cos-hoeff", K, m_keeps=[6, 4], deltas=[0.7, 0.3])
    pdf = grid.toPandas()
    assert len(pdf) == 4
    assert set(zip(pdf["m_keep"], pdf["delta"])) == {(6, 0.7), (6, 0.3), (4, 0.7), (4, 0.3)}


def _reference_cos_l2_raw(corpus_pdf, q_raw, k):
    """Reference ``refine_cos_l2`` semantics coded directly from the
    published algorithm (``ANNCode.py:431-480`` with the CLI's inputs,
    ``ANNCode.py:825-849``): fetch space = unit(RAW float32 corpus),
    cushion B = ||unit(raw) − unit(reduced)||, ground truth = top-k in
    the fp16-rounded unit space (``ANNCode.py:837``). Ties order by
    vec_id (the engine's documented determinism deviation). Returns
    (ids, scores, n_fetched, n_unnecessary, n_hits) for one query."""
    import numpy as np

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.fp16 import (
        fp16_round_np,
        reduce_precision_np,
    )

    def unit(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        return (m / np.maximum(n, 1e-12)).astype(np.float32)

    ids = corpus_pdf["vec_id"].to_numpy()
    raw = np.stack(corpus_pdf["embedding"].to_numpy()).astype(np.float32)
    red, _ = reduce_precision_np(raw, 4)
    DBu = unit(raw)                      # raw fetch space (the quirk)
    DBru = unit(red)
    gt_space = unit(fp16_round_np(raw))  # gt stays fp16 space
    diff = DBu - DBru
    B = np.sqrt((diff * diff).sum(axis=1)).astype(np.float32)
    qn = (q_raw / max(np.linalg.norm(q_raw), 1e-12)).astype(np.float32)

    s_hat = np.add.reduce(DBru * qn[None, :], axis=1).astype(np.float32)
    exact = np.add.reduce(DBu * qn[None, :], axis=1).astype(np.float32)
    gt_scores = np.add.reduce(gt_space * qn[None, :], axis=1).astype(np.float32)
    gt = set(ids[np.lexsort((ids, -gt_scores))[:k]].tolist())

    order = np.lexsort((ids, -s_hat))
    seed, rest = order[:k], order[k:]
    top_s = exact[seed].astype(np.float32)
    top_i = ids[seed].copy()
    fetched = list(ids[seed])
    n_fetched = len(seed)
    wp = int(np.argmin(top_s))
    worst = float(top_s[wp])
    for idx in rest:
        if float(s_hat[idx]) + float(B[idx]) < worst:
            continue
        n_fetched += 1
        fetched.append(ids[idx])
        sx = float(exact[idx])
        if sx > worst:
            top_s[wp] = sx
            top_i[wp] = ids[idx]
            wp = int(np.argmin(top_s))
            worst = float(top_s[wp])
    fin = np.lexsort((top_i, -top_s))
    fin_ids = top_i[fin]
    fin_set = set(fin_ids.tolist())
    n_unnecessary = sum(1 for i in fetched if i not in fin_set)
    return (
        fin_ids.tolist(),
        top_s[fin].astype(float).tolist(),
        n_fetched,
        n_unnecessary,
        len(gt & fin_set),
    )


def test_raw_full_replays_reference_cos_l2(spark, sf_small):
    """``raw_full=True`` must reproduce the reference's cos-l2
    semantics exactly: unrounded corpus in the fetch space + cushion,
    fp16-rounded ground truth (``ANNCode.py:849,764,837``) — the one
    deliberate semantic deviation of the engine, now reproducible."""
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    got = (
        refine_replica_collected(
            queries, corpus, "cos-l2", K, keep_m=4, raw_full=True
        )
        .toPandas()
        .sort_values("query_id")
        .reset_index(drop=True)
    )
    corpus_pdf = corpus.select("vec_id", "embedding").toPandas()
    q_pdf = queries.select("query_id", "embedding").toPandas()
    import numpy as np

    for _, qrow in q_pdf.iterrows():
        ref = _reference_cos_l2_raw(
            corpus_pdf, np.asarray(qrow["embedding"], dtype=np.float32), K
        )
        mine = got[got["query_id"] == qrow["query_id"]].iloc[0]
        assert list(mine["neighbor_ids"]) == ref[0]
        assert [float(s) for s in mine["scores"]] == pytest.approx(ref[1], abs=0)
        assert (mine["n_fetched"], mine["n_unnecessary"], mine["n_hits"]) == (
            ref[2], ref[3], ref[4],
        )


def test_raw_full_partitioned_equals_collected(spark, sf_small):
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings").repartition(7)
    part = (
        refine_replica(queries, corpus, "cos-l2", K, keep_m=4, raw_full=True)
        .toPandas().sort_values("query_id").reset_index(drop=True)
    )
    coll = (
        refine_replica_collected(
            queries, corpus, "cos-l2", K, keep_m=4, raw_full=True
        )
        .toPandas().sort_values("query_id").reset_index(drop=True)
    )
    assert len(part) == len(coll) > 0
    for col in ("query_id", "n_hits", "n_fetched", "n_unnecessary"):
        assert part[col].tolist() == coll[col].tolist(), col
    for a, b in zip(part["neighbor_ids"], coll["neighbor_ids"]):
        assert list(a) == list(b)


def test_raw_full_rejected_outside_cos_l2(spark, sf_small):
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    with pytest.raises(ValueError, match="cos-l2"):
        refine_replica_collected(
            queries, corpus, "cos-hoeff", K, keep_m=4, delta=0.7, raw_full=True
        ).collect()
