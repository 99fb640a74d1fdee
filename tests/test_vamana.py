"""Vamana α-pruned graph build (operators/vamana.py): prune-fold
semantics, edge-set invariants, and the construction-quality claim
(the r09 verdict's "construction-limited family" fix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    simsearch as S,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    vamana as V,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    exact_topk_fixture_cached,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

K = 20


def _python_robust_prune(elems: list[int], degree: int) -> int:
    """Reference fold: sequential RobustPrune over (bit, occ)-encoded
    candidates — keep j iff budget open and no kept closer candidate
    occludes it. Mirrors the SQL/Spark fold bit-for-bit."""
    acc = 0
    for e in elems:
        bit, occ = divmod(e, V._ENC)
        cnt, mask = divmod(acc, V._CNT)
        if cnt < degree and (mask & occ) == 0:
            acc = acc + V._CNT + bit
    return acc


def test_prune_fold_matches_python_replica(spark):
    """The registered Spark fold expression equals the sequential
    reference on crafted pools: occlusion chains, budget exhaustion,
    and the all-kept case."""
    cases = [
        # three candidates, second occluded by first
        [(1 << 25) * 1 + 0, (1 << 25) * 2 + 1, (1 << 25) * 4 + 0],
        # occlusion by a candidate that was itself occluded (bit 1 is
        # dropped, so bit 2's occ mask referencing bit 1 never fires)
        [(1 << 25) * 1 + 0, (1 << 25) * 2 + 1, (1 << 25) * 4 + 2],
        # budget exhaustion at degree 2
        [(1 << 25) * 1, (1 << 25) * 2, (1 << 25) * 4, (1 << 25) * 8],
        [],
    ]
    for degree in (2, 16):
        for elems in cases:
            want = _python_robust_prune(elems, degree)
            got = spark.sql(
                f"SELECT aggregate(array({', '.join(f'CAST({e} AS BIGINT)' for e in elems)}), "
                f"CAST(0 AS BIGINT), (acc, e) -> "
                f"IF((acc div {V._CNT}) < {degree} "
                f"AND ((acc % {V._CNT}) & (e % {V._ENC})) = 0, "
                f"acc + {V._CNT} + (e div {V._ENC}), acc)) AS acc"
                if elems
                else f"SELECT CAST(0 AS BIGINT) AS acc"
            ).collect()[0].acc
            assert got == want, (degree, elems)


def test_vamana_edges_invariants(spark, sf_small):
    """Symmetric, self-loop-free, and every directed kept edge comes
    from the candidate pool (the prune only drops, never invents)."""
    corpus = load_table(spark, sf_small, "embeddings")
    edges = V.vamana_edges(corpus, cache_key=f"test:{sf_small}")
    rows = {(r.src, r.dst) for r in edges.collect()}
    assert rows, "empty graph"
    assert all(s != d for s, d in rows)
    assert all((d, s) in rows for s, d in rows), "not symmetric"
    base = S.symmetric_knn_edges(corpus, S.GRAPH_DEGREE, cache_key=f"test-base:{sf_small}")
    pool = {
        (r.node_id, r.cand_id)
        for r in V.vamana_candidate_pool(corpus, base).collect()
    }
    assert all((s, d) in pool or (d, s) in pool for s, d in rows)


def test_vamana_beats_banded_walk_recall(spark, sf_small):
    """The headline claim: at the same degree budget and walk
    parameters, the α-pruned graph's beam-walk recall@20 strictly
    exceeds the banded build's (0.915 vs 0.785 at sf0.001)."""
    corpus = load_table(spark, sf_small, "embeddings")
    queries = queries_view(spark, sf_small)
    exact = exact_topk_fixture_cached(spark, sf_small, K, "cosine")
    ve = V.vamana_edges(corpus, cache_key=f"test:{sf_small}")
    be = S.symmetric_knn_edges(corpus, S.GRAPH_DEGREE, cache_key=f"test-base:{sf_small}")
    rv = S.ann_recall(
        S.graph_topk_from_index(queries, corpus, ve, K), exact, K
    ).collect()[0].recall_at_k
    rb = S.ann_recall(
        S.graph_topk_from_index(queries, corpus, be, K), exact, K
    ).collect()[0].recall_at_k
    assert rv > rb, (rv, rb)
    assert rv >= 0.85


def test_vamana_directed_degree_bounded(spark, sf_small):
    """The prune's kept-set size never exceeds the degree budget:
    every node's directed out-degree ≤ VAMANA_DEGREE, and the nearest
    candidate (j = 0) is always kept."""
    corpus = load_table(spark, sf_small, "embeddings")
    base = S.symmetric_knn_edges(corpus, S.GRAPH_DEGREE, cache_key=f"test-base:{sf_small}")
    kept = V.vamana_kept_edges(corpus, base).persist()
    mx = kept.groupBy("src").count().agg(F.max("count")).collect()[0][0]
    assert mx <= V.VAMANA_DEGREE
    nearest = V.vamana_candidate_pool(corpus, base).where(F.col("j") == 0)
    n_nodes = nearest.count()
    n_kept_nearest = nearest.join(
        kept.select(F.col("src").alias("node_id"), F.col("dst").alias("cand_id")),
        ["node_id", "cand_id"],
    ).count()
    assert n_kept_nearest == n_nodes


def test_vamana_delta_insert_invariants(spark, sf_small):
    """The COMPLETE DiskANN insert (r11): inserted nodes link through
    the same occlusion discipline as the batch build, every resident
    that receives a reverse edge merges (and on overflow re-prunes)
    its adjacency, and the output is the replacement adjacency of
    every touched src — so EVERY emitted src has out-degree ≤
    VAMANA_DEGREE, no self-links, and the reverse edges live inside
    the resident lists rather than as a blind symmetric union."""
    from collections import Counter

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.mutate import (
        fixture_mutation,
    )
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
        beam_candidates,
    )

    corpus = load_table(spark, sf_small, "embeddings")
    upserts, _ = fixture_mutation(corpus)
    edges = V.vamana_edges(corpus, cache_key=f"test:{sf_small}")
    out = V.vamana_delta_edges(upserts, corpus, edges).persist()
    rows = {(r.src, r.dst) for r in out.collect()}
    assert rows
    assert all(s != d for s, d in rows)
    deg = Counter(s for s, _ in rows)
    assert max(deg.values()) <= V.VAMANA_DEGREE, "replacement lists overflow"
    # rebuild the inserted-side kept set through the same exposed
    # pieces: its srcs are the batch; non-affected batch srcs pass
    # through verbatim, and every kept link targets a visited resident
    cand = beam_candidates(
        upserts.select(F.col("vec_id").alias("query_id"), "embedding"),
        corpus,
        edges,
    ).persist()
    kept = V.robust_prune_pool(
        V.index_pool(cand.where(F.col("vec_id") != F.col("query_id"))),
        corpus,
    ).persist()
    assert kept.count() > 0, "no forward insert links"
    kdeg = Counter(r.src for r in kept.collect())
    assert max(kdeg.values()) <= V.VAMANA_DEGREE
    visited = {(r.query_id, r.vec_id) for r in cand.collect()}
    assert all((r.src, r.dst) in visited for r in kept.collect())
    krows = {(r.src, r.dst) for r in kept.collect()}
    affected = {d for _, d in krows}
    for s, d in krows:
        if s not in affected:
            assert (s, d) in rows, "untouched inserted list must pass through"
    # every affected resident emits a replacement list that contains
    # at least one reverse edge or pruned survivor, and ALL emitted
    # resident lists respect the budget (checked globally above)
    out_srcs = {s for s, _ in rows}
    assert affected <= out_srcs, "every affected resident must be re-emitted"


@pytest.mark.slow  # multi-batch property sweep (~40s): slow tier, r12 VERDICT #2
def test_vamana_delta_resident_degree_bounded_over_batches(spark, sf_small):
    """The r10 gap, closed (Subramanya et al. 2019 Alg. 2 step 3):
    under k=3 SEQUENTIAL insert batches with per-src replacement
    merge, every node any batch touched keeps directed out-degree ≤
    VAMANA_DEGREE in the merged edge table. The pre-fix operator
    (blind symmetric append) fails this by round 1: measured max
    out-degree 42 at sf0.001 with 462/500 nodes over budget."""
    corpus = (
        load_table(spark, sf_small, "embeddings")
        .select("vec_id", "embedding")
        .localCheckpoint(eager=True)
    )
    edges = V.vamana_edges(corpus, cache_key=f"test-seq:{sf_small}")
    touched: set[int] = set()
    for mod, rem in ((11, 5), (7, 3), (5, 2)):
        delta = corpus.where(F.col("vec_id") % mod == rem).select(
            "vec_id", F.reverse("embedding").alias("embedding")
        )
        out = V.vamana_delta_edges(delta, corpus, edges).localCheckpoint(eager=True)
        srcs = out.select("src").distinct()
        touched |= {r.src for r in srcs.collect()}
        # per-src replacement merge (the operator's declared contract)
        edges = (
            edges.join(srcs, "src", "left_anti")
            .unionByName(out)
            .localCheckpoint(eager=True)
        )
        # post-batch corpus: batch members carry their new vectors
        corpus = (
            corpus.join(delta.select("vec_id"), "vec_id", "left_anti")
            .unionByName(delta)
            .localCheckpoint(eager=True)
        )
    deg = {
        r.src: r["count"]
        for r in edges.groupBy("src").count().collect()
        if r.src in touched
    }
    assert deg, "no touched nodes"
    assert max(deg.values()) <= V.VAMANA_DEGREE, (
        "resident out-degree grew past the budget under sustained ingest: "
        f"max={max(deg.values())}"
    )


def test_delta_edges_dangling_dst_fails_loud(spark):
    """r11 ADVICE #3: a stored edge whose dst id is absent from the
    corpus frame must raise, not silently vanish from the resident
    merge (which would undercount the degree the re-prune decision
    uses once deletes exist)."""
    import pytest

    dim = 4
    base = [(i, [float((i >> b) & 1) for b in range(dim)]) for i in range(8)]
    corpus = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    # ring adjacency, plus an edge from EVERY node to id 99 which is
    # NOT in the corpus — whichever residents the insert touches, their
    # stored adjacency carries a dangling dst
    ring = [(i, (i + 1) % 8) for i in range(8)] + [(i, 99) for i in range(8)]
    edges = spark.createDataFrame(ring, "src long, dst long")
    delta = spark.createDataFrame(
        [(100, [0.9] * dim)], "vec_id long, embedding array<float>"
    )
    with pytest.raises(Exception, match="endpoint absent from corpus"):
        V.vamana_delta_edges(delta, corpus, edges, degree=3).collect()


@pytest.mark.slow  # planted-component walk property: slow tier, r12 VERDICT #2
def test_reachability_stat_catches_planted_disconnected_component(spark):
    """VERDICT r11 stretch #9: the walk-horizon coverage stat must be
    load-bearing, not always-1.0. Plant a component that is (a)
    disconnected in the REAL built graph (two antipodal clusters —
    every node's top-16 cosine neighbors are in-cluster, so the
    banded KNN base, the 2-hop pool, and the symmetrized prune all
    stay inside the component) and (b) invisible to the stride entry
    predicate (all its ids ≡ 1 mod BEAM_ENTRY_STRIDE). RED: the blind
    stride walk reports coverage < 1 and reaches zero planted nodes —
    recall on that component is capped by the ENTRY SET at any beam
    width. GREEN: augmenting the entries with a sparse offset stride
    (every 5th planted id — the repair lever documented on
    ``walk_reachability``) restores coverage 1.0 with the stored
    graph untouched."""
    import numpy as np

    stride = S.BEAM_ENTRY_STRIDE
    dim = 16
    rng = np.random.default_rng(7)
    a_ids = [i for i in range(150) if i % stride != 1]
    b_ids = [1000 + stride * j + 1 for j in range(150)]
    rows = []
    for i in a_ids:
        v = rng.normal(0.0, 0.05, dim)
        v[0] += 1.0
        rows.append((i, [float(x) for x in v]))
    for i in b_ids:
        v = rng.normal(0.0, 0.05, dim)
        v[0] -= 1.0
        rows.append((i, [float(x) for x in v]))
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    edges = V.vamana_edges(corpus, cache_key="planted-disconnect").localCheckpoint(
        eager=True
    )
    # the planted component really is disconnected in the built graph
    cross = edges.where(
        ((F.col("src") >= 1000) & (F.col("dst") < 1000))
        | ((F.col("src") < 1000) & (F.col("dst") >= 1000))
    ).count()
    assert cross == 0, f"clusters not separated in the built graph: {cross} edges"

    blind = corpus.where(F.col("vec_id") % stride == 0).select(
        F.col("vec_id").alias("node")
    )
    reached = S.walk_reachability(blind, edges, S.BEAM_ROUNDS)
    n_total = len(rows)
    n_blind = reached.count()
    assert n_blind < n_total, "stat blind to the planted component"
    assert reached.where(F.col("node") >= 1000).count() == 0

    # repair: sparse offset entries inside the planted residue class
    # (every 5th planted id) — entry augmentation, graph unchanged
    extra = corpus.where(F.col("vec_id") % (5 * stride) == 1).select(
        F.col("vec_id").alias("node")
    )
    assert 0 < extra.count() < len(b_ids)
    repaired = S.walk_reachability(blind.unionByName(extra), edges, S.BEAM_ROUNDS)
    assert repaired.count() == n_total, "entry augmentation must restore coverage 1.0"
