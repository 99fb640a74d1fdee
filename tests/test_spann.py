"""SPANN closure-assignment postings + query-aware probe pruning
(operators/spann.py — Chen et al. NeurIPS 2021).

The oracle gate (test_registry_oracle) already hash-checks
``ann_spann_topk`` / ``ann_spann_recall`` / ``spann_posting_stats``
against DuckDB; these tests pin the operator-level CONTRACTS the hash
cannot see: the degenerate-parameter equivalence to ``ivf_assign``,
the replication cap, the nearest-cell guarantee, the recall-per-
scanned-row WIN over plain IVF that justified registration, and the
map-only (shuffle-free) assignment plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    simsearch as S,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    spann as SP,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    exact_topk_fixture_cached,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

K = 20


@pytest.fixture(scope="module")
def corpus(spark, sf_small):
    return load_table(spark, sf_small, "embeddings").localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def cents(spark, corpus):
    return S.ivf_centroids(corpus)


def test_degenerate_closure_equals_ivf_assign(corpus, cents):
    """eps=0, max_assign=1 must reproduce ivf_assign's cell choice
    exactly, tie-break included — the closure family strictly contains
    plain IVF assignment."""
    a1 = SP.closure_cells(corpus, cents, 0.0, 1).select("vec_id", "cell")
    a2 = S.ivf_assign(corpus, cents).select("vec_id", "cell")
    n = corpus.count()
    assert a1.count() == n
    assert a1.join(a2, ["vec_id", "cell"]).count() == n


def test_nearest_cell_always_posted_and_cap_respected(corpus, cents):
    """Every vector's posting set includes its ivf_assign cell (the
    closure threshold is >= the min by construction) and never exceeds
    SPANN_MAX_REPLICAS postings."""
    posted = SP.spann_postings(corpus, cents)
    nearest = S.ivf_assign(corpus, cents).select("vec_id", "cell")
    n = corpus.count()
    assert posted.join(nearest, ["vec_id", "cell"]).count() == n
    reps = posted.groupBy("vec_id").agg(F.count(F.lit(1)).alias("r"))
    assert reps.where(F.col("r") > SP.SPANN_MAX_REPLICAS).count() == 0
    assert reps.count() == n  # no vector dropped


def test_probe_set_bounded_and_nonempty(spark, sf_small, cents):
    q = queries_view(spark, sf_small)
    probes = SP.spann_probes(q, cents)
    per_q = probes.groupBy("query_id").agg(F.count(F.lit(1)).alias("r"))
    assert per_q.where(F.col("r") > SP.SPANN_NPROBE_MAX).count() == 0
    assert per_q.count() == q.count()


def test_spann_beats_ivf_recall_at_matched_scan_budget(spark, sf_small, corpus, cents):
    """The registration claim (reports/SPANN.md): at a scanned-row
    budget no larger than IVF nprobe=3's, SPANN's recall@20 must be
    at least IVF nprobe=3's — boundary replication buys back the
    boundary misses a fixed nprobe pays for forever."""
    q = queries_view(spark, sf_small)
    exact = exact_topk_fixture_cached(spark, sf_small, K, "cosine")

    ivf_rows = (
        S.ivf_probes(q, cents, 3).join(S.ivf_assign(corpus, cents), "cell").count()
    )
    sp_rows = (
        F.broadcast(SP.spann_probes(q, cents))
        .join(SP.spann_postings(corpus, cents), "cell")
        .count()
    )
    assert sp_rows <= ivf_rows, (sp_rows, ivf_rows)

    r_ivf = S.ann_recall(S.ivf_topk(q, corpus, K), exact, K).collect()[0][
        "recall_at_k"
    ]
    r_sp = S.ann_recall(SP.spann_topk(q, corpus, K), exact, K).collect()[0][
        "recall_at_k"
    ]
    assert r_sp >= r_ivf, (r_sp, r_ivf)


def test_closure_assignment_plan_is_map_only(corpus, cents):
    """The scale claim in the module docstring: corpus-side closure
    assignment has NO exchange on the corpus path — the only exchange
    permitted is the one-row centroid-array scalar aggregate that
    feeds the broadcast. A shuffle of the corpus here would be the
    ivf_assign argmin shuffle sneaking back in."""
    posted = SP.spann_postings(corpus, cents)
    plan = posted._jdf.queryExecution().executedPlan().toString()
    exchanges = [
        ln for ln in plan.splitlines() if ln.strip().startswith("Exchange ")
    ]
    assert all("SinglePartition" in ln for ln in exchanges), plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
