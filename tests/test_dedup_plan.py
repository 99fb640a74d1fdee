"""Scale-shape assertions for the dedup family (VERDICT r02 #2/#3):
the registered embedding near-dup plan must be the banded equi-join —
no cartesian/nested-loop product — and exact dedup must shuffle on the
text hash, never the document body. The quadratic triangular join stays
here as a fixture-scale semantic cross-check only."""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    dedup as D,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
)


def _phys(df, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def test_dedup_embedding_plan_has_no_cartesian_product(spark, sf_small):
    emb = load_table(spark, sf_small, "embeddings")
    plan = _phys(D.embedding_neardup_lsh(emb, threshold=0.35))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dedup_embedding_lsh_pairs_subset_of_exact(spark, sf_small):
    """Banding only drops pairs (s-curve recall), never invents them:
    every banded pair must appear in the exact triangular join with
    the identical cosine."""
    emb = load_table(spark, sf_small, "embeddings")
    banded = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in D.embedding_neardup_lsh(emb, threshold=0.35).collect()
    }
    exact = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in D.embedding_neardup_pairs(emb, threshold=0.35).collect()
    }
    assert banded, "banding produced no candidate pairs at fixture scale"
    for pair, cos in banded.items():
        assert pair in exact
        assert cos == exact[pair]


def test_exact_dedup_shuffles_hash_not_text(spark, sf_small):
    """The primary aggregation exchange must partition on the xxhash64
    key, not the document text (hash-first bucketing)."""
    docs = load_table(spark, sf_small, "documents")
    # simple mode inlines partitioning expressions on the Exchange line
    plan = _phys(D.exact_dedup(docs), mode="simple")
    assert "xxhash64" in plan
    exchanges = [
        line for line in plan.splitlines() if "Exchange hashpartitioning" in line
    ]
    assert exchanges, plan
    assert any("__h" in line for line in exchanges)
    # the body may be shuffled ONLY in the collision-resolution branch,
    # whose partitioning includes the primary hash key __h; the main
    # aggregation exchanges must partition on hash columns alone
    for line in exchanges:
        if "text#" in line or "__t#" in line:
            assert "__h#" in line, line


def test_exact_dedup_matches_naive_groupby(spark, sf_small):
    """Hash-first + collision resolution ≡ GROUP BY lower(text)."""
    docs = load_table(spark, sf_small, "documents")
    got = sorted(
        (r["canonical_id"], r["n_copies"]) for r in D.exact_dedup(docs).collect()
    )
    want = sorted(
        (r["canonical_id"], r["n_copies"])
        for r in docs.groupBy(F.lower("text"))
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_copies"))
        .collect()
    )
    assert got == want


def test_exact_dedup_collision_resolution_branch(spark):
    """Force the collision detector: two distinct texts in the same
    primary-hash bucket must not merge. We cannot fabricate a real
    xxhash64 collision, so patch the bucket key to a constant and
    check the resolver reproduces the exact per-text groups."""
    import bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.dedup as dd

    data = [(1, "alpha"), (2, "alpha"), (3, "beta"), (4, "Beta")]
    spark_df = spark.createDataFrame(data, "doc_id int, text string")
    orig = dd.F.xxhash64

    def fake_xxhash64(*cols):
        # constant primary bucket; the check hash stays real
        if len(cols) == 1:
            return dd.F.lit(0).cast("long")
        return orig(*cols)

    dd.F.xxhash64 = fake_xxhash64
    try:
        out = sorted(
            (r["canonical_id"], r["n_copies"])
            for r in dd.exact_dedup(spark_df).collect()
        )
    finally:
        dd.F.xxhash64 = orig
    # "alpha"×2 → (1, 2); "beta"/"Beta" lowercase-equal → (3, 2)
    assert out == [(1, 2), (3, 2)]


def test_duplicate_components_on_synthetic_graph(spark):
    """A chain a-b-c plus an isolated pair (d,e): two components with
    min-id labels and correct sizes; a larger round cap changes
    nothing (fixpoint semantics are cap-independent)."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.dedup import (
        CC_MAX_ROUNDS,
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], "id_a bigint, id_b bigint"
    )
    rows = {
        r.doc_id: (r.component_id, r.component_size)
        for r in duplicate_components(pairs).collect()
    }
    assert rows == {
        10: (10, 3), 20: (10, 3), 30: (10, 3),
        40: (40, 2), 50: (40, 2),
    }
    more = {
        r.doc_id: (r.component_id, r.component_size)
        for r in duplicate_components(pairs, max_rounds=CC_MAX_ROUNDS + 1).collect()
    }
    assert more == rows


def test_duplicate_components_deep_path_converges(spark):
    """The r06-verdict defect case: a path graph with diameter well
    past the old fixed round count (CC_ITERS = 5) used to return
    silently SPLIT components. The fixpoint contract must label the
    whole path as one component — and the shortcut step must get
    there in ~log₂(diameter) rounds, which the small max_rounds cap
    below enforces (plain neighbor-min alone would need 24 rounds
    and hit the cap's RuntimeError)."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.dedup import (
        duplicate_components,
    )

    n = 25  # path 0-1-2-...-24, diameter 24 > CC_ITERS
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a bigint, id_b bigint"
    )
    rows = {
        r.doc_id: (r.component_id, r.component_size)
        for r in duplicate_components(pairs, max_rounds=10).collect()
    }
    assert rows == {i: (0, n) for i in range(n)}


def test_duplicate_components_raises_at_cap(spark):
    """A cap too small for the graph must raise loudly, never return
    truncated labels (the silent-mislabel defect)."""
    import pytest

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(24)], "id_a bigint, id_b bigint"
    )
    with pytest.raises(RuntimeError, match="still moving"):
        duplicate_components(pairs, max_rounds=2).collect()
