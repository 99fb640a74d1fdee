"""Sweeping scale guards over the whole registry (SURVEY §4).

Correctness rows prove the values; these tests prove the *plans* stay
scale-safe as the registry grows: a CartesianProduct in any registered
query is a 100 TB kill (N×M pair materialization with no broadcast),
and a row-wise Python UDF (BatchEvalPython) in a hot path forfeits
whole-stage codegen. Both properties are asserted for every query so a
future registration can't silently regress them.
"""

from __future__ import annotations

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    registry,
)


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_no_cartesian_product_in_any_registered_plan(spark, sf_small):
    """Cross joins are allowed only with a broadcast side (planned as
    BroadcastNestedLoopJoin — bounded by the broadcast, the corpus
    side streams). An unbroadcast CartesianProduct shuffles every
    pair and cannot survive scale-up."""
    offenders = []
    for name, fn in registry.QUERIES.items():
        plan = _phys(fn(spark, sf_small))
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian products in: {offenders}"


def test_no_rowwise_python_udf_in_any_registered_plan(spark, sf_small):
    """Python touches data only through Arrow-batched pandas UDFs
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) — a
    row-at-a-time BatchEvalPython node means a ~10-100x slow path
    crept into a registered query."""
    offenders = []
    for name, fn in registry.QUERIES.items():
        plan = _phys(fn(spark, sf_small))
        if "BatchEvalPython" in plan:
            offenders.append(name)
    assert not offenders, f"row-wise Python UDFs in: {offenders}"
