"""Sweeping scale guards over the whole registry (SURVEY §4).

Correctness rows prove the values; these tests prove the *plans* stay
scale-safe as the registry grows: a CartesianProduct in any registered
query is a 100 TB kill (N×M pair materialization with no broadcast),
and a row-wise Python UDF (BatchEvalPython) in a hot path forfeits
whole-stage codegen. Both properties are asserted for every query so a
future registration can't silently regress them.
"""

from __future__ import annotations

import re

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    registry,
)


def _phys(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


_NODE = re.compile(r"^(?P<pre>[\s:+\-]*)(?:\*\(\d+\)\s*)?(?P<name>\w+)")


def single_partition_sort_windows(plan: str) -> list[str]:
    """Chains like ``Window->Sort->Exchange SinglePartition`` in a
    physical-plan treeString: a Sort or Window whose input is an
    ``Exchange SinglePartition`` funnels EVERY row of its input
    through one task — the r05 ``corpus_dsir_select`` defect. A
    SinglePartition exchange feeding a final scalar aggregate (the
    standard two-phase global agg, partials only) is fine and is not
    matched. Parsed by treeString indentation: a node's parent is the
    nearest shallower line above it."""
    parsed = []
    for ln in plan.splitlines():
        m = _NODE.match(ln)
        if m and m.group("name"):
            parsed.append((len(m.group("pre")), m.group("name"), ln.strip()))
        else:
            parsed.append((None, None, ln.strip()))
    hits = []
    for i, (d, name, txt) in enumerate(parsed):
        if name != "Exchange" or "SinglePartition" not in txt:
            continue
        j = i - 1
        while j >= 0 and (parsed[j][0] is None or parsed[j][0] >= d):
            j -= 1
        if j < 0:
            continue
        chain = [parsed[j][1]]
        if chain[0] == "Sort":  # Window plans as Window->Sort->Exchange
            k, dj = j - 1, parsed[j][0]
            while k >= 0 and (parsed[k][0] is None or parsed[k][0] >= dj):
                k -= 1
            if k >= 0:
                chain.append(parsed[k][1])
        if any(n in ("Sort", "Window", "WindowGroupLimit") for n in chain):
            hits.append("->".join(reversed(chain)) + "->Exchange SinglePartition")
    return hits


def test_no_cartesian_product_in_any_registered_plan(registry_artifacts):
    """Cross joins are allowed only with a broadcast side (planned as
    BroadcastNestedLoopJoin — bounded by the broadcast, the corpus
    side streams). An unbroadcast CartesianProduct shuffles every
    pair and cannot survive scale-up. (The three sweeps share one
    plan build — the session-scoped ``registry_artifacts`` fixture.)"""
    offenders = [
        name
        for name, (_, plan) in registry_artifacts.items()
        if "CartesianProduct" in plan
    ]
    assert not offenders, f"cartesian products in: {offenders}"


def test_no_rowwise_python_udf_in_any_registered_plan(registry_artifacts):
    """Python touches data only through Arrow-batched pandas UDFs
    (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) — a
    row-at-a-time BatchEvalPython node means a ~10-100x slow path
    crept into a registered query."""
    offenders = [
        name
        for name, (_, plan) in registry_artifacts.items()
        if "BatchEvalPython" in plan
    ]
    assert not offenders, f"row-wise Python UDFs in: {offenders}"


def test_no_single_partition_sort_or_window_in_any_registered_plan(
    registry_artifacts,
):
    """A global unpartitioned Window/orderBy (Exchange SinglePartition
    feeding a Sort/Window over a corpus-sized input) is a one-task
    sort at 100× — the r05 ``corpus_dsir_select`` scale-killer, now
    fixed via bucket-decomposed exact ranking. This asserts no
    registered plan regresses to that shape. Global ``orderBy`` plans
    as RangePartitioning (parallel) and final scalar aggregates keep
    their SinglePartition partials exchange — neither is matched."""
    offenders = {}
    for name, (_, plan) in registry_artifacts.items():
        hits = single_partition_sort_windows(plan)
        if hits:
            offenders[name] = hits
    assert not offenders, f"single-partition sorts/windows in: {offenders}"


def test_guard_detects_single_partition_window():
    """The parser itself: red on the r05-shaped plan, green on the
    two legitimate SinglePartition uses (scalar agg, range sort)."""
    bad = """Window [row_number() windowspecdefinition(key DESC)]
+- Sort [key DESC NULLS LAST], false, 0
   +- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=1]
      +- FileScan parquet [key]"""
    assert single_partition_sort_windows(bad) == [
        "Window->Sort->Exchange SinglePartition"
    ]
    ok = """HashAggregate(keys=[], functions=[count(1)])
+- Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=2]
   +- HashAggregate(keys=[], functions=[partial_count(1)])
      +- Sort [key ASC NULLS FIRST], true, 0
         +- Exchange rangepartitioning(key ASC, 8), [plan_id=3]
            +- FileScan parquet [key]"""
    assert single_partition_sort_windows(ok) == []


def test_survey_headline_counts_match_registry():
    """SURVEY.md is the build contract; its headline query/oracle
    counts drifted once (r11 closed at 242/237 while the §8 summary
    line still said 239/234 — VERDICT r11 "What's missing" #5). This
    pins the summary line to the live registry so it can't drift
    silently again: update SURVEY.md in the same commit that
    registers a query."""
    import os

    survey = os.path.join(os.path.dirname(__file__), "..", "SURVEY.md")
    with open(survey, encoding="utf-8") as fh:
        text = fh.read()
    m = re.search(r"(\d+) queries, (\d+) oracle-checked", text)
    assert m, "SURVEY.md headline count line missing"
    assert int(m.group(1)) == len(registry.QUERIES), (
        f"SURVEY.md says {m.group(1)} queries, registry has "
        f"{len(registry.QUERIES)} — update the SURVEY.md summary line"
    )
    assert int(m.group(2)) == len(registry.ORACLES), (
        f"SURVEY.md says {m.group(2)} oracle-checked, registry has "
        f"{len(registry.ORACLES)} — update the SURVEY.md summary line"
    )
