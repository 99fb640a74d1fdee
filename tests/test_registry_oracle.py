"""Every declared (query, oracle) pair must hash-match — this mirrors
the driver's t2 gate at a smaller scale factor for fast iteration."""

from __future__ import annotations

import pytest

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    registry,
)

from .oracle_harness import compare, duckdb_conn


def _ids():
    return sorted(registry.ORACLES.keys())


@pytest.fixture(scope="module")
def con(sf_small):
    c = duckdb_conn(sf_small)
    yield c
    c.close()


@pytest.fixture(scope="module", autouse=True)
def _release_artifacts_after_module(spark):
    """The gate materializes every memoized index artifact (PQ
    codebook, graph edges, exact top-K frames, ...) in one JVM;
    release them when the module ends so later modules don't inherit
    a heap full of persisted relations (the r05 full-suite OOM)."""
    yield
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.session import (
        clear_caches,
    )

    clear_caches(spark)


@pytest.mark.parametrize("name", _ids())
def test_oracle_match_sf0001(spark, sf_small, con, name):
    df = registry.QUERIES[name](spark, sf_small)
    problems = compare(df, con, registry.ORACLES[name])
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_query_runs(spark, sf_small, registry_artifacts):
    """Queries without oracles still must run and return a schema.
    Oracled queries MATERIALIZE in the gate above (each compare runs
    the full query), so re-counting them here paid ~245 redundant
    jobs (~250s of the r12 suite wall); the count() sweep covers only
    the rows-only queries the gate never executes. Construction +
    schema of every query is still asserted via the shared fixture."""
    for name, (schema, _) in registry_artifacts.items():
        assert schema.fields, name
    for name, fn in registry.QUERIES.items():
        if name not in registry.ORACLES:
            assert fn(spark, sf_small).count() >= 0, name


def test_no_nonatomic_output_columns(registry_artifacts):
    """The driver's value canonicalizer hashes cell values and crashes
    on list cells (`TypeError: unhashable type: 'list'` — the r01/r02
    rownorm_unit failure). Every registered query, oracled or not, must
    therefore emit only atomic column types."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    for name, (schema, _) in registry_artifacts.items():
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        assert not bad, f"{name} emits non-scalar columns {bad}"
