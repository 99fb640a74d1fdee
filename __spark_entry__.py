"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine package: the queries/oracles live in
``bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry``
so they are unit-tested alongside the operators they exercise.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (  # noqa: E402
    registry,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: exact top-K cosine similarity search of the
    derived query set against the ``embeddings`` corpus at sf0.001."""
    return registry.q_topk_cosine_exact(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
