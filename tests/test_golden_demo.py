"""Golden end-to-end run (SURVEY §5 item 4): the reference's demo
configuration — seed-42 Gaussian corpus N=2000 D=128, 30 queries,
mode=cos-hoeff k=20 keep=6 δ=0.7 (``ANNCode.py:816-819, 798-802``) —
with the metrics tuple frozen. Counts are integers and the generator
is partitioning-independent, so the values are exact, not approximate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    refine_metrics,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
    synthetic_corpus,
)

GOLDEN = {"recall": 1.0, "save": 0.23665000000000003, "fpr": 0.00335}


def test_demo_config_metrics_frozen(spark):
    corpus = synthetic_corpus(spark, n_rows=2000, dim=128, seed=42).select(
        "vec_id", "embedding"
    )
    queries = synthetic_corpus(spark, n_rows=30, dim=128, seed=43).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    row = refine_metrics(queries, corpus, "cos-hoeff", 20, 6, 0.7, dim=128).first()
    assert row.recall == GOLDEN["recall"]
    assert abs(row.save - GOLDEN["save"]) < 1e-12
    assert abs(row.fpr - GOLDEN["fpr"]) < 1e-12
    # reference invariants: saving ≤ structural bound, fpr ≥ 0
    assert row.save <= 1.0 - (1 + 5 + 6) / 16.0 + 1e-9
    assert row.fpr >= 0.0
