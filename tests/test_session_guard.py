"""ensure_parallelism narrow/wide detection: the analyzed-plan walk
must key on node CLASS names, not on substrings of the rendered plan
(a literal or column named 'Window' is not a Window operator)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.session import (
    ensure_parallelism,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
)


def test_narrow_scan_is_repartitioned(spark, sf_small):
    df = load_table(spark, sf_small, "embeddings")  # one parquet file
    out = ensure_parallelism(df)
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


def test_wide_plan_skips_the_probe(spark, sf_small):
    df = load_table(spark, sf_small, "embeddings").groupBy("vec_id").count()
    assert ensure_parallelism(df) is df


def test_literal_named_like_an_operator_does_not_false_positive(spark, sf_small):
    """A narrow plan carrying a lit('Window') projection (or a column
    alias containing 'Join') is still narrow: the guard must
    repartition it rather than substring-match the rendered plan."""
    df = (
        load_table(spark, sf_small, "embeddings")
        .withColumn("kind", F.lit("Window"))
        .withColumnRenamed("embedding", "JoinedVec")
    )
    out = ensure_parallelism(df)
    assert out is not df
    assert out.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
