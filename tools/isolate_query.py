"""Isolate one or more bench queries in a fresh session: cold run,
warm re-run, optional plan dump — the r13 measurement harness (guide
§1: measure first, noop sink, labeled jobs).

Usage:
  python tools/isolate_query.py QUERY [QUERY ...] [--sf DIR] [--cpus N]
      [--plan OUT_DIR] [--repeat N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
    registry,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", default="32")
    ap.add_argument("--plan", default=None, help="dir to write explain('formatted')")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_CPUS"] = args.cpus
    spark = get_spark(
        app_name="isolate-query",
        extra_conf={
            "spark.driver.extraJavaOptions": "-Xlog:disable",
            "spark.driver.memory": "16g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = spark.read.parquet(f"{args.sf}/embeddings.parquet").limit(8).selectExpr(
        "vec_id", "aggregate(embedding, 0D, (a, v) -> a + v) AS s"
    )
    warm.write.format("noop").mode("overwrite").save()
    spark.range(0, 64, numPartitions=64).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name in args.queries:
        fn = registry.QUERIES[name]
        for i in range(args.repeat):
            spark.sparkContext.setJobDescription(f"{name} run {i}")
            t0 = time.perf_counter()
            df = fn(spark, args.sf)
            if args.plan and i == 0:
                os.makedirs(args.plan, exist_ok=True)
                with open(os.path.join(args.plan, f"{name}.txt"), "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            if name.endswith(("_metrics", "_recall", "_tuned")) or name.startswith(
                "compression_model"
            ):
                df.collect()
            else:
                df.write.format("noop").mode("overwrite").save()
            print(f"{name} run{i}: {time.perf_counter() - t0:.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
