"""End-to-end 10× scale-up experiment on the flagship served path
(round-5 verdict #7): does the stored-layout refinement serve plan
keep its shape and scale its scan linearly when the corpus grows 10×?

Method: the sf0.1 corpus (N=2000, D=64) is replicated R× with shifted
ids, the l2-tz disaggregated layout (``prepare_corpus``) is written
once per R as parquet (the offline build, excluded from serve
timings), and the flagship ``refine_topk`` serves the same 40-query
set from each stored layout. Measured per R:

* serve wall-time (noop sink — full execution, no driver collect);
* physical scan bytes from parquet metadata (pyarrow column-chunk
  sizes): the phase-1 column set (vec_id, redv, delta, embedding —
  l2-tz reads the raw signs; other modes read only redv/delta) vs the
  ``full`` fetch column vs total. Linear growth of the phase-1 bytes
  with R, with the `full` column still excluded from the cheap pass,
  is the §3.3 disaggregation made measurable at scale;
* plan SHAPE (executedPlan node sequence, ids/stats normalized) —
  the "no plan-shape change at 10×" claim: broadcast sides stay
  broadcast, no new Exchange appears.

Usage: python tools/scale_experiment_10x.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    prepare_corpus,
    refine_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry import (
    K_DEFAULT,
    KEEP_M_DEFAULT,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

MODE = "l2-tz"
REPS = [1, 10]
#: l2-tz phase-1 ReadSchema (operators/refine.py reduced_cols)
PHASE1_COLS = ("vec_id", "redv", "delta", "embedding")


def column_bytes(store_path: str) -> dict[str, int]:
    """Compressed column-chunk bytes per top-level column across every
    parquet file of the store — what a column-pruned scan of that
    column set actually reads off storage."""
    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(store_path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            meta = pq.ParquetFile(os.path.join(root, f)).metadata
            for rg in range(meta.num_row_groups):
                g = meta.row_group(rg)
                for ci in range(g.num_columns):
                    col = g.column(ci)
                    top = col.path_in_schema.split(".")[0]
                    out[top] = out.get(top, 0) + col.total_compressed_size
    return out


def normalize_plan(plan: str) -> str:
    """Node sequence only: strip expression ids, plan ids, paths,
    stats, and sizes so 1× and 10× plans compare by SHAPE."""
    s = re.sub(r"#\d+[L]?", "#x", plan)
    s = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_n", s)
    s = re.sub(r"plan_id=\d+", "plan_id=x", s)
    s = re.sub(r"\[id=#?\w+\]", "", s)
    s = re.sub(r"/[\w\-./]*bfann[\w\-./]*", "<path>", s)
    s = re.sub(r"\d+\.\d+ [KMG]i?B", "<sz>", s)
    s = re.sub(r"Statistics\([^)]*\)", "Statistics(x)", s)
    s = re.sub(r"rows=\d+", "rows=x", s)
    return s


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "reports/SCALE_10X.md"
    spark = get_spark(
        app_name="scale-10x", extra_conf={"spark.driver.memory": "6g"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)
    n_base = base.count()
    n_q = queries.count()

    results = []
    stores = []
    plans = {}
    for rep in REPS:
        corpus = base
        if rep > 1:
            # shifted-id replicas; queries stay the base 40 so the
            # serve plan (broadcast queries × corpus scan) is the
            # identical computation over R× the corpus rows
            corpus = None
            for i in range(rep):
                c = base.select(
                    (F.col("vec_id") + F.lit(i * 10_000_000)).alias("vec_id"),
                    "embedding",
                )
                corpus = c if corpus is None else corpus.unionByName(c)
        store = tempfile.mkdtemp(prefix=f"bfann-scale{rep}x-")
        stores.append(store)
        t0 = time.perf_counter()
        prepare_corpus(corpus, KEEP_M_DEFAULT, MODE).write.mode(
            "overwrite"
        ).parquet(store)
        build_s = round(time.perf_counter() - t0, 2)

        prepared = spark.read.parquet(store)
        res = refine_topk(
            queries, corpus, MODE, K_DEFAULT, KEEP_M_DEFAULT, None,
            prepared_corpus=prepared,
        )
        plans[rep] = normalize_plan(
            res.topk._jdf.queryExecution().executedPlan().toString()
        )
        # warm-up run (codegen, readers, shuffle buffers), then
        # release its cached phase-1 frame and time a FRESH
        # refine_topk: the timed run executes the registered plan
        # semantics exactly — persist marker active, scored computed
        # once and consumed twice from cache — with a cold cache.
        # (Timing a second run of the SAME res would read scored from
        # the warm cache and skip phase 1; unpersisting the same res
        # before re-running would drop the persist MARKER and compute
        # phase 1 twice in the timed plan. Both mismeasure.)
        res.topk.write.format("noop").mode("overwrite").save()
        res.scored.unpersist()
        timed = refine_topk(
            queries, corpus, MODE, K_DEFAULT, KEEP_M_DEFAULT, None,
            prepared_corpus=prepared,
        )
        t0 = time.perf_counter()
        timed.topk.write.format("noop").mode("overwrite").save()
        serve_s = round(time.perf_counter() - t0, 2)
        n_rows = timed.topk.count()
        timed.scored.unpersist()

        cb = column_bytes(store)
        phase1 = sum(cb.get(c, 0) for c in PHASE1_COLS)
        row = {
            "rep": rep,
            "n_corpus": n_base * rep,
            "build_s": build_s,
            "serve_s": serve_s,
            "topk_rows": n_rows,
            "phase1_bytes": phase1,
            "full_bytes": cb.get("full", 0),
            "total_bytes": sum(cb.values()),
        }
        results.append(row)
        print(row, flush=True)

    r1, r10 = results[0], results[-1]
    shape_equal = plans[REPS[0]] == plans[REPS[-1]]
    ratio = lambda k: round(r10[k] / r1[k], 2) if r1[k] else float("nan")  # noqa: E731

    os.makedirs(os.path.dirname(out_md), exist_ok=True)
    with open(out_md, "w") as fh:
        fh.write(
            f"""# 10× scale-up: flagship refinement served from the stored layout

Corpus: `{sf_dir}` embeddings replicated {REPS[-1]}× (N {r1['n_corpus']} →
{r10['n_corpus']}), l2-tz keep_m={KEEP_M_DEFAULT}, K={K_DEFAULT}, {n_q} queries.
Serve = `refine_topk(prepared_corpus=<stored parquet layout>)` to a noop
sink; build (layout write) excluded from serve timings.

| rep | N | build s | serve s | phase-1 col bytes | `full` col bytes | total store bytes |
|---|---|---|---|---|---|---|
| 1× | {r1['n_corpus']} | {r1['build_s']} | {r1['serve_s']} | {r1['phase1_bytes']:,} | {r1['full_bytes']:,} | {r1['total_bytes']:,} |
| {REPS[-1]}× | {r10['n_corpus']} | {r10['build_s']} | {r10['serve_s']} | {r10['phase1_bytes']:,} | {r10['full_bytes']:,} | {r10['total_bytes']:,} |

**Ratios {REPS[-1]}×/1×**: phase-1 scan bytes **{ratio('phase1_bytes')}×**
(linear target {REPS[-1]}×), serve wall **{ratio('serve_s')}×**, store
total **{ratio('total_bytes')}×**.

**Plan shape at {REPS[-1]}×: {"UNCHANGED" if shape_equal else "CHANGED"}** —
executedPlan node sequences (expression ids / stats / paths normalized)
{"are identical: the queries stay broadcast, the corpus side stays a" if shape_equal else "DIFFER — see below:"}
{"column-pruned scan + shuffle-free map, and no new Exchange appears." if shape_equal else ""}

Phase-1 column set (l2-tz ReadSchema): `{', '.join(PHASE1_COLS)}`; the
`full` fetch column ({r10['full_bytes']:,} B at {REPS[-1]}×) stays out of the
cheap pass — the §3.3 disaggregated-placement win, measured on the
stored layout rather than asserted.
"""
        )
        if not shape_equal:
            fh.write("\n## 1× plan\n```\n" + plans[REPS[0]][:4000] + "\n```\n")
            fh.write("\n## 10× plan\n```\n" + plans[REPS[-1]][:4000] + "\n```\n")
    print(f"wrote {out_md} (shape_equal={shape_equal})")
    for s in stores:
        shutil.rmtree(s, ignore_errors=True)


if __name__ == "__main__":
    main()
