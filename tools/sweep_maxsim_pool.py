"""MaxSim candidate-pool sufficiency sweep (round-5 verdict #4).

``MAXSIM_POOL = 50`` was an absolute constant while the corpus grows
with SF, so the pool's measured sufficiency (Recall@10 of the pooled
two-stage re-rank against exhaustive MaxSim) fell 0.46 → 0.2475 going
sf0.01 → sf0.1 — and would keep falling at 100×. Real late-interaction
stacks size the stage-1 pool relative to the corpus (PLAID's candidate
generation admits by score structure, not a fixed 50). This sweeps
pool ∈ {50..800} at one SF to pick the pool FRACTION the r06
operating point used. HISTORICAL (r07): the whole-vector fraction pool
was retired for the per-slice top-p UNION pool (N-independent;
``multivec.maxsim_union_pool``, swept in sweep_maxsim_union.py) —
this tool measures the stage-1 family it replaced.

The exhaustive MaxSim ground truth (q·N·M²) is built once and shared
across the grid; stage-1 exact top-POOL frames are memoized per pool
by ``exact_topk_fixture_cached``.

Usage: python tools/sweep_maxsim_pool.py [sf_dir] [out_csv]
"""

from __future__ import annotations

import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    multivec as MV,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
    ann_recall,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    exact_topk_fixture_cached,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

POOLS = [50, 100, 200, 400, 800]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/sweep_maxsim_pool.csv"
    spark = get_spark(app_name="maxsim-pool-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)
    n = corpus.count()
    exact = MV.maxsim_topk_exhaustive(queries, corpus, MV.MAXSIM_K).persist()
    exact.count()  # materialize the ground truth once, outside the timings

    rows = []
    for pool in POOLS:
        t0 = time.perf_counter()
        cand = exact_topk_fixture_cached(spark, sf_dir, pool, "cosine").select(
            "query_id", "neighbor_id"
        )
        ann = MV.maxsim_rerank(queries, corpus, cand)
        rec = ann_recall(ann, exact, MV.MAXSIM_K).collect()[0]
        row = {
            "pool": pool,
            "pool_frac_of_n": round(pool / n, 4),
            "recall_at_k": rec["recall_at_k"],
            "n_queries": rec["n_queries"],
            "wall_s": round(time.perf_counter() - t0, 2),
        }
        rows.append(row)
        print(row, flush=True)

    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv} (n={n})")


if __name__ == "__main__":
    main()
