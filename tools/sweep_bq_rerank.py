"""Binary-quantization re-rank budget sweep: recall@K and the byte
model across R (the exact-fetch multiple). R is the 1-bit sketch's
recall knob — the signature scan is fixed at D/8 bytes/vector, so the
frontier trades R·K full fetches against recall.

Usage: python tools/sweep_bq_rerank.py [sf_dir] [out_csv]
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
    bq as BQ,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
    ann_recall,
    embedding_dim,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    exact_topk_fixture_cached,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

K = 20
R_GRID = (2, 3, 5, 8, 12, 16)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/sweep_bq_rerank.csv"
    spark = get_spark(app_name="bq-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)
    exact = exact_topk_fixture_cached(spark, sf_dir, K, "cosine").persist()
    n = corpus.count()
    dim = embedding_dim(corpus)
    b_full, b_sig = 4.0 * dim, dim / 8.0

    rows = []
    for r in R_GRID:
        t0 = time.perf_counter()
        ann = BQ.bq_refined_topk(queries, corpus, K, r=r)
        rec = ann_recall(ann, exact, K).collect()[0]
        # bytes/query: full signature scan + r*K exact fetches, vs a
        # full-precision scan of all n vectors
        save = 1.0 - (b_sig * n + b_full * r * K) / (b_full * n)
        rows.append(
            {
                "r": r,
                "recall_at_k": rec["recall_at_k"],
                "fetch_frac": round(r * K / n, 4),
                "save_vs_full_scan": round(save, 4),
                "wall_s": round(time.perf_counter() - t0, 2),
            }
        )
        print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
