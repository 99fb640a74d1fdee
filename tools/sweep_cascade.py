"""Cascade frontier sweep: (r2, r1) → recall@K + per-query bytes.

``operators/bq.cascade_topk`` composes the whole precision ladder —
1-bit Hamming admit (r2·K) → int8 recon-cosine narrow (r1·K) → exact
re-rank. The registered point is (bq.CASCADE_R2, bq.CASCADE_R1) =
(10, 2) — r1=2 dominated r1=3 in this very sweep; this sweeps the two
pool knobs at one SF so the operating point is a measured choice, the
same discipline as ``sweep_graph_beam.py`` / ``sweep_maxsim_pool.py``.

Bytes model per query (matches ``registry_vectordb.q_ann_cascade_
metrics``): N·⌈D/8⌉ + r2·K·(D+8) + r1·K·4D, against 4·N·D flat.

Usage: python tools/sweep_cascade.py [sf_dir] [out_csv]
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
GRID = [(5, 3), (8, 3), (10, 3), (12, 3), (15, 3), (10, 2), (10, 5)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/sweep_cascade.csv"
    spark = get_spark()
    queries = queries_view(spark, sf_dir)
    corpus = load_table(spark, sf_dir, "embeddings")
    n = corpus.count()
    d = embedding_dim(corpus)
    exact = exact_topk_fixture_cached(spark, sf_dir, K, "cosine")
    full = 4 * n * d
    rows = []
    for r2, r1 in GRID:
        t0 = time.time()
        ann = BQ.cascade_topk(queries, corpus, K, r1=r1, r2=r2)
        rec = ann_recall(ann, exact, K).collect()[0]
        wall = time.time() - t0
        bytes_q = n * ((d + 7) // 8) + r2 * K * (d + 8) + r1 * K * 4 * d
        rows.append(
            {
                "sf_dir": sf_dir,
                "n": n,
                "d": d,
                "k": K,
                "r2": r2,
                "r1": r1,
                "recall_at_k": rec["recall_at_k"],
                "bytes_per_query": bytes_q,
                "bytes_saving": round(1.0 - bytes_q / full, 6),
                "wall_sec": round(wall, 2),
            }
        )
        print(rows[-1])
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
