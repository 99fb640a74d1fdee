"""Matryoshka prefix-dimension frontier: recall vs bandwidth along the
dimension axis (operators/mrl.py).

For each kept prefix length d' (and re-rank factor R), measure
Recall@20 of the refined prefix path against the exact cosine top-K,
plus the byte model: the cheap pass scans d'/D of the coordinate
bytes over all N vectors, then R·K full vectors per query are
fetched for the exact re-rank.

The fixture corpus is isotropic (no MRL training), so this frontier
is the FLOOR for the operator — trained MRL embeddings front-load
information into the prefix and shift every point up.

Usage: python tools/sweep_mrl_frontier.py [sf_dir] [out_csv]
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
    mrl as MRL,
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

#: (d_keep, r) — the registered point is (D/4 = 16, 3)
GRID = [
    (4, 3),
    (8, 3),
    (16, 3),   # registered operating point
    (32, 3),
    (8, 5),
    (16, 5),
    (32, 5),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/sweep_mrl_frontier.csv"
    spark = get_spark(app_name="mrl-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)
    exact = exact_topk_fixture_cached(spark, sf_dir, K, "cosine").persist()
    n = corpus.count()
    dim = embedding_dim(corpus)
    b_full = 4.0 * dim

    rows = []
    for d_keep, r in GRID:
        t0 = time.perf_counter()
        ann = MRL.mrl_refined_topk(queries, corpus, K, r=r, d_keep=d_keep)
        rec = ann_recall(ann, exact, K).collect()[0]
        # bytes: prefix scan of all n vectors + r*K full fetches/query,
        # vs a full-precision scan of all n vectors
        save = 1.0 - (4.0 * d_keep * n + b_full * r * K) / (b_full * n)
        rows.append(
            {
                "d_keep": d_keep,
                "r": r,
                "recall_at_k": rec["recall_at_k"],
                "prefix_frac": round(d_keep / dim, 4),
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
