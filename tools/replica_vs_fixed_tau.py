"""Order-exact vs fixed-τ₀ byte accounting at bench scale.

The scalable refinement path (`operators/refine.py`) fixes the
admission threshold at the seed's τ₀ and documents its bandwidth
saving as a *lower bound* on the reference's evolving-threshold
numbers. The corpus-partitioned order-exact replica
(`operators/refine_replica.py`) removes the old collect ceiling, so
the reference-exact curve can now be measured at any scale — this
tool emits both curves side by side, quantifying exactly how much
saving the scalable plan concedes for its parallelism.

Usage: python tools/replica_vs_fixed_tau.py [sf_dir] [out_csv]
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    refine_metrics,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine_replica import (
    refine_replica,
    replica_metrics,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

K = 20
DIM = 64
GRID = [("l2-tz", m, None) for m in (6, 4, 3, 2)] + [
    ("cos-l1", 2, None),
    ("cos-hoeff", 6, 0.7),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/replica_vs_fixed_tau.csv"
    spark = get_spark(app_name="replica-vs-fixed")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)
    n_corpus = corpus.count()

    rows = []
    for mode, m, delta in GRID:
        fixed = refine_metrics(
            queries, corpus, mode, K, m, delta, cache_key=sf_dir
        ).first()
        rep = replica_metrics(
            refine_replica(queries, corpus, mode, K, m, delta),
            mode, K, m, n_corpus, DIM, delta,
        ).first()
        rows.append(
            {
                "mode": mode,
                "m_keep": m,
                "delta": delta if delta is not None else 0.0,
                "recall_fixed": round(fixed["recall"], 6),
                "recall_exact": round(rep["recall"], 6),
                "save_fixed": round(fixed["save"], 6),
                "save_exact": round(rep["save"], 6),
                "save_conceded": round(rep["save"] - fixed["save"], 6),
                "fpr_fixed": round(fixed["fpr"], 6),
                "fpr_exact": round(rep["fpr"], 6),
            }
        )
        print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    bad = [r for r in rows if r["save_conceded"] < -1e-9]
    print("\nfixed-tau saving is a lower bound on exact:", "VIOLATED" if bad else "holds on every grid point")


if __name__ == "__main__":
    main()
