"""Operating-point sweep for the combined early-reject × compression
saving (VERDICT r02 #6; paper §4.3).

For each zero-miss mode and mantissa budget, run the distributed
metrics once, then compose the combined saving for each compression
level offline: ``save`` is linear in the reduced-pass bytes/vector
(``save = 1 − b_red/b_full − fetched_frac``), so one Spark metrics row
per (mode, m) serves every override.

keep_e semantics follow the reference CLI (``ANNCode.py:827-833``):
the refinement VALUES always come from the keep-exponent reduction
(keeping the zero-miss Δ bound valid); ``keep_e`` shapes only the
stored bit-plane layout and its byte accounting, exactly as
``--ekeep`` does in the reference. ``values_consistent`` marks the
rows whose stored planes could reconstruct the scoring values
(keep_e=5); the headline operating point is the recall-1.0 maximum
across the full grid, reference-style.

Usage: python tools/sweep_operating_point.py [sf_dir] [out_csv]
"""

from __future__ import annotations

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.compression import (
    avg_reduced_bytes_per_vec,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    refine_metrics,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)

DIM = 64
B_FULL = 16.0 * DIM / 8.0
MODES = ("l2-tz", "cos-l1")
M_GRID = (6, 4, 3, 2, 1, 0)
LEVELS = (6, 9)
E_GRID = (5, 4, 3, 2)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/sweep_operating_point.csv"
    spark = get_spark(app_name="bfann-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings")
    queries = queries_view(spark, sf_dir)

    rows = []
    for mode in MODES:
        for m in M_GRID:
            base = refine_metrics(
                queries, corpus, mode, 20, m, None, keep_e=5, cache_key=sf_dir
            ).first()
            b_red0 = (1 + 5 + m) * DIM / 8.0
            fetched_frac = (1.0 - base["save"]) - b_red0 / B_FULL
            for keep_e in E_GRID:
                raw_bytes = (1 + keep_e + m) * DIM / 8.0
                for level in LEVELS:
                    comp_bytes = avg_reduced_bytes_per_vec(
                        corpus, keep_e, m, level=level
                    )
                    save_comb = 1.0 - comp_bytes / B_FULL - fetched_frac
                    rows.append(
                        {
                            "mode": mode,
                            "m_keep": m,
                            "keep_e": keep_e,
                            "zlib_level": level,
                            "recall": base["recall"],
                            "fpr": round(base["fpr"], 6),
                            "save_raw": round(base["save"], 6),
                            "comp_bytes_per_vec": round(comp_bytes, 3),
                            "ratio_vs_reduced": round(raw_bytes / comp_bytes, 4),
                            "save_combined": round(save_comb, 6),
                            "values_consistent": keep_e == 5,
                        }
                    )
                    print(rows[-1], flush=True)

    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        writer = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)

    best = max(
        (r for r in rows if r["recall"] == 1.0),
        key=lambda r: r["save_combined"],
    )
    print("\nBEST (recall 1.0, reference accounting):", best)
    best_strict = max(
        (r for r in rows if r["recall"] == 1.0 and r["values_consistent"]),
        key=lambda r: r["save_combined"],
    )
    print("BEST (recall 1.0, keep_e=5 strict):", best_strict)


if __name__ == "__main__":
    main()
