"""High-dimension Hoeffding-saving evidence run (r11, VERDICT r10 #4).

The one BASELINE.md row the graded fixture cannot reach is the
Hoeffding saving band (≈0.6 at ≥90% recall): the paper measures it on
300–3072-dimensional embeddings, while the fixture is D=64. The
cos-hoeff cushion is a Hoeffding bound over D bounded coordinate
products, so its width shrinks like √(ln(1/δ)/D) relative to the
score scale — the saving should RISE with D toward the paper band,
with no code change. This experiment measures exactly that curve:
seeded corpora (N and every constant fixed, only D swept), the
registered tuned operating point (keep_m=2, δ=0.9) plus the
reference CLI default (keep_m=6, δ=0.7), through the UNCHANGED
``refine_metrics`` operator. l2-tz (truncation cushion, no
concentration argument) runs at the same points as the control.

Two corpus structures, because D alone is NOT the paper's story:

* ``iso`` — isotropic Gaussian. Here the top-K score gap shrinks at
  the SAME 1/√D rate the cushion does (cosines concentrate around 0
  with spread 1/√D), so saving must FALL with D — the adversarial
  control that separates "saving tracks D" from "saving tracks the
  score-gap-to-cushion ratio".
* ``clu`` — planted clusters (center + σ·noise, the
  ``recall_ladder_clustered`` idiom): same-cluster cosine stays
  ≈ 1/(1+σ²) at every D while the bulk concentrates toward 0, so the
  cushion's √(ln(1/δ)/D) width shrinks relative to a FIXED score gap
  — the regime real 300–3072-D embedding corpora (the paper's) live
  in, where saving should rise toward the ≈0.6 band.

Usage: python tools/experiment_highdim_hoeffding.py [out_csv]
Writes reports/sweep_highdim_hoeffding.csv; summarized in
reports/HIGHDIM_SAVING.md.
"""

from __future__ import annotations

import csv
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    refine_metrics,
)

K = 20
N = 2000
STRIDE = 50  # queries = every STRIDE-th vector, the fixture contract
DIMS = (64, 128, 256, 512, 1024)
POINTS = (
    # the byte model is b_red = (1 + keep_e + keep_m)·D/16 of fp16, so
    # the zero-FPR saving ceilings are m=0: 0.615, m=1: 0.552,
    # m=2: 0.490, m=6: 0.240 (after the K/N fetch term). The paper's
    # ≈0.6 band therefore REQUIRES the coarse m∈{0,1} rungs to be
    # honest (recall ≥ 0.9) — which is exactly what a tighter
    # √(ln(1/δ)/D) cushion buys at high D.
    ("cos-hoeff", 0, 0.9),
    ("cos-hoeff", 1, 0.9),
    ("cos-hoeff", 2, 0.9),   # the registered tuned point
    ("cos-hoeff", 6, 0.7),   # the reference CLI default
    ("l2-tz", 0, None),
    ("l2-tz", 1, None),
    ("l2-tz", 2, None),      # truncation cushion control
    # Euclidean Hoeffding rungs (r12, VERDICT r11 #8): the paper's
    # Figs. 11b/12b Euclidean band is ≈50% sign-aware saving on
    # GloVe/SIFT-style corpora; same δ ladder as the cosine rungs.
    ("l2-hoeff", 0, 0.9),
    ("l2-hoeff", 1, 0.9),
    ("l2-hoeff", 2, 0.9),
    ("l2-hoeff", 6, 0.7),    # the reference CLI default, l2 form
)


N_CLUSTERS = 50
CLUSTER_SIGMA = 0.5  # same-cluster cosine ≈ 1/(1+σ²) = 0.8, D-invariant


def synth_corpus(spark, dim: int, structure: str, seed: int = 47):
    """Seeded float32 corpus shaped like the fixture's embeddings
    table (vec_id, embedding); ``iso`` = standard Gaussian, ``clu`` =
    planted clusters (unit-scaled center + σ·noise)."""
    rng = np.random.default_rng(seed)
    if structure == "iso":
        x = rng.standard_normal((N, dim)).astype(np.float32)
    else:
        centers = rng.standard_normal((N_CLUSTERS, dim)) / np.sqrt(dim)
        assign = rng.integers(0, N_CLUSTERS, size=N)
        x = (
            centers[assign]
            + CLUSTER_SIGMA * rng.standard_normal((N, dim)) / np.sqrt(dim)
        ).astype(np.float32)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def main() -> None:
    out_csv = sys.argv[1] if len(sys.argv) > 1 else "reports/sweep_highdim_hoeffding.csv"
    structures = sys.argv[2].split(",") if len(sys.argv) > 2 else ["clu", "iso"]
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.session import (
        clear_caches,
    )

    # 8g driver heap + a cache release per (structure, dim): each
    # dim's memoized refine artifacts (prepared corpus, exact top-K)
    # are dead weight once its points finish, and at D=1024 the
    # accumulated caches OOM'd the default heap at the 55th of 110
    # points (r12 run).
    spark = get_spark(
        app_name="highdim-hoeffding",
        extra_conf={"spark.driver.memory": "8g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for structure in structures:
        for dim in DIMS:
            clear_caches(spark)
            corpus = synth_corpus(spark, dim, structure).localCheckpoint(eager=True)
            queries = corpus.where(corpus.vec_id % STRIDE == 0).select(
                corpus.vec_id.alias("query_id"), "embedding"
            )
            for mode, m, delta in POINTS:
                t0 = time.perf_counter()
                r = refine_metrics(
                    queries, corpus, mode, K, m, delta,
                    cache_key=f"highdim:{structure}:{dim}",
                ).collect()[0]
                rows.append(
                    {
                        "structure": structure,
                        "dim": dim,
                        "mode": mode,
                        "m_keep": m,
                        "delta": delta if delta is not None else "",
                        "recall": r["recall"],
                        "save": round(r["save"], 4),
                        "fpr": round(r["fpr"], 4),
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
