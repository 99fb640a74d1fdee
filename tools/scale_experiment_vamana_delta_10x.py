"""Scale contract of the complete DiskANN insert (r11):
the resident-maintenance pass is bounded by the BATCH, not the corpus.

Claim under test (operators/vamana.vamana_delta_edges docstring):
affected residents ≤ |delta|·degree, each merged pool ≤ old-degree +
batch reverse edges (truncated to L), so the resident pass costs
O(|delta|·degree·L²) scorings at ANY corpus size. This measures, on
seeded Gaussian corpora at N = 2 000 / 20 000 with a FIXED-SIZE
insert batch (200 vectors):

* affected-resident count vs the |delta|·degree bound,
* merged-pool row count (the resident pass's join input),
* resident-pass wall vs the inserted-side walk wall (the walk is a
  per-vector graph search — the only part whose cost scales with
  graph size, logarithmically by design),
* shuffle read bytes of the resident pass (via the local UI's stage
  metrics) — the 100-TB proxy: batch-bounded frames must shuffle a
  batch-bounded byte volume at ANY corpus size.

r12 (VERDICT r11 #6) extends the rung ladder to 100×: pass the rungs
as argv, e.g. ``python tools/scale_experiment_vamana_delta_10x.py
200000`` for the 100× rung alone (the 2k/20k numbers are recorded in
reports/VAMANA.md). Driver memory via VAMANA_SCALE_DRIVER_MEM
(default 8g; the 200k build's occlusion pair space wants ≥ 48g).

The corpora are fresh Gaussian draws (NOT replications — replicated
points are exact duplicates and degenerate the prune's tie-breaks,
the r09 quantizer lesson).

Usage: python tools/scale_experiment_vamana_delta_10x.py
Appends nothing; summarized in reports/VAMANA.md (r11 scale section).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    vamana as V,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
    beam_candidates,
)

D = 64
BATCH = 200


def corpus_at(spark, n: int, seed: int = 53):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, D)).astype(np.float32)
    rows = [(int(i), [float(v) for v in x[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def _shuffle_read_bytes(ui_port: int = 4040) -> int:
    """Total shuffle-read bytes across all completed stages so far,
    from the local UI's REST API; deltas between two calls bound the
    bytes a phase shuffled. 0 if the UI is unreachable."""
    import json
    import urllib.request

    try:
        base = f"http://127.0.0.1:{ui_port}/api/v1/applications"
        apps = json.load(urllib.request.urlopen(base, timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(f"{base}/{app_id}/stages?status=complete", timeout=10)
        )
        return sum(s.get("shuffleReadBytes", 0) for s in stages)
    except Exception:
        return 0


def main() -> None:
    # the 10x build's occlusion pair space carries 64-float vectors on
    # both sides of an 11.5M-row join — needs a real driver heap
    # (8g for the 20k rung; the 100x rung wants ≥ 48g)
    rungs = tuple(int(a) for a in sys.argv[1:]) or (2_000, 20_000)
    spark = get_spark(
        app_name="vamana-delta-scale",
        extra_conf={
            "spark.driver.memory": os.environ.get("VAMANA_SCALE_DRIVER_MEM", "8g"),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    for n in rungs:
        corpus = corpus_at(spark, n).localCheckpoint(eager=True)
        t0 = time.perf_counter()
        edges = V.vamana_edges(corpus, cache_key=f"delta10x:{n}")
        edges.count()
        build_wall = time.perf_counter() - t0
        # fixed-size batch: the FIRST `BATCH` ids, re-embedded (reversed)
        delta = (
            corpus.where(F.col("vec_id") < BATCH)
            .select("vec_id", F.reverse("embedding").alias("embedding"))
            .localCheckpoint(eager=True)
        )
        # inserted-side walk (the N-dependent part)
        walk_shuf0 = _shuffle_read_bytes()
        t1 = time.perf_counter()
        q = delta.select(F.col("vec_id").alias("query_id"), "embedding")
        cand = beam_candidates(q, corpus, edges).where(
            F.col("vec_id") != F.col("query_id")
        )
        kept = V.prune_batch_pool(
            V.index_pool(cand).localCheckpoint(eager=True), corpus
        ).localCheckpoint(eager=True)
        n_kept = kept.count()
        walk_wall = time.perf_counter() - t1
        walk_shuffle_mb = (_shuffle_read_bytes() - walk_shuf0) / 1e6
        # full operator (walk + resident pass)
        shuf0 = _shuffle_read_bytes()
        t2 = time.perf_counter()
        out = V.vamana_delta_edges(delta, corpus, edges)
        n_out = out.count()
        full_wall = time.perf_counter() - t2
        full_shuffle_mb = (_shuffle_read_bytes() - shuf0) / 1e6
        aff = kept.select("dst").distinct().count()
        print(
            {
                "n": n,
                "build_wall_s": round(build_wall, 1),
                "kept_edges": n_kept,
                "affected_residents": aff,
                "bound_batch_x_degree": BATCH * V.VAMANA_DEGREE,
                "walk_wall_s": round(walk_wall, 1),
                "full_wall_s": round(full_wall, 1),
                "resident_pass_s": round(full_wall - walk_wall, 1),
                "walk_shuffle_read_mb": round(walk_shuffle_mb, 1),
                "full_op_shuffle_read_mb": round(full_shuffle_mb, 1),
                "resident_shuffle_read_mb": round(full_shuffle_mb - walk_shuffle_mb, 1),
                "out_rows": n_out,
            },
            flush=True,
        )


if __name__ == "__main__":
    main()
