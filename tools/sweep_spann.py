"""SPANN operating-point sweep vs plain IVF (reports/SPANN.md).

Grid over the closure-assignment slack ``eps`` / replica cap /
query-side slack ``qeps`` / probe cap, against IVF at nprobe 1–3, on
three corpora: the sf0.01 fixture (isotropic — the worst case for any
pruning index) and the two planted-cluster corpora from
``recall_ladder_clustered`` (σ=0.25 and σ=0.05 — the regime real
embedding spaces live in). For every point:

* recall@20 against the brute-force oracle,
* scanned rows (the probes ⋈ postings join size — the read-path cost
  a 100-TB serving tier pays per query batch),
* posting count / storage inflation (the write-path price).

The registered operating point (SPANN_EPS/—_MAX_REPLICAS/—_QEPS/
—_NPROBE_MAX in operators/spann.py) is the Pareto knee of this table.

Usage: python tools/sweep_spann.py [sf_dir] [out_csv]
Writes reports/sweep_spann.csv.
"""

from __future__ import annotations

import csv
import os
import sys
import tempfile

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from recall_ladder_clustered import make_clustered  # noqa: E402

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark import (  # noqa: E402
    get_spark,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (  # noqa: E402
    simsearch as S,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (  # noqa: E402
    spann as SP,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (  # noqa: E402
    exact_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.session import (  # noqa: E402
    clear_caches,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (  # noqa: E402
    QUERY_STRIDE,
    load_table,
)

from pyspark.sql import functions as F  # noqa: E402

K = 20

SPANN_GRID = [
    # (eps, max_replicas, qeps, nprobe_max)
    (0.10, 2, 0.0, 1),
    (0.15, 2, 0.0, 1),
    (0.15, 2, 0.15, 2),  # the registered operating point
    (0.15, 3, 0.15, 2),
    (0.25, 3, 0.15, 2),
    (0.25, 4, 0.35, 2),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_csv = sys.argv[2] if len(sys.argv) > 2 else "reports/sweep_spann.csv"
    spark = get_spark(app_name="spann-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        fixtures = [("isotropic_sf0.01", sf_dir)]
        for sigma in (0.25, 0.05):
            d = os.path.join(tmp, f"sig{sigma}")
            os.makedirs(d)
            make_clustered(d, sigma)
            fixtures.append((f"clustered_sig{sigma}", d))
        for fixture, fdir in fixtures:
            clear_caches(spark)
            corpus = load_table(spark, fdir, "embeddings").localCheckpoint(
                eager=True
            )
            q = (
                corpus.where(F.col("vec_id") % QUERY_STRIDE == 0)
                .select(F.col("vec_id").alias("query_id"), "embedding")
                .localCheckpoint(eager=True)
            )
            n = corpus.count()
            cents = S.ivf_centroids(corpus)
            exact = exact_topk(q, corpus, K, "cosine").localCheckpoint(eager=True)
            assigned = S.ivf_assign(corpus, cents).localCheckpoint(eager=True)

            def emit(index, recall, scanned, postings):
                rows.append(
                    {
                        "fixture": fixture,
                        "index": index,
                        "recall": recall,
                        "scanned_rows": scanned,
                        "postings": postings,
                        "inflation": round(postings / n, 3),
                    }
                )
                print(rows[-1], flush=True)

            for nprobe in (1, 2, 3):
                pr = S.ivf_probes(q, cents, nprobe)
                scanned = pr.join(assigned, "cell").count()
                rec = S.ann_recall(
                    S.ivf_topk(q, corpus, K, nprobe=nprobe), exact, K
                ).collect()[0]["recall_at_k"]
                emit(f"ivf_nprobe{nprobe}", rec, scanned, n)
            for eps, reps, qeps, npx in SPANN_GRID:
                posted = SP.spann_postings(corpus, cents, eps, reps).localCheckpoint(
                    eager=True
                )
                pn = posted.count()
                probes = SP.spann_probes(q, cents, qeps, npx)
                scanned = F.broadcast(probes).join(posted, "cell").count()
                rec = S.ann_recall(
                    SP.spann_topk(
                        q, corpus, K, eps=eps, qeps=qeps,
                        max_replicas=reps, nprobe_max=npx,
                    ),
                    exact,
                    K,
                ).collect()[0]["recall_at_k"]
                emit(f"spann_e{eps}_r{reps}_q{qeps}_p{npx}", rec, scanned, pn)
    os.makedirs(os.path.dirname(out_csv), exist_ok=True)
    with open(out_csv, "w", newline="") as fh:
        w = csv.DictWriter(fh, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv}")


if __name__ == "__main__":
    main()
