"""Joint (pool-slice-count × p) sweep for two-stage MaxSim (r11,
VERDICT r10 stretch #8).

`reports/sweep_maxsim_union.csv` swept p only at the scorer's own
M=4 slicing and declared the knee at p=100 (sufficiency 0.97 at
sf0.1, pool ≤ M·p = 400). This sweeps the STAGE-1 slicing m_pool
independently of the M=4 scorer — finer pool slices rank docs by
more local evidence at the same pool-size bound (m_pool·p held
comparable) — to decide whether the 3% missing exhaustive-MaxSim
winners are a pool-geometry artifact or the knee is real.

Ground truth is always the exhaustive M=4 MaxSim top-K (the
registered scorer's semantics). NumPy replica of the engine
arithmetic — sizing only, like sweep_maxsim_union.py.

Usage: python tools/sweep_maxsim_joint.py [sf_dir ...]
Writes reports/sweep_maxsim_joint.csv.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow.parquet as pq

M_SCORE = 4
K = 10
STRIDE = 50

#: (m_pool, p) grid; pool bound = m_pool·p. 400 is the registered
#: bound (4·100); rows at ≤400 are the fair comparisons, larger
#: bounds chart the ceiling.
GRID = [
    (4, 50), (4, 100), (4, 150), (4, 200),
    (2, 100), (2, 200), (2, 400),
    (8, 25), (8, 50), (8, 100),
    (16, 12), (16, 25), (16, 50),
]


def slice_cos(Q: np.ndarray, C: np.ndarray, m: int) -> np.ndarray:
    """(nq, m, N, m) cosines between every query/doc slice pair."""
    d = Q.shape[1]
    sub = d // m
    qs = Q.reshape(len(Q), m, sub)
    cs = C.reshape(len(C), m, sub)
    qn = np.maximum(np.linalg.norm(qs, axis=2), 1e-12)
    cn = np.maximum(np.linalg.norm(cs, axis=2), 1e-12)
    dots = np.einsum("qis,njs->qinj", qs, cs)
    return dots / (qn[:, :, None, None] * cn[None, None, :, :])


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    rows = ["sf_dir,n,m_pool,p,pool_bound,pool_mean,sufficiency_at_10"]
    for sf_dir in dirs:
        t = pq.read_table(f"{sf_dir}/embeddings.parquet")
        ids = np.asarray(t["vec_id"])
        C = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        order = np.argsort(ids)
        ids, C = ids[order], C[order]
        qmask = ids % STRIDE == 0
        Q = C[qmask]
        # exhaustive M=4 MaxSim ground truth (ties -> smaller vec_id,
        # which argsort's stability over the id-sorted corpus gives)
        sc4 = slice_cos(Q, C, M_SCORE)            # (nq, 4, N, 4)
        maxsim = sc4.max(axis=3).sum(axis=1)      # (nq, N)
        top = np.argsort(-maxsim, kind="stable", axis=1)[:, :K]  # corpus positions
        for m_pool, p in GRID:
            scm = slice_cos(Q, C, m_pool).max(axis=3)  # (nq, m_pool, N)
            pool_sizes, hits = [], []
            for qi in range(len(Q)):
                pool: set[int] = set()
                for i in range(m_pool):
                    srt = np.argsort(-scm[qi, i], kind="stable")[:p]
                    pool.update(srt.tolist())
                pool_sizes.append(len(pool))
                hits.append(len(pool.intersection(top[qi].tolist())) / K)
            rows.append(
                f"{sf_dir},{len(C)},{m_pool},{p},{m_pool * p},"
                f"{np.mean(pool_sizes):.1f},{np.mean(hits):.4f}"
            )
            print(rows[-1], flush=True)
    with open("reports/sweep_maxsim_joint.csv", "w") as fh:
        fh.write("\n".join(rows) + "\n")
    print("wrote reports/sweep_maxsim_joint.csv")


if __name__ == "__main__":
    main()
