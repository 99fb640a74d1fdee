"""CLI entry point (SURVEY §2.11 O2) mirroring the reference's
argparse surface (``ANNCode.py:793-878``): the same six modes, the
same defaults (``--k 20 --keep 6 --ekeep 5 --delta 0.7``), the same
sweep flags — driving the Spark engine instead of a NumPy loop.

Run as ``python -m bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark
--mode cos-l1 --db corpus.parquet --q queries.parquet``; with no
``--db/--q`` a seeded synthetic corpus is used (reference demo,
``ANNCode.py:816-819``).
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODES = ("cos-hoeff", "cos-l1", "cos-l2", "l2-tz", "l2-sym", "l2-hoeff")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bfann-spark",
        description="Bandwidth-first ANN refinement on PySpark",
    )
    p.add_argument("--mode", choices=MODES, default="cos-hoeff")
    p.add_argument("--db", help="corpus path (.parquet/.vec/.fvecs/bin)")
    p.add_argument("--q", help="query path (same formats)")
    p.add_argument("--k", type=int, default=20)
    p.add_argument("--keep", type=int, default=6, help="mantissa bits kept")
    p.add_argument("--ekeep", type=int, default=5, help="exponent bits kept")
    p.add_argument("--delta", type=float, default=0.7, help="Hoeffding miss budget")
    p.add_argument("--maxrows", type=int, default=100_000)
    p.add_argument("--compress_level", type=int, default=-1,
                   help="zlib level (0..9) for reduced-pass bit-planes; "
                        "<0 disables (ANNCode.py:806)")
    p.add_argument("--exact-replica", action="store_true",
                   help="order-sensitive replica path (reference byte accounting)")
    p.add_argument("--csv_out", help="append sweep metrics CSV to this dir (S6)")
    p.add_argument("--plot_out", help="PNG prefix for sweep plots (S7)")
    p.add_argument("--sweep_m", help="comma list of m_keep values to sweep")
    p.add_argument("--sweep_delta", help="comma list of deltas (Hoeffding modes)")
    p.add_argument("--cpus", default=None, help="local core count (default $SPARK_GRAFT_CPUS or all)")
    return p


def _load_side(spark: SparkSession, path: str | None, maxrows: int, is_query: bool) -> DataFrame:
    from .sources.loaders import load_matrix, synthetic_corpus

    if path is None:
        # reference demo shape: N=2000, D=128, q=30 (ANNCode.py:816-819)
        n = 30 if is_query else 2000
        df = synthetic_corpus(spark, n_rows=n, dim=128, seed=42 + int(is_query))
    elif path.endswith(".parquet"):
        df = spark.read.parquet(path)
    else:
        df = load_matrix(spark, path, max_rows=maxrows)
    id_col = "query_id" if is_query else "vec_id"
    cols = dict.fromkeys(df.columns)
    src_id = "vec_id" if "vec_id" in cols else ("query_id" if "query_id" in cols else None)
    if src_id is None:
        df = df.select(F.monotonically_increasing_id().alias(id_col), "embedding")
    else:
        df = df.select(F.col(src_id).alias(id_col), "embedding")
    return df


def _plot_sweep(rows, plot_out: str) -> None:
    """S7: recall-vs-saving and fpr-vs-saving PNGs (driver-side; no-op
    without matplotlib, which this container does not ship)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plots", file=sys.stderr)
        return
    for metric in ("recall", "fpr"):
        fig, ax = plt.subplots()
        ax.plot([r["save"] for r in rows], [r[metric] for r in rows], "o-")
        ax.set_xlabel("bandwidth saving")
        ax.set_ylabel(metric)
        fig.savefig(f"{plot_out}_{metric}.png")
        plt.close(fig)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .operators.refine import refine_metrics, refine_topk
    from .plans.sweep import sweep_metrics, write_metrics_csv
    from .session import get_spark

    spark = get_spark(cpus=args.cpus)
    corpus = _load_side(spark, args.db, args.maxrows, is_query=False)
    queries = _load_side(spark, args.q, args.maxrows, is_query=True)
    mode = args.mode
    delta = args.delta if "hoeff" in mode else None
    dim = len(corpus.select("embedding").first()[0])

    # optional compression model: override the reduced-pass bytes with
    # measured compressed bytes/vec of the (keep_e, keep_m) bit planes
    # (ANNCode.py:831-833)
    red_bytes_override = None
    if args.compress_level is not None and args.compress_level >= 0:
        from .operators.compression import avg_reduced_bytes_per_vec

        red_bytes_override = avg_reduced_bytes_per_vec(
            corpus, args.ekeep, args.keep, level=args.compress_level
        )

    preds = refine_topk(queries, corpus, mode, args.k, args.keep, delta).topk
    metrics = refine_metrics(
        queries, corpus, mode, args.k, args.keep, delta,
        keep_e=args.ekeep, red_bytes_override=red_bytes_override, dim=dim,
    )
    n_preds = preds.count()
    row = metrics.first().asDict()
    # S8: final report line (reference shape, ANNCode.py:863-867)
    print(
        f"mode={args.mode} k={args.k} m_keep={args.keep} e_keep={args.ekeep} "
        f"delta={delta} preds={n_preds} recall={row.get('recall')} "
        f"save={row.get('save')} fpr={row.get('fpr')}"
    )
    if red_bytes_override is not None:
        print(f"compressed reduced-pass bytes/vec ~= {red_bytes_override:.2f}")

    if args.sweep_m:
        m_keeps = [int(x) for x in args.sweep_m.split(",")]
        deltas = [float(x) for x in args.sweep_delta.split(",")] if args.sweep_delta else None
        sw = sweep_metrics(queries, corpus, mode, args.k, m_keeps, deltas,
                           exact_replica=args.exact_replica, dim=dim,
                           keep_e=args.ekeep,
                           compress_level=(None if args.compress_level is None
                                           or args.compress_level < 0
                                           else args.compress_level))
        rows = [r.asDict() for r in sw.collect()]
        if args.csv_out:
            write_metrics_csv(sw, args.csv_out)
        if args.plot_out:
            _plot_sweep(rows, args.plot_out)
        for r in rows:
            print(r)
    # cache lifecycle: a CLI invocation may have memoized prepared
    # corpora / scored frames / quantizers — release them so repeated
    # invocations against one long-lived session don't accumulate
    # cached partitions
    from .session import clear_caches

    clear_caches(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
