"""Continuous vector ingest — the end-to-end loop a live vector store
runs (SURVEY §2.9 additive scope; the reference is build-once/
query-many, ``ANNCode.py`` has no ingest path):

    change stream → foreachBatch → cell-routed delta store
                                        ↓
    queries ─────────── merge-on-read serve (base ⊎ delta)

* **Ingest** (``start_delta_ingest``): each micro-batch is routed to
  its IVF cell with the STATELESS assignment projection
  (``operators/simsearch.assign_cells_stateless`` — the quantizer
  rides along as a literal, so the batch plan has no join, no
  aggregation, no streaming state) and APPENDED to a cell-partitioned
  parquet delta store — the LSM memtable flush. Nothing is ever
  rewritten; at 100 TB each micro-batch append touches only its own
  cells' directories.
* **Change rows** carry ``(vec_id, embedding, op, seq)`` — CDC shape:
  ``op`` ∈ {upsert, delete}, ``seq`` a monotone change-log sequence
  number (LSN). Keying last-wins on ``seq`` (not on micro-batch id)
  makes the served state independent of how the stream was chopped
  into batches — the property the batch≡stream test proves.
* **Serve** (``serve_fresh_topk``): merge-on-read — the base scan
  anti-joins the broadcast tombstone set, surviving latest upserts
  union on (``operators/mutate.mutated_topk``), exactly the
  delta-table serve plan, now fed by a live stream.

Freshness contract: after the ingest query drains, the served top-K
equals ``mutated_topk`` over the same change set applied as one batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def start_delta_ingest(
    stream_df: DataFrame,
    centroid_rows: list,
    delta_path: str,
    checkpoint_path: str,
):
    """Start the foreachBatch ingest of a change stream
    ``(vec_id, embedding, op, seq)`` into the cell-partitioned delta
    store at ``delta_path``. Returns the StreamingQuery (availableNow
    trigger — drains the source then stops; a production deployment
    drops the trigger and runs forever)."""
    from ..operators.simsearch import assign_cells_stateless

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        routed = assign_cells_stateless(
            bdf, centroid_rows, keep_cols=("embedding", "op", "seq")
        ).select(
            F.col("id").alias("vec_id"),
            "embedding",
            "op",
            "seq",
            F.lit(batch_id).alias("batch_id"),
            "cell",
        )
        # cluster by the partition key before the write (guide §6):
        # a micro-batch lands in ~n_cells directories, and writing
        # them from one task serializes ~n_cells parquet-writer
        # opens/commits (measured ~2s/batch at fixture scale; ~35%
        # faster spread over a few tasks). Hash-partitioning on cell
        # is deterministic, content per cell is unchanged, and every
        # reader aggregates per cell/vec_id — row order never matters.
        n_write = max(2, bdf.sparkSession.sparkContext.defaultParallelism // 4)
        routed.repartition(n_write, "cell").write.mode("append").partitionBy(
            "cell"
        ).parquet(delta_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def delta_latest(spark: SparkSession, delta_path: str) -> DataFrame:
    """(vec_id, embedding, op): the last-wins view of the delta store —
    highest ``seq`` per vec_id; on a seq tie, delete beats upsert
    (op ASC — the within-transaction CDC rule, deterministic on both
    engines). The CDC contract expects ``(vec_id, seq)`` unique per
    ``op``; if a producer ever violates it (two upserts, same seq,
    different embeddings), the final content-hash tie-break still
    picks ONE winner deterministically — and independently of how the
    stream was chopped into micro-batches (a ``batch_id`` tie-break
    would break the batch≡stream property), instead of leaving the
    choice to partition order (r08 ADVICE). The rank window partitions
    by vec_id over the delta-sized store only — the base corpus never
    enters."""
    d = spark.read.parquet(delta_path)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("seq").desc(), F.col("op").asc(), F.xxhash64("embedding").asc()
    )
    return (
        d.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select("vec_id", "embedding", "op")
    )


def serve_fresh_topk(
    queries: DataFrame, base: DataFrame, latest: DataFrame, k: int
) -> DataFrame:
    """Exact cosine top-K over base ⊎ latest changes (merge-on-read:
    broadcast tombstones prune the base scan, latest upserts union on).
    ``latest`` is the :func:`delta_latest` view."""
    from ..operators.mutate import mutated_topk

    ups = latest.where(F.col("op") == "upsert").select("vec_id", "embedding")
    dels = latest.where(F.col("op") == "delete").select("vec_id")
    return mutated_topk(queries, base, ups, dels, k)


#: deterministic CDC change-set classes derived from the fixture
#: corpus (the mutate.py idiom): wave 1 (seq 1) re-embeds ids ≡ 3
#: (mod 10) reversed and deletes ids ≡ 7 (mod 13); wave 2 (seq 2)
#: restores ids ≡ 3 (mod 20) to their original embedding — together
#: they exercise last-wins across waves AND the same-seq
#: delete-beats-upsert tie (ids in both wave-1 classes).
CHANGE_UP_MOD, CHANGE_UP_REM = 10, 3
CHANGE_DEL_MOD, CHANGE_DEL_REM = 13, 7
RESTORE_MOD, RESTORE_REM = 20, 3


def change_stream_fixture(corpus: DataFrame) -> DataFrame:
    """(vec_id, embedding, op, seq): the two-wave CDC change set the
    registered ingest query and the batch≡stream test both drive."""
    emb_t = corpus.schema["embedding"].dataType
    up1 = corpus.where(
        F.col("vec_id") % CHANGE_UP_MOD == CHANGE_UP_REM
    ).select(
        "vec_id",
        F.reverse("embedding").alias("embedding"),
        F.lit("upsert").alias("op"),
        F.lit(1).alias("seq"),
    )
    del1 = corpus.where(
        F.col("vec_id") % CHANGE_DEL_MOD == CHANGE_DEL_REM
    ).select(
        "vec_id",
        F.lit(None).cast(emb_t).alias("embedding"),
        F.lit("delete").alias("op"),
        F.lit(1).alias("seq"),
    )
    up2 = corpus.where(F.col("vec_id") % RESTORE_MOD == RESTORE_REM).select(
        "vec_id",
        F.col("embedding"),
        F.lit("upsert").alias("op"),
        F.lit(2).alias("seq"),
    )
    return up1.unionByName(del1).unionByName(up2)


def start_spann_delta_ingest(
    stream_df: DataFrame,
    centroid_rows: list,
    delta_path: str,
    checkpoint_path: str,
    eps: float | None = None,
    max_assign: int | None = None,
):
    """SPANN twin of :func:`start_delta_ingest`: each micro-batch's
    UPSERTS are routed to every closure cell (boundary replication —
    ``operators/spann.closure_cells_stateless``, the same no-join/
    no-state literal projection, now emitting one posting row per
    assigned cell), DELETES to the sentinel ``cell = -1`` partition
    (a tombstone must mask every replica; the serve path broadcasts
    the tombstone set wholesale, so guessing the old postings' cells
    is both impossible — the delete carries no embedding — and
    unnecessary). Appends stay cell-partitioned: at 100 TB each
    micro-batch touches only its own cells' directories, exactly as
    the single-assignment ingest does, with write volume scaled by
    the measured ~1.9× closure inflation."""
    from ..operators import spann as SP

    kwargs = {}
    if eps is not None:
        kwargs["eps"] = eps
    if max_assign is not None:
        kwargs["max_assign"] = max_assign

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        routed = SP.closure_cells_stateless(
            bdf, centroid_rows, keep_cols=("embedding", "op", "seq"), **kwargs
        ).select(
            F.col("id").alias("vec_id"),
            "embedding",
            "op",
            "seq",
            F.lit(batch_id).alias("batch_id"),
            "cell",
        )
        # same write clustering as start_delta_ingest (guide §6)
        n_write = max(2, bdf.sparkSession.sparkContext.defaultParallelism // 4)
        routed.repartition(n_write, "cell").write.mode("append").partitionBy(
            "cell"
        ).parquet(delta_path)

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
