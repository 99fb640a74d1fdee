"""Streaming MinHash near-duplicate dedup — the continuous-corpus-
build twin of ``registry_dedup.dedup_incremental`` (VERDICT r09 #4):

    doc stream → foreachBatch → decide vs sketch store → append sketches
                                        ↓
                     (doc_id, is_near_dup, keep) decision log

* **Sketch store**: the persisted per-document MinHash band rows and
  shingle sets (``{store}/bands``, ``{store}/shingles``) — exactly
  the index a 100 TB dedup pipeline maintains; initialized from the
  existing corpus (``init_neardup_store``) and APPENDED per
  micro-batch, never rewritten (the LSM shape of
  ``ingest.start_delta_ingest``).
* **Per-batch decision**: an arriving doc is a near-dup iff a banded
  candidate VERIFIES at Jaccard ≥ τ against (a) any stored doc —
  the existing corpus plus every earlier-arrived doc — or (b) a
  SMALLER-id doc in its own micro-batch. Bodies never join at corpus
  width: the candidate space is the band equi-join, the verify reads
  only the two candidates' shingle sets.
* **Batch ≡ stream**: the decision rule is the *conservative banding
  filter* — a doc is rejected against every earlier-seen doc whether
  or not that doc was itself kept (the standard pre-filter variant;
  the greedy keep-chain variant would make decisions depend on other
  decisions and thus on batch chopping). Under micro-batches that
  are ascending doc_id ranges (``write_ordered_stream_source``),
  "earlier-seen" ≡ "smaller doc_id", so the streamed decision log
  equals the one-shot batch form :func:`neardup_decisions` —
  ``tests/test_streaming.py`` proves it, and the DuckDB oracle
  replays the batch form in plain SQL.
* **The ordering contract is ENFORCED, not assumed** (r11, VERDICT
  r10 #5): each micro-batch asserts its arrivals' min doc_id exceeds
  the max PREVIOUSLY-ARRIVED doc_id (from the decision log — the
  existing corpus carries no arrival order and is exempt) and fails
  the query loud otherwise. Silently computing a log that no longer
  equals the batch form is the one behavior this operator refuses.
* **Bounded-disorder CDC is HANDLED, not just rejected** (r12,
  VERDICT r11 #3): ``start_neardup_ingest_reordered`` buffers
  arrivals in an idempotent arrivals store and releases them to the
  ordered contract in ascending watermark ranges
  ``(wm(b−1), wm(b)]`` with ``wm = max_seen − lateness`` — the
  constructive half of the guard. Disorder beyond the declared
  lateness bound still fails loud.
* **Restart-safe sinks** (r11, r10 ADVICE): every sink (decisions,
  bands, shingles) is partitioned by ``batch_id`` and written with
  dynamic partition overwrite, so a micro-batch retried after a
  mid-batch failure REPLACES its own partitions instead of
  double-appending — exactly-once per batch_id.
"""

from __future__ import annotations

import os
import shutil

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_band_buckets,
    minhash_signatures_from_index,
    shingle_index,
)

#: shared with registry_dedup (SHINGLE_N / MINHASH_TAU there) — kept
#: as parameters here so the operator is corpus-agnostic.


def _verified_pairs(
    cand: DataFrame, sh_d: DataFrame, sh_p: DataFrame, threshold: float
) -> DataFrame:
    """(d_id, p_id) of candidates whose exact word-shingle Jaccard —
    rounded to 6 decimals, the ``minhash_lsh_pairs`` contract — meets
    ``threshold``. ``sh_d``/``sh_p`` are (id, shingle) long-form
    indexes for the arriving and partner sides."""
    sizes_d = sh_d.groupBy("id").agg(F.count("*").alias("n_d"))
    sizes_p = sh_p.groupBy("id").agg(F.count("*").alias("n_p"))
    inter = (
        cand.join(sh_d.select(F.col("id").alias("d_id"), "shingle"), "d_id")
        .join(sh_p.select(F.col("id").alias("p_id"), "shingle"), ["p_id", "shingle"])
        .groupBy("d_id", "p_id")
        .agg(F.count("*").alias("n_inter"))
    )
    jac = F.col("n_inter").cast("double") / (
        F.col("n_d") + F.col("n_p") - F.col("n_inter")
    ).cast("double")
    return (
        inter.join(sizes_d.select(F.col("id").alias("d_id"), "n_d"), "d_id")
        .join(sizes_p.select(F.col("id").alias("p_id"), "n_p"), "p_id")
        .where(F.round(jac, 6) >= threshold)
        .select("d_id", "p_id")
    )


def _write_partition(df: DataFrame, path: str, batch_id: int) -> None:
    """Idempotent per-batch sink: the rows land in the ``batch_id``
    partition under dynamic overwrite, so a retried batch replaces its
    own output instead of appending a second copy."""
    (
        df.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def init_neardup_store(
    existing: DataFrame, store_path: str, n: int = 3
) -> None:
    """Materialize the existing corpus's sketch store: band rows and
    shingle index — the artifacts ``minhash_signatures`` /
    ``shingle_index`` already define, written once as the stream's
    starting state (partition ``batch_id = -1``; arriving batches add
    their own partitions).

    One tokenize+shingle pass, not two (r12 VERDICT #3): the shingle
    index lands first, and the band rows are rebuilt FROM the stored
    index (``minhash_signatures_from_index`` — identical band rows:
    shingle-less docs carry NULL signatures and are dropped by the
    banding either way). The old form re-shingled the corpus for the
    signature pass — the dominant cost of store init."""
    _write_partition(shingle_index(existing, n), f"{store_path}/shingles", -1)
    sh = _read_batch(existing.sparkSession, f"{store_path}/shingles", -1)
    bands = minhash_band_buckets(minhash_signatures_from_index(sh))
    _write_partition(bands, f"{store_path}/bands", -1)


def _read_batch(spark: SparkSession, path: str, batch_id: int) -> DataFrame:
    """The rows of one ``batch_id`` partition (partition-pruned scan)."""
    return spark.read.parquet(path).where(
        F.col("batch_id") == batch_id
    ).drop("batch_id")


def start_neardup_ingest(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_path: str,
    n: int = 3,
    threshold: float = 0.5,
):
    """Start the foreachBatch near-dup ingest of a ``(doc_id, text)``
    stream against the sketch store at ``store_path``. Each
    micro-batch: enforce the ordering contract, sketch the arrivals,
    band-join against the store and within the batch, verify
    candidates at exact Jaccard ≥ ``threshold``, and land the decision
    log and the arrivals' own sketches in the batch's own partition
    (idempotent under micro-batch retry). Returns the StreamingQuery
    (availableNow)."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        process_neardup_batch(bdf, batch_id, store_path, n, threshold)

    return (
        stream_docs.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def process_neardup_batch(
    bdf: DataFrame,
    batch_id: int,
    store_path: str,
    n: int = 3,
    threshold: float = 0.5,
) -> None:
    """One micro-batch of the near-dup ingest — module-level so the
    guard and the retry idempotency are directly testable.

    Ordering guard (the enforced contract): the batch≡stream equality
    holds only when "earlier-arrived" ≡ "smaller doc_id", so the
    arrivals' min doc_id must exceed the max doc_id that already has
    a decision row. The existing corpus (sketches at batch_id = -1)
    is exempt — it carries no arrival order, and the decision rule
    already rejects against existing partners in either id direction.
    On violation the batch RAISES (failing the streaming query) —
    out-of-order CDC needs a reorder buffer upstream, not a silently
    wrong log. At scale the max-arrived id is one parquet footer
    statistic off the decision log, not a scan."""
    # one pass over the (small) arrivals answers both "empty?" and the
    # guard's min id — the old isEmpty + min pair ran two jobs per batch
    bstats = bdf.agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("mn")
    ).collect()[0]
    if not bstats["n"]:
        return
    batch_min = bstats["mn"]
    spark = bdf.sparkSession
    dec_path = f"{store_path}/decisions"
    try:
        prev_max = (
            spark.read.parquet(dec_path)
            .where(F.col("batch_id") != batch_id)  # a retry of this batch is fine
            .agg(F.max("doc_id"))
            .collect()[0][0]
        )
    except AnalysisException as e:
        # ONLY path-missing means "first batch". Any other read failure
        # (corrupt footer, permissions, transient FS error) must fail
        # the query — swallowing it would silently disable the ordering
        # contract and process the batch against an unseen decision
        # history (r11 ADVICE #1).
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        prev_max = None
    if prev_max is not None and batch_min <= prev_max:
        raise ValueError(
            "near-dup ingest ordering contract violated: batch "
            f"{batch_id} arrives with min doc_id {batch_min} <= max "
            f"previously-arrived doc_id {prev_max}; micro-batches must "
            "be ascending doc_id ranges (reorder upstream or use "
            "write_ordered_stream_source)"
        )
    # Sketch the arrivals ONCE and land the sketches straight in their
    # own batch partition (r12 VERDICT #3 — per-batch job count):
    # the sink write the batch owes anyway doubles as the
    # materialization the old eager localCheckpoints paid separate
    # jobs for, and the band rows are rebuilt from the STORED shingle
    # index instead of re-tokenizing the arrivals a second time
    # (identical band rows — see ``minhash_signatures_from_index``).
    # Writing the arrival sketches before the decision log is safe for
    # the decision rule AND for retries: every store read below
    # excludes the batch's own partitions (``!= batch_id``), so the
    # decision inputs cannot see these writes, and a retried batch
    # overwrites the same partitions with the same rows (dynamic
    # partition overwrite). 5 jobs per batch, was 8.
    _write_partition(shingle_index(bdf, n), f"{store_path}/shingles", batch_id)
    b_sh = _read_batch(spark, f"{store_path}/shingles", batch_id)
    _write_partition(
        minhash_band_buckets(minhash_signatures_from_index(b_sh)),
        f"{store_path}/bands",
        batch_id,
    )
    b_bands = _read_batch(spark, f"{store_path}/bands", batch_id)
    s_bands = spark.read.parquet(f"{store_path}/bands").where(
        F.col("batch_id") != batch_id  # a retry must not see its own sketches
    )
    s_sh = spark.read.parquet(f"{store_path}/shingles").where(
        F.col("batch_id") != batch_id
    )
    cand_store = (
        b_bands.alias("d")
        .join(s_bands.alias("p"), ["band", "bkey"])
        .select(F.col("d.id").alias("d_id"), F.col("p.id").alias("p_id"))
        .distinct()
    )
    cand_within = (
        b_bands.alias("x")
        .join(b_bands.alias("y"), ["band", "bkey"])
        .where(F.col("x.id") < F.col("y.id"))
        .select(F.col("y.id").alias("d_id"), F.col("x.id").alias("p_id"))
        .distinct()
    )
    near = (
        _verified_pairs(cand_store, b_sh, s_sh, threshold)
        .select("d_id")
        .unionByName(
            _verified_pairs(cand_within, b_sh, b_sh, threshold).select("d_id")
        )
        .distinct()
        .withColumnRenamed("d_id", "doc_id")
        .withColumn("__n", F.lit(1))
    )
    # the decision plan reads only frozen inputs (arrivals + the
    # store's OTHER partitions), so it writes directly — no
    # decide-before-mutate checkpoint needed now that the own-batch
    # exclusion isolates it from the sketch writes above
    decisions = (
        bdf.select("doc_id")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__n", F.lit(0)).alias("is_near_dup"),
            (F.col("__n").isNull()).cast("int").alias("keep"),
        )
    )
    _write_partition(decisions, dec_path, batch_id)


def neardup_decisions(
    docs: DataFrame,
    inc_mod: int,
    inc_rem: int,
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """One-shot batch form of the streamed decision log: incoming doc
    d (``doc_id % inc_mod == inc_rem``) is a near-dup iff a verified
    pair links it to an existing doc (either id order) or to a
    smaller-id incoming doc — the conservative banding filter the
    stream applies incrementally."""
    from ..operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs, n=n, threshold=threshold)
    b_inc = F.col("id_b") % inc_mod == inc_rem
    a_inc = F.col("id_a") % inc_mod == inc_rem
    near_ids = (
        # id_a < id_b always: any partner rejects the larger incoming
        # id; an EXISTING larger partner also rejects the smaller
        # incoming id (the corpus side has no arrival order)
        pairs.where(b_inc)
        .select(F.col("id_b").alias("doc_id"))
        .unionByName(
            pairs.where(a_inc & ~b_inc).select(F.col("id_a").alias("doc_id"))
        )
        .distinct()
        .withColumn("__n", F.lit(1))
    )
    inc = docs.where(F.col("doc_id") % inc_mod == inc_rem).select("doc_id")
    return inc.join(near_ids, "doc_id", "left").select(
        "doc_id",
        F.coalesce("__n", F.lit(0)).alias("is_near_dup"),
        (F.col("__n").isNull()).cast("int").alias("keep"),
    )


def write_ordered_stream_source(
    incoming: DataFrame, src_dir: str, n_batches: int = 4
) -> None:
    """Write ``incoming`` docs as ``n_batches`` parquet files of
    ASCENDING doc_id ranges with pinned ascending mtimes — the
    file-source ordering contract the batch≡stream property needs
    (micro-batch order = id order ⇒ "earlier-seen" ≡ "smaller id").
    The id list is collected driver-side to cut range boundaries —
    a fixture-sized setup helper, same declared role as the
    change-stream fixture."""
    ids = sorted(r.doc_id for r in incoming.select("doc_id").collect())
    step = max(1, (len(ids) + n_batches - 1) // n_batches)
    os.makedirs(src_dir, exist_ok=True)
    tmp_root = src_dir + ".tmp"
    for b in range(n_batches):
        chunk = ids[b * step : (b + 1) * step]
        if not chunk:
            continue
        part_dir = os.path.join(tmp_root, f"b{b}")
        incoming.where(
            (F.col("doc_id") >= chunk[0]) & (F.col("doc_id") <= chunk[-1])
        ).coalesce(1).write.mode("overwrite").parquet(part_dir)
        part = next(p for p in os.listdir(part_dir) if p.endswith(".parquet"))
        dst = os.path.join(src_dir, f"b{b}.parquet")
        shutil.copy(os.path.join(part_dir, part), dst)
        # file-source batches are ordered by modification time — pin it
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    shutil.rmtree(tmp_root, ignore_errors=True)


def read_decisions(spark: SparkSession, store_path: str) -> DataFrame:
    """(doc_id, is_near_dup, keep): the streamed decision log."""
    return spark.read.parquet(f"{store_path}/decisions").select(
        "doc_id", "is_near_dup", "keep"
    )


#: Default lateness bound (in doc_id units) for the reorder buffer:
#: arrivals may be displaced by at most this much below the maximum
#: doc_id seen so far. The disordered fixture source is generated
#: with the same bound, so the buffer's watermark is exactly tight.
NEARDUP_LATENESS = 100


def write_disordered_stream_source(
    incoming: DataFrame, src_dir: str, n_batches: int = 4, disorder: int = NEARDUP_LATENESS
) -> None:
    """Write ``incoming`` docs as ``n_batches`` parquet files in a
    SHUFFLED-but-bounded arrival order: doc ``x`` arrives at key
    ``x + j(x)`` with deterministic jitter ``j(x) ∈ [0, disorder)``
    (Knuth multiplicative hash), so when ``x`` arrives every
    earlier-arrived id is ``< x + disorder`` — i.e. every arrival
    satisfies ``doc_id > max_seen - disorder``, the bounded-lateness
    contract ``start_neardup_ingest_reordered`` buffers against. The
    plain ordered path's guard REJECTS this source (the r11 fail-loud
    behavior); the reorder buffer drains it to the same decision log."""
    rows = sorted(
        ((r.doc_id + (r.doc_id * 2654435761) % disorder), r.doc_id)
        for r in incoming.select("doc_id").collect()
    )
    ids_by_arrival = [doc_id for _, doc_id in rows]
    step = max(1, (len(ids_by_arrival) + n_batches - 1) // n_batches)
    os.makedirs(src_dir, exist_ok=True)
    tmp_root = src_dir + ".tmp"
    for b in range(n_batches):
        chunk = ids_by_arrival[b * step : (b + 1) * step]
        if not chunk:
            continue
        part_dir = os.path.join(tmp_root, f"b{b}")
        incoming.where(F.col("doc_id").isin(chunk)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part_dir)
        part = next(p for p in os.listdir(part_dir) if p.endswith(".parquet"))
        dst = os.path.join(src_dir, f"b{b}.parquet")
        shutil.copy(os.path.join(part_dir, part), dst)
        os.utime(dst, (1_700_000_000 + b, 1_700_000_000 + b))
    shutil.rmtree(tmp_root, ignore_errors=True)


def process_reordered_batch(
    bdf: DataFrame,
    batch_id: int,
    store_path: str,
    n: int = 3,
    threshold: float = 0.5,
    lateness: int = NEARDUP_LATENESS,
) -> None:
    """One micro-batch of the REORDER-BUFFERED ingest (VERDICT r11
    #3 — the constructive half of the r11 fail-loud guard): arrivals
    within a bounded-lateness CDC stream are buffered and released to
    the ordering contract in ascending id ranges.

    Watermark rule: with every future arrival guaranteed
    ``doc_id > max_seen − lateness``, the ids at or below
    ``wm(b) = max(arrivals ≤ b) − lateness`` are complete — no
    smaller id can still arrive — so batch ``b`` releases exactly the
    range ``(wm(b−1), wm(b)]`` to :func:`process_neardup_batch`.
    Ranges ascend with the watermark, so the released stream
    satisfies the ordered contract by construction, and every id in
    a released range has already arrived (ids ≤ wm can no longer be
    in flight), so the drained decision log equals the one-shot batch
    form — the same batch≡stream property as the ordered path.

    Idempotency: the release set is a DETERMINISTIC function of the
    arrivals store alone (partitioned by batch_id, dynamic
    overwrite), never of downstream sink contents — a batch retried
    after a failure between its sink writes recomputes the identical
    range and overwrites the same partitions. Deriving "already
    released" from the decision log instead would lose the
    bands/shingles of a batch that failed between the decisions and
    sketch writes.

    Arrivals BELOW the previous watermark violate the declared
    lateness bound: their range has already been released, so the
    batch fails loud (the r11 contract) rather than dropping them."""
    # one pass over the (small) arrivals answers "empty?" and the
    # lateness guard's min id together (the isEmpty + min pair ran two
    # jobs); one conditional pass over the arrivals store answers both
    # watermarks (the old prev-max + cur-max pair ran two scans)
    bstats = bdf.agg(
        F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("mn")
    ).collect()[0]
    if not bstats["n"]:
        return
    batch_min = bstats["mn"]
    spark = bdf.sparkSession
    arr_path = f"{store_path}/arrivals"
    _write_partition(bdf.select("doc_id", "text"), arr_path, batch_id)
    arrivals = spark.read.parquet(arr_path).where(F.col("batch_id") <= batch_id)
    wms = arrivals.agg(
        F.max(F.when(F.col("batch_id") < batch_id, F.col("doc_id"))).alias("prev"),
        F.max("doc_id").alias("cur"),
    ).collect()[0]
    wm_prev = None if wms["prev"] is None else wms["prev"] - lateness
    if wm_prev is not None and batch_min is not None and batch_min <= wm_prev:
        raise ValueError(
            "near-dup reorder buffer lateness bound violated: batch "
            f"{batch_id} arrives with doc_id {batch_min} <= watermark "
            f"{wm_prev} (max seen - {lateness}); that id range was "
            "already released — raise the lateness bound to cover "
            "the stream's real disorder"
        )
    wm_cur = wms["cur"] - lateness
    release = arrivals.where(F.col("doc_id") <= wm_cur)
    if wm_prev is not None:
        release = release.where(F.col("doc_id") > wm_prev)
    # no checkpoint / emptiness probe: the release set is a
    # deterministic partition-pruned read of the frozen arrivals
    # store (nothing below mutates it), and the ordered path's own
    # first-pass stats handle an empty release
    process_neardup_batch(
        release.select("doc_id", "text"), batch_id, store_path, n, threshold
    )


def start_neardup_ingest_reordered(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_path: str,
    n: int = 3,
    threshold: float = 0.5,
    lateness: int = NEARDUP_LATENESS,
):
    """foreachBatch near-dup ingest that accepts bounded-disorder
    arrival order (see :func:`process_reordered_batch`). After the
    stream drains, call :func:`flush_neardup_buffer` to release the
    final above-watermark tail."""

    def write_batch(bdf: DataFrame, batch_id: int) -> None:
        process_reordered_batch(bdf, batch_id, store_path, n, threshold, lateness)

    return (
        stream_docs.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def flush_neardup_buffer(
    spark: SparkSession,
    store_path: str,
    n: int = 3,
    threshold: float = 0.5,
    lateness: int = NEARDUP_LATENESS,
) -> None:
    """Release the reorder buffer's tail — the arrivals still above
    the final watermark — as one last ordered batch. For a finite
    (drained) stream the tail is complete by definition; on an
    infinite stream this runs at ingest shutdown. Idempotent: the
    tail set and its synthetic batch_id are deterministic functions
    of the arrivals store, so a repeated flush overwrites the same
    partitions with the same rows."""
    arr_path = f"{store_path}/arrivals"
    try:
        arrivals = spark.read.parquet(arr_path)
    except AnalysisException as e:
        if "PATH_NOT_FOUND" not in str(e) and "Path does not exist" not in str(e):
            raise
        return  # nothing ever arrived
    stats = arrivals.agg(
        F.max("doc_id").alias("max_id"), F.max("batch_id").alias("max_b")
    ).collect()[0]
    if stats.max_id is None:
        return
    # the tail is a deterministic read of the frozen arrivals store
    # (the ordered path never writes to it) — no checkpoint, and the
    # ordered path's first-pass stats handle an empty tail
    tail = arrivals.where(F.col("doc_id") > stats.max_id - lateness).select(
        "doc_id", "text"
    )
    process_neardup_batch(tail, int(stats.max_b) + 1, store_path, n, threshold)
