"""Vector-store mutation: upserts and deletes served over an immutable
base corpus — the LSM shape every production vector store runs (base
segments + a small in-memory delta + tombstones; FAISS `remove_ids`,
Lucene/Milvus soft deletes with merge-on-compaction are all public
instances of it). The reference is build-once/query-many
(``ANNCode.py`` has no mutation path); a deployable engine needs one.

Semantics (applied in this order, ties resolved explicitly):

1. **upsert** — the row replaces the base row with the same id;
2. **delete** — the id disappears, whether it lives in the base or in
   the upsert batch (deletes win over upserts on the same id).

Spark realization — the base is NEVER rewritten per mutation:

* ``mutated_live`` — base rows survive via a broadcast **anti-join**
  against the tombstone set (upserted ∪ deleted ids; memtable-sized,
  so the base-side scan streams once with no shuffle), then the
  surviving upserts union on. At 100 TB this is exactly the
  merge-on-read plan: tombstones broadcast to every scan task,
  base partitioning untouched.
* ``mutated_topk`` — exact cosine top-K over the live view; the
  semantic reference every index-served mutation path must equal.
* ``compact_cells`` — the maintenance op: re-assign the surviving
  delta to the IVF cells of the FROZEN base quantizer (production
  compaction does not retrain the coarse quantizer — re-clustering is
  a separate rebuild) and report per-cell occupancy after the merge.
  This is the planning input for merge scheduling (which cells grew,
  which drained).

The registered queries derive a deterministic mutation batch from the
fixture itself (``fixture_mutation``): ids ≡ UPSERT_REM (mod
UPSERT_MOD) are re-embedded with their coordinates reversed (an
SQL-replayable "new embedding"), ids ≡ DELETE_REM (mod DELETE_MOD)
are deleted; ids matching both exercise the delete-wins rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine
from .topk import topk_per_query

#: deterministic fixture-derived mutation batch (≈9% upserts, ≈7.7%
#: deletes, with a nonempty overlap class mod 143 exercising
#: delete-wins).
UPSERT_MOD, UPSERT_REM = 11, 5
DELETE_MOD, DELETE_REM = 13, 7


def fixture_mutation(corpus: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(upserts, deletes) derived from the corpus: upserts carry the
    reversed embedding (deterministic, replayed as ``list_reverse`` in
    the DuckDB twin); deletes are bare ids."""
    upserts = corpus.where(F.col("vec_id") % UPSERT_MOD == UPSERT_REM).select(
        "vec_id", F.reverse("embedding").alias("embedding")
    )
    deletes = corpus.where(F.col("vec_id") % DELETE_MOD == DELETE_REM).select(
        "vec_id"
    )
    return upserts, deletes


def mutated_live(
    base: DataFrame, upserts: DataFrame, deletes: DataFrame
) -> DataFrame:
    """The live (vec_id, embedding) view after applying the mutation
    batch: base rows minus tombstoned ids, plus surviving upserts.
    Both anti-join sides broadcast (the delta is memtable-sized by
    assumption); the base scan is otherwise untouched — merge-on-read,
    no base rewrite, no shuffle of the base."""
    tomb = (
        upserts.select("vec_id").unionByName(deletes.select("vec_id")).distinct()
    )
    live_base = base.join(F.broadcast(tomb), "vec_id", "left_anti").select(
        "vec_id", "embedding"
    )
    kept_ups = upserts.join(F.broadcast(deletes), "vec_id", "left_anti").select(
        "vec_id", "embedding"
    )
    return live_base.unionByName(kept_ups)


def mutated_topk(
    queries: DataFrame,
    base: DataFrame,
    upserts: DataFrame,
    deletes: DataFrame,
    k: int,
) -> DataFrame:
    """(query_id, rank, neighbor_id, score): exact cosine top-K over
    the mutated live view — deleted ids can never appear, upserted ids
    score with their NEW embedding. The semantic contract every
    index-served mutation path (tombstoned IVF scan + delta
    brute-force) must reproduce."""
    live = mutated_live(base, upserts, deletes)
    q = F.broadcast(queries.select("query_id", F.col("embedding").alias("qv")))
    scored = live.crossJoin(q).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine("qv", "embedding").alias("score"),
    )
    return topk_per_query(scored, k, ascending=False)


def compact_cells(
    base: DataFrame, upserts: DataFrame, deletes: DataFrame
) -> DataFrame:
    """(cell, n_base_live, n_upserted, n_total): per-cell occupancy
    after merging the mutation batch into the cell-partitioned layout,
    under the base's FROZEN coarse quantizer. Counts shuffle as one
    row per vector (the argmin struct-agg of ``ivf_assign``), then one
    tiny per-cell aggregate — the merge-scheduling input, not a data
    rewrite."""
    from .simsearch import ivf_assign, ivf_centroids

    cents = ivf_centroids(base)
    tomb = (
        upserts.select("vec_id").unionByName(deletes.select("vec_id")).distinct()
    )
    live_base = base.join(F.broadcast(tomb), "vec_id", "left_anti").select(
        "vec_id", "embedding"
    )
    kept_ups = upserts.join(F.broadcast(deletes), "vec_id", "left_anti").select(
        "vec_id", "embedding"
    )
    tagged = ivf_assign(live_base, cents).select(
        "vec_id", "cell", F.lit(0).alias("is_up")
    ).unionByName(
        ivf_assign(kept_ups, cents).select(
            "vec_id", "cell", F.lit(1).alias("is_up")
        )
    )
    return (
        tagged.groupBy("cell")
        .agg(
            F.count(F.when(F.col("is_up") == 0, 1)).alias("n_base_live"),
            F.count(F.when(F.col("is_up") == 1, 1)).alias("n_upserted"),
            F.count("*").alias("n_total"),
        )
        .select("cell", "n_base_live", "n_upserted", "n_total")
    )
