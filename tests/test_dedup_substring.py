"""Exact-substring dedup (Lee et al. 2022, VERDICT r11 #2): verbatim
shared token spans ≥ L at ANY offset. The load-bearing case is the
UNALIGNED overlap — a 60-token span shared at different offsets — that
``curation.dedup_chunks`` (aligned non-overlapping 16-token windows)
provably misses and ``dedup.substring_dedup`` (stride-1 windows) finds.
Corpus-level equality vs the DuckDB oracle is covered by the registry
gate (`test_registry_oracle`); this file pins the semantics on crafted
documents."""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators import (
    dedup as D,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.curation import (
    dedup_chunks,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


#: a 60-token shared passage of DISTINCT tokens (so no aligned 16-token
#: chunk of one embedding of it can equal a differently-phased chunk of
#: the other), plus per-document unique filler.
_SPAN = [f"shared{i:02d}" for i in range(60)]
_DOC_A = [f"fillera{i:02d}" for i in range(3)] + _SPAN + [
    f"tailera{i:02d}" for i in range(17)
]  # span occupies offsets [3, 62] of 80 tokens
_DOC_B = [f"fillerb{i:02d}" for i in range(11)] + _SPAN + [
    f"tailerb{i:02d}" for i in range(9)
]  # span occupies offsets [11, 70] of 80 tokens


def test_unaligned_span_found_by_substring_missed_by_chunks(spark):
    docs = _mkdocs(
        spark, [(1, " ".join(_DOC_A)), (2, " ".join(_DOC_B))]
    )

    # dedup_chunks (aligned 16-token windows) sees NO duplicate chunk:
    # the span enters doc 1 at phase 3 and doc 2 at phase 11, so every
    # aligned chunk mixes different 16-token slices of the span.
    ch = dedup_chunks(docs, chunk=16)
    assert ch.where(F.col("n_copies") > 1).count() == 0

    # substring_dedup finds the full span in both documents, merged to
    # one maximal interval each: windows at offsets 3..47 (doc 1) and
    # 11..55 (doc 2) are all duplicated, islands close at off+15.
    out = D.substring_dedup(docs, min_len=16).orderBy("doc_id").collect()
    got = [(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out]
    assert got == [(1, 3, 62, 60), (2, 11, 70, 60)]


def test_disjoint_spans_stay_separate_islands(spark):
    # Two shared passages inside one document, separated by a gap
    # longer than L, must come out as two spans, not one.
    s1 = [f"alpha{i:02d}" for i in range(20)]
    s2 = [f"beta{i:02d}" for i in range(20)]
    gap = [f"gapx{i:02d}" for i in range(25)]
    doc1 = s1 + gap + s2
    docs = _mkdocs(
        spark,
        [
            (1, " ".join(doc1)),
            (2, " ".join(s1)),
            (3, " ".join(s2)),
        ],
    )
    out = (
        D.substring_dedup(docs, min_len=16)
        .orderBy("doc_id", "span_start")
        .collect()
    )
    got = [(r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out]
    assert got == [
        (1, 0, 19, 20),
        (1, 45, 64, 20),
        (2, 0, 19, 20),
        (3, 0, 19, 20),
    ]


def test_within_document_repeat_alone_does_not_count(spark):
    # A passage repeated twice in ONE document but nowhere else is not
    # a cross-document duplicate (min_docs=2 counts distinct doc_ids).
    s = [f"solo{i:02d}" for i in range(16)]
    docs = _mkdocs(
        spark,
        [
            (1, " ".join(s + [f"mid{i}" for i in range(20)] + s)),
            (2, " ".join(f"other{i:02d}" for i in range(40))),
        ],
    )
    assert D.substring_dedup(docs, min_len=16).count() == 0


def test_plan_is_blocked_never_all_pairs(spark, sf_small):
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
        load_table,
    )

    df = D.substring_dedup(load_table(spark, sf_small, "documents"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
