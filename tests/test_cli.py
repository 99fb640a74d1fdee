"""O2 CLI surface: argument parity with the reference
(``ANNCode.py:793-878``) and an end-to-end run over the fixture
corpus reusing the shared test session."""

from __future__ import annotations

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.cli import (
    MODES,
    _load_side,
    build_parser,
)


def test_parser_defaults_match_reference():
    args = build_parser().parse_args(["--mode", "cos-hoeff"])
    # reference CLI defaults, ANNCode.py:798-802
    assert (args.k, args.keep, args.ekeep, args.delta, args.maxrows) == (
        20, 6, 5, 0.7, 100_000
    )
    assert set(MODES) == {
        "cos-hoeff", "cos-l1", "cos-l2", "l2-tz", "l2-sym", "l2-hoeff"
    }


def test_load_side_parquet_and_synthetic(spark, sf_small):
    corpus = _load_side(spark, f"{sf_small}/embeddings.parquet", 1000, is_query=False)
    assert corpus.columns == ["vec_id", "embedding"]
    assert corpus.count() > 0
    q = _load_side(spark, None, 1000, is_query=True)
    assert q.columns == ["query_id", "embedding"]
    assert q.count() == 30  # reference demo query count, ANNCode.py:818
