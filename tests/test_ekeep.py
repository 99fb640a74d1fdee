"""P6 end-to-end: exponent-bit truncation through the Spark surface
(VERDICT r02 #3). The kernel itself is covered bit-exactly in
test_fp16; here the Spark UDF path and the byte-model composition are
checked."""

from __future__ import annotations

import numpy as np
import pytest

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.fp16 import (
    reduce_precision_np,
    with_reduced_precision,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.refine import (
    refine_metrics,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)


@pytest.mark.parametrize("keep_e", [3, 4])
def test_spark_udf_matches_kernel_keep_both(spark, sf_small, keep_e):
    emb = load_table(spark, sf_small, "embeddings").limit(64)
    out = with_reduced_precision(emb.select("vec_id", "embedding"), 6, keep_e)
    rows = out.orderBy("vec_id").collect()
    mat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in rows])
    want_red, want_exp = reduce_precision_np(mat, 6, keep_e)
    got_red = np.stack([np.asarray(r["red"], dtype=np.float32) for r in rows])
    got_exp = np.stack([np.asarray(r["kept_exp"], dtype=np.int16) for r in rows])
    assert np.array_equal(got_red, want_red)
    assert np.array_equal(got_exp, want_exp.astype(np.int16))


def test_keep_e_enters_byte_model_only(spark, sf_small):
    """Reference CLI semantics (``ANNCode.py:827`` + ``:316-319``):
    keep_e changes bits_red = 1 + keep_e + keep_m, not the refinement
    values — so recall/fpr are identical and save rises by exactly
    one exponent plane: Δsave = 1·D/8 / (16·D/8) = 1/16."""
    queries = queries_view(spark, sf_small)
    corpus = load_table(spark, sf_small, "embeddings")
    r5 = refine_metrics(queries, corpus, "l2-tz", 20, 6, None, keep_e=5).first()
    r4 = refine_metrics(queries, corpus, "l2-tz", 20, 6, None, keep_e=4).first()
    assert r4["recall"] == r5["recall"]
    assert r4["fpr"] == r5["fpr"]
    assert abs((r4["save"] - r5["save"]) - 1.0 / 16.0) < 1e-12


def test_cli_forwards_ekeep_and_compress_level(spark, capsys):
    """--ekeep and --compress_level must reach the metrics (the old CLI
    parsed --ekeep and dropped it)."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.cli import (
        main,
    )

    rc = main(
        [
            "--mode", "l2-tz", "--k", "5", "--keep", "6",
            "--ekeep", "4", "--compress_level", "6",
            "--maxrows", "200", "--cpus", "4",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert "e_keep=4" in out
    assert "compressed reduced-pass bytes/vec" in out
