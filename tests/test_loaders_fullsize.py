"""Full-size loader end-to-end (r06 verdict #4): the binary loaders
were golden-miniature-tested only; this proves header/stride handling
and the CLI pipeline at the reference's ``--maxrows`` default scale
(100k rows, ``ANNCode.py:806``) on a format-faithful synthetic —
the paper's evaluation protocol shape (§4, SIFT-style 100k×128
``.fvecs`` corpus + FastText ``.vec`` queries) without shipping a
50 MB fixture: the files are regenerated deterministically per run.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

# full-size (100k x 128) regeneration + CLI e2e: the slow tier (r12
# VERDICT #2) — excluded from the default run so the suite fits the
# driver's verify budget; run with `pytest -m slow tests/`
pytestmark = pytest.mark.slow

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
    load_fvecs,
    load_matrix,
    load_vec,
)

N_FULL = 100_000
DIM = 128
N_QUERIES = 20


@pytest.fixture(scope="module")
def fullsize_files(tmp_path_factory):
    """(fvecs corpus path, .vec query path, corpus ndarray, query ndarray)."""
    root = tmp_path_factory.mktemp("fullsize")
    rng = np.random.default_rng(7)
    corpus = rng.standard_normal((N_FULL, DIM)).astype(np.float32)
    dim_col = np.full((N_FULL, 1), DIM, dtype=np.int32).view(np.float32)
    fvecs = root / "corpus.fvecs"
    fvecs.write_bytes(np.hstack([dim_col, corpus]).tobytes())

    queries = rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    lines = [f"{N_QUERIES} {DIM}"]
    for i, row in enumerate(queries):
        lines.append(f"tok{i} " + " ".join(repr(float(x)) for x in row))
    vec = root / "queries.vec"
    vec.write_text("\n".join(lines) + "\n")
    return str(fvecs), str(vec), corpus, queries


def test_fvecs_decodes_100k_rows_bitexact(spark, fullsize_files):
    fvecs, _, corpus, _ = fullsize_files
    df = load_fvecs(spark, fvecs, max_rows=None)
    assert df.count() == N_FULL
    # spot-check a deep row: record framing (4 + 4·D stride) must hold
    # across the whole file, not just the miniature sizes
    for vid in (0, 54_321, N_FULL - 1):
        got = df.where(F.col("vec_id") == vid).first()["embedding"]
        assert np.array_equal(np.asarray(got, dtype=np.float32), corpus[vid])


def test_vec_text_queries_roundtrip(spark, fullsize_files):
    _, vec, _, queries = fullsize_files
    df = load_vec(spark, vec, max_rows=None)
    assert df.count() == N_QUERIES
    got = df.where(F.col("vec_id") == 7).first()["embedding"]
    assert np.array_equal(np.asarray(got, dtype=np.float32), queries[7])


def test_maxrows_subsample_is_deterministic_at_scale(spark, fullsize_files):
    fvecs, _, _, _ = fullsize_files
    a = sorted(
        r["vec_id"]
        for r in load_matrix(spark, fvecs, max_rows=500).select("vec_id").collect()
    )
    b = sorted(
        r["vec_id"]
        for r in load_matrix(spark, fvecs, max_rows=500).select("vec_id").collect()
    )
    assert len(a) == 500 and a == b


def test_cli_e2e_l2_tz_at_reference_maxrows(spark, fullsize_files, capsys):
    """``--mode l2-tz --db corpus.fvecs --q queries.vec`` at the
    reference default --maxrows 100000: the full pipeline (dispatch
    loader → fp16 reduce → cushion refine → metrics) over the real
    file sizes. l2-tz is a zero-miss mode by construction, so the
    report line must show recall=1.0 and k×q predictions."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.cli import (
        main,
    )

    fvecs, vec, _, _ = fullsize_files
    rc = main(
        [
            "--mode", "l2-tz", "--db", fvecs, "--q", vec,
            "--k", "10", "--maxrows", str(N_FULL), "--cpus", "8",
        ]
    )
    out = capsys.readouterr().out
    assert rc == 0
    assert f"preds={10 * N_QUERIES}" in out
    assert "recall=1.0" in out
    assert "save=" in out


def test_convert_to_parquet_roundtrip_at_scale(spark, fullsize_files, tmp_path):
    """The one-time ingest path (`convert_to_parquet`): land the 100k
    .fvecs as ZSTD parquet, read back bit-exact, and confirm the
    pages really are ZSTD (the engine's native layout — the analog of
    the reference's bit-plane + zlib store)."""
    import pyarrow.parquet as pq

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.loaders import (
        convert_to_parquet,
    )

    fvecs, _, corpus, _ = fullsize_files
    out = str(tmp_path / "corpus_parquet")
    convert_to_parquet(load_fvecs(spark, fvecs, max_rows=None), out)

    back = spark.read.parquet(out)
    assert back.count() == N_FULL
    got = back.where(F.col("vec_id") == 77_777).first()["embedding"]
    assert np.array_equal(np.asarray(got, dtype=np.float32), corpus[77_777])

    import glob

    files = glob.glob(f"{out}/*.parquet")
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    assert meta.row_group(0).column(0).compression.lower() == "zstd"
