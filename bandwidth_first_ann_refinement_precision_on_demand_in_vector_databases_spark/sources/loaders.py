"""Reference-native vector-file sources (SURVEY §2.1 S1–S5).

The reference reads three matrix formats into NumPy
(``ANNCode.py:60-158``); here each becomes a DataFrame source
``(vec_id BIGINT, embedding ARRAY<FLOAT>)``:

* S1 ``.vec``   — FastText text: header ``N D``, lines ``token v1..vD``
* S2 ascii-bin  — two ASCII int lines ``L`` ``D``, then ``L*D`` float32
* S3 ``.fvecs`` — FAISS/SIFT records ``[int32 D][D×float32]``
* S3b ``.ivecs`` — int32 sibling (benchmark ground-truth lists)
* S4 dispatch   — route by extension
* S5 synthetic  — seeded Gaussian demo corpus (``ANNCode.py:816-819``)

Scale note: ``.vec`` distributes naturally (``spark.read.text`` splits
the file). The binary formats arrive via ``binaryFile`` (whole file per
task) — correct for the reference's single-file dumps; at 100 TB the
supported path is convert-once to Parquet (``convert_to_parquet``) and
scan that, so the binary decode is a one-time ingest, not a query path.

Subsampling: the reference subsamples with seed-42 NumPy choice
(``ANNCode.py:68-71``). A distributed engine cannot replay NumPy's RNG
stream cheaply; we define the engine's deterministic equivalent —
rank rows by ``xxhash64(row_index, seed)`` and keep the smallest
``max_rows`` — seeded, uniform, and reproducible across cluster sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

VECTOR_SCHEMA = StructType(
    [
        StructField("vec_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ]
)

DEFAULT_MAX_ROWS = 100_000  # reference CLI default, ANNCode.py:802
SAMPLE_SEED = 42


def _subsample(df: DataFrame, max_rows: int | None, seed: int = SAMPLE_SEED) -> DataFrame:
    """Deterministic uniform subsample: keep max_rows smallest seeded hashes."""
    if max_rows is None:
        return df
    ranked = df.withColumn("__h", F.xxhash64(F.col("vec_id"), F.lit(seed)))
    return (
        ranked.orderBy("__h")
        .limit(max_rows)
        .drop("__h")
    )


def load_vec(spark: SparkSession, path: str, max_rows: int | None = DEFAULT_MAX_ROWS) -> DataFrame:
    """S1: FastText ``.vec`` (reference ``load_vec``, ``ANNCode.py:60-91``).

    Header line ``N D`` is dropped; malformed/short lines are skipped
    (P9 filter, ``ANNCode.py:82-83``). vec_id = 0-based data-line index.
    """
    lines = (
        spark.read.text(path)
        .select(
            F.monotonically_increasing_id().alias("__line"),
            F.split(F.trim(F.col("value")), r"\s+").alias("parts"),
        )
    )
    # Read D from the header (driver-side: 1 tiny row).
    header = lines.orderBy("__line").limit(1).collect()[0]["parts"]
    if len(header) < 2 or not header[0].isdigit() or not header[1].isdigit():
        raise ValueError("invalid .vec header")
    dim = int(header[1])

    body = (
        lines.where(F.col("__line") > 0)
        .where(F.size("parts") >= dim + 1)  # skip short lines, ANNCode.py:82-83
        .select(
            (F.row_number().over(__line_window()) - 1).cast("long").alias("vec_id"),
            F.transform(F.slice("parts", 2, dim), lambda s: s.cast("float")).alias("embedding"),
        )
    )
    return _subsample(body, max_rows)


def __line_window():
    from pyspark.sql.window import Window

    return Window.orderBy("__line")


def _binary_records_df(
    spark: SparkSession, path: str, decode_fn, max_rows: int | None
) -> DataFrame:
    """Shared binaryFile → mapInPandas decode plumbing for S2/S3."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def chop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                mat = decode_fn(bytes(blob))
                yield pd.DataFrame(
                    {
                        "vec_id": np.arange(mat.shape[0], dtype=np.int64),
                        "embedding": list(mat),
                    }
                )

    return _subsample(raw.mapInPandas(chop, schema=VECTOR_SCHEMA), max_rows)


def _decode_ascii_header(data: bytes) -> np.ndarray:
    """S2 payload decode (reference ``load_bin_header_body``, ``ANNCode.py:94-109``)."""
    nl1 = data.index(b"\n")
    nl2 = data.index(b"\n", nl1 + 1)
    rows = int(data[:nl1].strip())
    dim = int(data[nl1 + 1 : nl2].strip())
    buf = np.frombuffer(data, dtype=np.float32, offset=nl2 + 1, count=rows * dim)
    if buf.size != rows * dim:
        raise ValueError("truncated payload")
    return buf.reshape(rows, dim)


def _decode_fvecs(data: bytes) -> np.ndarray:
    """S3 payload decode (reference ``load_fvecs``, ``ANNCode.py:112-137``).

    Fixed-dimension fast path: validate record size, strip the leading
    int32 dim of each record.
    """
    if len(data) < 4:
        raise ValueError("bad fvecs")
    dim = int(np.frombuffer(data, dtype=np.int32, count=1)[0])
    rec = 4 + 4 * dim
    if len(data) % rec != 0:
        raise ValueError("size mismatch")
    mat = np.frombuffer(data, dtype=np.float32).reshape(-1, dim + 1)
    return np.ascontiguousarray(mat[:, 1:])


def load_bin_header_body(
    spark: SparkSession, path: str, max_rows: int | None = DEFAULT_MAX_ROWS
) -> DataFrame:
    """S2: ASCII-header binary."""
    return _binary_records_df(spark, path, _decode_ascii_header, max_rows)


def load_fvecs(spark: SparkSession, path: str, max_rows: int | None = DEFAULT_MAX_ROWS) -> DataFrame:
    """S3: FAISS/SIFT ``.fvecs``."""
    return _binary_records_df(spark, path, _decode_fvecs, max_rows)


GROUNDTRUTH_SCHEMA = StructType(
    [
        StructField("query_id", LongType(), False),
        StructField("neighbor_ids", ArrayType(IntegerType(), False), False),
    ]
)


def load_ivecs(
    spark: SparkSession, path: str, max_rows: int | None = DEFAULT_MAX_ROWS
) -> DataFrame:
    """``.ivecs`` — the int32 sibling of ``.fvecs`` and the format ANN
    benchmarks (SIFT/GIST/Deep1B) ship ground-truth neighbor lists in:
    records ``[int32 K][K×int32 ids]``. Returns ``(query_id,
    neighbor_ids)`` — the ground-truth shape ``ann_recall`` consumes
    after a posexplode. The reference stops at ``.fvecs``
    (``ANNCode.py:140-158``); a user evaluating against published
    ground truth needs this sibling."""
    raw = spark.read.format("binaryFile").load(path).select("content")

    def chop(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                data = bytes(blob)
                arr = np.frombuffer(data, dtype=np.int32)
                if arr.size == 0:
                    continue
                k = int(arr[0])
                if k <= 0 or arr.size % (k + 1) != 0:
                    raise ValueError("bad ivecs")
                mat = arr.reshape(-1, k + 1)
                if not (mat[:, 0] == k).all():
                    raise ValueError("bad ivecs (ragged K)")
                yield pd.DataFrame(
                    {
                        "query_id": np.arange(mat.shape[0], dtype=np.int64),
                        "neighbor_ids": list(
                            np.ascontiguousarray(mat[:, 1:])
                        ),
                    }
                )

    out = raw.mapInPandas(chop, schema=GROUNDTRUTH_SCHEMA)
    if max_rows is None:
        return out
    ranked = out.withColumn(
        "__h", F.xxhash64(F.col("query_id"), F.lit(SAMPLE_SEED))
    )
    return ranked.orderBy("__h").limit(max_rows).drop("__h")


def _decode_bvecs(data: bytes) -> np.ndarray:
    """``.bvecs`` decode — the uint8 sibling of ``.fvecs`` and the
    format the billion-scale ANN benchmarks (bigann/SIFT1B) ship
    their corpora in: records ``[int32 dim][dim×uint8]``. Values are
    widened to float32 (the engine's value space; the 0..255 codes
    are exactly representable)."""
    if len(data) < 4:
        raise ValueError("bad bvecs")
    dim = int(np.frombuffer(data, dtype=np.int32, count=1)[0])
    rec = 4 + dim
    if dim <= 0 or len(data) % rec != 0:
        raise ValueError("size mismatch")
    raw = np.frombuffer(data, dtype=np.uint8).reshape(-1, rec)
    dims = raw[:, :4].copy().view(np.int32).ravel()
    if not (dims == dim).all():
        raise ValueError("bad bvecs (ragged dim)")
    return np.ascontiguousarray(raw[:, 4:]).astype(np.float32)


def load_bvecs(spark: SparkSession, path: str, max_rows: int | None = DEFAULT_MAX_ROWS) -> DataFrame:
    """S3 sibling: FAISS/bigann ``.bvecs`` (uint8 vectors)."""
    return _binary_records_df(spark, path, _decode_bvecs, max_rows)


def _decode_int_header(data: bytes) -> np.ndarray:
    """S4 fallback: ``[int32 L][int32 D]`` header binary (``ANNCode.py:150-158``)."""
    rows, dim = np.frombuffer(data, dtype=np.int32, count=2)
    buf = np.frombuffer(data, dtype=np.float32, offset=8, count=int(rows) * int(dim))
    return buf.reshape(int(rows), int(dim))


def load_matrix(spark: SparkSession, path: str, max_rows: int | None = DEFAULT_MAX_ROWS) -> DataFrame:
    """S4: dispatch by extension (reference ``load_matrix``, ``ANNCode.py:140-158``)."""
    lowered = path.lower()
    if lowered.endswith(".vec"):
        return load_vec(spark, path, max_rows)
    if lowered.endswith(".fvecs"):
        return load_fvecs(spark, path, max_rows)
    if lowered.endswith(".ivecs"):
        return load_ivecs(spark, path, max_rows)
    if lowered.endswith(".bvecs"):
        return load_bvecs(spark, path, max_rows)
    if lowered.endswith(".parquet"):
        return _subsample(spark.read.parquet(path), max_rows)
    try:
        df = load_bin_header_body(spark, path, max_rows)
        df.limit(1).collect()  # force a decode to trigger the fallback
        return df
    except Exception:
        return _binary_records_df(spark, path, _decode_int_header, max_rows)


def synthetic_corpus(
    spark: SparkSession,
    n_rows: int = 2000,
    dim: int = 128,
    seed: int = 42,
    partitions: int | None = None,
) -> DataFrame:
    """S5: seeded Gaussian demo corpus (reference ``ANNCode.py:816-819``).

    Distributed + deterministic: each Arrow batch draws from an RNG
    seeded by ``(seed, first vec_id in batch)``, so the values for a
    given vec_id do not depend on partitioning.
    """
    base = spark.range(0, n_rows, numPartitions=partitions)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            out = np.empty((len(ids), dim), dtype=np.float32)
            for j, vid in enumerate(ids):
                rng = np.random.default_rng((seed, int(vid)))
                out[j] = rng.standard_normal(dim, dtype=np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(out)})

    return base.mapInPandas(gen, schema=VECTOR_SCHEMA)


def convert_to_parquet(df: DataFrame, out_path: str) -> None:
    """One-time ingest: land any vector source as ZSTD parquet (the
    engine's native layout; analog of the reference's bit-plane pages +
    zlib, ``ANNCode.py:668-704``)."""
    df.write.mode("overwrite").option("compression", "zstd").parquet(out_path)
