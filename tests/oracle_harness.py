"""Local replica of the driver's Spark-vs-DuckDB correctness check.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same fixture dir, then compares row count, column names, and values
(order-insensitive, exact after the queries' own rounding).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    FIXTURE_TABLES,
)


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    # lists/arrays → tuples so they sort/compare
    for col in df.columns:
        if df[col].map(lambda v: isinstance(v, (list, tuple, np.ndarray))).any():
            df[col] = df[col].map(
                lambda v: tuple(float(x) for x in v) if v is not None else None
            )
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_values_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    got = _canon(spark_df.toPandas())
    want = _canon(con.sql(sql).df())
    problems: list[str] = []
    if list(got.columns) != list(want.columns):
        problems.append(f"columns differ: spark={list(got.columns)} duckdb={list(want.columns)}")
        return problems
    if len(got) != len(want):
        problems.append(f"row count differs: spark={len(got)} duckdb={len(want)}")
        return problems
    # dtype-kind parity: the driver hashes value *representations*, so a
    # Spark int64 column vs a DuckDB HUGEINT→float64 column hash-mismatches
    # even when every value is numerically identical (the r04 bm25_topn
    # failure: `sum(BIGINT)` promotes to HUGEINT in DuckDB). Flag any
    # integer-vs-float kind disagreement before the value compare, which
    # would otherwise pass.
    _KIND = {"i": "int", "u": "int", "f": "float", "b": "bool"}
    for col in got.columns:
        gk = _KIND.get(got[col].dtype.kind, "other")
        wk = _KIND.get(want[col].dtype.kind, "other")
        if {gk, wk} == {"int", "float"}:
            problems.append(
                f"column {col!r}: dtype kind differs (spark={got[col].dtype}, "
                f"duckdb={want[col].dtype}) — driver hash would mismatch"
            )
    if problems:
        return problems
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"column {col!r}: {len(bad)}/{len(ga)} values differ, first at row {i}: "
                f"spark={x!r} duckdb={y!r}"
            )
    return problems
