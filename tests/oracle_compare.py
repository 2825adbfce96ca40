"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its oracle SQL side by side and
compares row count, column names, and canonicalized values — strict
(exact string equality after canonicalization), because the driver
compares by value hash.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import pandas as pd

from kinesis_to_opensearch_lambda_spark.sources.batch import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "<null>"
    if isinstance(v, float):
        # Dtype-faithful: the driver hashes values as materialized, so an
        # int64 3 and a float64 3.0 MUST differ here (round-1 lesson: DuckDB
        # sum(CASE…) returns HUGEINT → pandas float64 while Spark returns
        # int64; the old `3.0`→`3` collapse hid that drift).
        if math.isnan(v):
            return "<null>"  # pandas NULL-float
        return repr(float(v))
    if isinstance(v, (datetime, date, pd.Timestamp)):
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(x)}" for k, x in sorted(v.items())) + "}"
    if pd.isna(v):
        return "<null>"
    return str(v)


def _rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(_canon(v) for v in row) for row in df.itertuples(index=False))


def assert_parity(spark, name: str, sf_dir: str) -> None:
    timed_parity(spark, name, sf_dir)


def timed_parity(spark, name: str, sf_dir: str) -> dict[str, float]:
    """assert_parity plus a cost attribution: returns
    ``{"spark_sec": ..., "oracle_sec": ..., "compare_sec": ...}``
    (oracle/compare 0.0 for rows-only entries).  Sweep artifacts
    record the split so harness cost is never mistaken for engine
    cost — the r6 triangle lesson (a 950s combined figure that was
    mostly oracle) made structural per the r9 verdict.  compare_sec
    (the pure-Python row canonicalization both result sets pass
    through) was added after the r10 relational sweep showed it
    DOMINATING wide results: window_range_frame at sf10 was 165.7s
    total but only 4.1s Spark + 8.7s DuckDB — the other ~150s was the
    comparator, and without the third bucket that read as engine
    cost."""
    import time

    from kinesis_to_opensearch_lambda_spark.queries import REGISTRY

    q = REGISTRY[name]
    t0 = time.perf_counter()
    actual = q.spark(spark, sf_dir).toPandas()
    spark_sec = round(time.perf_counter() - t0, 2)
    if q.oracle is None:
        assert len(actual) >= 0  # rows-only smoke
        return {"spark_sec": spark_sec, "oracle_sec": 0.0, "compare_sec": 0.0}
    t0 = time.perf_counter()
    con = duck_con(sf_dir)
    expected = con.execute(q.oracle).fetchdf()
    oracle_sec = round(time.perf_counter() - t0, 2)
    t_cmp = time.perf_counter()

    assert sorted(actual.columns) == sorted(expected.columns), (
        f"{name}: column mismatch\n spark={sorted(actual.columns)}\n "
        f"duckdb={sorted(expected.columns)}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count {len(actual)} (spark) != {len(expected)} (duckdb)"
    )
    a_rows, e_rows = _rows(actual), _rows(expected)
    if a_rows != e_rows:
        diffs = [
            f"  spark  row {i}: {a}\n  duckdb row {i}: {e}"
            for i, (a, e) in enumerate(zip(a_rows, e_rows))
            if a != e
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch ({len(diffs)}+ differing rows shown)\n"
            + "\n".join(diffs)
        )
    return {
        "spark_sec": spark_sec,
        "oracle_sec": oracle_sec,
        "compare_sec": round(time.perf_counter() - t_cmp, 2),
    }
