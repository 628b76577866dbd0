"""Local mirror of the driver's DuckDB-oracle comparison: run the Spark
query and the oracle SQL on the same parquet dir, sort columns by name,
sort rows, compare values exactly (floats too — both sides round, so any
difference is a real engine-semantics bug we want to see here, not in
CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from hielo_spark.io import TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for t in TABLES:
        conn.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return conn


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), key=lambda s: s.astype(str)).reset_index(drop=True)
    return df


def _eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    if a is None or b is None:
        return a is None and b is None
    return str(a) == str(b)


def compare(spark_df, oracle_df: pd.DataFrame, name: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    sp = _canon(spark_df.toPandas())
    du = _canon(oracle_df)
    problems: list[str] = []
    if list(sp.columns) != list(du.columns):
        problems.append(f"{name}: columns differ spark={list(sp.columns)} duck={list(du.columns)}")
        return problems
    if len(sp) != len(du):
        problems.append(f"{name}: row counts differ spark={len(sp)} duck={len(du)}")
        return problems
    sp = sp.where(pd.notnull(sp), None)
    du = du.where(pd.notnull(du), None)
    for col in sp.columns:
        sv, dv = sp[col].tolist(), du[col].tolist()
        bad = [
            (i, a, b)
            for i, (a, b) in enumerate(zip(sv, dv))
            if not _eq(a, b)
        ]
        if bad:
            i, a, b = bad[0]
            problems.append(
                f"{name}: column {col!r} mismatches at {len(bad)}/{len(sv)} rows; first row {i}: spark={a!r} duck={b!r}"
            )
    return problems
