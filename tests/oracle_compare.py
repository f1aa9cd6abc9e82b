"""Local mirror of the driver's DuckDB-oracle differential check:
same parquet tables, row-count + column-name + value comparison with
EXACT equality (the driver hash-matches, so approximate agreement is a
failure there too).
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd

from food_panda_etl_spark.tables import TABLES


def duckdb_run(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        # synthetic-fixture tests write only the table(s) under test;
        # Spark-written tables are directories of part files
        path = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(path):
            continue
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con.execute(sql).fetch_df()


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        # exact double identity — hex repr catches any bit difference
        return float(v).hex()
    if isinstance(v, (bool,)):
        return str(bool(v))
    if isinstance(v, (int,)):
        return str(int(v))
    return str(v)


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    out = []
    for _, row in df[cols].iterrows():
        out.append(tuple(_norm_cell(v) for v in row))
    return cols, sorted(out)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = match)."""
    problems: list[str] = []
    sdf = spark_df.toPandas()
    ddf = duckdb_run(oracle_sql, sf_dir)
    if len(sdf) != len(ddf):
        problems.append(f"row count: spark={len(sdf)} duckdb={len(ddf)}")
    scols, srows = canonical_rows(sdf)
    dcols, drows = canonical_rows(ddf)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duckdb={dcols}")
        return problems
    if srows != drows:
        n = 0
        for a, b in zip(srows, drows):
            if a != b:
                problems.append(f"first row diff: spark={a} duckdb={b}")
                break
        diff = len(set(srows).symmetric_difference(drows))
        problems.append(f"{diff} rows differ (of {max(len(srows), len(drows))})")
    return problems
