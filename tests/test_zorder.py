"""Z-order clustering: SQL-mirror parity (incl. the >31-bit-position
regime where un-cast INT terms wrap), guard rails, and the actual
file-skipping effect on written parquet footers."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.zorder import (
    cluster_by_zorder,
    zorder_key,
    zorder_key_sql,
)


def _ref_morton(vals: list[int], bits: int) -> int:
    """Pure-python reference interleave (column i bit b → b*n+i)."""
    n = len(vals)
    out = 0
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= (((v & ((1 << bits) - 1)) >> b) & 1) << (b * n + i)
    return out


def test_sql_mirror_matches_key_beyond_31_bits(spark):
    """4 cols × 8 bits = positions up to 31: the regime where the un-cast
    SQL form silently wrapped INT (ADVICE r3). Spark column expr, Spark
    SQL text, DuckDB SQL text, and the pure-python reference must all
    agree — including out-of-range inputs, which mask to low bits."""
    rows = [
        (a, b, c, d)
        for a, b, c, d in [
            (0, 0, 0, 0),
            (255, 255, 255, 255),
            (1, 2, 3, 4),
            (200, 100, 50, 25),
            (256, 300, 1000, 511),  # out-of-range → masked
        ]
    ]
    df = spark.createDataFrame(rows, "a INT, b INT, c INT, d INT")
    cols = [F.col(x) for x in "abcd"]
    sql = zorder_key_sql(list("abcd"), bits=8)
    got = df.select(
        "a", "b", "c", "d",
        zorder_key(cols, bits=8).alias("k_col"),
        F.expr(sql).alias("k_sql"),
    ).collect()
    con = duckdb.connect()
    con.execute("CREATE TABLE t (a INT, b INT, c INT, d INT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    duck = {
        (r[0], r[1], r[2], r[3]): r[4]
        for r in con.execute(f"SELECT a, b, c, d, ({sql}) FROM t").fetchall()
    }
    for r in got:
        key = (r["a"], r["b"], r["c"], r["d"])
        ref = _ref_morton(list(key), 8)
        assert r["k_col"] == ref, (key, r["k_col"], ref)
        assert r["k_sql"] == ref, (key, r["k_sql"], ref)
        assert duck[key] == ref, (key, duck[key], ref)


def test_guards(spark):
    df = spark.range(4).select(F.col("id").alias("a"), F.col("id").alias("b"))
    with pytest.raises(ValueError, match="exceeds a signed long"):
        zorder_key([F.col("a")] * 8, bits=8)
    with pytest.raises(ValueError, match="exceeds a signed long"):
        zorder_key_sql(["a"] * 8, bits=8)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key_sql([], bits=8)
    with pytest.raises(ValueError, match="must be positive"):
        cluster_by_zorder(df, [F.col("a"), F.col("b")], num_partitions=0)


def test_preexisting_zkey_column_survives(spark):
    """cluster_by_zorder must never clobber a user column named __zkey
    (ADVICE r3: it was overwritten and then dropped)."""
    df = spark.range(8).select(
        F.col("id").alias("a"), (F.col("id") * 10).alias("__zkey")
    )
    out = cluster_by_zorder(df, [F.col("a")], bits=3, num_partitions=2)
    assert "__zkey" in out.columns
    assert {r["__zkey"] for r in out.collect()} == {i * 10 for i in range(8)}


def _files_overlapping(path: str, lo: tuple[int, int], hi: tuple[int, int]) -> int:
    """Count parquet files whose (db, pb) row-group min/max spans overlap
    the query box [lo, hi] — exactly the skipping decision a min/max
    pruning reader makes."""
    import pyarrow.parquet as pq

    n = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        overlaps = False
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            sdb = g.column(names["db"]).statistics
            spb = g.column(names["pb"]).statistics
            if (
                sdb.max >= lo[0]
                and sdb.min <= hi[0]
                and spb.max >= lo[1]
                and spb.min <= hi[1]
            ):
                overlaps = True
                break
        n += overlaps
    return n


def test_zorder_layout_skips_files(spark, sf_dir, tmp_path):
    """The point of the layout: under a 2-dimension box predicate, the
    Z-clustered write must allow MORE file skips than the natural layout
    (same data, same file count). Asserted on real written footers."""
    from food_panda_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("date")) % 256)
        .cast("long")
        .alias("db"),
        (F.col("l_partkey") % 256).cast("long").alias("pb"),
    )
    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    nfiles = 16
    li.repartition(nfiles).write.mode("overwrite").parquet(plain_dir)
    cluster_by_zorder(
        li, [F.col("db"), F.col("pb")], bits=8, num_partitions=nfiles
    ).write.mode("overwrite").parquet(z_dir)
    # a small box in both dimensions — the multi-predicate scan the
    # one-dimensional (or random) layout cannot prune on
    lo, hi = (32, 32), (63, 63)
    plain_touch = _files_overlapping(plain_dir, lo, hi)
    z_touch = _files_overlapping(z_dir, lo, hi)
    assert z_touch < plain_touch, (z_touch, plain_touch)


def test_cluster_plan_single_range_exchange(spark, sf_dir):
    """Plan gate: clustering is ONE rangepartitioning exchange + local
    sort — no extra shuffle, no Python stage."""
    from food_panda_etl_spark.plans.lint import explain_formatted, plan_summary
    from food_panda_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_partkey") % 256).alias("pb"),
        (F.col("l_suppkey") % 256).alias("sb"),
    )
    out = cluster_by_zorder(li, [F.col("pb"), F.col("sb")], bits=8)
    assert plan_summary(out).exchanges == 1
    plan = explain_formatted(out).lower()
    assert "rangepartitioning" in plan, plan[:1500]
    assert "pythonudf" not in plan and "batchevalpython" not in plan
