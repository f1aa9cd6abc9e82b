"""Ingestion connector tests: paginated Python DataSource, retry policy,
mapInPandas enrichment lookups, and the full rebuilt ETL end-to-end."""

from __future__ import annotations

import json
import math
import os

import pytest

from food_panda_etl_spark.sinks import write_partitioned_vendors
from food_panda_etl_spark.sources import (
    FakeVendorBackend,
    lookup_vendor_payloads,
    register_vendor_list_source,
    retry_with_backoff,
    split_payloads,
)
from food_panda_etl_spark.vendor import PAGE_SIZE, enrich_vendors

BACKEND = FakeVendorBackend()


@pytest.fixture()
def vendor_source(spark):
    register_vendor_list_source(spark)
    return spark.read.format("vendor_list").option("cities", "11,22")


def test_listing_scan_counts_and_pages(vendor_source):
    df = vendor_source.load()
    got = {r["city_id"]: r["n"] for r in df.groupBy("city_id").count().withColumnRenamed("count", "n").collect()}
    assert got == {c: BACKEND.n_vendors(c) for c in ("11", "22")}
    # one task per page — the executor fan-out unit
    expected_pages = sum(
        math.ceil(BACKEND.n_vendors(c) / PAGE_SIZE) for c in ("11", "22")
    )
    assert df.rdd.getNumPartitions() == expected_pages
    # batch_number is the 1-based page index: page p holds codes
    # [p*48, (p+1)*48) in code order
    rows = df.filter("city_id = '11'").orderBy("code").collect()
    assert [r["batch_number"] for r in rows] == [
        i // PAGE_SIZE + 1 for i in range(len(rows))
    ]


def test_listing_scan_custom_page_size(vendor_source):
    df = vendor_source.option("page_size", "10").load()
    assert df.filter("city_id = '11'").count() == BACKEND.n_vendors("11")
    assert df.rdd.getNumPartitions() == sum(
        math.ceil(BACKEND.n_vendors(c) / 10) for c in ("11", "22")
    )


def test_retry_with_backoff_attempts_and_sleeps():
    calls, sleeps = [], []

    def flaky(attempt):
        calls.append(attempt)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    out = retry_with_backoff(
        flaky, retries=3, base_delay_s=1.0, max_jitter_s=0.0, sleeper=sleeps.append
    )
    assert out == "ok"
    assert calls == [0, 1, 2]  # attempt index exposed → client rotation hook
    assert sleeps == [1.0, 2.0]  # doubling backoff, no real sleep


def test_retry_with_backoff_exhaustion():
    with pytest.raises(RuntimeError, match="always"):
        retry_with_backoff(
            lambda a: (_ for _ in ()).throw(RuntimeError("always")),
            retries=2,
            sleeper=lambda _s: None,
        )


def test_lookup_payloads_shapes(spark):
    codes = spark.createDataFrame(
        [("c9-v00011",), ("c9-v00003",), ("c9-v00004",)], "code string"
    )
    rows = {r["code"]: r for r in lookup_vendor_payloads(codes).collect()}
    # v00011: 11 % 23 == 11 → 400 path: everything null
    assert rows["c9-v00011"]["details"] is None
    assert rows["c9-v00011"]["ratings"] is None and rows["c9-v00011"]["reviews"] is None
    # v00003: details present but no name key; 3 reviews
    assert "name" not in json.loads(rows["c9-v00003"]["details"])
    assert len(rows["c9-v00003"]["reviews"]) == 3
    # v00004: fully populated
    assert json.loads(rows["c9-v00004"]["details"])["name"] == "Vendor c9-v00004"
    assert rows["c9-v00004"]["ratings"] is not None


def test_full_etl_end_to_end(spark, out_dir):
    """The whole reference pipeline rebuilt: paginated listing scan →
    batched enrichment lookups → left-outer enrichment lineage →
    hive-partitioned parquet (``/root/reference/src/main.rs:107-273`` as
    one declarative flow)."""
    register_vendor_list_source(spark)
    codes = (
        spark.read.format("vendor_list")
        .option("cities", "7")
        .load()
        .select("city_id", "code")
    )
    details, reviews, ratings = split_payloads(lookup_vendor_payloads(codes))
    vendors = enrich_vendors(
        codes, details, reviews, ratings,
        started_at=1_741_300_000, completed_at=1_741_300_500,
    )
    base = os.path.join(out_dir, "lake")
    write_partitioned_vendors(vendors, base)

    back = spark.read.parquet(base)
    n = BACKEND.n_vendors("7")
    assert back.count() == n
    # partition layout carries the derived date keys
    assert set(os.listdir(base)) >= {"city_id=7"}
    got = {r["code"]: r for r in back.collect()}
    # 400-path rows survive with null payloads and Unknown name
    v11 = got["c7-v00011"]
    assert v11["details"] is None and v11["name"] == "Unknown"
    # missing-name details degrade to Unknown but keep the payload
    v3 = got["c7-v00003"]
    assert v3["details"] is not None and v3["name"] == "Unknown"
    # reviews pack into a JSON array, newest first
    v4 = got["c7-v00004"]
    revs = json.loads(v4["reviews"])
    assert [r["k"] for r in revs] == [3, 2, 1, 0]
    assert got["c7-v00042"]["name"] == "Vendor c7-v00042"
