"""Reference-parity fixtures (SURVEY.md §5.2-5.4): vendor schema round-trip,
enrichment lineage semantics, golden hive partition layout."""

from __future__ import annotations

import json
import os

import pytest

from food_panda_etl_spark.sinks import with_partition_keys, write_partitioned_vendors
from food_panda_etl_spark.vendor import (
    VENDOR_SCHEMA,
    enrich_vendors,
    read_vendor_json,
)

T0 = 1_742_500_000  # fixed epoch seconds — deterministic unlike Utc::now()


def _spool_rows():
    return [
        {
            "code": "v001",
            "name": "Alpha Grill",
            "details": {"name": "Alpha Grill", "cuisine": "bbq", "rating": 4.5},
            "batch_number": 1,
            "reviews": [{"text": "good", "score": 5}, {"text": "ok", "score": 3}],
            "ratings": {
                "total_count": 10,
                "created_at": "2025-01-01T00:00:00Z",
                "updated_at": "2025-01-02T00:00:00Z",
                "ratings": [{"count": 7, "percentage": 70, "score": 5}],
            },
            "extraction_started_at": T0,
            "extraction_completed_at": T0 + 5,
        },
        {
            # the HTTP-400 degraded row: null payloads, name Unknown
            # (src/services/vendor.rs:96-105)
            "code": "v002",
            "name": "Unknown",
            "details": None,
            "batch_number": 1,
            "reviews": None,
            "ratings": None,
            "extraction_started_at": T0,
            "extraction_completed_at": T0 + 6,
        },
    ]


def test_vendor_json_roundtrip(spark, out_dir):
    """S5+S8: spooled JSON array → typed DF → Parquet → DF, schema & values
    intact; dynamic JSON payloads erased to strings at the boundary
    (src/storage/parquet.rs:29-42)."""
    spool = os.path.join(out_dir, "spool.json")
    with open(spool, "w") as f:
        json.dump(_spool_rows(), f)

    df = read_vendor_json(spark, spool)
    assert [f.name for f in df.schema.fields] == [f.name for f in VENDOR_SCHEMA.fields]
    assert [f.dataType for f in df.schema.fields] == [
        f.dataType for f in VENDOR_SCHEMA.fields
    ]

    pq = os.path.join(out_dir, "vendors.parquet")
    df.write.parquet(pq)
    back = spark.read.parquet(pq)
    assert [f.dataType for f in back.schema.fields] == [
        f.dataType for f in VENDOR_SCHEMA.fields
    ]

    rows = {r["code"]: r for r in back.collect()}
    assert set(rows) == {"v001", "v002"}
    a, b = rows["v001"], rows["v002"]
    # dynamic payload captured as raw JSON text, parseable and equal
    assert json.loads(a["details"]) == _spool_rows()[0]["details"]
    assert json.loads(a["reviews"]) == _spool_rows()[0]["reviews"]
    assert json.loads(a["ratings"])["total_count"] == 10
    assert a["extraction_started_at"] == T0
    # degraded row: nulls survive, row kept (left-outer semantics)
    assert b["details"] is None and b["reviews"] is None and b["ratings"] is None
    assert b["name"] == "Unknown"


@pytest.fixture()
def enrichment_inputs(spark):
    codes = spark.createDataFrame(
        [(1, f"v{i:03d}") for i in range(1, 6)], "city_id int, code string"
    )
    details = spark.createDataFrame(
        [
            ("v001", '{"name":"Alpha Grill","cuisine":"bbq"}'),
            ("v002", '{"cuisine":"thai"}'),  # no name key → Unknown
            # v003 absent → 400-path: row kept, all payloads null
            ("v004", '{"name":"Delta Diner"}'),
            ("v005", '{"name":"Echo Eats"}'),
        ],
        "code string, details string",
    )
    reviews = spark.createDataFrame(
        [("v001", json.dumps({"text": f"r{i}", "i": i}), 1000 + i) for i in range(5)]
        + [("v004", json.dumps({"text": "only"}), 1)],
        "code string, review string, created_at long",
    )
    ratings = spark.createDataFrame(
        [("v001", '{"total_count":10}'), ("v004", '{"total_count":3}')],
        "code string, ratings string",
    )
    return codes, details, reviews, ratings


def test_enrich_vendors_semantics(spark, enrichment_inputs):
    codes, details, reviews, ratings = enrichment_inputs
    out = enrich_vendors(
        codes, details, reviews, ratings,
        page_size=2, reviews_cap=3, started_at=T0, completed_at=T0 + 9,
    )
    assert [f.name for f in out.schema.fields] == ["city_id"] + [
        f.name for f in VENDOR_SCHEMA.fields
    ]
    rows = {r["code"]: r for r in out.collect()}
    # left-outer: all 5 codes survive, including the detail-less v003
    assert set(rows) == {f"v{i:03d}" for i in range(1, 6)}
    assert rows["v003"]["details"] is None
    assert rows["v003"]["name"] == "Unknown"
    # JSON name extraction with default (src/services/vendor.rs:61-64)
    assert rows["v001"]["name"] == "Alpha Grill"
    assert rows["v002"]["name"] == "Unknown"
    # newest-cap reviews, descending created_at, valid JSON array text
    top = json.loads(rows["v001"]["reviews"])
    assert [r["i"] for r in top] == [4, 3, 2]
    assert json.loads(rows["v004"]["reviews"]) == [{"text": "only"}]
    assert rows["v002"]["reviews"] is None
    # per-city batch numbering: 5 codes / page_size 2 → pages 1,1,2,2,3
    assert [rows[f"v{i:03d}"]["batch_number"] for i in range(1, 6)] == [1, 1, 2, 2, 3]
    assert rows["v001"]["extraction_completed_at"] == T0 + 9


def test_partitioned_sink_golden_layout(spark, out_dir):
    """Golden layout (SURVEY.md §5.3): hive keys identical to
    src/main.rs:236-244 including zero-padded month/day."""
    df = spark.createDataFrame(
        [
            (7, "v001", 1_741_300_000),   # 2025-03-06 UTC
            (7, "v002", 1_762_000_000),   # 2025-11-01 UTC
            (12, "v003", 1_741_300_000),
        ],
        "city_id int, code string, extraction_completed_at long",
    )
    base = os.path.join(out_dir, "lake")
    write_partitioned_vendors(df, base)

    found = set()
    for root, _dirs, files in os.walk(base):
        if any(f.endswith(".parquet") for f in files):
            found.add(os.path.relpath(root, base))
    assert found == {
        "city_id=7/year=2025/month=03/day=06",
        "city_id=7/year=2025/month=11/day=01",
        "city_id=12/year=2025/month=03/day=06",
    }
    # read-back prunes by partition key and recovers all rows
    back = spark.read.parquet(base)
    assert back.count() == 3
    assert back.filter("city_id = 7 and month = '03'").count() == 1


def test_with_partition_keys_accepts_timestamp(spark):
    df = spark.createDataFrame([("2025-03-06 10:00:00",)], "ts string").selectExpr(
        "cast(ts as timestamp) as extraction_completed_at"
    )
    r = with_partition_keys(df).collect()[0]
    assert (r["year"], r["month"], r["day"]) == ("2025", "03", "06")


def test_partition_pruning_reaches_scan(spark, out_dir):
    """S9 at scale: a city_id/date predicate must prune partitions at plan
    time (PartitionFilters on the scan), not filter post-read."""
    import os as _os

    df = spark.createDataFrame(
        [(c, f"v{c}{i}", 1_741_300_000 + c * 86_400)
         for c in (1, 2, 3) for i in range(4)],
        "city_id int, code string, extraction_completed_at long",
    )
    base = _os.path.join(out_dir, "pruned_lake")
    write_partitioned_vendors(df, base)
    q = spark.read.parquet(base).filter("city_id = 2 and month = '03'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "city_id" in plan.split("PartitionFilters", 1)[1][:200]
    assert q.count() == 4


def test_compact_parquet_merges_small_files(spark, out_dir):
    """A fragmented dataset (64 tiny files) compacts to the byte-target
    file count with identical rows; a second compaction is a no-op shape."""
    import glob
    import os

    from food_panda_etl_spark.sinks import compact_parquet
    from food_panda_etl_spark.tables import load_table

    path = os.path.join(out_dir, "frag")
    li = load_table(spark, os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001"), "lineitem")
    li.repartition(64).write.parquet(path)  # simulate a streaming writer
    before = len(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))
    assert before >= 64
    rows_before = spark.read.parquet(path).count()
    checksum_before = (
        spark.read.parquet(path).selectExpr("sum(hash(l_orderkey, l_linenumber)) h").collect()[0]["h"]
    )
    n_files = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n_files < before and n_files >= 1
    assert spark.read.parquet(path).count() == rows_before
    checksum_after = (
        spark.read.parquet(path).selectExpr("sum(hash(l_orderkey, l_linenumber)) h").collect()[0]["h"]
    )
    assert checksum_after == checksum_before


def test_compact_parquet_per_partition_sizing(spark, out_dir):
    """ADVICE r2: with partition_keys the file count must be sized PER
    partition value — a hot partition gets many files, a cold one gets 1 —
    not a single global count smeared across values."""
    import glob
    import os

    from food_panda_etl_spark.sinks import compact_parquet

    path = os.path.join(out_dir, "frag_hive")
    hot = spark.range(0, 60_000).selectExpr("'hot' AS k", "id", "uuid() AS payload")
    cold = spark.range(0, 50).selectExpr("'cold' AS k", "id", "uuid() AS payload")
    hot.unionAll(cold).repartition(16).write.partitionBy("k").parquet(path)
    checksum_before = (
        spark.read.parquet(path).selectExpr("sum(hash(k, id)) h").collect()[0]["h"]
    )
    hot_bytes = sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(path, "k=hot", "*.parquet"))
    )
    target = max(1, hot_bytes // 3)  # hot → ~3-4 files, cold → 1
    compact_parquet(spark, path, target_file_bytes=target, partition_keys=["k"])
    hot_files = glob.glob(os.path.join(path, "k=hot", "*.parquet"))
    cold_files = glob.glob(os.path.join(path, "k=cold", "*.parquet"))
    assert len(cold_files) == 1, f"cold partition fragmented: {len(cold_files)}"
    assert 2 <= len(hot_files) <= 6, f"hot partition file count {len(hot_files)}"
    checksum_after = (
        spark.read.parquet(path).selectExpr("sum(hash(k, id)) h").collect()[0]["h"]
    )
    assert checksum_after == checksum_before


def test_compact_parquet_crash_recovery(spark, out_dir):
    """ADVICE r2: a crash between the two swap moves leaves the original
    at .__compact_old__ and nothing at `path`; the next invocation must
    restore and proceed instead of failing on the missing dataset."""
    import os
    import shutil

    from food_panda_etl_spark.sinks import compact_parquet

    path = os.path.join(out_dir, "crashy")
    spark.range(0, 1000).selectExpr("id", "uuid() AS payload").repartition(8).write.parquet(path)
    rows = spark.read.parquet(path).count()
    # Simulate the crash window: old moved aside, path gone, stale tmp left.
    shutil.move(path, path + ".__compact_old__")
    os.makedirs(path + ".__compact_tmp__", exist_ok=True)
    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n >= 1
    assert spark.read.parquet(path).count() == rows
    assert not os.path.exists(path + ".__compact_old__")
    assert not os.path.exists(path + ".__compact_tmp__")
