"""Sinks: hive-partitioned Parquet, JSON lines, S3A/MinIO configuration.

The reference hand-rolls everything here: a row→column pivot into one Arrow
RecordBatch (``/root/reference/src/storage/parquet.rs:13-97``), a formatted
partition key ``city_id=<c>/year=<y>/month=%02d/day=%02d/vendors_<ts>.parquet``
(``src/main.rs:236-244``), and an 8 MiB multipart uploader
(``src/storage/minio.rs:139-242``). In Spark all three are declarative:
``partitionBy`` writes the identical hive layout with per-partition parallel
writers (no ``Arc<Mutex<JsonWriter>>`` single-writer bottleneck,
``src/main.rs:117``), the Parquet writer chunks row groups and spills, and
the S3A committer does multipart transparently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PARTITION_KEYS = ["city_id", "year", "month", "day"]


def with_partition_keys(df: DataFrame, ts_col: str = "extraction_completed_at") -> DataFrame:
    """Derive ``year``/``month``/``day`` partition strings from a timestamp.

    ``date_format`` with ``MM``/``dd`` reproduces the reference's zero-padded
    ``{:02}`` keys (``src/main.rs:238-244``) — plain ``month()`` would write
    ``month=8``, not ``month=08``. Year intentionally unpadded (``{}`` in the
    reference too). Accepts an epoch-seconds long (the at-rest type,
    ``src/storage/parquet.rs:24-25``) or a timestamp column.
    """
    ts = F.col(ts_col)
    if dict(df.dtypes).get(ts_col) in ("bigint", "int"):
        ts = F.timestamp_seconds(ts)
    return (
        df.withColumn("year", F.date_format(ts, "yyyy"))
        .withColumn("month", F.date_format(ts, "MM"))
        .withColumn("day", F.date_format(ts, "dd"))
    )


def write_partitioned_vendors(
    df: DataFrame,
    base_path: str,
    *,
    ts_col: str = "extraction_completed_at",
    mode: str = "overwrite",
) -> None:
    """Write the vendor table under the reference's exact hive layout.

    ``city_id=<c>/year=<y>/month=<mm>/day=<dd>/part-*.parquet`` — identical
    pruning keys to ``src/main.rs:236-244``; the epoch-stamped *filename* is
    a non-semantic artifact (Spark's task-UUID filenames serve the same
    uniqueness purpose). With ``partitionOverwriteMode=dynamic`` (session
    default) an overwrite touches only the partitions present in ``df`` —
    the day-level idempotent re-run story a 100 TB pipeline needs.
    """
    out = with_partition_keys(df, ts_col)
    out.write.mode(mode).partitionBy(*PARTITION_KEYS).parquet(base_path)


def write_json_lines(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSONL sink (S7). The reference spools a single ``[row,\\n…]`` array
    file behind a mutex (``src/storage/json.rs:14-58``) purely as a staging
    area; JSONL is the scale-correct shape (splittable, parallel writers).
    """
    df.write.mode(mode).json(path)


def s3a_conf(
    endpoint: str,
    access_key: str,
    secret_key: str,
    *,
    path_style: bool = True,
    multipart_size: str = "64M",
) -> dict[str, str]:
    """Hadoop S3A settings equivalent to the reference's MinIO client.

    ``force_path_style(true)`` (``src/storage/minio.rs:47``) ≡
    ``fs.s3a.path.style.access``; the 8 MiB multipart threshold/part size
    (``src/storage/minio.rs:140``) maps to ``fs.s3a.multipart.size`` — 64 MiB
    default here because 8 MiB parts are too small at 100 TB (S3 caps a
    multipart object at 10k parts → 8 MiB parts cap files at ~78 GiB and
    multiply request counts).

    Apply via ``spark.conf`` prefixed ``spark.hadoop.`` or on the builder;
    then ``df.write.parquet("s3a://bucket/key")`` — the committer handles
    create/upload-part/complete (``src/storage/minio.rs:150-242``) itself.

    CLASSPATH REQUIREMENT (probed and pinned by tests/test_s3a_probe.py):
    the S3A connector is NOT part of the Spark distribution — the
    deployment must ship ``hadoop-aws-<hadoop.version>.jar`` + the AWS
    SDK ``bundle`` jar (and ``spark-hadoop-cloud`` for the committer
    protocol classes). This container's pyspark 4.1.2 bundles
    ``hadoop-client-api/runtime`` only, so an ``s3a://`` write here fails
    with ``ClassNotFoundException: org.apache.hadoop.fs.s3a.S3AFileSystem``
    — the probe test asserts that EXACT failure (config is correct, the
    jar is the only gap) and auto-upgrades to a live loopback-S3
    write-through when the jars are present.
    """
    return {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.access.key": access_key,
        "spark.hadoop.fs.s3a.secret.key": secret_key,
        "spark.hadoop.fs.s3a.path.style.access": str(path_style).lower(),
        "spark.hadoop.fs.s3a.multipart.size": multipart_size,
        # Directory committer: task-level commit without rename storms —
        # the correctness/perf baseline for object stores.
        "spark.hadoop.fs.s3a.committer.name": "directory",
        "spark.sql.sources.commitProtocolClass": (
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        ),
        "spark.sql.parquet.output.committer.class": (
            "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
        ),
    }


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
    partition_keys: list[str] | None = None,
) -> int:
    """Small-files compaction — the unglamorous operation that keeps a
    100 TB lake readable. Streaming/incremental writers leave thousands
    of KB-sized files per partition; every downstream scan then pays one
    task + one object-store GET per file. This rewrites the dataset into
    ``ceil(bytes / target_file_bytes)`` files (per partition when
    ``partition_keys`` is given), sizing from the FILESYSTEM (actual
    bytes), not row counts. Returns the file count written.

    Sizing is PER PARTITION when ``partition_keys`` is given: each hive
    partition's byte size is measured from its own directory and the data
    is repartitioned on (partition keys, salt) with a per-partition salt
    modulus — so a 10 GiB hot partition gets 40 files while a 10 MiB cold
    one gets 1, instead of a single global count smeared across all
    partition values.

    The rewrite goes through a temp dir + swap. The swap is NOT atomic:
    a crash between the two moves leaves ``path`` absent with the intact
    original at ``<path>.__compact_old__`` — which this function detects
    and restores on the next invocation (and never deletes the old copy
    until the new tree is fully in place). On an object store, prefer a
    table format (Iceberg/Delta) whose metadata commit makes the swap
    truly atomic.
    """
    import glob
    import math
    import os
    import shutil

    from pyspark.sql import functions as F

    old = path.rstrip("/") + ".__compact_old__"
    tmp = path.rstrip("/") + ".__compact_tmp__"
    # Crash recovery: a previous run that died mid-swap left the original
    # intact at `old` and `path` missing (or half-moved tmp). Restore.
    if os.path.isdir(old) and not os.path.isdir(path):
        shutil.move(old, path)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)

    files = [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    if not files:
        return 0
    df = spark.read.parquet(path)
    if partition_keys:
        # Per-partition byte sizes from the hive directory layout:
        # group each file under its relative partition dir prefix
        # (k1=v1/k2=v2/...), then salt each partition value to its own
        # ceil(bytes/target) file count. Hash repartition on
        # (keys..., salt) spreads writers; partitionBy reassembles the
        # layout. A rare (keys,salt) hash collision merges two groups
        # into one task — file sizes stay as computed, the task just
        # writes two files.
        part_bytes: dict[str, int] = {}
        for f in files:
            rel = os.path.relpath(os.path.dirname(f), path)
            key = "/".join(p.split("=", 1)[1] for p in rel.split(os.sep) if "=" in p)
            part_bytes[key] = part_bytes.get(key, 0) + os.path.getsize(f)
        n_per_part = {
            k: max(1, math.ceil(b / target_file_bytes)) for k, b in part_bytes.items()
        }
        mod_map = F.create_map(
            *[F.lit(x) for kv in n_per_part.items() for x in kv]
        )
        pk_str = F.concat_ws("/", *[F.col(k).cast("string") for k in partition_keys])
        salted = df.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*df.columns), F.coalesce(mod_map[pk_str], F.lit(1))),
        )
        n_total = sum(n_per_part.values())
        writer = (
            salted.repartition(n_total, *(partition_keys + ["__salt"]))
            .drop("__salt")
            .write.mode("overwrite")
            .partitionBy(*partition_keys)
        )
    else:
        total_bytes = sum(os.path.getsize(f) for f in files)
        n_out = max(1, math.ceil(total_bytes / target_file_bytes))
        writer = df.repartition(n_out).write.mode("overwrite")
    writer.parquet(tmp)
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return len(
        [f for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)]
    )


def apply_s3a_conf(spark, conf: dict[str, str]) -> list[str]:
    """Apply :func:`s3a_conf` to a LIVE session: ``spark.hadoop.*`` keys
    are static builder conf, but the underlying Hadoop Configuration —
    the object the S3A filesystem actually reads — is mutable at runtime.
    SQL-layer keys (committer protocol classes) go through ``spark.conf``,
    which validates the class is loadable: on a deployment without the
    ``spark-hadoop-cloud`` module those keys cannot apply and are returned
    as skipped (empty list = everything applied). Set them on the builder
    of a cluster that ships the cloud committers.

    Runbook: ``apply_s3a_conf(spark, s3a_conf(endpoint, key, secret))``
    then ``df.write.parquet("s3a://bucket/prefix")`` — the directory
    committer multiparts and commits without rename storms.
    """
    from pyspark.errors.exceptions.captured import IllegalArgumentException

    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    skipped: list[str] = []
    for k, v in conf.items():
        if k.startswith("spark.hadoop."):
            hconf.set(k[len("spark.hadoop."):], v)
        else:
            try:
                spark.conf.set(k, v)
            except IllegalArgumentException:
                skipped.append(k)  # committer jar not on this classpath
    return skipped


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    *,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: pre-shuffles data into ``num_buckets`` hash
    buckets on ``bucket_col`` so subsequent equi-joins/aggregations on that
    key read co-located buckets and skip their shuffle entirely — the
    pay-once-shuffle-never-again pattern for fact tables that join on the
    same key query after query. (Bucketing requires ``saveAsTable``;
    plain-path parquet cannot carry bucket metadata.)"""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)
