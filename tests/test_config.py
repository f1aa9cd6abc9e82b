"""Settings parity: YAML + APP_ env overlay (config.rs:28-54), projection
onto Spark S3A conf. No Spark session needed."""

from __future__ import annotations

import os

from food_panda_etl_spark.config import Settings

YAML = """\
cities: ["11", "22"]
minio:
  endpoint: http://minio:9000
  access_key: minioadmin
  secret_key: miniosecret
  bucket: vendors
  region: us-east-1
api:
  headers:
    User-Agent: test-agent
    Accept: application/json
"""


def _write(tmp, text):
    p = os.path.join(tmp, "default.yaml")
    with open(p, "w") as f:
        f.write(text)
    return p


def test_yaml_load(out_dir):
    s = Settings.load(_write(out_dir, YAML), env={})
    assert s.cities == ["11", "22"]
    assert s.minio.endpoint == "http://minio:9000"
    assert s.minio.bucket == "vendors"
    assert s.api.headers["User-Agent"] == "test-agent"


def test_env_overlay_wins(out_dir):
    env = {
        "APP_MINIO__ENDPOINT": "http://other:9000",
        "APP_MINIO__SECRET_KEY": "rotated",
        "APP_CITIES": "7,8,9",
    }
    s = Settings.load(_write(out_dir, YAML), env=env)
    assert s.minio.endpoint == "http://other:9000"
    assert s.minio.secret_key == "rotated"
    assert s.minio.access_key == "minioadmin"  # unoverridden YAML survives
    assert s.cities == ["7", "8", "9"]


def test_spark_conf_projection(out_dir):
    s = Settings.load(_write(out_dir, YAML), env={})
    conf = s.spark_conf()
    # path-style access ≡ force_path_style (src/storage/minio.rs:47)
    assert conf["spark.hadoop.fs.s3a.path.style.access"] == "true"
    assert conf["spark.hadoop.fs.s3a.endpoint"] == "http://minio:9000"
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "us-east-1"
    assert s.sink_base_path() == "s3a://vendors"


def test_defaults_without_file():
    s = Settings.load(None, env={})
    assert s.cities == [] and s.spark_conf() == {}


GOLDEN_S3A = {
    "spark.hadoop.fs.s3a.endpoint": "http://minio:9000",
    "spark.hadoop.fs.s3a.access.key": "ak",
    "spark.hadoop.fs.s3a.secret.key": "sk",
    "spark.hadoop.fs.s3a.path.style.access": "true",
    "spark.hadoop.fs.s3a.multipart.size": "64M",
    "spark.hadoop.fs.s3a.committer.name": "directory",
    "spark.sql.sources.commitProtocolClass": (
        "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
    ),
    "spark.sql.parquet.output.committer.class": (
        "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter"
    ),
}


def test_s3a_conf_golden():
    """The committer/multipart mapping of the reference's MinIO client
    (force_path_style minio.rs:47, multipart minio.rs:139-242) must not
    drift: exact golden comparison."""
    from food_panda_etl_spark.sinks import s3a_conf

    assert s3a_conf("http://minio:9000", "ak", "sk") == GOLDEN_S3A


def test_s3a_conf_reaches_live_hadoop_configuration(spark):
    """apply_s3a_conf must land fs.s3a.* on the live Hadoop Configuration
    (the object the S3A filesystem reads) and SQL keys on spark.conf —
    proving the runbook works on a session we did not build."""
    from food_panda_etl_spark.sinks import apply_s3a_conf, s3a_conf

    skipped = apply_s3a_conf(spark, s3a_conf("http://minio:9000", "ak", "sk"))
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.endpoint") == "http://minio:9000"
    assert hconf.get("fs.s3a.multipart.size") == "64M"
    assert hconf.get("fs.s3a.committer.name") == "directory"
    # this test container ships no spark-hadoop-cloud jar, so exactly the
    # two committer-class keys must be reported skipped (not silently lost)
    assert set(skipped) <= {
        "spark.sql.sources.commitProtocolClass",
        "spark.sql.parquet.output.committer.class",
    }
