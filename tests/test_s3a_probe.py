"""S3A write-through probe (VERDICT r2 task 7).

The reference's multipart uploader (/root/reference/src/storage/minio.rs:
139-242) maps to Spark's S3A committer stack, configured by
``sinks.s3a_conf`` / ``apply_s3a_conf``. Whether the committer can RUN
here is a classpath question, so this module PROBES it and pins the
result either way:

- jars present (a real deployment): write a partitioned dataset through
  an ``s3a://`` URI against an in-process loopback S3 server — the full
  multipart path executes.
- jars absent (this container: pyspark 4.1.2 ships hadoop-client-* but
  NOT hadoop-aws / the AWS SDK bundle): assert the failure is EXACTLY
  the missing-class error — proving the residual risk is jar
  deployment, not our configuration — and that ``apply_s3a_conf``
  degrades as documented (hadoop keys land, committer keys reported
  skipped).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.sinks import apply_s3a_conf, s3a_conf


def _s3a_class_loadable(spark) -> bool:
    jvm = spark.sparkContext._jvm
    try:
        jvm.java.lang.Class.forName("org.apache.hadoop.fs.s3a.S3AFileSystem")
        return True
    except Exception:
        return False


def test_s3a_classpath_probe_result_is_pinned(spark):
    """The committed record of the environment probe: flipping means the
    container gained/lost hadoop-aws and the write-through test below
    changed arms."""
    loadable = _s3a_class_loadable(spark)
    jars = spark.sparkContext._jsc.sc().listJars().mkString(",")
    # pyspark 4.1.2's bundled jars dir has no hadoop-aws/aws-sdk (checked
    # at build: hadoop-client-api/runtime only) — so the class must not
    # load unless the deployment added the jars explicitly.
    import glob
    import os

    import pyspark

    jar_dir = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    has_aws_jar = bool(
        glob.glob(os.path.join(jar_dir, "*hadoop-aws*"))
        or glob.glob(os.path.join(jar_dir, "*aws-java-sdk*"))
        or glob.glob(os.path.join(jar_dir, "bundle-*"))
    )
    assert loadable == has_aws_jar, (
        f"classpath probe mismatch: Class.forName={loadable}, "
        f"jars present={has_aws_jar}, extra jars: {jars}"
    )


def test_s3a_conf_degrades_exactly_as_documented(spark):
    """apply_s3a_conf on THIS classpath: every spark.hadoop.* key must
    land on the live Hadoop Configuration; the two committer classes
    (which need the spark-hadoop-cloud module) must be reported skipped
    when absent — silent misconfiguration is the failure mode that
    corrupts object-store writes at scale."""
    conf = s3a_conf("http://127.0.0.1:9", "ak", "sk")
    skipped = apply_s3a_conf(spark, conf)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    assert hconf.get("fs.s3a.endpoint") == "http://127.0.0.1:9"
    assert hconf.get("fs.s3a.path.style.access") == "true"
    assert hconf.get("fs.s3a.multipart.size") == "64M"
    cloud_loadable = True
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol"
        )
    except Exception:
        cloud_loadable = False
    if cloud_loadable:
        assert skipped == []
    else:
        assert set(skipped) == {
            "spark.sql.sources.commitProtocolClass",
            "spark.sql.parquet.output.committer.class",
        }


def test_s3a_write_through_or_exact_classpath_gap(spark, out_dir, tmp_path):
    """Either the full write-through runs (jars present) or the s3a://
    write fails with EXACTLY the missing-S3AFileSystem error (jars
    absent) — any other failure means our conf is wrong and must fail
    this test."""
    if _s3a_class_loadable(spark):
        _run_loopback_write_through(spark, tmp_path)
        return
    apply_s3a_conf(spark, s3a_conf("http://127.0.0.1:9", "ak", "sk"))
    df = spark.range(0, 10).selectExpr("id", "id % 3 AS part")
    with pytest.raises(Exception) as ei:
        df.write.mode("overwrite").partitionBy("part").parquet(
            "s3a://probe-bucket/dataset"
        )
    msg = str(ei.value)
    assert (
        "org.apache.hadoop.fs.s3a.S3AFileSystem" in msg
        and ("ClassNotFoundException" in msg or "not found" in msg)
    ), f"expected the missing-class error, got a different failure: {msg[:500]}"


def _run_loopback_write_through(spark, tmp_path):
    """Minimal S3 REST subset (PUT object / GET object / multipart
    create+part+complete / HEAD / list-v2) over http.server, backed by
    tmp_path — enough for the S3A committer's happy path."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    store: dict[str, bytes] = {}
    uploads: dict[str, dict[int, bytes]] = {}

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _key(self):
            return self.path.split("?", 1)[0].lstrip("/")

        def do_PUT(self):
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            q = self.path.split("?", 1)[1] if "?" in self.path else ""
            if "uploadId=" in q and "partNumber=" in q:
                params = dict(p.split("=", 1) for p in q.split("&"))
                uploads.setdefault(params["uploadId"], {})[
                    int(params["partNumber"])
                ] = body
            else:
                store[self._key()] = body
            self.send_response(200)
            self.send_header("ETag", '"x"')
            self.end_headers()

        def do_POST(self):
            q = self.path.split("?", 1)[1] if "?" in self.path else ""
            body = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            if q.startswith("uploads"):
                uid = f"u{len(uploads)}"
                uploads[uid] = {}
                xml = (
                    f"<InitiateMultipartUploadResult><UploadId>{uid}"
                    f"</UploadId></InitiateMultipartUploadResult>"
                )
            elif "uploadId=" in q:
                uid = dict(p.split("=", 1) for p in q.split("&"))["uploadId"]
                parts = uploads.pop(uid, {})
                store[self._key()] = b"".join(
                    parts[i] for i in sorted(parts)
                )
                xml = "<CompleteMultipartUploadResult/>"
            else:
                xml = "<Error/>"
            data = f'<?xml version="1.0"?>{xml}'.encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            data = store.get(self._key())
            if data is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_HEAD(self):
            data = store.get(self._key())
            if data is None:
                self.send_response(404)
            else:
                self.send_response(200)
                self.send_header("Content-Length", str(len(data)))
            self.end_headers()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        apply_s3a_conf(
            spark, s3a_conf(f"http://127.0.0.1:{srv.server_port}", "ak", "sk")
        )
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        hconf.set("fs.s3a.connection.ssl.enabled", "false")
        df = spark.range(0, 100).selectExpr("id", "id % 3 AS part")
        df.write.mode("overwrite").partitionBy("part").parquet(
            "s3a://probe-bucket/dataset"
        )
        back = spark.read.parquet("s3a://probe-bucket/dataset")
        assert back.count() == 100
    finally:
        srv.shutdown()
