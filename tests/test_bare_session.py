"""The round-1 failure class, as a regression net: the correctness
driver builds its OWN SparkSession — none of session.py's conf is there.
Every session-sensitive query (events' TIMESTAMP(NANOS) read, timezone
math, pandas_udf paths) must still hash-match its oracle on a session we
did not build. Runs in a subprocess because a second SparkSession in
this JVM would silently reuse the fixture's context."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

# deliberately bare: no UTC conf, no nanosAsLong, no arrow/AQE tuning
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

SENSITIVE = [
    "q_epoch_cast",      # events nanos + session TZ
    "q_json_extract",    # events nanos
    "q_group_pct",       # events nanos
    "q_asof_join",       # events nanos + window over ts
    "q_date_parts",      # TZ-dependent date math
    "q_tumbling_window", # TZ-dependent truncation
    "q_udaf",            # pandas_udf GROUPED_AGG needs arrow defaults
]
sf = sys.argv[1]
bad = []
for name in SENSITIVE:
    problems = compare(QUERIES[name](spark, sf), ORACLES[name], sf)
    if problems:
        bad.append((name, problems))
        print("FAIL", name, problems)
print("BARE_OK" if not bad else "BARE_BAD")
sys.exit(1 if bad else 0)
"""


def test_sensitive_queries_pass_on_bare_session(sf_dir):
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT, sf_dir],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )
    assert "BARE_OK" in out.stdout, f"stdout:\n{out.stdout}\nstderr:\n{out.stderr[-2000:]}"
