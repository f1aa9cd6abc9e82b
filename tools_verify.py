"""Drive the driver contract end-to-end against the DuckDB oracle.

Usage: python tools_verify.py [sf_dir] [query ...]
Defaults: sf0.01, every declared query (oracled → hash compare;
rows-only → runs clean with >0 rows unless known-empty is fine).
Prints one line per query and a final summary; exit 1 on any failure.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from food_panda_etl_spark.session import get_spark  # noqa: E402
from tests.oracle_compare import compare  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.01"
    names = args[1:] if args and os.path.isdir(args[0]) else args
    spark = get_spark(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    rows = entrymod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows")
    assert len(rows) >= 1
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = names or list(queries)
    failures = []
    for name in names:
        t0 = time.perf_counter()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                problems = compare(df, oracles[name], sf_dir)
                status = "OK" if not problems else f"FAIL {problems}"
            else:
                n = df.count()
                problems = []
                status = f"OK rows-only ({n} rows)"
        except Exception as e:  # noqa: BLE001
            problems = [str(e)]
            status = f"ERROR {e}"
        dt = time.perf_counter() - t0
        print(f"{name}: {status} [{dt:.1f}s]", flush=True)
        if problems:
            failures.append(name)
    print(f"SUMMARY: {len(names) - len(failures)}/{len(names)} green; failures: {failures}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
