#!/usr/bin/env python
"""Exact driver simulation: a PLAIN SparkSession (none of our confs) with a
hostile non-UTC, non-hour-offset timezone, every registered query run at
sf0.01 and compared to its DuckDB oracle with the driver's compare logic.

This is the pre-snapshot gate the round-3 retro established: plans.check
uses build_session (our confs), so it can mask conf-dependent breakage —
this script can't. Usage:

    python scripts/driver_sim.py [names...]   # default: all queries
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from biglake_iceberg_python_spark.plans.check import (  # noqa: E402
    compare,
    duckdb_connect,
)
from biglake_iceberg_python_spark.plans.registry import (  # noqa: E402
    load_all,
    resolve_oracle,
)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "Asia/Kathmandu")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    registry = load_all()
    names = sys.argv[1:] or list(registry)
    con = duckdb_connect(sf_dir)
    n_ok = 0
    for name in names:
        spec = registry[name]
        try:
            df = spec.fn(spark, sf_dir)
            sql = resolve_oracle(spec, sf_dir)
            if sql is None:
                ok = df.count() >= 0
                detail = "rows-only"
            else:
                r = compare(df, con, sql)
                ok = r["ok"]
                detail = "" if ok else str(
                    {k: v for k, v in r.items() if k != "ok"}
                )[:300]
        except Exception as e:  # keep sweeping
            ok, detail = False, f"{type(e).__name__}: {e}"
        n_ok += ok
        print(f"{'OK  ' if ok else 'FAIL'} {name} {detail}")
    print(f"{n_ok}/{len(names)} ok")
    return 0 if n_ok == len(names) else 1


if __name__ == "__main__":
    raise SystemExit(main())
