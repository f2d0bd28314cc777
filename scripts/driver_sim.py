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
    # Hostile-environment axes, each overridable so one script covers the
    # TZ sweep (default) AND the adversarial-partition-count sweep the
    # round-8 hardening added (e.g. SIM_CORES=3 SIM_PARTITIONS=3
    # SIM_TZ=Pacific/Chatham — few, uneven partitions shake out
    # partition-order/-count-dependent results the TZ axis can't).
    cores = os.environ.get("SPARK_GRAFT_SIM_CORES", "8")
    parts = os.environ.get("SPARK_GRAFT_SIM_PARTITIONS", cores)
    tz = os.environ.get("SPARK_GRAFT_SIM_TZ", "Asia/Kathmandu")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.sql.session.timeZone", tz)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.default.parallelism", parts)
    )
    # Opt-in heap for ABOVE-driver-scale sweeps (e.g. the round-11 sf0.1
    # full-registry run): the grading driver compares at sf0.01, where the
    # plain session's default 1g heap is part of the fidelity being
    # simulated. 10x the data in the SAME 1g local JVM is a harness
    # artifact no real deployment has (cluster heap scales with data) —
    # the graph family's two edge-sized checkpoints + 348 accumulated
    # query states legitimately exceed it. Leave unset for driver parity.
    mem = os.environ.get("SPARK_GRAFT_SIM_DRIVER_MEM")
    if mem:
        builder = builder.config("spark.driver.memory", mem)
    spark = builder.getOrCreate()
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
