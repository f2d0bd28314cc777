#!/usr/bin/env python
"""Dump .explain('formatted') output for the round-13 optimization targets
into plans/r13/<query>_<suffix>.txt (before/after evidence for the
optimization round).  Usage: python scripts/dump_r13_plans.py before|after
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from biglake_iceberg_python_spark.plans.registry import load_all  # noqa: E402
from biglake_iceberg_python_spark.session import build_session  # noqa: E402

TARGETS = [
    "dedup_minhash_lsh",
    "dedup_minhash_oph",
    "dedup_substring_spans",
    "text_bm25_search",
    "text_lm_perplexity",
    "tpch_q21_waiting_supplier",
    "graph_pagerank",
    "graph_kcore",
]


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump_r13_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    for name in TARGETS:
        df = reg[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print("wrote", path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
