#!/usr/bin/env python
"""Dump .explain('formatted') output for the round-14 optimization targets
into plans/r14/<query>_<suffix>.txt (before/after evidence for the
optimization round).  Usage: python scripts/dump_r14_plans.py before|after

Also dumps the PRE-checkpoint ``_edges(spark, sf_dir)`` plan (round-13
verdict "What's wrong" #1: the committed graph query plans open on the
checkpointed ``Scan ExistingRDD``, hiding the pinned repartition exchange —
the shared edge-builder plan makes it auditable).
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
    "text_bpe_train_merges",
    "text_bpe_encode",
    "text_lm_perplexity",
    "graph_pagerank",
    "graph_kcore",
    "agg_unpivot",
]


def _dump(df, path: str, header: str) -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    with open(path, "w") as f:
        f.write(header)
        f.write(buf.getvalue())
    print("wrote", path)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(root, "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("dump_r14_plans")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reg = load_all()
    for name in TARGETS:
        df = reg[name].fn(spark, sf_dir)
        _dump(
            df,
            os.path.join(out_dir, f"{name}_{suffix}.txt"),
            f"# {name} — explain('formatted') at {sf_dir} ({suffix})\n",
        )
    # The shared graph edge builder, BEFORE any localCheckpoint truncates it.
    from biglake_iceberg_python_spark.operators.graph import _edges

    _dump(
        _edges(spark, sf_dir),
        os.path.join(out_dir, f"graph_edges_builder_{suffix}.txt"),
        f"# graph _edges(spark, sf_dir) pre-checkpoint — {sf_dir} ({suffix})\n",
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
