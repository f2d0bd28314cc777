"""MERGE INTO (upsert) as a Catalyst-optimizable DataFrame re-expression.

Spark's MERGE INTO statement needs a row-level-operation table provider
(Iceberg/Delta); with plain parquet tables the same semantics are a full
outer join — which is also exactly how those providers execute a COW merge
internally. Semantics implemented:

    WHEN MATCHED THEN UPDATE SET <update_cols from source>
    WHEN NOT MATCHED THEN INSERT *

Scale notes: the join shuffles both sides on the merge key once (or
broadcasts a small source — the common CDC case); COW then rewrites only
matched files when paired with partition pruning on the target. Rows touched
once, no driver loops.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    update_cols: list[str] | None = None,
) -> DataFrame:
    """Return the post-MERGE state of ``target``.

    ``update_cols``: columns taken from source when keys match (default:
    every non-key column source shares with target). Source rows with no
    target match are inserted; target rows with no source match pass
    through unchanged.
    """
    t_cols = target.columns
    if update_cols is None:
        update_cols = [c for c in source.columns if c in t_cols and c not in on]
    missing = [c for c in on + update_cols if c not in source.columns]
    if missing:
        raise ValueError(f"source lacks merge columns: {missing}")

    t = target.alias("t")
    s = source.alias("s")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on]
    )
    joined = t.join(s, cond, "full_outer")

    matched = reduce(lambda a, b: a & b, [F.col(f"s.{k}").isNotNull() for k in on])
    out_cols = []
    for c in t_cols:
        if c in on:
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        elif c in update_cols:
            # matched → source value; insert → source value; else target
            out_cols.append(
                F.when(matched, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            )
        elif c in source.columns:
            # not an update col, but needed to materialize inserted rows
            out_cols.append(F.coalesce(F.col(f"t.{c}"), F.col(f"s.{c}")).alias(c))
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
