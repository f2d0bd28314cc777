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

    # Row-presence markers: `eqNullSafe` lets a NULL source key match a NULL
    # target key, so presence must be detected with a non-nullable marker —
    # testing `s.<key> IS NOT NULL` would misclassify that matched row as
    # unmatched and silently keep target values for its update columns.
    t = target.withColumn("__t_present", F.lit(1)).alias("t")
    s = source.withColumn("__s_present", F.lit(1)).alias("s")
    cond = reduce(
        lambda a, b: a & b, [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in on]
    )
    joined = t.join(s, cond, "full_outer")

    src_present = F.col("s.__s_present").isNotNull()
    tgt_present = F.col("t.__t_present").isNotNull()
    out_cols = []
    for c in t_cols:
        if c in update_cols:
            # matched → source value; insert → source value; else target
            out_cols.append(
                F.when(src_present, F.col(f"s.{c}")).otherwise(F.col(f"t.{c}"))
                .alias(c)
            )
        elif c in source.columns:
            # keys and passthrough columns: the target's value whenever the
            # target row exists (even a NULL one — coalesce would wrongly
            # pull the source value there); source only for pure inserts.
            out_cols.append(
                F.when(tgt_present, F.col(f"t.{c}")).otherwise(F.col(f"s.{c}"))
                .alias(c)
            )
        else:
            out_cols.append(F.col(f"t.{c}").alias(c))
    return joined.select(*out_cols)
