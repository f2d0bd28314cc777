"""Physical-plan assertions — the scale contract, enforced by pytest.

Correct rows are necessary but not sufficient at 100 TB; these tests pin
the plan SHAPES that make the queries scale: filters pushed into the
parquet scan, column pruning, broadcast joins where a side is provably
small, TakeOrderedAndProject for global top-k, WindowGroupLimit for
per-group top-k, partial aggregation before the shuffle.
"""

from __future__ import annotations


from biglake_iceberg_python_spark.plans.registry import load_all

REGISTRY = load_all()


def plan_of(spark, sf_dir, name: str) -> str:
    df = REGISTRY[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "pricing_summary")
    # shipdate filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table is read as only the 7 needed cols
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema
    assert "l_quantity" in read_schema
    # two-phase aggregation (map-side partial before the shuffle)
    assert plan.count("HashAggregate") >= 2


def test_filter_predicates_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_predicates")
    assert "PushedFilters: [IsNotNull" in plan
    assert "GreaterThanOrEqual(o_totalprice,50000.0)" in plan


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast_star")
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan  # the fact table never shuffles


def test_shipping_priority_broadcasts_filtered_dim(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_shipping_priority")
    assert "BroadcastHashJoin" in plan
    # top-10 without a global sort
    assert "TakeOrderedAndProject" in plan


def test_global_topk_avoids_full_sort(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "scan_limit_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_per_group_topk_uses_window_group_limit(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "window_topk_per_group")
    assert "WindowGroupLimit" in plan


def test_semi_anti_join_strategies(spark, sf_dir):
    assert "LeftSemi" in plan_of(spark, sf_dir, "join_semi")
    assert "LeftAnti" in plan_of(spark, sf_dir, "join_anti")


def test_not_in_null_uses_null_aware_anti_join(spark, sf_dir):
    """NOT IN must plan as a null-aware anti join (the trailing `true` on
    the BroadcastHashJoin line), never a plain LeftAnti — a plain anti
    join would return wrong rows when the set contains NULL — and never a
    BroadcastNestedLoopJoin (the single-key case qualifies for the hash
    path)."""
    plan = plan_of(spark, sf_dir, "subquery_not_in_null")
    assert plan.count("LeftAnti, BuildRight, true") == 3
    assert "BroadcastNestedLoopJoin" not in plan


def test_theta_join_broadcasts_small_side(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_theta_range")
    assert "BroadcastNestedLoopJoin" in plan


def test_partitioned_read_prunes(spark, sf_dir):
    # The partition filter must land in PartitionFilters, not a post-scan
    # Filter over all partitions.
    df = REGISTRY["source_partitioned_write_prune"].fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "isnotnull(o_orderpriority" in plan or "o_orderpriority" in plan.split(
        "PartitionFilters: ["
    )[1].splitlines()[0]


def test_q10_topk_and_pushdown(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q10_returned_items")
    # returnflag filter reaches the lineitem scan; top-20 avoids global sort
    assert "EqualTo(l_returnflag,R)" in plan
    assert "TakeOrderedAndProject" in plan


def test_q18_semi_join_then_topk(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "tpch_q18_large_volume")
    assert "LeftSemi" in plan
    assert "TakeOrderedAndProject" in plan


def test_q19_single_pass_broadcast(spark, sf_dir):
    # OR-of-ANDs predicate must stay one lineitem pass: exactly one join,
    # part broadcast, no union of three scans.
    plan = plan_of(spark, sf_dir, "tpch_q19_discounted_revenue")
    assert plan.count("BroadcastHashJoin") == 1
    assert "Union" not in plan
    assert plan.count("Scan parquet") == 2  # lineitem once, part once


def test_q7_dims_broadcast(spark, sf_dir):
    # supplier + both nation role-aliases broadcast; the only wide joins are
    # the fact-side orderkey/custkey ones.
    plan = plan_of(spark, sf_dir, "tpch_q7_volume_shipping")
    assert plan.count("BroadcastHashJoin") >= 3


def test_no_cartesian_in_registry(spark, sf_dir):
    """No registered query may contain an unbounded CartesianProduct — the
    one plan shape that can never scale. (Broadcast nested loops with a
    bounded side are fine.)"""
    bad = []
    for name in REGISTRY:
        if name.startswith(("stream_", "lakehouse_")):
            continue  # side-effecting; covered by their own tests
        try:
            plan = plan_of(spark, "/root/testdata/sf0.001", name)
        except Exception:
            continue
        if "CartesianProduct" in plan:
            bad.append(name)
    assert not bad, f"cartesian products in: {bad}"


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Matching bucketBy on both sides must eliminate the join shuffle."""
    import uuid

    from biglake_iceberg_python_spark.lakehouse.catalog import LakehouseCatalog
    from biglake_iceberg_python_spark.sources.tables import load_table

    db = f"bkt_test_{uuid.uuid4().hex[:8]}"
    cat = LakehouseCatalog(spark)
    cat.create_namespace(db)
    try:
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ).write.bucketBy(4, "o_orderkey").sortBy("o_orderkey").saveAsTable(
            f"{db}.o_bkt"
        )
        load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity"
        ).write.bucketBy(4, "l_orderkey").sortBy("l_orderkey").saveAsTable(
            f"{db}.l_bkt"
        )
        ob, lb = spark.table(f"{db}.o_bkt"), spark.table(f"{db}.l_bkt")
        # At sf0.001 the optimizer (rightly) prefers broadcast; disable it
        # to expose the fact⋈fact shape this pattern exists for.
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        try:
            joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey)
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        cat.drop_namespace(db)


def test_sessionize_single_shuffle(spark, sf_dir):
    """Both windows (lag, running flag-sum) and both rollups (session-,
    user-level) must ride ONE exchange on user_id — the grouping keys are
    prefixes of the window partitioning, so no further shuffle is legal."""
    plan = plan_of(spark, sf_dir, "agg_sessionize_events")
    assert plan.count("Exchange") == 1
    assert plan.count("Window") == 2
    assert plan.count("Sort") == 1


def test_pack_token_shards_no_global_window_over_rows(spark, sf_dir):
    """The corpus-wide prefix-sum must come from the two-phase shape: the
    only empty-partitioning window runs over the per-bucket table (after
    an aggregation), never over the raw per-document rows."""
    plan = plan_of(spark, sf_dir, "pack_token_shards")
    assert "SinglePartition" in plan  # tiny bucket-base table window
    # the per-doc cumsum window is partitioned by bucket
    assert "windowspecdefinition(bucket" in plan
    # bucket base offsets come back via broadcast, not a shuffle join
    assert "BroadcastHashJoin" in plan


def test_funnel_stage_filters_pushed_to_scan(spark, sf_dir):
    """Each funnel stage must read only its event_type from parquet (the
    stage selectivity is the whole point at 100 TB) and stage tables, being
    pre-aggregated and shrinking, should join via broadcast, never
    sort-merge."""
    plan = plan_of(spark, sf_dir, "funnel_conversion")
    for etype in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{etype})" in plan
    assert "SortMergeJoin" not in plan


def test_heavy_hitters_threshold_is_broadcast(spark, sf_dir):
    """The corpus total/key-count must come back as a broadcast of the
    1-row stats table — a nested-loop join against one row, never a
    shuffle or a driver-side collect baked into the plan."""
    plan = plan_of(spark, sf_dir, "agg_heavy_hitters")
    assert "BroadcastNestedLoopJoin" in plan
    # one shuffle for the per-key count; the stats derivation reuses it
    assert plan.count("Exchange hashpartitioning") <= 2


def test_gap_fill_grid_is_generated_not_joined(spark, sf_dir):
    """The dense calendar must come from sequence()+explode over the
    per-user bounds (Generate in-plan), not from any driver-side range
    table; LOCF rides a single partitioned window."""
    plan = plan_of(spark, sf_dir, "ts_gap_fill_locf")
    assert "Generate explode(sequence(" in plan
    assert plan.count("Window") == 1
    assert "SinglePartition" not in plan


def test_decontaminate_broadcasts_eval_side(spark, sf_dir):
    """The eval shingle set is benchmark-sized — it must come to the train
    postings as a broadcast, never a shuffle of the corpus side; and the
    tfidf-style doc count must not appear as a driver-side collect (the
    whole query is one job)."""
    plan = plan_of(spark, sf_dir, "curate_decontaminate")
    assert "BroadcastHashJoin" in plan


def test_train_shards_no_corpus_shuffle(spark, sf_dir):
    """Shard assignment is map-side hash arithmetic; the only exchange is
    the N-row shard rollup — no range partitioning, no sort of the
    corpus."""
    plan = plan_of(spark, sf_dir, "curate_train_shards")
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_tfidf_idf_table_broadcasts_and_no_ln(spark, sf_dir):
    """text_tfidf_top_terms (round-8 by-construction form): the idf
    micro-nat literal table must broadcast into the cached doc-frequency
    table, no ln may appear anywhere in the plan, and the top-15 must be
    TakeOrderedAndProject, never a range sort. (N is a parquet-footer
    statistics count on the driver — replacing the pre-round-8 in-plan
    1-row broadcast — because the literal table derivation needs N at
    plan-construction time; a footer count reads no data at any scale.)"""
    plan = plan_of(spark, sf_dir, "text_tfidf_top_terms")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "LOG(" not in plan.upper()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_dataset_card_no_funnel_exchanges(spark, sf_dir):
    """The dataset-card quantiles use the two-phase bucketed rank: no
    global sort, no single-partition exchange, and the corpus projection
    is checkpoint-materialized so the rank phases don't re-tokenize. The
    extra hash exchanges vs the old one-exchange window shape are bounded
    rollups (bucket bases, group sizes) — never a |groups|-task funnel."""
    plan = plan_of(spark, sf_dir, "curate_dataset_card")
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "__bucket" in plan


def test_q11_reuses_value_table_exchange(spark, sf_dir):
    """Q11's global total must come from re-aggregating the per-part value
    table's shuffle output (ReusedExchange), not from a second lineitem
    pass; all dimension joins broadcast."""
    df = REGISTRY["tpch_q11_important_stock"].fn(spark, sf_dir)
    df.collect()  # ReuseExchange is finalized by AQE during execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan
    assert "SortMergeJoin" not in plan


def test_q20_pushes_like_prefix_and_broadcasts_dims(spark, sf_dir):
    """Q20's p_name LIKE 'large%' must push to the part scan as a prefix
    filter, and the supplier/nation/part joins must all broadcast (the
    only shuffle is the (suppkey, partkey) aggregation)."""
    plan = plan_of(spark, sf_dir, "tpch_q20_promo_suppliers")
    assert "StringStartsWith(p_name,large)" in plan
    assert "SortMergeJoin" not in plan


def test_q2_topk_and_scale_safe_min_match(spark, sf_dir):
    """Q2's ordered LIMIT 20 must run as TakeOrderedAndProject (no global
    sort), and the part filters must push to the scan. The per-part
    min-cost match may legitimately sort-merge (mins is per-part sized),
    so no broadcast is asserted there."""
    plan = plan_of(spark, sf_dir, "tpch_q2_min_cost_supplier")
    assert "TakeOrderedAndProject" in plan
    assert "EqualTo(p_type,STANDARD)" in plan


def test_hidden_partitioning_prunes_to_projected_months(spark, sf_dir):
    """The months(o_orderdate) transform must turn a source-column date
    range into PartitionFilters on the hidden column (pruning at the file
    index, not a post-scan row filter), and a bucket-transform equality
    must prune to exactly one bucket."""
    import tempfile

    from biglake_iceberg_python_spark.lakehouse.partitioning import (
        BucketTransform,
        HiddenPartitionedTable,
        MonthsTransform,
    )
    from biglake_iceberg_python_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory(prefix="lh_hidpart_t_") as root:
        t = HiddenPartitionedTable(spark, root, MonthsTransform("o_orderdate"))
        t.write(o)
        pruned = t.scan_range("1998-03-15", "1998-09-15")
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [")[1].splitlines()[0]
        assert "__p" in pf and "199803" in pf and "199809" in pf, pf
        # and the projection is not vacuous: the pruned scan covers exactly
        # the rows the source predicate selects
        n = pruned.count()
        expect = o.filter(
            "o_orderdate >= TIMESTAMP '1998-03-15' "
            "AND o_orderdate < TIMESTAMP '1998-09-15'"
        ).count()
        assert n == expect and n > 0

        b = HiddenPartitionedTable(
            spark, root + "/b", BucketTransform("o_custkey", 16)
        )
        b.write(o)
        one = b.scan_eq(42)
        bplan = one._jdf.queryExecution().executedPlan().toString()
        bpf = bplan.split("PartitionFilters: [")[1].splitlines()[0]
        assert "(__p#" in bpf and " = " in bpf, bpf
        rows = one.select("o_custkey").distinct().collect()
        assert all(r["o_custkey"] == 42 for r in rows)


def test_pagerank_iterations_broadcast_rank_vector(spark, sf_dir):
    """Every per-iteration join must broadcast the rank vector — the edge
    list never re-shuffles. A SortMergeJoin appearing here means the
    broadcast regressed and each iteration pays two full exchanges."""
    plan = plan_of(spark, sf_dir, "graph_pagerank")
    assert "SortMergeJoin" not in plan, "rank-vector broadcast regressed"


def test_dynamic_partition_pruning_fires(spark, sf_dir):
    """The DPP query's fact scan must carry a dynamicpruningexpression in
    its PartitionFilters (runtime pruning from the broadcast dim filter),
    not a static literal filter. Rebuilt inline because the registered
    query returns a checkpointed result (its temp dirs are cleaned up)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from biglake_iceberg_python_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory(prefix="dpp_t_") as root:
        path = os.path.join(root, "po")
        o.write.partitionBy("o_orderpriority").parquet(path)
        fact = spark.read.parquet(path)
        dim = (
            spark.read.parquet(path)
            .select(F.col("o_orderpriority").alias("prio"))
            .distinct()
            .filter(
                F.col("prio").startswith("1-") | F.col("prio").startswith("2-")
            )
        )
        j = (
            fact.join(dim, fact.o_orderpriority == dim.prio)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" in plan.lower(), plan[:2000]
        assert "SubqueryBroadcast" in plan


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """Under the bloom-join conf regime the fact side must carry a
    might_contain(bloom filter) pre-filter fed by a bloom_filter_agg over
    the filtered dim's keys. Rebuilt inline (the registered query returns
    a checkpointed result and restores the confs)."""
    from pyspark.sql import functions as F

    from biglake_iceberg_python_spark.operators.joins import (
        _BLOOM_CONFS,
    )
    from biglake_iceberg_python_spark.sources.tables import load_table

    saved = {k: spark.conf.get(k, None) for k in _BLOOM_CONFS}
    for k, v in _BLOOM_CONFS.items():
        spark.conf.set(k, v)
    try:
        li = load_table(spark, sf_dir, "lineitem")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        j.collect()
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:1500]
        assert "might_contain" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_partition_evolution_prunes_each_spec_with_its_own_transform(
    spark, sf_dir
):
    """After a years→months spec evolution, a range scan must prune the
    old files to the projected YEARS and the new files to the projected
    MONTHS — each spec's directory set filtered by its own transform —
    and the union must equal the raw range query."""
    import tempfile

    from biglake_iceberg_python_spark.lakehouse.partitioning import (
        MonthsTransform,
        SpecEvolvedTable,
        YearsTransform,
    )
    from biglake_iceberg_python_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    cutoff = "o_orderdate < TIMESTAMP '1996-01-01 00:00:00'"
    with tempfile.TemporaryDirectory(prefix="lh_specevo_t_") as root:
        t = SpecEvolvedTable(spark, root)
        t.evolve(YearsTransform("o_orderdate"))
        t.write(o.filter(cutoff))
        t.evolve(MonthsTransform("o_orderdate"))
        t.write(o.filter(f"NOT ({cutoff})"))

        pruned = t.scan_range("1995-07-01", "1996-07-01")
        # inputFiles() reports the unpruned file index on union plans;
        # input_file_name() reflects the files actually read at execution,
        # i.e. after per-branch partition pruning.
        from pyspark.sql import functions as F

        files = [
            r[0]
            for r in pruned.select(F.input_file_name()).distinct().collect()
        ]
        spec0 = {f.rsplit("/", 2)[-2] for f in files if "spec=0" in f}
        spec1 = {f.rsplit("/", 2)[-2] for f in files if "spec=1" in f}
        # old layout: only the 1995 year directory survives pruning
        assert spec0 == {"__p=1995"}, spec0
        # new layout: only 1996-01..06 month directories produce rows (the
        # month-granular projection conservatively includes 199607 for the
        # exclusive 07-01 bound, but the row filter drops every July row,
        # so no July file contributes output)
        assert spec1 == {f"__p=19960{m}" for m in range(1, 7)}, spec1
        # evolution is invisible in results
        expect = o.filter(
            "o_orderdate >= TIMESTAMP '1995-07-01' "
            "AND o_orderdate < TIMESTAMP '1996-07-01'"
        ).count()
        assert pruned.count() == expect and expect > 0


def test_manifest_stats_prune_commits(spark, sf_dir):
    """scan_where must plan over ONLY the commits whose footer min/max
    overlaps the probe range: of four year-sliced commits, a mid-1997
    range reads files from exactly one commit directory."""
    import tempfile

    from biglake_iceberg_python_spark.lakehouse.snapshots import SnapshotTable
    from biglake_iceberg_python_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory(prefix="lh_manif_t_") as root:
        t = SnapshotTable(spark, root)
        y = F.year("o_orderdate")
        for lo, hi in [(0, 1996), (1996, 1997), (1997, 1998), (1998, 9999)]:
            t.write(o.filter((y >= lo) & (y < hi)), mode="append")
        pruned = t.scan_where(
            "o_orderdate", "1997-03-01T00:00:00", "1997-09-01T00:00:00"
        )
        dirs = {f.rsplit("/", 2)[-2] for f in pruned.inputFiles()}
        assert len(dirs) == 1, dirs
        total = {f.rsplit("/", 2)[-2] for f in t.read().inputFiles()}
        assert len(total) == 4
        # pruning is invisible in results
        assert pruned.count() == o.filter(
            "o_orderdate >= TIMESTAMP '1997-03-01' "
            "AND o_orderdate < TIMESTAMP '1997-09-01'"
        ).count()
        # disjoint probe range → zero dirs, empty result, no error
        assert t.scan_where(
            "o_orderdate", "2030-01-01T00:00:00", "2031-01-01T00:00:00"
        ).count() == 0


def test_lm_perplexity_single_corpus_scan(spark, sf_dir):
    """text_lm_perplexity must explode the corpus ONCE in its visible plan
    (the scoring-side instances); the model table (type-level bigram
    counts) is localCheckpoint-materialized, so prefix counts, vocab size,
    and the scoring join all read the checkpointed RDD instead of each
    re-deriving the corpus-wide explode (1 scan + checkpoint build = two
    corpus passes total, vs four unmaterialized)."""
    plan = plan_of(spark, sf_dir, "text_lm_perplexity")
    assert plan.count("documents.parquet") == 1, plan
    assert plan.count("Scan ExistingRDD") >= 2  # model read by >1 consumer


def test_vocab_coverage_windows_vocab_not_corpus(spark, sf_dir):
    """text_vocab_coverage's partition-less ROW_NUMBER may only ever sort
    the TYPE table: the corpus contributes one scan (the word-count
    build), and every SinglePartition exchange in the plan sits above the
    checkpointed vocab table, never above corpus rows."""
    plan = plan_of(spark, sf_dir, "text_vocab_coverage")
    # The corpus explode → word-count shuffle lives entirely inside the
    # checkpoint build (one corpus pass); the visible plan reads the
    # vocab-sized checkpoint twice (ranked window + totals) and never
    # touches the parquet again.
    assert plan.count("documents.parquet") == 0, plan
    assert plan.count("Scan ExistingRDD") == 2


def test_repetition_stats_shuffles_doc_keyed_only(spark, sf_dir):
    """text_repetition_stats may shuffle only on doc-prefixed keys (both
    aggregations carry doc-bounded state) — no single-partition pass and
    no range sort over the corpus."""
    plan = plan_of(spark, sf_dir, "text_repetition_stats")
    assert "SinglePartition" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert plan.count("HashAggregate") >= 4  # two two-phase aggregations


def test_join_hints_flip_physical_strategy(spark, sf_dir):
    """Each join hint must override size-based selection: the same
    supplier⋈nation join plans as ShuffledHashJoin / SortMergeJoin /
    BroadcastHashJoin under the respective hints (both sides are
    broadcast-sized, so without the hint Catalyst would broadcast)."""
    from biglake_iceberg_python_spark.sources.tables import load_table

    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cond = s["s_nationkey"] == n["n_nationkey"]
    plans = {
        hint: s.hint(hint).join(n, cond)._jdf.queryExecution()
        .executedPlan().toString()
        for hint in ("SHUFFLE_HASH", "MERGE", "BROADCAST")
    }
    assert "ShuffledHashJoin" in plans["SHUFFLE_HASH"]
    assert "SortMergeJoin" in plans["MERGE"]
    assert "BroadcastHashJoin" in plans["BROADCAST"]
    plan = plan_of(spark, sf_dir, "join_hint_strategies")
    assert "ShuffledHashJoin" in plan


def test_zorder_envelope_decision_is_distributed(spark, sf_dir):
    """Round-4 directive: the Z-order skip-decision must keep per-file
    envelopes distributed — exactly one shuffle (the file_id agg) and the
    query box arriving by broadcast, with no O(n_files) row collect."""
    from pyspark.sql import functions as F

    from biglake_iceberg_python_spark.lakehouse.queries import (
        zorder_envelope_keep,
    )
    from biglake_iceberg_python_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    table = li.withColumn("file_id", F.pmod("l_orderkey", F.lit(8)))
    box = spark.createDataFrame(
        [(10.0, 100.0, 10.0, 100.0)], "p1 double, p2 double, q1 double, q2 double"
    )
    plan = (
        zorder_envelope_keep(table, box)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan


def test_chunk_sliding_zero_shuffle(spark, sf_dir):
    """Document chunking must be a pure map-side 1→N expansion — no
    Exchange anywhere: it runs at scan throughput at any corpus size."""
    plan = plan_of(spark, sf_dir, "text_chunk_sliding")
    assert "Exchange" not in plan, plan


def test_fuzzy_levenshtein_blocks_via_equi_join(spark, sf_dir):
    """The edit-distance candidate join must be a hash equi-join on the
    (lang, bucket) blocking key — never a nested-loop over doc pairs."""
    plan = plan_of(spark, sf_dir, "dedup_fuzzy_levenshtein")
    # any EQUI-join strategy is fine (broadcast at tiny sf, shuffle at scale)
    assert any(
        j in plan
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    ), plan
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_matryoshka_coarse_stage_broadcasts_queries(spark, sf_dir):
    """The coarse scorer must broadcast the query set (candidates stream);
    the only exchange shuffles the |Q|·shortlist rows for the rescore
    windows, never the corpus."""
    plan = plan_of(spark, sf_dir, "sim_matryoshka_rescore")
    assert "BroadcastNestedLoopJoin BuildRight" in plan, plan


def test_bpe_pair_expansion_runs_on_type_table(spark, sf_dir):
    """BPE pair stats: the char-pair explosion must sit ABOVE the word
    aggregation (type table), not on raw corpus rows — the plan generates
    pairs after the first HashAggregate, so the expansion is vocab-sized."""
    plan = plan_of(spark, sf_dir, "text_bpe_pair_stats")
    gen = plan.index("Generate explode")
    # the word-count aggregate (on key w) appears BELOW the explode
    assert "HashAggregate" in plan[gen:], plan


def test_bm25_topk_no_global_sort_no_explode(spark, sf_dir):
    """BM25's top-k must be TakeOrderedAndProject (per-partition heaps) and
    term frequencies must come from array-filter counts in codegen — a
    fixed keyword query never justifies exploding the corpus to words."""
    plan = plan_of(spark, sf_dir, "text_bm25_search")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Generate explode" not in plan


def test_hybrid_rrf_rankers_stay_tiny(spark, sf_dir):
    """Fusion joins two ≤50-row ranked lists; neither side may shuffle the
    corpus — the vector ranker broadcasts its 1-row query vector and the
    only exchanges carry top-k candidates."""
    plan = plan_of(spark, sf_dir, "sim_hybrid_rrf")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # 1-row query vector broadcast


def test_corr_covar_single_pass_partial_agg(spark, sf_dir):
    """The five moment sums must accumulate map-side (two-phase agg) and
    entirely in codegen — no Python anywhere near the hot path."""
    plan = plan_of(spark, sf_dir, "agg_corr_covar")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan


def test_url_canonical_all_codegen(spark, sf_dir):
    """URL synthesis + the full canonicalization regex chain must run as
    codegen string expressions (zero Python), with the only shuffles being
    the (source, canonical) dedup key and the per-source rollup."""
    plan = plan_of(spark, sf_dir, "curate_url_canonical")
    assert "BatchEvalPython" not in plan
    assert "Generate" not in plan  # no explode needed for param filtering
    assert plan.count("Exchange hashpartitioning") <= 2


def test_winsorize_no_funnel_exchanges(spark, sf_dir):
    """The winsorize cutoffs use the two-phase bucketed rank over a
    checkpoint-materialized 3-column projection: no global sort, no
    single-partition exchange, cutoffs broadcast back for the clip
    rollup."""
    plan = plan_of(spark, sf_dir, "curate_winsorize")
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    assert "__bucket" in plan
    # the narrow projection is materialized once, not re-scanned per phase
    assert plan.count("Scan parquet") == 0


def test_pca_gram_fixed_size_partials(spark, sf_dir):
    """The Gram pipeline must be one Arrow stage emitting fixed-size
    partials and ONE merge shuffle on (i, j) — corpus size never appears
    in the shuffle volume."""
    plan = plan_of(spark, sf_dir, "ml_pca_gram")
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("HashAggregate") >= 2  # partial + final merge


def test_ewma_expands_rollup_not_raw_events(spark, sf_dir):
    """The 7× cover-set explode must sit ABOVE the daily rollup aggregate
    (expansion over user-days, never over raw events)."""
    plan = plan_of(spark, sf_dir, "ts_ewma_decay")
    gen = plan.index("Generate explode")
    assert "HashAggregate" in plan[gen:], plan


def test_span_corruption_zero_shuffle(spark, sf_dir):
    """Objective prep must be a pure map over the scan — no exchange, no
    Python, no explode."""
    plan = plan_of(spark, sf_dir, "pack_span_corruption")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
    assert "Generate" not in plan


def test_phash_neardup_equi_join_only(spark, sf_dir):
    """The pHash banding must plan as a pure equi-join on (band, value) —
    no nested-loop pair enumeration anywhere, and the pair filter must be
    bit arithmetic in codegen."""
    plan = plan_of(spark, sf_dir, "multimodal_phash_neardup")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


def test_substring_spans_mapside_shingles(spark, sf_dir):
    """Positional shingles must generate map-side from the token array (no
    window, no self-join before the fingerprint shuffle), and all joins
    must be equi-joins on the fingerprint key."""
    plan = plan_of(spark, sf_dir, "dedup_substring_spans")
    assert "Generate explode" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    gen = plan.index("Generate explode")
    # nothing below the explode except the scan-side projection — the
    # first aggregate (fingerprint count) sits ABOVE it in the dataflow
    assert "Window" not in plan[gen:]


def test_range_search_shuffle_free(spark, sf_dir):
    """Radius search must be broadcast + map-side filter with ZERO
    exchanges — no top-k window exists to force one."""
    plan = plan_of(spark, sf_dir, "sim_range_search")
    assert "Exchange hashpartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan


def test_welch_ttest_single_pass(spark, sf_dir):
    """Both variants' moments must accumulate in ONE conditional
    aggregation pass — no per-variant scans, no join."""
    plan = plan_of(spark, sf_dir, "events_ab_welch_ttest")
    assert plan.count("Scan parquet") == 1
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # map-side partial + final


def test_gini_two_phase_rank_no_data_sized_window_partition(spark, sf_dir):
    """The per-nation rank must be the two-phase bucketed form: the
    per-row ROW_NUMBER window partitions by (n_name, __bucket) — a
    nation's customers never funnel through one window partition — and
    only the ≤4096-row per-bucket base table crosses the n_name-only
    ordered window. Dims broadcast; no sort-merge join, no cartesian."""
    plan = plan_of(spark, sf_dir, "customer_gini_spend")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the data-proportional window is bucket-partitioned
    assert "windowspecdefinition(n_name" in plan and "__bucket" in plan
    row_windows = [
        ln for ln in plan.splitlines()
        if "row_number() windowspecdefinition" in ln
    ]
    assert row_windows and all("__bucket" in ln for ln in row_windows)


def test_skew_kurtosis_single_pass(spark, sf_dir):
    """Four power sums in one map-side-combined aggregation."""
    plan = plan_of(spark, sf_dir, "agg_skew_kurtosis")
    assert plan.count("Scan parquet") == 1
    assert plan.count("HashAggregate") >= 2


def test_js_divergence_type_level_tables(spark, sf_dir):
    """The JSD term computation must join TYPE-level tables with the
    global distribution broadcast — the corpus contributes only the
    (source, word) count shuffle."""
    plan = plan_of(spark, sf_dir, "text_js_divergence_sources")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_reconcile_single_full_outer_join(spark, sf_dir):
    """Reconciliation must be ONE key join over projected columns — no
    cartesian, no repeated scans beyond the two sides."""
    plan = plan_of(spark, sf_dir, "util_table_reconcile")
    assert plan.count("FullOuter") == 1 and "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan


def test_attribution_windows_share_conv_partitioning(spark, sf_dir):
    """Both attribution windows (touch count, recency rank) must ride the
    conv_id partitioning the band join established — no third
    data-proportional exchange."""
    plan = plan_of(spark, sf_dir, "events_attribution_multitouch")
    assert plan.count("Exchange hashpartitioning") <= 3
    assert "CartesianProduct" not in plan


def test_bootstrap_expands_daily_rollup(spark, sf_dir):
    """The B×n draw expansion must sit above the daily rollup aggregate
    (cover-set over user-days, never raw events)."""
    plan = plan_of(spark, sf_dir, "events_bootstrap_ci_daily_mean")
    gen = plan.index("Generate explode")
    assert "HashAggregate" in plan[gen:], plan


def test_minhash_oph_signature_is_shuffle_free(spark, sf_dir):
    """The OPH signature's whole point: hash → 32 slot mins → densify all
    happen per-row inside codegen — the corpus never shuffles to build
    signatures (no doc_id exchange exists anywhere: the downstream joins
    broadcast), no window, no self-join, and the candidate join stays an
    equi bucket join. The only hash exchange in the whole plan is the
    candidate-pair distinct."""
    plan = plan_of(spark, sf_dir, "dedup_minhash_oph")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "Exchange hashpartitioning(doc_id" not in plan


def test_countmin_cells_shuffle_is_geometry_bounded(spark, sf_dir):
    """The CMS build's only corpus-sized structure is map-side: the
    exchange after the cell explode carries (j, cell) partial counts —
    bounded by sketch geometry (4x8192), not by key cardinality. The
    probe side must broadcast (no exact-count shuffle joined at scale),
    and nothing nested-loops."""
    plan = plan_of(spark, sf_dir, "agg_countmin_sketch")
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    # the sketch aggregation is partial (map-side combined) before its
    # exchange: the (j, cell) pair rides ONE two-key exchange (Catalyst
    # names the struct-field keys _groupingexpression)
    import re

    m = re.search(
        r"Exchange hashpartitioning\(_groupingexpression#\d+, "
        r"_groupingexpression#\d+L",
        plan,
    )
    assert m, "cell-count exchange missing"


def test_rake_has_no_corpus_wide_window(spark, sf_dir):
    """RAKE's segmentation windows must be per-doc (bounded partitions) —
    a window without doc_id in its partition spec would single-thread the
    corpus; the word-score join must broadcast the type-level table."""
    plan = plan_of(spark, sf_dir, "text_rake_keywords")
    import re

    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "doc_id" in spec, f"corpus-wide window: {spec}"
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_negative_sampling_vocab_topk_avoids_global_sort(spark, sf_dir):
    """The top-500 vocabulary cut must be TakeOrderedAndProject (never a
    rangepartitioning sort of the whole vocabulary) — pinned on the
    pre-checkpoint subplan, since the registered query materializes the
    cut so its windows consume a 500-row RDD; the outer plan must show
    exactly that (ExistingRDD, no rangepartitioning exchange), and the
    corpus scan reads only the text column."""
    from biglake_iceberg_python_spark.operators.curation import _vocab_topk

    inner = (
        _vocab_topk(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in inner
    assert "Exchange rangepartitioning" not in inner
    read_schema = inner.split("ReadSchema: ")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" not in read_schema
    outer = plan_of(spark, sf_dir, "curate_negative_sampling")
    assert "Scan ExistingRDD" in outer
    assert "Exchange rangepartitioning" not in outer
    assert "documents.parquet" not in outer


def test_kneser_ney_topk_and_single_corpus_scan(spark, sf_dir):
    """Top-20 must be TakeOrderedAndProject; the bigram-type total (nbt)
    broadcasts; the corpus explode feeds ONE model build (the
    localCheckpoint makes the model table the only scan consumer)."""
    plan = plan_of(spark, sf_dir, "text_kneser_ney_bigram")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # the checkpointed model is scanned, not the corpus, for every join
    assert plan.count("Scan ExistingRDD") >= 2 or "Scan parquet" not in plan


def test_resource_allocation_caps_hubs_before_wedge_join(spark, sf_dir):
    """The deg<=cap filter must sit BELOW the z-z wedge self-join (the
    fan-out bound depends on filtering first), the wedge join must be an
    equi-join on z (never a cartesian), and top-20 must be
    TakeOrderedAndProject. Round 11: the wedge self-join and the und
    anti-join must be SHUFFLED joins — both sides are edge-sized and an
    edge list must never broadcast (Catalyst's undershooting
    ExistingRDD estimate picked broadcast and OOM'd a default-heap
    session at sf0.1)."""
    plan = plan_of(spark, sf_dir, "graph_resource_allocation")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the cap shows up as a pre-join filter on the degree column
    assert "(deg#" in plan and "<= 256" in plan
    # wedge join keyed on z: pinned to a shuffled sort-merge join
    assert "SortMergeJoin [z#" in plan
    # the anti-join against existing edges is shuffled, never broadcast
    anti_lines = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti_lines and all(
        "SortMergeJoin" in ln for ln in anti_lines
    ), anti_lines


def test_triangle_count_edge_sides_never_broadcast(spark, sf_dir):
    """Round 11: triangle counting's wedge self-join and closure join
    consume the ORIENTED EDGE list on both sides — edge-sized, corpus-
    growing relations that must reach the join via shuffle. Only the
    node-sized deg joins and the one-row stat tables may broadcast."""
    plan = plan_of(spark, sf_dir, "graph_triangle_count")
    assert "CartesianProduct" not in plan
    # the two merge-hinted joins appear as sort-merge joins on u / (u,v)
    assert plan.count("SortMergeJoin") >= 2


def test_seasonal_decompose_windows_grid_not_corpus(spark, sf_dir):
    """The moving-average window must run over the dense per-(type,day)
    GRID (thousands of rows), keyed on event_type — never over raw events;
    the events scan reads only the two needed columns."""
    plan = plan_of(spark, sf_dir, "ts_seasonal_decompose")
    read_schema = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "ts" in read_schema and "event_type" in read_schema
    assert "props" not in read_schema and "user_id" not in read_schema
    # exactly one corpus-sized exchange: the (type, day) rollup; the window
    # partitions by event_type afterwards
    assert "Window" in plan


def test_cuped_single_user_shuffle_then_one_row(spark, sf_dir):
    """CUPED must shuffle the corpus ONCE (per-user rollup on user_id);
    the bounds row broadcasts; the final 12-column moment rollup is a
    two-phase aggregate to a single row."""
    plan = plan_of(spark, sf_dir, "events_cuped_adjusted_delta")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row bounds × events
    assert plan.count("Exchange hashpartitioning(user_id") == 1
    assert "Exchange SinglePartition" in plan  # the 1-row moment merge


def test_paragraph_dedup_single_chunk_exchange(spark, sf_dir):
    """The only corpus-sized exchange is the chunk-keyed shuffle for
    first-occurrence ranking (dedup_exact's budget); chunking itself is
    map-side array arithmetic — no self-join, no range sort."""
    plan = plan_of(spark, sf_dir, "dedup_paragraph_exact")
    assert plan.count("Exchange hashpartitioning(chunk#") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_model_broadcasts_into_instance_join(spark, sf_dir):
    """DSIR scoring must broadcast the type-level model into the bigram
    instance join (the perplexity shape) — the corpus stream never
    shuffles for scoring — and the cut is TakeOrderedAndProject."""
    plan = plan_of(spark, sf_dir, "curate_dsir_select")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    # the per-doc rollup is the only instance-keyed exchange
    assert plan.count("Exchange hashpartitioning(doc_id#") == 1


def test_bpe_training_rounds_never_rescan_corpus(spark, sf_dir):
    """The six training rounds run on the ONE checkpointed word-type
    table (round 14: merge pairs are driver-collected literals, so the
    merge table itself is a local relation — zero corpus work at emit
    time), and the ENCODE consumer's type-table side must be the replace
    chain over that checkpoint, never a re-derived corpus scan: exactly
    one documents scan (its own source/word rollup) in the whole encode
    plan."""
    plan = plan_of(spark, sf_dir, "text_bpe_train_merges")
    assert "documents.parquet" not in plan
    # createDataFrame of the collected merge rows plans as a local
    # relation (Scan ExistingRDD over driver rows / LocalTableScan).
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan
    assert "FileScan parquet" not in plan
    enc = plan_of(spark, sf_dir, "text_bpe_encode")
    assert enc.count("FileScan parquet") == 1  # csw rollup only
    assert "Scan ExistingRDD" in enc  # type table from the t0 checkpoint


def test_length_pair_binning_avoids_corpus_range_sort(spark, sf_dir):
    """The two-phase rank must not range-sort the corpus: no
    rangepartitioning exchange anywhere (the only unpartitioned window
    runs over the tiny distinct-lengths table), and the mirror pairing is
    an equi-join."""
    plan = plan_of(spark, sf_dir, "pack_length_pair_binning")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_cuped_vs_did_share_the_scan_shape(spark, sf_dir):
    """DiD must be a pure scan-to-one-row aggregation: exactly one
    SinglePartition exchange (the 8-integer moment merge) and zero
    row-keyed shuffles beyond the broadcast of the 1-row bounds."""
    plan = plan_of(spark, sf_dir, "events_diff_in_diff")
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 0
    assert plan.count("Exchange SinglePartition") >= 1


def test_naive_bayes_model_broadcasts_into_scoring(spark, sf_dir):
    """NB posterior assembly must stay broadcast-joined and Python-free —
    train and score are pure SQL ops. Since round 9 the class table is
    inlined as literals (no crossJoin, no ranking window); the model join
    on the word key and the doc-key aggregation are the only hash
    exchanges."""
    plan = plan_of(spark, sf_dir, "ml_naive_bayes_langid")
    assert "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_linreg_moments_accumulate_map_side(spark, sf_dir):
    """Normal-equations OLS must be a two-phase aggregation (int64 partials
    before the group exchange) with zero Python and zero extra scans: one
    lineitem read feeds all six sufficient statistics."""
    plan = plan_of(spark, sf_dir, "ml_linreg_normal_eq")
    assert plan.count("HashAggregate") >= 2
    assert "BatchEvalPython" not in plan
    assert plan.count("FileScan parquet") == 1


def test_heaps_law_windows_run_on_decile_rows(spark, sf_dir):
    """The cumulative windows must consume the 10-row decile table, never
    the corpus: every Window node sits above an aggregation, and the
    corpus-side work is the two type-level min-decile reductions."""
    plan = plan_of(spark, sf_dir, "text_heaps_law")
    assert "Window" in plan
    # windows read the joined per-decile aggregates (post-HashAggregate),
    # so a range-partitioned corpus sort must not exist
    assert "Exchange rangepartitioning" not in plan.split("Window")[-1]
    assert "BatchEvalPython" not in plan


def test_kcore_rounds_reuse_checkpointed_edges(spark, sf_dir):
    """Each peel round must consume the previous round's materialized edge
    list (localCheckpoint → Scan ExistingRDD), not re-derive the lineitem
    self-join per round."""
    plan = plan_of(spark, sf_dir, "graph_kcore")
    assert "Scan ExistingRDD" in plan
    assert plan.count("FileScan parquet") == 0  # all inputs checkpointed


def test_sql_temp_function_inlines_into_codegen(spark, sf_dir):
    """SQL UDFs must inline at analysis time: no Python evaluation node,
    two-phase aggregation, single scan — the plan a hand-written
    expression would get."""
    plan = plan_of(spark, sf_dir, "sql_temp_function")
    assert "BatchEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2
    assert plan.count("FileScan parquet") == 1


def test_scalar_regex_is_pure_codegen_projection(spark, sf_dir):
    """The regex battery must stay map-side JVM codegen: one parquet scan,
    zero exchanges, zero Python — regex evaluation never justifies a
    shuffle or a UDF."""
    plan = plan_of(spark, sf_dir, "scalar_regex")
    assert plan.count("FileScan parquet") == 1
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_argminmax_is_single_two_phase_aggregate(spark, sf_dir):
    """max_by/min_by must plan as ONE two-phase hash aggregate — partial
    (value, ord) pairs before a single |groups|-row exchange — never the
    rank-window-then-filter shape that sorts every group."""
    plan = plan_of(spark, sf_dir, "agg_extrema_argminmax")
    assert plan.count("HashAggregate") == 2
    assert plan.count("Exchange") == 1
    assert "Window" not in plan and "Sort" not in plan


def test_interpolate_anchors_share_one_sort(spark, sf_dir):
    """Backward and forward anchor windows must fuse into a single Window
    pass over one (user_id, day) sort — interpolation costs no more than
    LOCF. Grid generation must be map-side explode, not a driver calendar
    (no extra exchange beyond daily agg, bounds agg, and the grid join)."""
    plan = plan_of(spark, sf_dir, "ts_interpolate_linear")
    assert plan.count("Window") == 1
    assert plan.count("Sort ") == 1
    assert plan.count("Exchange") <= 3
    assert "BatchEvalPython" not in plan


def test_calibration_totals_broadcast_into_bins(spark, sf_dir):
    """The 1-row grand total must broadcast into the ≤10-row bin table
    (BroadcastNestedLoopJoin on a broadcast cross join), and the corpus
    must collapse through two-phase aggregation — never a corpus-wide
    sort or Python fallback."""
    plan = plan_of(spark, sf_dir, "ml_calibration_bins")
    assert plan.count("BroadcastNestedLoop") == 1
    assert plan.count("HashAggregate") >= 4
    assert "BatchEvalPython" not in plan


def test_graph_iteratives_broadcast_regime(spark, sf_dir):
    """Below the broadcast node limit (the default regime at every test
    SF), the per-iteration node-state joins — pagerank's rank vector,
    k-core's survivor set — must be broadcast-hash joins: the edge list
    never shuffles inside the loop."""
    for name in ("graph_pagerank", "graph_kcore"):
        plan = plan_of(spark, sf_dir, name)
        assert "BroadcastHashJoin" in plan, name


def test_graph_iteratives_shuffle_regime(spark, sf_dir):
    """Past the broadcast node limit (forced via the conf — the
    billions-of-nodes regime where a |V|-row broadcast OOMs executors),
    the SAME queries must plan shuffle joins instead of explicit
    broadcasts AND still produce bit-identical results: the flip is a
    physical strategy change, never a semantic one."""
    from biglake_iceberg_python_spark.operators.graph import (
        _BCAST_NODE_LIMIT_CONF,
    )

    def rows(name):
        return sorted(
            tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect()
        )

    base = {n: rows(n) for n in ("graph_pagerank", "graph_kcore")}
    # Disable Catalyst's own size-based broadcast too: at sf0.001 it would
    # (rightly) re-broadcast the tiny sides and mask the strategy flip.
    spark.conf.set(_BCAST_NODE_LIMIT_CONF, "1")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for name in ("graph_pagerank", "graph_kcore"):
            plan = plan_of(spark, sf_dir, name)
            assert "BroadcastHashJoin" not in plan, name
            assert (
                "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            ), name
            assert rows(name) == base[name], name
    finally:
        spark.conf.unset(_BCAST_NODE_LIMIT_CONF)
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_growing_dims_flip_to_shuffle_when_broadcast_disabled(spark, sf_dir):
    """The equi-join twin of the graph regime tests: linearly-growing
    dimension sides (part, supplier, customer) carry NO broadcast hint
    (tpch.py module docstring), so Catalyst chooses broadcast only from
    SIZE. Forcing the threshold to -1 models the 100 TB regime where those
    dims exceed executor memory: the joins must flip to shuffle joins and
    return bit-identical rows, while the explicitly-hinted bounded dims
    (nation/region) keep their broadcast regardless of threshold — the
    hint is reserved for sides that are provably small at every scale."""

    def rows(name):
        return sorted(
            tuple(r) for r in REGISTRY[name].fn(spark, sf_dir).collect()
        )

    names = ("tpch_q9_product_profit", "join_q5_local_supplier")
    base = {n: rows(n) for n in names}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        for name in names:
            plan = plan_of(spark, sf_dir, name)
            # part/supplier/customer now shuffle…
            assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, name
            # …but the hinted nation (and region) broadcasts survive.
            assert "BroadcastHashJoin" in plan, name
            assert rows(name) == base[name], name
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def _partitionless_specs(plan: str) -> int:
    """Count window specs with NO partition columns: in plan text a spec
    renders ``windowspecdefinition(<partition exprs>, <order> ASC|DESC
    ..., specifiedwindowframe...)`` — when the FIRST argument already
    carries a sort direction, the partition list is empty."""
    n = 0
    for chunk in plan.split("windowspecdefinition(")[1:]:
        first = chunk.split(",")[0]
        if " ASC" in first or " DESC" in first:
            n += 1
    return n


def test_pareto_family_windows_are_bucket_partitioned(spark, sf_dir):
    """The Pareto/ABC/Gini ranks are two-phase (functions/twophase.py):
    the O(SF) rollup's rank/cumsum windows must partition by the value
    bucket, and the only partition-less ordered pass allowed is over the
    per-bucket aggregate (≤ 4096 rows per group) — never the rollup
    itself. supplier_pareto/part_abc pay exactly those bucket-table
    windows; gini partitions its bucket pass by nation, so it has none."""
    for name, max_free in (
        ("supplier_pareto", 2),  # bucket-table base_n + base_revenue
        ("part_abc_xyz_classification", 2),
        ("customer_gini_spend", 0),  # bucket table partitioned by nation
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "__bucket" in plan, name
        assert _partitionless_specs(plan) <= max_free, (
            name,
            _partitionless_specs(plan),
        )


def test_low_cardinality_group_ranks_are_bucket_partitioned(spark, sf_dir):
    """Exact order statistics grouped by a handful-cardinality key
    (l_returnflag, event_type, lang, source×lang) must use the two-phase
    bucketed rank: every corpus-sized row_number/cumsum window partitions
    by (group, __bucket), never the bare group key — otherwise the whole
    table funnels through |groups| tasks. Group-key-only windows may
    appear solely over the ≤4096-row per-bucket base tables."""
    for name in (
        "agg_weighted_median",
        "events_outlier_mad",
        "curate_dataset_card",
        "curate_winsorize",
    ):
        plan = plan_of(spark, sf_dir, name)
        assert "__bucket" in plan, name
        assert _partitionless_specs(plan) == 0, name
        for ln in plan.splitlines():
            if "windowspecdefinition" not in ln:
                continue
            spec = ln.split("windowspecdefinition(", 1)[1]
            # either a bucketed per-row window or the bucket-table base
            # pass ordered BY __bucket — both mention the bucket column
            assert "__bucket" in spec, (name, ln.strip()[:120])


def test_registry_wide_unpartitioned_window_audit(spark, sf_dir):
    """Round-7 verdict #4: promote the per-query single-partition-window
    audits to a REGISTRY-WIDE regression gate. Sweep every registered
    query's physical plan and flag each `windowspecdefinition` whose spec
    starts with a sort column (no partition key — the whole input funnels
    through one task). Every hit must be a documented value-domain-bounded
    table; a new query that slips an unpartitioned window over a
    data-proportional table fails here until audited.

    Streaming queries are excluded: their returned DataFrame is a
    memory-sink table scan (the real plan runs inside the streaming
    engine, whose state bounds are asserted in test_streaming_state).
    """
    import re

    # name -> why the windowed table is bounded (not O(data))
    allowed = {
        # two_phase_rank / two-phase prefix-sum per-bucket base tables:
        # <= n_buckets (4096) rows by construction (functions/twophase.py)
        "part_abc_xyz_classification": "two-phase bucket base table",
        "supplier_pareto": "two-phase bucket base table",
        "pack_token_shards": "two-phase bucket base table",
        "pipeline_corpus_build": "two-phase bucket base table",
        "events_peak_concurrency": "per-calendar-day boundary totals",
        # calendar / value-domain tables
        "events_cumulative_uniques": "calendar-hour table",
        "events_kaplan_meier_retention": "day-offset table (calendar span)",
        "funnel_latency_percentiles":
            "per-DISTINCT-latency counts (span-seconds domain, pre-agg)",
        "text_heaps_law": "10-row decile table",
        # explicit head-selection before the window
        "curate_negative_sampling": "top-500 vocab head (TakeOrdered)",
        "text_vocab_coverage": "vocab head (TakeOrdered since r7)",
        "text_zipf_fit": "vocab head (TakeOrdered since r7)",
        "graph_pagerank": "window after .limit(top-N)",
        "sim_hybrid_rrf": "per-query top-K fused candidate lists",
        # handful-cardinality keys
        "curate_mix_apportionment": "per-source quota table",
    }
    offenders: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        if "streaming" in spec.tags:
            continue
        plan = plan_of(spark, sf_dir, name)
        hits = sorted(
            {
                m.group(1).strip()
                for m in re.finditer(r"windowspecdefinition\(([^,)]*)", plan)
                if " ASC" in m.group(1) or " DESC" in m.group(1)
            }
        )
        if hits:
            offenders[name] = hits
    unaudited = {n: h for n, h in offenders.items() if n not in allowed}
    stale = sorted(set(allowed) - set(offenders))
    assert not unaudited, f"unpartitioned window needs a scale audit: {unaudited}"
    assert not stale, f"allowlist entries no longer needed: {stale}"


def test_graph_edges_builder_pins_full_width_ok_exchange(spark, sf_dir):
    """The shared graph edge builder's order-key repartition must stay a
    PINNED-width hash exchange (REPARTITION_BY_NUM, never AQE-coalescable
    REPARTITION_BY_COL): advisory sizing sees the small grouped sets
    flowing IN, not the ~40x pair volume the expansion emits below it
    (round-13 fix; round-13 verdict #8 asked for this pin to be asserted —
    the query-level plans hide it behind the localCheckpoint). Also pins
    the round-14 codegen expansion: no interpreted filter lambda remains
    in the pair explode."""
    from biglake_iceberg_python_spark.operators.graph import _edges

    plan = _edges(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert "REPARTITION_BY_COL" not in plan
    # the double-explode pair expansion (the mirror union repeats the
    # subtree, so the node count is a multiple of 2), with no interpreted
    # filter lambda feeding the second explode
    assert plan.count("Generate explode") >= 2
    assert "filter(ps" not in plan
