"""Physical-plan audits: the properties the 100 TB scale story depends
on, asserted on the actual optimized/executed plans (SURVEY.md §4).

These are regression guards: if a refactor turns a broadcast join into
a cartesian product or breaks parquet pushdown, correctness tests stay
green but these fail.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo2mysql_spark.queries import load_all
from tests.conftest import SF_DIR

REGISTRY = load_all()


def physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_q1_filter_pushed_to_parquet(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_q1_column_pruning(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    # scan must read only the 7 needed columns, not all 11
    readschema = next(line for line in plan.splitlines() if "ReadSchema" in line)
    assert "l_orderkey" not in readschema and "l_suppkey" not in readschema
    assert "l_quantity" in readschema


def test_q1_partial_aggregation(spark):
    """Map-side combine: two HashAggregate levels around the shuffle."""
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert plan.count("HashAggregate") >= 2


def test_q5_broadcasts_dimensions(spark):
    df = REGISTRY["q5_regional_revenue"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_semi_anti_join_strategies(spark):
    plan = physical_plan(REGISTRY["join_coverage"].fn(spark, SF_DIR))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_sort_limit_is_take_ordered(spark):
    """Global top-N must not global-sort: TakeOrderedAndProject."""
    from mongo2mysql_spark.queries.relational import sort_limit_orders

    df = sort_limit_orders(spark, SF_DIR)
    assert "TakeOrderedAndProject" in physical_plan(df)


def test_flatten_has_no_shuffle(spark):
    df = REGISTRY["etl_flatten"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "Exchange" not in plan  # narrow projection end-to-end


def test_routing_is_single_projection(spark):
    from mongo2mysql_spark.operators.routing import add_table_column
    from mongo2mysql_spark.sources.parquet import load_table

    df = add_table_column(
        load_table(spark, SF_DIR, "events").withColumn("_key", F.lit("tag:1:topics")),
        "_key",
        "events",
    )
    plan = optimized_plan(df)
    assert "Join" not in plan and "Aggregate" not in plan


def test_bruteforce_broadcasts_queries(spark):
    df = REGISTRY["ann_topk_exact"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_whole_stage_codegen_active(spark):
    df = REGISTRY["q1_pricing_summary"].fn(spark, SF_DIR)
    df.collect()  # AQE finalizes the plan only on execution
    # executedPlan renders whole-stage-codegen stages as `*(n)` markers
    plan = physical_plan(df)
    assert "*(1)" in plan and "*(2)" in plan


def test_minhash_single_shuffle_for_signatures(spark):
    from mongo2mysql_spark.functions.text import tokens, word_shingles
    from mongo2mysql_spark.operators.dedup import minhash_signature
    from mongo2mysql_spark.sources.parquet import load_table

    spark.catalog.clearCache()  # else an earlier LSH run's persisted
    # signature frame serves this plan from cache (no exchange at all)
    d = load_table(spark, SF_DIR, "documents")
    sig = minhash_signature(d, "doc_id", word_shingles(tokens(F.col("text")), 3))
    plan = physical_plan(sig)
    # one exchange for the groupBy(doc_id) — no extra shuffles
    assert plan.count("Exchange hashpartitioning") == 1


def test_asof_join_is_not_nested_loop(spark):
    """The as-of join must plan as shuffle+window (linear), never as an
    inequality BroadcastNestedLoopJoin (quadratic)."""
    df = REGISTRY["asof_join_error_purchase"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_lsh_band_shuffle_is_narrow(spark):
    """The LSH candidate-pair dedup must not drag the k signature
    columns through the band join: pair dedup aggregates on (id_1,id_2)
    alone (no first(a0..) carries), and the signature frame is reused
    from cache rather than recomputed per reference.  Inspects the
    LAZY operator plan (materialize=False): the registry slot
    checkpoints its pair-bounded branches, which truncates the plan the
    driver sees."""
    from mongo2mysql_spark.functions.text import tokens, word_shingles
    from mongo2mysql_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from mongo2mysql_spark.queries.dedup import BANDS, K
    from mongo2mysql_spark.sources import load_table as T

    d = T(spark, SF_DIR, "documents")
    sig = minhash_signature(d, "doc_id", word_shingles(tokens(F.col("text")), 3), k=K)
    df = lsh_candidate_pairs(
        sig, "doc_id", k=K, bands=BANDS, min_est_jaccard=0.5, materialize=False
    )
    df.collect()  # finalize AQE plan
    plan = physical_plan(df)
    spark.catalog.clearCache()  # materialize=False leaves the sig cache to us
    dedup_aggs = [
        line
        for line in plan.splitlines()
        if "HashAggregate" in line and "id_1" in line and "id_2" in line
    ]
    assert dedup_aggs, "pair-dedup aggregate missing from plan"
    assert not any("first(a" in line or "mh0" in line for line in dedup_aggs)
    assert "InMemoryTableScan" in plan  # signatures persisted, not re-derived


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Co-located join lever: after bucketed staging on the join key,
    the orders<->lineitem equi-join plans with ZERO Exchange (the
    shuffle was paid once at staging time)."""
    from mongo2mysql_spark.plans.bucketing import read_staged, stage_bucketed
    from mongo2mysql_spark.sources.parquet import load_table

    # (warehouse dir is a static conf; managed tables land in the
    # session default and are dropped — files included — in finally)
    o = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    stage_bucketed(o, "b_orders", ["o_orderkey"], 4, sort_cols=["o_orderkey"])
    stage_bucketed(li, "b_lineitem", ["l_orderkey"], 4, sort_cols=["l_orderkey"])
    try:
        # disable broadcast: at test scale AQE would broadcast the dim,
        # hiding the co-located SortMergeJoin this lever exists for
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        joined = read_staged(spark, "b_orders").join(
            read_staged(spark, "b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides arrive co-located
        # sanity: result matches the plain (shuffled) join
        assert joined.count() == o.join(li, o.o_orderkey == li.l_orderkey).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The range join must plan as an equi-join on the bucket id even
    with broadcast disabled (both sides big at scale) — never a
    BroadcastNestedLoopJoin/CartesianProduct on the BETWEEN predicate."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = REGISTRY["range_join_promo_revenue"].fn(spark, SF_DIR)
        plan = physical_plan(df)
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_hypertable_rollup_serves_from_store_not_raw(spark):
    """The registered rollup computes through the STREAMING refresh
    (streaming/rollup.py): by serve time the raw events were consumed
    by the foreachBatch runs, so the hour/day/week legs must read the
    materialized partial store, never the raw table (the continuous-
    aggregate contract).  The sliding-DAU legs are the documented
    exception: sliding DISTINCT has no mergeable-partial store (the
    partials hold no user identities), so the exact 'sliding24h' leg
    scans events, the exact frame is re-read by the 'sliding24h_hll'
    verdict join, and the HLL sketch build scans once more — exactly
    THREE raw scans, all attributable to the DAU family, none to the
    rollup legs."""
    df = REGISTRY["events_hypertable_rollup"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    # three rollup legs over the checkpointed store materialization
    assert plan.count("Scan ExistingRDD") == 3
    # raw events scans: exact DAU leg + its reuse in the hll verdict
    # join + the hll sketch build — the rollup legs contribute zero
    assert plan.count("events.parquet") == 3


def test_connected_components_stars_are_equi_joins(spark):
    """One star round must plan as hash/sort-merge equi-joins — a
    nested-loop or cartesian here would be quadratic in the edge list."""
    from mongo2mysql_spark.operators.components import _large_star, _small_star

    e = spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "a: long, b: long")
    plan = _small_star(_large_star(e))._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_topk_plan_shape(spark):
    """BM25 search must broadcast both small sides (df + stats) and
    take its top-20 as TakeOrderedAndProject, never a global sort."""
    df = REGISTRY["text_bm25_search"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("SortMergeJoin") == 0


def test_pack_sequences_no_global_window(spark):
    """Sequence packing must never plan a no-partition window (the
    single-reducer shape the two-phase prefix sum exists to avoid)."""
    df = REGISTRY["corpus_pack_sequences"].fn(spark, SF_DIR)
    plan = physical_plan(df)
    # every Window operator must carry a partition spec
    for line in plan.splitlines():
        if "Window " in line or line.strip().startswith("Window"):
            assert "__pid" in line, line


def _window_lines_missing_partition(plan: str) -> list[str]:
    """Window plan lines print as ``Window [exprs], [partSpec], [orderSpec]``
    with empty specs omitted.  Three groups → partitioned (fine).  Two
    groups → the trailing group is either a partition spec (fine) or an
    order spec — only orderings carry ASC/DESC, and an ordered window
    with no partition is the single-reducer shape.  One group → fully
    global (also single-reducer)."""
    bad = []
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        groups = line.split("], [")
        if len(groups) >= 3:
            continue
        if len(groups) == 1 or " ASC" in groups[1] or " DESC" in groups[1]:
            bad.append(line)
    return bad


# Queries whose plan legitimately contains a broadcast nested-loop join:
# a deliberate crossJoin against a broadcast single-row/tiny frame
# (corpus stats, query vectors, the IVF centroid table).
_BNLJ_OK = {
    "text_bm25_search",
    "dedup_pair_families",
    "ann_topk_exact",
    "ann_topk_ivf",
    "agg_approx_sketches",  # single-row merged-sketch frame cross-joined in
    "embedding_stats",  # PQ ADC scan crossJoins the broadcast per-query
    # distance-table frame (operators/pq.py) — same family as ann_topk_*
    "text_term_frequency",  # domain shares crossJoin the 1-row broadcast
    # total (operators/domains.domain_sizes) — k-bounded × 1, never quadratic
    "profile_table_stats",  # heavy_keys crossJoins its 1-row totals frame
    "corpus_pack_sequences",  # systematic_weighted_select crossJoins the
    # 1-row weight total
    "resample_gapfill",  # seasonal_backtest crossJoins the 1-row span/split
    # frame (and the per-key hour grid explodes from it)
    "topk_parts_per_brand",  # association_rules crossJoins the 1-row
    # basket-count frame (operators/basket) — pair-bounded × 1
    "events_sessionize",  # the latdist branch crossJoins the 1-row
    # converter count with the 1-row exact-quantile frame (1 × 1)
    "corpus_clean_shuffle",  # lm_perplexity folds the broadcast 1-row
    # vocabulary-size frame in with a cross join (r12 lazy_vocab —
    # replaces the eager .first() the old path ran per build)
    "etl_pipeline_e2e",  # the builder's ppl gate uses the same
    # lazy-vocab 1-row cross join through pipelines.build_training_corpus
}


@pytest.mark.slow
def test_registry_sweep_no_cartesian_no_global_window(spark):
    """Every registered query must plan without a CartesianProduct and
    without an unpartitioned (single-reducer) Window — the two plan
    shapes that silently work at sf0.01 and melt down at 100 TB.
    Broadcast nested-loop joins are allowed only on the allowlisted
    queries that intentionally cross-join a broadcast scalar frame."""
    problems = []
    for name, q in sorted(REGISTRY.items()):
        if name.startswith("streaming_"):
            continue  # executing a stream per sweep entry is covered by test_streaming
        plan = physical_plan(q.fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_OK:
            problems.append(f"{name}: BroadcastNestedLoopJoin (not allowlisted)")
        bad = _window_lines_missing_partition(plan)
        if bad:
            problems.append(f"{name}: unpartitioned Window: {bad[0].strip()[:120]}")
    assert not problems, "\n".join(problems)


def test_winnow_staging_survives_optimizer(spark):
    """The winnowing fingerprint pass stages tokens and the shingle-hash
    array as their own projections so the window-min lambda slices a
    bound column.  If CollapseProject ever re-inlines them (alias
    vanishing from the optimized plan), the md5 array is rebuilt once
    per window — an O(n^2)-per-document regression measured at 17x wall
    time.  (Asserted on the operator plan directly: the slot now serves
    slot_memo'd checkpoints, so its own optimized plan is checkpoint
    scans.)"""
    from mongo2mysql_spark.operators.passages import doc_fingerprints_pos
    from mongo2mysql_spark.queries.text import WINNOW_K, WINNOW_W
    from mongo2mysql_spark.sources import load_table

    d = load_table(spark, SF_DIR, "documents")
    df = doc_fingerprints_pos(d, "doc_id", "text", WINNOW_K, WINNOW_W)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "__hs" in optimized, "hash-array staging collapsed into the consumer"
    assert "__t" in optimized, "token staging collapsed into the consumer"


@pytest.mark.slow
def test_registry_schema_stable_across_scale_factors(spark):
    """Every registered query must produce the SAME schema at sf0.001
    and sf0.01 — a schema that drifts with data scale (pivot value
    discovery, inferred JSON fields, type widening differences) would
    pass local tests and break the driver gate.  Plan-only: no query
    executes."""
    problems = []
    for name, q in sorted(REGISTRY.items()):
        if name.startswith("streaming_"):
            continue
        try:
            s1 = q.fn(spark, "/root/testdata/sf0.001").schema
            s2 = q.fn(spark, "/root/testdata/sf0.01").schema
        except Exception as exc:  # noqa: BLE001
            problems.append(f"{name}: build error {str(exc)[:100]}")
            continue
        if s1 != s2:
            problems.append(f"{name}: sf0.001={s1.simpleString()[:120]} vs sf0.01={s2.simpleString()[:120]}")
    assert not problems, "\n".join(problems)


def test_dynamic_partition_pruning_fires_on_partitioned_join(spark, tmp_path):
    """A hive-partitioned fact joined to a filtered dim must plan a
    dynamic-pruning subquery on the partition column — at 100 TB this is
    what keeps a star join from scanning every date/tenant directory
    when the dim filter only selects a few."""
    from pyspark.sql import functions as F

    from mongo2mysql_spark.sources.lake import write_partitioned
    from mongo2mysql_spark.sources.parquet import load_table

    orders = load_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_by_status")
    write_partitioned(orders, path, ["o_orderstatus"])

    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", "final"), ("O", "open"), ("P", "pending")], "status string, label string"
    )
    j = fact.join(
        dim.filter(F.col("label") == "final"), fact.o_orderstatus == dim.status
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the result is the pruned slice
    assert j.count() == orders.filter("o_orderstatus = 'F'").count()


def test_new_operator_plans_have_no_cartesian_or_global_window(spark):
    """Plan-shape sweep over the round's new operators: no
    CartesianProduct anywhere, no single-reducer (empty-partition)
    window, and the anomaly scorer plans exactly one exchange (the
    per-key shuffle)."""
    from pyspark.sql import functions as F

    from mongo2mysql_spark.operators.anomaly import rolling_zscore
    from mongo2mysql_spark.operators.diffing import snapshot_diff
    from mongo2mysql_spark.operators.profile import profile_table
    from mongo2mysql_spark.operators.semdedup import semantic_dedup_pairs
    from mongo2mysql_spark.sources.parquet import load_table

    ev = load_table(spark, SF_DIR, "events")
    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")

    frames = {
        "anomaly": rolling_zscore(
            ev, ["user_id"], "ts", "value", tiebreak_cols=["event_id"]
        ),
        "semdedup_pairs": semantic_dedup_pairs(
            emb.select("vec_id", "embedding"), "vec_id", "embedding",
            kmeans_iters=1,
        ),
        "profile": profile_table(ev),
        "diff": snapshot_diff(docs.limit(400), docs, ["doc_id"]),
    }
    for name, df in frames.items():
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "Window [" not in plan or "windowspecdefinition()" not in plan, name

    anomaly_plan = frames["anomaly"]._jdf.queryExecution().executedPlan().toString()
    assert anomaly_plan.count("Exchange") == 1, anomaly_plan


def test_q19_disjunction_prefilters_both_sides(spark):
    """TPC-H Q19 shape: the OR-of-ANDs join predicate mixes columns of
    both tables, but Catalyst must still extract each side's implied
    disjunction (CNF conversion) so part AND lineitem prefilter BEFORE
    the join — without it the join processes both full tables."""
    df = REGISTRY["join_coverage"].fn(spark, SF_DIR).filter("side = 'q19'")
    plan = optimized_plan(df)
    below_join = plan.split("Join Inner", 1)[-1]
    # part side: brand disjunction pushed below the join
    assert "Brand#12" in below_join and "p_size" in below_join
    # lineitem side: quantity disjunction pushed below the join
    assert "l_quantity" in below_join
    # and no cartesian anywhere
    assert "Cartesian" not in physical_plan(df)


def test_slot_persist_releases_previous_generation(spark):
    """cachereg.slot_persist (r12): rebuilding a slot releases the
    previous build's cache under the same key — at most one live
    generation per call site, the invariant the persist-release guard
    below exists to protect."""
    from mongo2mysql_spark.cachereg import _REGISTRY, slot_persist

    key = ("test.slot_persist",)
    a = slot_persist(key, spark.range(10))
    a.count()
    assert a.storageLevel.useMemory
    b = slot_persist(key, spark.range(20))
    assert not a.storageLevel.useMemory  # previous generation released
    assert _REGISTRY[key] is b
    b.count()
    assert b.storageLevel.useMemory
    slot_persist(key, spark.range(5))  # cleanup for later tests
    _REGISTRY.pop(key).unpersist()


def test_every_persist_site_has_a_release_path():
    """The round-5 bench regression's standing guard: any non-test
    module that persist()s a DataFrame must also contain an
    unpersist() — a long-lived driver session runs ~50 registry
    queries back-to-back, and never-released caches accumulated until
    the dedup family ran 2.8-4.1x slower (BENCH_r05 vs r04).  The
    release may be deferred (porter.py exposes an explicit
    Result.unpersist() API its callers invoke), so the rule is
    file-scoped; AST-based so comments mentioning persist() don't
    count."""
    import ast
    import pathlib

    pkg = pathlib.Path(__file__).resolve().parents[1] / "mongo2mysql_spark"
    offenders = []
    for path in sorted(pkg.rglob("*.py")):
        calls = {"persist": 0, "unpersist": 0}
        for node in ast.walk(ast.parse(path.read_text())):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr in calls
            ):
                calls[node.func.attr] += 1
        if calls["persist"] and not calls["unpersist"]:
            offenders.append(str(path.relative_to(pkg)))
    assert not offenders, (
        f"persist() without any unpersist() release path: {offenders}"
    )


def test_centroid_assignment_is_aggregate_not_window(spark):
    """Nearest-centroid assignment (IVF build side, prototype pruning)
    must plan as a max_by AGGREGATE with map-side partials, never as a
    row_number window over partitionBy(id) — the window shuffles all C
    candidate copies of the corpus on the id key; the aggregate ships
    one partial row per (partition, id) (VERDICT r6 #2)."""
    from mongo2mysql_spark.operators.pruning import prune_prototypes
    from mongo2mysql_spark.operators.similarity import assign_centroids
    from mongo2mysql_spark.sources.parquet import load_table

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    cents = emb.filter(F.col("vec_id") % 97 == 0)

    assigned = assign_centroids(emb, cents, "vec_id", "embedding")
    plan = physical_plan(assigned)
    assert "Window" not in plan, plan
    assert "max_by" in plan
    # partial + final aggregate pair, one shuffle between them (the
    # other Exchange is the centroid BroadcastExchange, not a shuffle)
    assert plan.count("Exchange hashpartitioning") == 1, plan

    pruned = prune_prototypes(emb, "vec_id", "embedding", 97, 8)
    # the ASSIGNMENT stage must be window-free; the per-cluster rank
    # that follows is a legitimate partitioned window, so assert the
    # assignment subplan via the aggregate's presence and that the only
    # windows are the cluster-key ones
    pplan = physical_plan(pruned)
    assert "max_by" in pplan
    for line in pplan.splitlines():
        if "windowspecdefinition" in line:
            assert "__cid" in line, line

    # query-side nprobe>1 keeps the ranked-window contract (bounded side)
    probes = assign_centroids(emb.limit(20), cents, "vec_id", "embedding", nprobe=3)
    assert "_probe" in probes.columns
