"""Plan-quality invariants: the physical plans we rely on at 100 TB,
asserted so a refactor can't silently regress them (README
§Performance is backed by these)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from ingest_spark.queries import QUERIES
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q6_filters_reach_the_scan(spark):
    f = _formatted(spark, "tpch_q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in f  # pushed, not post-scan
    assert "LessThan(l_quantity,24.0)" in f
    # column pruning: the 11-column table scans as a 4-column slice
    read = [ln for ln in f.splitlines() if "ReadSchema" in ln][0]
    assert read.count(":") - 1 == 4, read


def test_q10_star_join_all_broadcast(spark):
    p = _plan(spark, "tpch_q10_returned_revenue")
    assert p.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in p  # fact side must never shuffle for a join


def test_q4_semi_join_stays_semi_and_broadcast(spark):
    p = _plan(spark, "tpch_q4_late_orders")
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_knn_broadcasts_queries_never_cartesian(spark):
    p = _plan(spark, "knn_bruteforce")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # tiny query side x corpus


def test_lsh_candidates_join_on_equi_buckets(spark):
    for name in (
        "minhash_lsh_neardup",
        "simhash_neardup",
        "ann_lsh_topk",
        "embedding_neardup_lsh",
    ):
        p = _plan(spark, name)
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name  # equi-join only


def test_scale_deciles_have_no_window(spark):
    # the 100TB bucket-assignment path: percentile agg + broadcast
    # array filter — a WindowExec anywhere means the single-partition
    # ntile crept back in
    p = _plan(spark, "spend_deciles_scale")
    assert "Window" not in p
    assert "BroadcastExchange" in p  # 1-row boundary frame broadcast


def test_connected_components_rounds_are_equi_joins(spark):
    # the iterative CC collapse must stay equi-join + hash-agg per
    # round — a cartesian anywhere would explode at cluster scale
    from ingest_spark.queries import QUERIES

    df = QUERIES["neardup_components"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_connected_components_star_rounds_are_equi_joins(spark):
    # the large-star/small-star variant must be equi-join + per-node
    # hash-agg only as well (its whole point is skew-safety)
    from ingest_spark.queries import QUERIES

    df = QUERIES["neardup_components_star"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p  # per-node min with partial aggregation


def test_flagship_aggregates_have_map_side_combine(spark):
    p = _plan(spark, "flagship_event_rollup")
    # partial + final pairs: dedup agg and rollup agg
    assert p.count("HashAggregate") >= 4


def test_incremental_filter_is_literal_pushdown(spark):
    f = _formatted(spark, "t8_incremental_filter")
    assert "GreaterThan(ts" in f or "GreaterThan(event_id" in f, f


def test_q8_deep_star_all_dimensions_broadcast(spark):
    p = _plan(spark, "tpch_q8_market_share")
    assert p.count("BroadcastHashJoin") >= 6  # 7-table star
    assert "CartesianProduct" not in p


def test_range_join_broadcasts_window_dimension(spark):
    p = _plan(spark, "range_join_weekly_windows")
    # non-equi join must be NestedLoop against the TINY broadcast side,
    # never a cartesian of the fact table
    assert "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p


def test_date_partitioned_write_prunes_scan(spark, tmp_path):
    """partitionBy(date) sink (K2 upgrade over Connect's
    DefaultPartitioner) must produce partition-PRUNED reads: the day
    filter lands in PartitionFilters and non-matching directories are
    never opened."""
    from ingest_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    sink = str(tmp_path / "by_day")
    ev.withColumn("day", __import__("pyspark").sql.functions.to_date("ts")).write.partitionBy(
        "day"
    ).parquet(sink)

    back = spark.read.parquet(sink).filter("day = DATE '2024-01-05'")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    f = back._jdf.queryExecution().explainString(mode)
    pf = [ln for ln in f.splitlines() if "PartitionFilters" in ln][0]
    assert "2024-01-05" in pf, pf
    n = back.count()
    assert n > 0
    full = spark.read.parquet(sink).count()
    assert n < full


def test_global_topn_is_take_ordered_not_global_window(spark):
    """Global top-N (q10's final rank, word/bigram frequency heads)
    must compile to TakeOrderedAndProject — a single-partition Window
    sort of the full aggregate would serialize at scale."""
    for name in ("word_frequencies", "bigram_frequencies"):
        p = _plan(spark, name)
        assert "TakeOrderedAndProject" in p, name


def test_q9_star_join_dimensions_broadcast(spark):
    p = _plan(spark, "tpch_q9_product_profit")
    assert p.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "CartesianProduct" not in p


def test_q21_exists_become_semi_anti_joins(spark):
    p = _plan(spark, "tpch_q21_waiting_supplier")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_sampling_filter_needs_no_shuffle(spark):
    """The sample/split assignment itself is pure Column arithmetic:
    zero Exchange nodes — at 100 TB it is a codegen'd filter over the
    scan, embarrassingly parallel."""
    from ingest_spark.catalog import load_table
    from ingest_spark.operators import sampling

    docs = load_table(spark, SF_DIR, "documents")
    out = sampling.stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 10}, default_rate=100
    )
    p = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    assert "*(1)" in p  # the star marks the WholeStageCodegen span


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """With broadcast off (as when both sides are 100TB-large), the
    optimizer should inject a bloom_filter_agg runtime filter from the
    selective build side into the probe-side scan — rows that can't
    join die before the shuffle, not after it."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        o = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_reconciliation_full_outer_copartitions_no_broadcast(spark):
    """Full-outer must preserve both sides: the join has to be a
    co-partitioned SMJ/shuffle join, never broadcast."""
    p = _plan(spark, "source_reconciliation")
    assert "FullOuter" in p or "full_outer" in p.lower()
    assert "BroadcastHashJoin FullOuter" not in p


def test_market_basket_frequency_joins_broadcast(spark):
    """The pair->frequency joins are against the (small) part-frequency
    table: both must broadcast so pair rows never shuffle again after
    the co-occurrence aggregate."""
    p = _plan(spark, "market_basket_lift")
    assert p.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in p


def test_interpolation_single_shuffle_for_both_walks(spark):
    """Both IGNORE-NULLS carry walks (backward + forward) must share
    one event_type partitioning — exactly one Exchange below the
    Window operators beyond the grid build."""
    f = _formatted(spark, "interpolate_hourly_gaps")
    tree = f.split("\n\n")[0].splitlines()
    win_ix = [i for i, ln in enumerate(tree) if "Window (" in ln]
    # two-plus Window nodes (forward + backward walks)...
    assert len(win_ix) >= 2, tree
    # ...stacked over ONE shuffle: no Exchange between the topmost and
    # bottom-most Window node (the only other et-exchange in the plan
    # feeds the broadcast distinct() of event types, not the walks)
    between = tree[min(win_ix): max(win_ix) + 1]
    assert not any("Exchange" in ln for ln in between), between


def test_rolling_actives_single_fact_pass_no_expand(spark):
    # one parquet scan (DAU folded into the coverage aggregation, not a
    # second branch) and no Expand (DAU is a conditional plain count, so
    # the plan stays on the single-distinct aggregate strategy)
    p = _plan(spark, "rolling_active_users")
    assert p.count("Scan parquet") == 1, p
    assert "Expand" not in p, p


def test_ewma_self_join_runs_on_post_aggregate_grain(spark):
    # the age-weighted self-join must join two AGGREGATED sides (daily
    # grain), never the raw fact against itself: both scans feed a
    # HashAggregate before any join, and the tiny side broadcasts
    p = _plan(spark, "ewma_daily_value")
    assert "BroadcastHashJoin" in p, p          # post-agg side is broadcast-size
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p, p
    # the broadcast build side is an aggregated daily grain, not raw events
    build = p.split("BroadcastExchange", 1)[1]
    assert "HashAggregate" in build.split("Scan parquet", 1)[0], p


def test_round5_curation_plans_have_no_cartesian(spark):
    """Every r5 curation/retrieval query must stay equi-join (+ the
    1-row broadcast-aggregate BNLJ pattern where a scalar is fanned
    back onto the scan — the only BNLJ shape allowed)."""
    from ingest_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    # name -> max allowed BNLJ count (each a 1-row scalar broadcast);
    # a cap, not a wholesale exemption, so a regression adding an
    # unintended second nested-loop join still fails (r9 review)
    one_row_bnlj_max = {
        "unigram_logprob_score": 1,
        "bm25_multiquery": 1,
        "dsir_importance_weights": 1,
        # r9: one-row corpus_common_words broadcast into the gate
        "curation_e2e": 1,
    }
    for name in (
        "semantic_dedup_survivors",
        "duplicate_passage_fraction",
        "incremental_dedup_new",
        "curation_e2e",
        "quality_weighted_sample",
        "contamination_fraction",
        "unigram_logprob_score",
        "bm25_multiquery",
        # r6 additions
        "dsir_importance_weights",
        "ngram_novelty",
        "bpe_merge_candidates",
    ):
        p = QUERIES[name](spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in p, name
        n_bnlj = p.count("BroadcastNestedLoopJoin")
        assert n_bnlj <= one_row_bnlj_max.get(name, 0), (name, n_bnlj)


def test_duplicate_passage_fraction_uses_window_not_join(spark):
    """The 22.6x win (BASELINE.md): per-gram frequency must come from
    a window count over the single gram shuffle, not an aggregate
    joined back (which builds a gram-string hash relation the size of
    the exploded corpus)."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["duplicate_passage_fraction"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" in p
    assert "Join" not in p  # no join of any kind in this plan
    # the window keys on xxhash64(gram), not the raw string: 8-byte
    # sort keys in the shuffle (VERDICT r5 §Next #3)
    assert "xxhash64" in p


def test_duplicate_passage_fraction_skewsafe_bounded_windows(spark):
    """The skew-safe variant's contract: exactly two window stages —
    (gh, salt) then gh-over-bounded-rows — still no join of any kind,
    and both windows key on the 64-bit gram hash (never the string)."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["duplicate_passage_fraction_skewsafe"](
        spark, "/root/testdata/sf0.001"
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in p
    assert "CartesianProduct" not in p
    assert "xxhash64" in p
    # two distinct window specs: the salted level-1 and the gh level-2
    import re

    specs = set(re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", p))
    assert len(specs) >= 2, specs


def test_unigram_vocab_join_left_to_aqe_broadcasts_at_bench_scale(spark):
    """VERDICT r5 §Next #4: no forced F.broadcast on the vocab table —
    the strategy is AQE's. At bench scale the runtime stats must still
    land it as a broadcast hash join (no fact-side SortMergeJoin); at
    100 TB the same code degrades to a shuffled join instead of a
    driver OOM."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["unigram_logprob_score"](spark, "/root/testdata/sf0.001")
    df.collect()  # AQE decides from actual shuffle sizes at runtime
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_contamination_fraction_broadcasts_benchmark(spark):
    from ingest_spark.queries import QUERIES

    df = QUERIES["contamination_fraction"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p  # benchmark gram side broadcast
    assert "CartesianProduct" not in p


def test_bpe_merge_candidates_global_topk_is_take_ordered(spark):
    """Top-50 pairs must be TakeOrderedAndProject (per-partition
    heaps), never a full global sort of the pair-count table."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["bpe_merge_candidates"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "Sort [" not in p.replace("TakeOrderedAndProject", "")


def test_ngram_novelty_never_joins_back_on_gram(spark):
    """The novelty plan's contract (SCALING.md §7 discussion): the
    gram aggregate's output re-aggregates by winning doc_id; the only
    join is doc_id-keyed between two doc-sized tables — the 73M-row
    gram table is never a join input."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["ngram_novelty"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    joins = [ln for ln in p.splitlines() if "Join" in ln]
    assert joins, "expected the doc_id-keyed final join"
    assert all("doc_id" in ln and "gram" not in ln for ln in joins), joins


def test_domain_quota_pushes_group_limit_below_exchange(spark):
    """The quota plan's skew guard (SCALING.md §7): Spark's
    WindowGroupLimit must appear on BOTH sides of the shuffle, so each
    map task forwards <= quota rows per source and a corpus-sized
    source cannot flood one reducer."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["domain_quota_rebalance"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("WindowGroupLimit") >= 2, p[:2000]


def test_pmi_collocations_topk_and_no_cartesian(spark):
    from ingest_spark.queries import QUERIES

    df = QUERIES["pmi_collocations"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_countmin_sketch_is_broadcast_and_small(spark):
    """The CM sketch table must broadcast to the probe join (it is
    <= k*m rows forever) and the whole plan stays equi-join."""
    from ingest_spark.queries import QUERIES

    df = QUERIES["countmin_frequency_estimates"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p


def test_triangle_count_all_equi_joins(spark):
    from ingest_spark.queries import QUERIES

    df = QUERIES["triangle_count_parts"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # the 1-row edge-count broadcast is the only BNLJ allowed
    assert p.count("BroadcastNestedLoopJoin") <= 1


def test_classifier_scoring_stays_jvm_side(spark):
    """score_docs with fixed weights: the scoring aggregate must be
    pure JVM expressions (no Python eval anywhere in the plan) and
    the only join the doc-keyed margin attach."""
    from ingest_spark.operators import classifier

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = [0.01 * i for i in range(classifier.N_BUCKETS)] + [0.1]
    p = (
        classifier.score_docs(docs, w)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_scd2_snapshot_pushes_asof_filter_and_group_limit(spark):
    from ingest_spark.queries import QUERIES

    df = QUERIES["scd2_snapshot_at"](spark, "/root/testdata/sf0.001")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    f = df._jdf.queryExecution().explainString(mode)
    assert "LessThanOrEqual(ts" in f  # as-of filter reaches the scan
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("WindowGroupLimit") >= 2  # rank-1 pushed below the shuffle


def test_key_skew_report_is_takeordered_plus_broadcast(spark):
    from ingest_spark.queries import QUERIES

    df = QUERIES["key_skew_report"](spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_media_decode_pipeline_has_no_shuffle(spark):
    """The E5 decode path (attach_media_payload -> decode_media_features,
    two stacked mapInPandas stages) must compose into one shuffle-free
    plan: payloads are the dominant bytes at scale, and an Exchange
    between the encode and decode stages would move every payload
    across the cluster for no semantic reason."""
    for name in ("multimodal_media_decode", "multimodal_jpeg420_decode",
                 "media_decode_errors"):
        p = _plan(spark, name)
        assert "Exchange" not in p, f"{name} shuffles payloads:\n{p}"
        assert p.count("MapInPandas") >= 1, name


def test_embedding_join_stages_compile_no_codegen_fallback(spark):
    """VERDICT r8 #1 gate: the embedding-similarity join stages must
    WHOLE-STAGE-CODEGEN, not silently fall back to interpreted eval.

    r8's sweep log showed Janino `Failed to compile ... bhj_doConsume`
    for embedding_neardup_lsh / semantic_dedup_survivors — the inline
    five-chain unrolled cosine, instantiated twice, blew the 64 KB
    method limit once fused into the join stage (BASELINE.md records
    interpreted-vs-codegen as a 3.6x swing at 1M vectors). Fixed by
    hoisting per-side norms (operators/similarity.py); this test pins
    it: with spark.sql.codegen.fallback=false a compile failure in ANY
    stage of these plans raises instead of degrading, so the silent
    3-4x scale regression becomes a red test."""
    prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for name in (
            "embedding_neardup_lsh",
            "semantic_dedup_survivors",
            "ann_lsh_topk",
            "ann_lsh_multiprobe",
            "embedding_neardup",
            "knn_bruteforce",
        ):
            QUERIES[name](spark, SF_DIR).count()  # executes every stage
    finally:
        spark.conf.set("spark.sql.codegen.fallback", prev)


def test_bm25_multiquery_prunes_before_first_exchange(spark):
    """VERDICT r8 #4: the broadcast query-term prune must hit the
    exploded corpus BEFORE any Exchange — at 100 TB the prune is what
    keeps the first shuffle sized by matching terms, not by the whole
    explosion. Structurally: walking UP from the corpus explode, a
    BroadcastHashJoin on term appears with no Exchange between them;
    plus the top-N is a WindowGroupLimit, and nothing sort-merges.

    r15: tf is pin()ned (the tfidf r12 duplication fix applied here),
    which hides the explode+prune subtree behind the checkpoint scan in
    the default plan — the invariant lives in the PINNED subtree, so
    assert it on the unpinned plan (PIN_MODE=none) where the whole
    tree is visible."""
    from ingest_spark import pinning

    old_mode = pinning.PIN_MODE
    pinning.PIN_MODE = "none"
    try:
        p = _plan(spark, "bm25_multiquery")
    finally:
        pinning.PIN_MODE = old_mode
    lines = p.split("\n")
    gen_i = next(i for i, l in enumerate(lines) if "Generate explode(split" in l)
    bhj_i = max(
        i for i, l in enumerate(lines[:gen_i]) if "BroadcastHashJoin [term" in l
    )
    between = lines[bhj_i + 1 : gen_i]
    assert not any("Exchange hashpartitioning" in l for l in between), between
    assert "WindowGroupLimit" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_exact_substring_spans_windows_partition_by_doc_only(spark):
    """VERDICT r8 #4: every window in the seed-and-extend span walk
    partitions by doc_id ONLY (doc-local islands — state per task is
    one doc's gram positions, never a global sort), the dup-gram seed
    set arrives broadcast, and gram extraction is the codegen regex
    path (the r6 8.3x fix), not an interpreted HOF chain."""
    p = _plan(spark, "exact_substring_spans")
    win_lines = [l for l in p.split("\n") if l.lstrip().startswith("+- Window")
                 or l.lstrip().startswith(":- Window")]
    assert win_lines, p
    for l in win_lines:
        assert "], [doc_id" in l, l  # partition spec is doc_id alone
    assert "regexp_extract_all" in p
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "SortMergeJoin" not in p


def test_pq_ann_topk_prunes_candidates_before_rerank(spark):
    """VERDICT r8 #4: the PQ pipeline's shape — numpy ADC scoring in
    an Arrow batch (MapInPandas), a WindowGroupLimit top-80 candidate
    prune BEFORE the exact re-rank join, and broadcast-only joins (the
    8-byte-code table never sort-merges against the corpus)."""
    df = QUERIES["pq_ann_topk"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in p
    assert p.count("WindowGroupLimit") >= 2  # ADC prune + final top-k
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p


def test_incremental_ingest_batch_plan_is_state_sized(spark, tmp_path):
    """VERDICT r8 #4: the live per-batch plan of the persist-and-
    resume ingest — the new batch filter reaches the documents scan
    (PushedFilters on source), the corpus side arrives as STORED
    state tables (no re-shingling of existing docs: every Generate
    sits above a source-filtered documents scan), and nothing
    cartesians."""
    from pyspark.sql import functions as F

    from ingest_spark import incremental
    from ingest_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    state = str(tmp_path / "state")
    incremental.init_state(spark, docs.filter(F.col("source") != "src1"), state)
    df = incremental.ingest_batch(
        spark, docs.filter(F.col("source") == "src1"), state
    )
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    f = df._jdf.queryExecution().explainString(mode)
    assert "EqualTo(source,src1)" in f  # batch filter pushed to scan
    assert str(tmp_path) in f  # corpus side reads the stored state
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in p
    # the existing corpus is never re-shingled in the batch plan:
    # every documents scan in it carries the src1 batch filter
    doc_scans = [l for l in p.split("\n") if "documents.parquet" in l]
    assert doc_scans and all("src1" in l for l in doc_scans), doc_scans


def test_embedding_neardup_lsh_is_bucket_grouped_arrow_scoring(spark):
    """VERDICT r8 #1 (final form): the scale path's plan is ONE
    exchange on the LSH bucket feeding a FlatMapGroupsInPandas scorer
    — vectors cross the Arrow boundary once per bucket (|bucket| rows,
    never |bucket|^2 pairs), no join operator exists to fuse a mega-
    expression into, and the signature projection stays JVM-side below
    the shuffle. This is the formulation that replaced two failed
    Column-expression forms (Janino 64 KB blowup; HotSpot 8 KB JIT
    bailout -> bytecode interpreter, 799 s vs ~30 s at 1M x 64d)."""
    df = QUERIES["embedding_neardup_lsh"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in p
    assert p.count("Exchange") == 1, p  # the bucket shuffle, nothing else
    assert "hashpartitioning(__bucket" in p
    assert "Join" not in p and "CartesianProduct" not in p


def test_gopher_gate_adaptive_single_agg_then_broadcast(spark):
    """Late-r9 (the de-vacuized curation family): the corpus-adaptive
    gate must cost exactly ONE shuffle — the word-frequency aggregate
    whose top-20 lands in a TakeOrderedAndProject — re-entering the
    per-doc scan as a one-row broadcast; the four flag columns stay a
    narrow projection with no further exchange."""
    import re

    df = QUERIES["gopher_gate_adaptive"](spark, SF_DIR)
    p = df._jdf.queryExecution().executedPlan().toString()
    shuffles = re.findall(
        r"Exchange (?:hash|range)partitioning|Exchange SinglePartition", p
    )
    assert len(shuffles) == 1, p  # the word-frequency aggregate only
    assert p.count("BroadcastExchange") == 1, p
    assert "TakeOrderedAndProject" in p  # top-20 never a global sort
    assert "CartesianProduct" not in p


def test_sf_scaled_sides_degrade_to_shuffle_join_when_too_big(spark):
    """VERDICT r9 §Wrong #2 / §Next #2: no SF-scaled join side may carry
    a forced F.broadcast() hint. A hint forces the broadcast REGARDLESS
    of size — at 100 TB that's a blown 8 GB broadcast cap, a failed job.
    Proof of absence: with the broadcast threshold at -1 (every side
    "too big"), the relational family must compile to SortMergeJoin /
    ShuffledHashJoin, with BroadcastHashJoin remaining ONLY for joins
    that keep a hint on a fixed-cardinality side (nation=25, region=5,
    1-row scalar aggregates — sides that never grow). Before r10 this
    test fails on 16 queries; a reintroduced hint fails it again."""
    # name -> max BroadcastHashJoins allowed at threshold=-1 (the joins
    # still hinted on fixed-cardinality sides; 0 = fully hint-free)
    allowed_fixed_side_bhj = {
        "tpch_q3_shipping": 0,
        "tpch_q5_local_supplier": 2,   # nation + region hints
        "tpch_q7_nation_volume": 2,    # nation x2 hints
        "tpch_q8_market_share": 3,     # nation x2 + region hints
        "tpch_q9_product_profit": 1,   # nation hint
        "tpch_q10_returned_revenue": 1,  # nation hint
        # tpch_q11_important_stock left out since r11: its val subtree
        # is localCheckpoint-pinned, so the final plan has no file
        # scans or hinted joins at all (only a broadcast nested-loop
        # of the 1-row total against the materialized blocks) — its
        # single-scan guarantee is pinned by
        # test_q11_fact_subtree_evaluated_once below.
        "tpch_q14_promo_share": 0,
        "tpch_q15_top_supplier": 1,    # 1-row max_rev scalar, equi-joined
        "tpch_q16_supplier_variety": 0,
        "tpch_q17_small_qty_revenue": 0,
        "tpch_q18_large_orders": 0,
        "tpch_q19_bracket_revenue": 0,
        "tpch_q20_part_promotion": 0,
        "tpch_q21_waiting_supplier": 0,
        "cheapest_supplier_per_part": 0,
        "anti_join_inactive_customers": 0,
        "contract_validation": 0,
        "tfidf_top_terms": 0,
        "market_basket_lift": 0,
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for name, max_bhj in allowed_fixed_side_bhj.items():
            p = _plan(spark, name)
            n_bhj = p.count("BroadcastHashJoin")
            assert n_bhj <= max_bhj, (name, n_bhj, max_bhj)
            # degradation, not disappearance: the equi-joins are still
            # there, now as shuffle joins
            if max_bhj == 0 and "Join" in p:
                assert "SortMergeJoin" in p or "ShuffledHashJoin" in p, name
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_q11_fact_subtree_evaluated_once(spark):
    """VERDICT r10 §Next #1: tpch_q11's `val` (lineitem ⋈ supplier ⋈
    nation + per-partkey aggregate) is referenced twice — probe rows
    and the 1-row total — and Spark does not dedupe common subplans,
    so pre-r11 the full fact scan + shuffle executed TWICE (the old
    carve-out in the threshold=-1 dict documented it as 'nation hint
    x2'). Since r11 `val` is localCheckpoint-pinned: the executed plan
    of the returned frame must contain ZERO lineitem file scans (the
    one real scan ran inside the checkpoint job) and read the
    materialized blocks (ExistingRDD) instead; the only join left is
    the broadcast of the 1-row total."""
    p = _plan(spark, "tpch_q11_important_stock")
    assert "lineitem" not in p, p          # no re-derivation of the fact subtree
    assert "supplier" not in p, p
    assert "Scan ExistingRDD" in p, p      # checkpoint blocks, both references
    assert "CartesianProduct" not in p, p  # 1-row total arrives broadcast
    assert p.count("BroadcastHashJoin") == 0, p


def test_no_unpinned_fact_subtree_double_evaluation(spark):
    """VERDICT r10 §Next #2: the registry-wide audit for the q11
    pattern (a derived fact-grain frame referenced twice — probe +
    broadcast total — that Spark recomputes because it has no common-
    subplan dedup beyond ReuseExchange). The r11 audit found five
    fact-grain offenders with no runtime exchange reuse; each is now
    localCheckpoint-pinned at its natural grain. This guards the fix:
    the executed plan must scan the FACT table at most the pinned
    number of times (0 = fully behind the checkpoint). The full audit
    table lives in PLANS.md §Registry audit."""
    import re

    # name -> (fact table, max file scans of it allowed in the plan)
    pinned = {
        "tpch_q15_top_supplier": ("lineitem", 0),
        "market_basket_lift": ("lineitem", 0),
        "corpus_composition": ("documents", 0),
        # the score probe legitimately re-reads documents once; the
        # vocab + total live behind the pinned freq frame
        "unigram_logprob_score": ("documents", 1),
        "pmi_collocations": ("documents", 0),
        # r12 (VERDICT r11 §Next #5): the tf subtree executed twice
        # (probe + dfreq); ReuseExchange never fired because column
        # pruning diverges the subplans. tf is now pinned at doc-word
        # grain — everything derives from the pin (1.85x sf1 / 1.66x
        # sf10, ledger study text_shape_ab).
        "tfidf_top_terms": ("documents", 0),
    }
    for name, (table, max_scans) in pinned.items():
        df = QUERIES[name](spark, SF_DIR)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        f = df._jdf.queryExecution().explainString(mode)
        n = sum(
            1
            for b in re.split(r"\n\(\d+\) ", f)
            if b.startswith("Scan parquet") and f"{table}.parquet" in b
        )
        assert n <= max_scans, (name, table, n, max_scans)
        assert "Scan ExistingRDD" in f, name  # the pin is actually there


def test_exact_substring_spans_bloom_pruned_single_scan(spark):
    """VERDICT r11 §Next #1: exact_substring_spans pins its small seed
    set (localCheckpoint of the repeated-gram aggregate) and prunes
    the probe side's grams with a broadcast Bloom filter BEFORE the
    join. The executed plan must show all three structural facts:
    exactly ONE documents file scan (the probe — the seed branch ran
    inside the pin job), the pinned seed set read back as
    ExistingRDD, and the catalyst might_contain probe sitting in a
    Filter ahead of the join (pre-exchange, so when the seed set
    outgrows broadcast at 100 TB and the join degrades to sort-merge,
    only surviving grams — measured 0.4-1.2% — reach the shuffle)."""
    import re

    df = QUERIES["exact_substring_spans"](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    f = df._jdf.queryExecution().explainString(mode)
    n_doc_scans = sum(
        1
        for b in re.split(r"\n\(\d+\) ", f)
        if b.startswith("Scan parquet") and "documents.parquet" in b
    )
    assert n_doc_scans == 1, (n_doc_scans, f)
    assert "Scan ExistingRDD" in f, f       # the seed pin is there
    assert "might_contain" in f, f          # the bloom probe is there
    # the probe filter must sit BELOW the join (pre-exchange), not
    # after it: formatted numbering is child-first in-order, so the
    # might_contain Filter's op number must be smaller than the join's
    filter_nums = [
        int(m)
        for m, b in re.findall(r"\n\((\d+)\) (Filter[^\n]*(?:\n[^\n(]+)*)", f)
        if "might_contain" in b
    ]
    join_nums = [
        int(m)
        for m in re.findall(
            r"(?:BroadcastHashJoin|SortMergeJoin)[^\n(]*\((\d+)\)", f
        )
    ]
    assert filter_nums and join_nums, f
    assert min(filter_nums) < min(join_nums), (filter_nums, join_nums, f)


def test_bloom_prune_is_false_positive_only(spark):
    """The bloom prune may pass non-members (false positives — the
    exact join drops them) but must NEVER drop a true member at any
    fpp: prune a probe frame, then verify every build-side key
    survived. Also pins the two degrade paths: an empty build side
    skips the prune (returns the frame unchanged), and the pruned
    frame joined exactly equals the unpruned join."""
    from pyspark.sql import functions as F

    from ingest_spark.operators import bloom

    probe = spark.range(20000).select(
        F.col("id").alias("k"), F.xxhash64("id").alias("h")
    )
    build = spark.range(500).select(F.xxhash64("id").alias("h"))
    pruned = bloom.bloom_prune(probe, build, F.col("h"), "h", 500)
    # every true member survives
    assert pruned.join(build, "h").count() == 500
    # the prune did something (20k rows at fpp=0.01 -> ~500 + ~195 fp)
    n_pruned = pruned.count()
    assert 500 <= n_pruned < 20000, n_pruned
    # joined results identical with and without the prune
    a = sorted(r.k for r in probe.join(build, "h").select("k").collect())
    b = sorted(r.k for r in pruned.join(build, "h").select("k").collect())
    assert a == b
    # empty build side: prune skipped, frame unchanged
    empty = build.filter(F.lit(False))
    assert bloom.bloom_prune(probe, empty, F.col("h"), "h", 0) is probe


def test_aqe_splits_skewed_join_partitions(spark):
    """The documented 100-TB skew posture has two legs: manual salting
    (duplicate_passage_fraction_skewsafe) and AQE's runtime skew-join
    split for plain equi-joins. This pins the second leg actually
    firing: a 90%-hot key under shuffle-join thresholds must come out
    of AQE as SortMergeJoin(skew=true) with a 'coalesced and skewed'
    shuffle read — i.e. the hot partition was split into advisory-size
    chunks at runtime, no salting, no code change. If a Spark upgrade
    or conf refactor silently disables this, the manual-salting
    operators become the ONLY skew defense and this fails."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(500_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id").cast("string")).alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0]["n"] == 500_000  # executes -> final plan
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin(skew=true)" in p, p[:2000]
        assert "coalesced and skewed" in p, p[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
