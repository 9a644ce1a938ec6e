"""Regenerate PLANS.md: formatted physical-plan snapshots for
representative headline queries (plan-only — nothing executes).

Usage: python tools/gen_plans.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PICKS = [
    ("tpch_q6_forecast_revenue", "filter+agg: predicates and 4-column slice reach the scan"),
    ("tpch_q10_returned_revenue", "star join: all three dimensions broadcast, fact never join-shuffles"),
    ("window_topn_per_group", "per-group rank: WindowGroupLimit pushes the limit into the sort"),
    ("minhash_lsh_neardup", "LSH near-dup: equi-join on band buckets, no cartesian anywhere"),
    ("hash_split_train_test", "deterministic split: pure projection, zero exchanges"),
    ("funnel_conversion", "ordered funnel: scan-pruned slices, user-key joins, AQE"),
    ("interpolate_hourly_gaps", "gap interpolation: both IGNORE-NULLS walks stacked on ONE shuffle"),
    ("rolling_active_users", "rolling distinct: one fact pass, 7x generate on the tiny distinct set"),
    ("embedding_neardup_lsh", "semantic near-dup scale path: sign-LSH bucket equi-join, no cross product"),
    ("duplicate_passages", "passage report: distinct-per-doc shingles, map-side combine, TakeOrdered head"),
    ("duplicate_passage_fraction_skewsafe", "salted two-level window: per-task rows bounded by SALT*CAP for any gram frequency"),
    ("ngram_novelty", "novelty without join-back: gram aggregate re-aggregates by winning doc_id"),
    ("countmin_frequency_estimates", "count-min sketch: 12k-row state, broadcast probe join"),
    ("curation_scorecard", "multi-signal decision table: three doc-grain signal joins, scan fused"),
    ("hybrid_rrf_retrieval", "RRF fusion: two TakeOrdered heads, full-outer join of 20-row frames"),
    # r9 additions (VERDICT r8 #4): the r6-r8 heavyweights
    ("bm25_multiquery", "multi-term BM25: broadcast query-term prune BEFORE the first exchange, WindowGroupLimit top-N"),
    ("exact_substring_spans", "seed-and-extend spans: every window partitions by doc_id only, codegen regex gram extraction"),
    ("pq_ann_topk", "PQ ANN: Arrow-batched ADC scan, WindowGroupLimit candidate prune before exact re-rank, broadcast-only joins"),
    # late-r9: corpus-adaptive gate (the de-vacuized curation family)
    ("gopher_gate_adaptive", "adaptive quality gate: one word-frequency aggregate feeds a 1-row broadcast, flags stay in the scan projection"),
    # r10 (VERDICT r9 #7): the full curation pipeline after the
    # duplicated-gate fix — source carries through chunk_tokens, so the
    # gate subtree (documents scan + Gopher filter + common-words
    # aggregate + exact-dedup window) compiles exactly ONCE
    ("curation_e2e", "composed curation pipeline: single gate subtree (one documents scan feeding the gate), one 1-row common-words broadcast, LSH band equi-join, no re-join after chunking"),
]

KEEP_KW = (
    "Scan parquet", "Exchange", "Join", "ReadSchema", "PushedFilters",
    "Window", "TakeOrdered",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import ingest_spark.queries as Q
    from ingest_spark.session import get_spark

    spark = get_spark("gen-plans")
    out = open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md"), "w")
    out.write(f"""# PLANS — physical-plan snapshots ({os.path.basename(sf_dir)}, local[32], AQE on)

`.explain("formatted")` captures for {len(PICKS)} representative headline shapes, as
evidence the plan-quality invariants in `tests/test_plans.py` describe the
real plans. Regenerate with `python tools/gen_plans.py` after any
planner-relevant change.

""")
    for name, why in PICKS:
        df = Q.QUERIES[name](spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        lines = plan.split("\n")
        tree_end = next((i for i, l in enumerate(lines) if l.startswith("(")), len(lines))
        tree = "\n".join(lines[:tree_end]).rstrip()
        # keep only the node details that show scan pushdown, shuffles,
        # and join strategies — the scale-relevant evidence
        detail: list[str] = []
        block: list[str] = []
        keeping = False
        for l in lines[tree_end:]:
            if l.startswith("("):
                if keeping and block:
                    detail.extend(block + [""])
                block = [l]
                keeping = any(k in l for k in KEEP_KW)
            else:
                block.append(l)
        if keeping and block:
            detail.extend(block)
        out.write(
            f"## {name}\n\n_{why}_\n\n```\n{tree}\n\n"
            + "\n".join(detail).rstrip()
            + "\n```\n\n"
        )

    # incremental_ingest_e2e (VERDICT r8 #4): the registry entry
    # materializes through localCheckpoint (its temp state dir is gone
    # by return time), so snapshot the LIVE per-batch plan instead —
    # build real state, explain ingest_batch without executing it.
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ingest_spark import incremental
    from ingest_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    state = tempfile.mkdtemp(prefix="plans_state_")
    try:
        incremental.init_state(
            spark, docs.filter(F.col("source") != "src1"), state
        )
        df = incremental.ingest_batch(
            spark, docs.filter(F.col("source") == "src1"), state
        )
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        plan = df._jdf.queryExecution().explainString(mode)
        lines = plan.split("\n")
        tree_end = next((i for i, l in enumerate(lines) if l.startswith("(")), len(lines))
        out.write(
            "## incremental_ingest_e2e (per-batch ingest_batch plan)\n\n"
            "_one new-batch pass vs STORED corpus tables: batch hashed/"
            "banded/shingled once, bloom broadcast-prefilters the exact "
            "probe, state sides arrive pre-aggregated — per-batch cost "
            "is O(batch + state), never O(history)_\n\n```\n"
            + "\n".join(lines[:tree_end]).rstrip()
            + "\n```\n\n"
        )
    finally:
        shutil.rmtree(state, ignore_errors=True)
    out.close()
    spark.stop()
    print("PLANS.md written")


if __name__ == "__main__":
    main()
