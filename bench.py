"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...},
   "queries_median": {...}, "queries_cold": {...}, "value_cold": N,
   "steady_passes": 3, "sf": ...}

``value`` is total STEADY-STATE wall time across the headline set
(lower is better): each query runs once cold (``queries_cold`` — plan
compilation + codegen/JIT + first data touch), then STEADY_PASSES=3
measured passes. ``queries`` is the per-query MIN across the steady
passes — the plan's actual cost, immune to another process stealing
the box for one pass — and ``queries_median`` the per-query median,
reported alongside for honesty (VERDICT r5 §Next #2: the driver's r5
run showed steady>cold inversions that were pure contention; min-of-N
makes the recorded number a plan property again). Each query is
collected to the driver (row counts only retained) so the measurement
includes full plan execution, not lazy declaration.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type-hint resolution

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: one per operator family, weighted toward the shapes that
# matter at 100 TB (shuffle-heavy agg, broadcast star join, windowed
# rank, LSH near-dup, vector top-k, as-of join).
HEADLINE = [
    "flagship_event_rollup",
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_local_supplier",
    "window_topn_per_group",
    "t6_exact_dedup",
    "asof_join_events",
    "text_stats",
    "minhash_lsh_neardup",
    "knn_bruteforce",
    "tpch_q10_returned_revenue",
    "tpch_q13_order_distribution",
    "tpch_q18_large_orders",
    "sessionize_events",
    "tfidf_top_terms",
    "simhash_neardup",
    "ivf_topk",
    "chunk_tokens_windows",
    "funnel_conversion",
    "sketch_rollup_union",
    "markov_transitions",
    "rolling_active_users",
    # r4: curation/retrieval additions (VERDICT r3 §Next #5)
    "gopher_quality_gate",
    "duplicate_passages",
    "bm25_retrieval",
    "neardup_components",
    # r11 (VERDICT r10 §Next #4): the PRODUCTION 16h/4b signature as
    # benched pair-generation + components entries — these run at
    # EVERY SF (no sf10 skip): 4-row bands keep collisions
    # precision-bounded where the 4h/2b demos saturate by construction
    "minhash_lsh_neardup_prod",
    "neardup_components_prod",
    # r9: the O(log n) star-contraction CC variant rides alongside the
    # O(diameter) label-prop one — the sf10 evidence run (BASELINE.md)
    # showed the label variant's shallow-cluster assumption break on a
    # signature-saturated graph (diameter > 20), exactly the regime
    # the star algorithm exists for; benching both keeps the
    # crossover visible round-over-round
    "neardup_components_star",
    # r5: the composed curation pipeline + multi-query retrieval
    # (VERDICT r4 §Next #6/#8)
    "curation_e2e",
    "bm25_multiquery",
    # r6: DSIR importance weighting + incremental novelty (two-shuffle
    # text-aggregate shapes; novelty is the no-join-back formulation)
    "dsir_importance_weights",
    "ngram_novelty",
    # r6: ExactSubstr span extraction (positional-gram seed count +
    # doc-local island windows)
    "exact_substring_spans",
    # r8 (VERDICT r7 §Next #6): the two r7 composites — persist-and-
    # resume scoring against stored corpus state, and the real media
    # decode over Arrow batches (now exception-total + vectorized)
    "incremental_ingest_e2e",
    # r10 (VERDICT r9 §Next #4): the split per-batch shape — state is
    # seeded once per process (lands in the cold pass), so the steady
    # number is the pure ingest_batch cost the flatness study bounds.
    # r13 (VERDICT r12 §Next #6): e2e now ALSO rides the prebuilt
    # cache (its steady passes measure per-batch cost, stable), and
    # the one-time seeding cost is its own row below, isolated so its
    # I/O bimodality stays out of every other signal
    "incremental_ingest_batch",
    "incremental_ingest_seed",
    "multimodal_media_decode",
    # r9: the repaired embedding join (codegen-gated since VERDICT r8
    # #1 — tracking it here keeps the fix visible round-over-round)
    # and the real MJPEG-in-AVI frame decode composite (r8 #5)
    "embedding_neardup_lsh",
    "multimodal_mjpeg_frames",
    # r15: multimodal-dedup decode+hash path (BMP synth -> real decode
    # -> area-resample -> 64-bit dHash, linear in corpus — benchable at
    # every SF) and the variable-length dup-span ladder (prefix
    # doubling). The near-dup JOIN variants stay out of the headline:
    # image_dhash_neardup's planted-cluster fixture densities are
    # QUADRATIC in docs-per-base (~515 docs/cluster at sf1 -> ~13M
    # mutually-near-dup pairs — fixture saturation, the minhash-demo
    # class, not operator cost; the join is banded_hamming_pairs, the
    # same plan simhash_neardup already benches), and
    # video_dhash_neardup's fixture synthesis (pure-python JPEG encode
    # x 4 frames/clip) would dominate its own timing.
    "image_dhash_signatures",
    "dup_gram_doubling_profile",
]

# Measured and recorded but EXCLUDED from the headline steady total
# (VERDICT r10 §Next #6): state-dir seeding is I/O-bimodal (4.4-18.6 s
# at sf0.1 across processes on identical code), which would inject
# ±8 s of noise into a ~50 s suite total. r13: seeding moved into its
# own row (incremental_ingest_seed — excluded here for exactly that
# bimodality); incremental_ingest_e2e now reuses the prebuilt state on
# steady passes and is stable, but stays excluded so the steady total
# remains composition-comparable with rounds 10-12.
NON_TOTAL = {"incremental_ingest_e2e", "incremental_ingest_seed"}

# Row-heavy queries whose .collect() is dominated by py4j/Arrow driver
# delivery at big SFs (±30-140% documented drift at sf10) — each gets
# an additional ENGINE-ONLY steady leg through an aggregating checksum
# sink (count + summed crc32 over the canonical row JSON), recorded as
# `queries_checksum` alongside the collect numbers (VERDICT r10 §Next
# #5). The checksum VALUES ride along so a round-over-round engine
# delta is readable AND provably the same result set.
ROW_HEAVY = [
    "sessionize_events",
    "window_topn_per_group",
    "tfidf_top_terms",
    "dsir_importance_weights",
]


def _checksum_sink(df):
    """Aggregate a result frame to one (count, crc-sum) row JVM-side —
    full plan execution, zero driver row delivery. crc32 over the
    to_json of the whole row struct CONCATENATED with a per-column
    null bitmap; the SUM is order-independent so partitioning can't
    change the value. The bitmap exists because to_json omits null
    fields (ADVICE r11: rows differing only in WHICH column is null
    would otherwise serialize identically — {a:null,b:1} and
    {a:1,b:null} both lose their null key), so null placement now
    participates in the fingerprint."""
    from pyspark.sql import functions as F

    null_bitmap = F.concat_ws(
        "", *[F.isnull(c).cast("int").cast("string") for c in df.columns]
    )
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.crc32(F.concat(F.to_json(F.struct(*df.columns)), null_bitmap))
        ).alias("crc"),
    ).collect()[0]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ingest_spark.queries import QUERIES
    from ingest_spark.session import get_spark

    # SPARK_GRAFT_SKIP: comma-separated headline names to exclude.
    # Used by the above-bench-SF evidence runs (BASELINE.md r9): the
    # candidates-only near-dup queries have fixed-width-signature
    # parameters whose PAIR counts grow quadratically past ~100k docs,
    # so at sf10+ their `.collect()` measures driver serialization of
    # tens of millions of collision rows, not the banded join the
    # bench exists to time. The skip list is reported in the JSON so
    # a partial suite can never masquerade as the full one.
    skip = {
        s
        for s in os.environ.get("SPARK_GRAFT_SKIP", "").split(",")
        if s
    }
    headline = [n for n in HEADLINE if n not in skip]

    spark = get_spark("ingest-spark-bench")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    # warm the JVM + parquet footers so per-query numbers measure the
    # plans, not first-touch JIT
    QUERIES["s2_bounds_discovery"](spark, sf_dir).collect()
    # warm every table's parquet footer/scan path (first touch of a
    # cold file otherwise lands on whichever measured query reads it
    # first — at driver time that skewed the opening query ~3x)
    from pyspark.sql import functions as F

    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").limit(1).collect()
    # warm the codegen paths the suite exercises: broadcast hash join,
    # shuffle aggregate, partitioned window (tiny synthetic inputs —
    # compiles the operators, does none of the measured work)
    a = spark.range(1000).withColumn("k", F.pmod("id", F.lit(10)))
    b = spark.range(10).withColumnRenamed("id", "k")
    a.join(F.broadcast(b), "k").groupBy("k").count().collect()
    from pyspark.sql import Window

    a.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy("id"))
    ).filter(F.col("rn") <= 2).collect()
    # warm the Python worker pool + Arrow serde path (pandas_udf-backed
    # queries otherwise pay ~1-2s one-time worker startup)

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm("id")).collect()
    # Pass 1 (cold, TIMED): each query's own codegen/JIT + first data
    # touch (the unrolled vector expressions cost 1-2s of Janino alone,
    # and IVF embeds data-dependent centroid literals, so a smaller-SF
    # warm run would not hit the source cache). A cold failure is
    # LOGGED to stderr — never swallowed (VERDICT r4) — and must not
    # kill the bench; the measured pass below will surface a real
    # error loudly.
    cold: dict[str, float] = {}
    for name in headline:
        t0 = time.perf_counter()
        try:
            QUERIES[name](spark, sf_dir).collect()
            cold[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:
            cold[name] = -1.0  # sentinel: cold pass failed
            print(f"bench: cold pass failed for {name}: {exc!r}",
                  file=sys.stderr)

    # Passes 2..2+N (steady-state, TIMED): plan execution only — the
    # number that predicts cluster throughput. N=3 passes, per-query
    # MIN reported as `queries` (median alongside): a single pass can
    # be stolen by box contention; the min of three is the plan's
    # cost. Methodology in BASELINE.md.
    STEADY_PASSES = int(os.environ.get("SPARK_GRAFT_STEADY_PASSES", "3"))
    # SPARK_GRAFT_SINK=checksum switches the MAIN steady passes to the
    # aggregating sink for every query — the engine-only mode the sf10+
    # evidence runs use so collect-bound queries measure the plan, not
    # driver serialization (VERDICT r10 §Next #5).
    sink_mode = os.environ.get("SPARK_GRAFT_SINK", "collect")
    samples: dict[str, list[float]] = {name: [] for name in headline}
    rows: dict[str, int] = {}
    for _ in range(STEADY_PASSES):
        for name in headline:
            t0 = time.perf_counter()
            if sink_mode == "checksum":
                r = _checksum_sink(QUERIES[name](spark, sf_dir))
                samples[name].append(time.perf_counter() - t0)
                rows[name] = int(r["n"])
            else:
                out = QUERIES[name](spark, sf_dir).collect()
                samples[name].append(time.perf_counter() - t0)
                rows[name] = len(out)

    per_query = {n: round(min(s), 3) for n, s in samples.items()}
    per_query_median = {
        n: round(sorted(s)[len(s) // 2], 3) for n, s in samples.items()
    }
    total = round(
        sum(v for n, v in per_query.items() if n not in NON_TOTAL), 3
    )
    total_cold = round(
        sum(v for n, v in cold.items() if v >= 0 and n not in NON_TOTAL), 3
    )

    # Engine-only checksum leg for the collect-bound row-heavy queries
    # (always-on in collect mode; redundant when the whole suite is
    # already checksum-sunk). Runs AFTER the main passes so it can't
    # perturb them.
    queries_checksum: dict[str, float] = {}
    checksum_values: dict[str, dict] = {}
    if sink_mode != "checksum":
        ck_samples: dict[str, list[float]] = {
            n: [] for n in ROW_HEAVY if n in headline
        }
        for _ in range(STEADY_PASSES):
            for name in ck_samples:
                t0 = time.perf_counter()
                r = _checksum_sink(QUERIES[name](spark, sf_dir))
                ck_samples[name].append(time.perf_counter() - t0)
                val = {
                    "n": int(r["n"]),
                    "crc_sum": int(r["crc"]) if r["crc"] is not None else None,
                }
                # The fingerprint exists to prove the result set is
                # stable — so a cross-pass mismatch must surface, not
                # be silently last-pass-wins (ADVICE r11). Recorded as
                # `unstable` (all distinct values) + stderr, never
                # fatal: the driver's round record should still land.
                prev = checksum_values.get(name)
                if prev is not None and prev != val and "unstable" not in prev:
                    checksum_values[name] = {
                        "unstable": [prev, val],
                    }
                    print(
                        f"bench: checksum UNSTABLE across steady passes "
                        f"for {name}: {prev} != {val}",
                        file=sys.stderr,
                    )
                elif prev is not None and "unstable" in prev:
                    if val not in prev["unstable"]:
                        prev["unstable"].append(val)
                else:
                    checksum_values[name] = val
        queries_checksum = {
            n: round(min(s), 3) for n, s in ck_samples.items()
        }

    # Streaming micro-bench rides along (VERDICT r5 §Next #6) so the
    # per-round record includes the stateful-pipeline throughput; a
    # failure is logged, never fatal to the batch numbers.
    streaming: dict | None = None
    try:
        import shutil
        import tempfile

        import bench_streaming as bs

        workdir = tempfile.mkdtemp(prefix="bench_stream_")
        try:
            n_rows = int(os.environ.get("SPARK_GRAFT_STREAM_ROWS", "50000"))
            # Warm-up drain first (r10, VERDICT r9 §Next #3): a single
            # cold AvailableNow run varies ~2x with JIT/classloading
            # state left by the batch suite (measured 5.4k cold vs
            # 9.1k warm rows/s on identical code — the r8->r9
            # "regression" was this variance, not the 16-hash signing,
            # which doesn't even run in this leg). Batch queries
            # already separate cold from steady; this leg now does
            # the same: one small untimed drain, then the measured
            # run. Both numbers are reported.
            warm_src = f"{workdir}/events_json_warm"
            bs.generate_input(spark, warm_src, 5000, 4)
            warmup_run = bs.run_pipeline(spark, warm_src, f"{workdir}/warm")
            src = f"{workdir}/events_json"
            bs.generate_input(spark, src, n_rows, 16)
            run = bs.run_pipeline(spark, src, workdir)
            streaming = {
                "rows_per_sec": round(n_rows / run["wall_sec"], 1),
                "rows_in": n_rows,
                "wall_sec": run["wall_sec"],
                "batches": run["batches"],
                "warmup_rows": 5000,
                "warmup_wall_sec": warmup_run["wall_sec"],
            }
        finally:
            shutil.rmtree(workdir, ignore_errors=True)
    except Exception as exc:  # pragma: no cover - diagnostics only
        print(f"bench: streaming leg failed: {exc!r}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "total_steady": total,
                "total_cold": total_cold,
                "value_cold": total_cold,
                "queries": per_query,
                "queries_median": per_query_median,
                "queries_cold": cold,
                "queries_checksum": queries_checksum or None,
                "checksum_values": checksum_values or None,
                "sink": sink_mode,
                "total_excludes": sorted(NON_TOTAL & set(headline)) or None,
                "steady_passes": STEADY_PASSES,
                "streaming": streaming,
                "rows": rows,
                "skipped": sorted(skip) or None,
                "sf": sf,
            }
        )
    )
    # Steady per-query dict on its OWN near-tail line (VERDICT r9
    # §Next #6): the big line above can outgrow the driver's 2000-char
    # tail capture, which made round-over-round per-query comparison
    # depend on repo-side BENCH files. This line is just the dict
    # (~30 bytes/query), so it survives the tail alongside the compact
    # totals line below.
    print(
        json.dumps(
            {"metric": "per_query_steady_sec", "queries": per_query, "sf": sf}
        )
    )
    # Engine-only steady times for the collect-bound queries on their
    # own tail line (VERDICT r10 §Next #5) — the comparable numbers at
    # big SFs where collect() drifts ±30-140% with driver delivery.
    if queries_checksum:
        print(
            json.dumps(
                {
                    "metric": "per_query_checksum_sec",
                    "queries": queries_checksum,
                    "values": checksum_values,
                    "sf": sf,
                }
            )
        )
    # Compact per-round summary LAST (VERDICT r8 §Next #8): the driver
    # records only the output TAIL, which used to truncate away the
    # totals buried at the front of the big per-query line — this
    # trailing line is small enough to always survive the tail capture,
    # so round-over-round comparison never depends on truncation.
    # r16 (VERDICT r15 §Wrong #4 / §Next #7): the driver parses the
    # LAST line, and PERF_r15's per-query comparator came back empty
    # because this line carried no `queries` dict — the contract field
    # lives here now (additions-only; ~32 bytes/query keeps the line
    # inside the driver's tail capture).
    print(
        json.dumps(
            {
                "metric": "headline_suite_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "total_steady": total,
                "total_cold": total_cold,
                "n_queries": len(headline),
                "steady_passes": STEADY_PASSES,
                "streaming_rows_per_sec": (streaming or {}).get("rows_per_sec"),
                "sink": sink_mode,
                "total_excludes": sorted(NON_TOTAL & set(headline)) or None,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
