"""r16 star-CC round-cost A/B (VERDICT r15 §Next #3).

The executed round plan SS(LS(edges)) shows ZERO ReusedExchange: the
large-star subtree re-executes under every reference small-star makes
to its ``directed`` orientation (~4 copies, 8 SortMergeJoins, 24
checkpoint re-reads per round at sf0.1). Variants:

- base:     r15 shape (no intra-round pin)
- pin_dir:  materialize small-star's ``directed`` orientation once per
            round (captures LS + the orientation projection)
- pin_ls:   materialize LS output per round (SS still re-executes its
            own orientation twice)

Measured on (a) the real sf0.1 LSH candidate graph and (b) a synthetic
hub graph (1 hub, many spokes + random background pairs — the skew
shape the star variant exists for). Labels must be identical across
variants (asserted).

Usage: python tools/starcc_round_ab.py [--trials 3] [--hub-spokes 300000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ingest_spark.operators import dedup
from ingest_spark.session import get_spark  # noqa: E402


def _star_cc(pairs: DataFrame, pin_dir: bool, pin_ls: bool, max_iterations: int = 25):
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    initial_edges = edges
    all_nodes = (
        initial_edges.select(F.col("src").alias("id"))
        .union(initial_edges.select(F.col("dst").alias("id")))
        .distinct()
    )

    def fingerprint(e):
        row = e.agg(
            F.count("*").alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).first()
        return row["n"], row["h"]

    def small_star(e):
        directed = e.select(
            F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
        ).filter(F.col("src") != F.col("dst"))
        if pin_dir:
            directed = directed.localCheckpoint()
        mins = directed.groupBy("src").agg(F.min("dst").alias("m"))
        rewired = directed.join(mins, "src").select(
            F.col("dst").alias("src"), F.col("m").alias("dst")
        )
        center = mins.select(F.col("src"), F.col("m").alias("dst"))
        return (
            rewired.union(center)
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )

    fp = fingerprint(edges)
    converged = False
    for _ in range(max_iterations):
        ls = dedup._large_star(edges)
        if pin_ls:
            ls = ls.localCheckpoint()
        edges = small_star(ls).localCheckpoint()
        new_fp = fingerprint(edges)
        if new_fp == fp:
            converged = True
            break
        fp = new_fp
    if not converged:
        raise RuntimeError("no convergence")
    member_labels = edges.groupBy("src").agg(F.min("dst").alias("component"))
    return all_nodes.join(
        member_labels, all_nodes.id == member_labels.src, "left_outer"
    ).select("id", F.coalesce("component", F.col("id")).alias("component"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--hub-spokes", type=int, default=300_000)
    ap.add_argument("--bg-pairs", type=int, default=500_000)
    args = ap.parse_args()
    spark = get_spark("starcc-round-ab")
    sc = spark.sparkContext

    from ingest_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    lsh = dedup.minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=4, bands=2, shingle_n=3
    ).localCheckpoint()

    # synthetic hub: node 0 connected to 1..S, plus background chains
    # far from the hub id range (deterministic, no RNG)
    S, B = args.hub_spokes, args.bg_pairs
    hub = spark.range(1, S + 1).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    bg = spark.range(B).select(
        (F.col("id") * 2 + 10_000_000).alias("id_a"),
        (F.col("id") * 2 + 10_000_001).alias("id_b"),
    )
    hubg = hub.union(bg).localCheckpoint()

    variants = {
        "base": dict(pin_dir=False, pin_ls=False),
        "pin_dir": dict(pin_dir=True, pin_ls=False),
        "pin_ls": dict(pin_dir=False, pin_ls=True),
    }
    for gname, graph in (("lsh_sf0.1", lsh), ("hub", hubg)):
        # correctness: all variants produce identical labels
        want = None
        for vname, kw in variants.items():
            got = {
                (r.id, r.component)
                for r in _star_cc(graph, **kw).collect()
            }
            if want is None:
                want = got
            assert got == want, f"{gname}/{vname} labels diverge"
        times = {v: [] for v in variants}
        jobs = {}
        for t in range(args.trials):
            for vname, kw in variants.items():
                g = f"{gname}-{vname}-{t}"
                sc.setJobGroup(g, vname)
                t0 = time.perf_counter()
                _star_cc(graph, **kw).write.format("noop").mode(
                    "overwrite"
                ).save()
                times[vname].append(round(time.perf_counter() - t0, 3))
                jobs[vname] = len(sc.statusTracker().getJobIdsForGroup(g))
        print(
            json.dumps(
                {
                    "graph": gname,
                    "n_nodes": len(want),
                    **{f"{v}_min": min(times[v]) for v in variants},
                    **{f"{v}_jobs": jobs[v] for v in variants},
                    **times,
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
