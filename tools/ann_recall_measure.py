"""Measured ANN recall floors (VERDICT r12 §Next #5).

The similarity suite asserted recall >= 0.5 for ivf_topk / pq_topk —
loose enough that a halved-recall regression would still ship. This
tool measures recall vs brute force for the three approximate paths
(ivf, pq, lsh multiprobe) at the test parameterization, over a LARGER
query set than the tests (first 25 vectors, not 5) and at multiple
SFs, and appends the numbers to SCALE_RUNS.jsonl. The test assertions
are then pinned at ~80% of the measured minimum (see
tests/test_similarity.py r13 notes), so a real recall regression
fails while data-roll jitter doesn't.

Everything here is deterministic: the hyperplanes and k-means seeds
are fixed, and the driver parquet is static per SF.

Usage: python tools/ann_recall_measure.py [sf_dirs...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def measure(spark, sf_dir: str, n_queries: int = 25) -> dict:
    from ingest_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < n_queries)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=10).collect()
    }

    def recall(df):
        got = {(r.query_id, r.neighbor_id) for r in df.collect()}
        return round(len(exact & got) / len(exact), 4)

    return {
        "ivf": recall(sim.ivf_topk(emb, queries, k=10, n_cells=8, nprobe=3)),
        "pq": recall(
            sim.pq_topk(emb, queries, k=10, m=8, codebook_k=16, rerank_factor=8)
        ),
        "multiprobe": recall(
            sim.lsh_topk_multiprobe(emb, queries, k=10, num_bits=8)
        ),
        "ivf_pq": recall(
            sim.ivf_pq_topk(
                emb, queries, k=10, n_cells=8, nprobe=3,
                m=8, codebook_k=16, rerank_factor=8,
            )
        ),
        # the r14 retrieval-grade config (radius-2 x 4 tables) — its
        # absolute floor is pinned in tests/test_similarity.py
        "multiprobe_r2t4": recall(
            sim.lsh_topk_multiprobe(
                emb, queries, k=10, num_bits=8, probe_radius=2, num_tables=4
            )
        ),
        "n_exact": len(exact),
    }


# (radius, tables) grid at num_bits=8 — the two VERDICT r13 levers.
# Candidate fraction per config (uniform buckets):
#   r1/t1 9/256=3.5%, r2/t1 37/256=14.5%, r2/t2 ~27%, r2/t4 ~47%.
MULTIPROBE_GRID = [(1, 1), (2, 1), (1, 2), (2, 2), (2, 4)]


def measure_multiprobe_grid(spark, sf_dir: str, n_queries: int = 25) -> dict:
    """Recall + wall for each (probe_radius, num_tables) config —
    VERDICT r13 #2: pin where LSH top-k becomes a real retrieval path
    instead of a candidate filter."""
    import time

    from ingest_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < n_queries)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=10).collect()
    }
    out = {}
    for radius, tables in MULTIPROBE_GRID:
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.lsh_topk_multiprobe(
                emb, queries, k=10, num_bits=8,
                probe_radius=radius, num_tables=tables,
            ).collect()
        }
        out[f"r{radius}_t{tables}"] = {
            "recall": round(len(exact & got) / len(exact), 4),
            "wall_sec": round(time.time() - t0, 1),
        }
    return out


def measure_ivf_pq_grid(spark, sf_dir: str, n_queries: int = 25) -> dict:
    """Recall + wall for the ivf_pq sizing candidates (VERDICT r14 #2):
    the legacy fixed config (n_cells=8/nprobe=3/rerank=8, whose recall
    decays with corpus size), the sqrt-corpus auto rule shipped as
    ivf_pq_auto_params, and its two nearest neighbors (shallower probe
    fraction, bigger rerank budget) — so the shipped rule is the
    measured optimum, not a guess."""
    import math
    import time

    from ingest_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < n_queries)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim.brute_force_topk(emb, queries, k=10).collect()
    }
    n = emb.count()
    root = math.isqrt(n)
    auto = sim.ivf_pq_auto_params(n)
    configs = {
        "fixed_r14": (8, 3, 8),
        "auto": auto,
        "auto_probe4": (auto[0], max(3, -(-auto[0] // 4)), auto[2]),
        "auto_rerank_lo": (auto[0], auto[1], max(8, root // 4)),
    }
    out = {"n_corpus": n, "auto_params": list(auto)}
    for name, (cells, probe, rerank) in configs.items():
        t0 = time.time()
        got = {
            (r.query_id, r.neighbor_id)
            for r in sim.ivf_pq_topk(
                emb, queries, k=10, n_cells=cells, nprobe=probe,
                m=8, codebook_k=16, rerank_factor=rerank,
            ).collect()
        }
        out[name] = {
            "cells": cells, "nprobe": probe, "rerank": rerank,
            "recall": round(len(exact & got) / len(exact), 4),
            "wall_sec": round(time.time() - t0, 1),
        }
    return out


def main() -> None:
    sf_dirs = sys.argv[1:] or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    from ingest_spark.session import get_spark
    from tools.scale_runs import record, timed

    spark = get_spark()
    grid_only = os.environ.get("ANN_GRID_ONLY") == "1"
    ivf_pq_only = os.environ.get("ANN_IVF_PQ_GRID_ONLY") == "1"
    for sf_dir in sf_dirs:
        if ivf_pq_only:
            grid, gwall = timed(lambda: measure_ivf_pq_grid(spark, sf_dir))
            record(
                {
                    "op": "ivf_pq_auto_grid",
                    "params": {"sf_dir": sf_dir, "n_queries": 25, "k": 10,
                               "m": 8, "codebook_k": 16},
                    "wall_sec": gwall,
                    "checksum": grid,
                }
            )
            print(f"{sf_dir} ivf_pq grid: {grid}")
            continue
        if not grid_only:
            out, wall = timed(lambda: measure(spark, sf_dir))
            n = out.pop("n_exact")
            record(
                {
                    "op": "ann_recall_floors",
                    "params": {"sf_dir": sf_dir, "n_queries": 25, "k": 10,
                               "n_exact_pairs": n},
                    "wall_sec": wall,
                    "checksum": out,
                }
            )
            print(f"{sf_dir}: {out} ({wall:.1f}s)")
        grid, gwall = timed(lambda: measure_multiprobe_grid(spark, sf_dir))
        record(
            {
                "op": "ann_multiprobe_grid",
                "params": {"sf_dir": sf_dir, "n_queries": 25, "k": 10,
                           "num_bits": 8},
                "wall_sec": gwall,
                "checksum": grid,
            }
        )
        print(f"{sf_dir} multiprobe grid: {grid}")
    spark.stop()


if __name__ == "__main__":
    main()
