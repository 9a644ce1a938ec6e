"""Hub-skew A/B for triangle-counting orientation (VERDICT r6 §Next #2).

Builds a deliberately hub-skewed undirected graph entirely Spark-side:

  - background: ~8 pseudo-random edges per node over n_nodes ids
    (xxhash64-derived, deterministic) — supplies real triangles;
  - the hub: node ``n_nodes // 2`` connected to ``hub_frac`` of all
    nodes. Its MID-RANGE id is the adversarial case for id-ordered
    compact-forward: roughly half its edges arrive (from lower ids)
    and half leave (to higher ids), so the wedge join fans out
    in-degree x forward-degree ~ (hub_frac * n / 2)^2 through ONE
    join key. Degree-ordered orientation gives the hub (max degree)
    forward degree ~= 0 — every hub edge points INTO it — so no wedge
    centers on it at all.

Times `graph.triangle_count` under both orientations, asserts the
counts agree (orientation-invariance is the correctness claim), and
appends one SCALE_RUNS.jsonl line per variant via tools.scale_runs.

Usage: python tools/scale_run_triangles.py [n_nodes] [hub_frac]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_graph(spark, n_nodes: int, hub_frac: float):
    """Distinct (u, v) edges with u < v: background random edges plus
    one mid-id hub wired to hub_frac of the id space."""
    e_bg = n_nodes * 8
    bg = spark.range(e_bg).select(
        F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_nodes)).alias("a"),
        F.pmod(F.xxhash64("id", F.lit(2)), F.lit(n_nodes)).alias("b"),
    )
    hub = n_nodes // 2
    n_hub = int(n_nodes * hub_frac)
    spokes = spark.range(n_hub).select(
        F.lit(hub).cast("long").alias("a"),
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_nodes)).alias("b"),
    )
    edges = bg.unionAll(spokes)
    return (
        edges.filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .repartition(32)
    )


def run(n_nodes: int = 20_000, hub_frac: float = 0.4, spark=None) -> list[dict]:
    from tools import scale_runs

    from ingest_spark.operators import graph

    own_spark = spark is None
    if own_spark:
        from ingest_spark.session import get_spark

        spark = get_spark("triangle-scale-run")
    pairs = build_graph(spark, n_nodes, hub_frac).localCheckpoint()
    entries = []
    results = {}
    for variant, ordered in (("degree_ordered", True), ("id_ordered", False)):
        (row,), wall = scale_runs.timed(
            lambda o=ordered: graph.triangle_count(pairs, degree_ordered=o).collect()
        )
        results[variant] = (row.n_triangles, row.n_edges, wall)
    agree = results["degree_ordered"][:2] == results["id_ordered"][:2]
    for variant, (n_tri, n_edges, wall) in results.items():
        entry = scale_runs.record({
            "op": f"triangle_count_{variant}",
            "params": {"study": "triangle_hub_ab", "n_nodes": n_nodes,
                       "hub_frac": hub_frac, "n_edges": n_edges},
            "wall_sec": wall,
            "checksum": n_tri,
            "agree": agree,
        })
        print(json.dumps(entry, sort_keys=True))
        entries.append(entry)
    assert agree, f"orientation changed the triangle count: {results}"
    if own_spark:
        spark.stop()
    return entries


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    hub_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    run(n_nodes, hub_frac)


if __name__ == "__main__":
    main()
