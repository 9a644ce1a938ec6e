"""PageRank unit tests (operators.graph).

Covers the ADVICE r5 fix: on a DIRECTED graph, nodes with no in-edges
(pure sources) must keep the 0.15 base term every iteration instead of
vanishing from the output, and the node universe is src ∪ dst.
"""

from __future__ import annotations

import pytest

from ingest_spark.operators import graph


def _rank_map(df):
    return {r.node: r.rank_micro for r in df.collect()}


def test_pagerank_directed_source_only_nodes_keep_base_term(spark):
    # a -> b -> c: a has no in-edges, c has no out-edges
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    ranks = _rank_map(graph.pagerank_micro(edges, iterations=3))
    # all three nodes present (a would previously vanish)
    assert set(ranks) == {1, 2, 3}
    # the pure source holds exactly the base term
    assert ranks[1] == 150_000
    # rank flows downstream: c (fed by b, fed by a) out-ranks the source
    assert ranks[3] > ranks[2] > ranks[1]


def test_pagerank_reference_python_parity(spark):
    """Exact integer-arithmetic parity with a driver-side Python
    reimplementation of the documented update rule on a small directed
    graph with a dangling node and a source node."""
    e = [(1, 2), (1, 3), (2, 3), (3, 4), (5, 1)]
    edges = spark.createDataFrame(e, "src long, dst long")
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    outdeg = {n: sum(1 for s, _ in e if s == n) for n in nodes}
    ranks = {n: 1_000_000 for n in nodes}
    for _ in range(3):
        contrib: dict[int, int] = {}
        for s, d in e:
            contrib[d] = contrib.get(d, 0) + ranks[s] // outdeg[s]
        ranks = {
            n: 150_000 + (85 * contrib[n]) // 100 if n in contrib else 150_000
            for n in nodes
        }
    assert _rank_map(graph.pagerank_micro(edges, iterations=3)) == ranks


def test_pagerank_symmetrized_mass_and_universe(spark):
    edges = graph.symmetrize(
        spark.createDataFrame([(1, 2), (2, 3), (4, 5)], "src long, dst long")
    )
    out = _rank_map(graph.pagerank_micro(edges, iterations=2))
    assert set(out) == {1, 2, 3, 4, 5}
    # symmetric pair {4,5} is rank-symmetric
    assert out[4] == out[5]


def test_pagerank_rejects_zero_iterations(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        graph.pagerank_micro(edges, iterations=0)
