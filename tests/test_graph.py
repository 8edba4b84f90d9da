"""PageRank power iteration vs a local reference implementation."""

from __future__ import annotations

import pytest

from comix_etl_spark.operators.graph import pagerank


def _reference_pagerank(edges, iters, damping):
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    n = len(nodes)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dm = sum(rank[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            for d in ds:
                contrib[d] += rank[s] / len(ds)
        rank = {v: (1.0 - damping) / n + damping * dm / n + damping * contrib[v]
                for v in nodes}
    return rank


def test_pagerank_matches_reference_with_dangling_node(spark):
    # 4 nodes; node 4 is dangling (no out-edges)
    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (2, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=6).collect()}
    want = _reference_pagerank(edges, iters=6, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_pagerank_uniform_on_cycle(spark):
    # a 3-cycle is perfectly symmetric: ranks stay uniform at 1/3
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    got = {r.node: r.rank for r in pagerank(df, iters=4).collect()}
    for v in (1, 2, 3):
        assert got[v] == pytest.approx(1.0 / 3.0, rel=1e-12)
