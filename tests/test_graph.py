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


def test_tree_ancestry_deep_chain_and_forest(spark):
    """A 300-deep chain plus a separate star and singletons: pointer
    doubling must resolve exact (root, depth) in ~log2(300)=9 rounds
    (max_doublings=12 would fail if doubling didn't double)."""
    from comix_etl_spark.operators.graph import tree_ancestry

    rows = [(i, i - 1) for i in range(1, 301)] + [(0, 0)]     # chain 0..300
    rows += [(1000, 1000)] + [(1000 + k, 1000) for k in (1, 2, 3)]  # star
    rows += [(5000, None)]                                     # NULL-parent root
    df = spark.createDataFrame(rows, "node long, parent long")
    got = {r.node: (r.root, r.depth)
           for r in tree_ancestry(df, max_doublings=12).collect()}
    assert len(got) == 306
    assert got[300] == (0, 300) and got[150] == (0, 150) and got[0] == (0, 0)
    assert got[1002] == (1000, 1) and got[1000] == (1000, 0)
    assert got[5000] == (5000, 0)


def test_tree_ancestry_cycle_raises(spark):
    from comix_etl_spark.operators.graph import tree_ancestry

    import pytest

    df = spark.createDataFrame([(1, 2), (2, 1)], "node long, parent long")
    with pytest.raises(RuntimeError, match="cycle"):
        tree_ancestry(df, max_doublings=4)


def test_tree_ancestry_empty_input(spark):
    from comix_etl_spark.operators.graph import tree_ancestry

    df = spark.createDataFrame([], "node long, parent long")
    assert tree_ancestry(df, max_doublings=3).count() == 0


def test_tree_ancestry_dangling_parent_kept_as_root(spark):
    """ADVICE r6: a parent id with no (node, parent) row of its own must
    NOT drop the subtree — the dangling id is treated as a root. Chain
    3 -> 2 -> 99 where 99 has no row: both nodes must resolve with
    root=99 and correct depths."""
    from comix_etl_spark.operators.graph import tree_ancestry

    df = spark.createDataFrame(
        [(2, 99), (3, 2), (10, None)], "node long, parent long")
    got = {r.node: (r.root, r.depth)
           for r in tree_ancestry(df, max_doublings=6).collect()}
    assert got == {2: (99, 1), 3: (99, 2), 10: (10, 0)}


def _reference_ppr(edges, seeds, iters, damping):
    nodes = sorted({n for e in edges for n in e})
    out = {}
    for s, d in set(edges):
        out.setdefault(s, []).append(d)
    sset = [v for v in nodes if v in seeds]
    sv = {v: (1.0 / len(sset) if v in seeds else 0.0) for v in nodes}
    rank = dict(sv)
    for _ in range(iters):
        dm = sum(rank[v] for v in nodes if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for s, ds in out.items():
            for d in ds:
                contrib[d] += rank[s] / len(ds)
        rank = {v: (1.0 - damping) * sv[v] + damping * dm * sv[v]
                + damping * contrib[v] for v in nodes}
    return rank


def test_personalized_pagerank_matches_reference_and_localizes(spark):
    """PPR with seeds {1}: mass conserves to 1.0, ranks match the local
    reference, and a component unreachable from the seed holds exactly
    zero mass (restart never lands there)."""
    edges = [(1, 2), (2, 3), (3, 1), (2, 4),   # seed component; 4 dangling
             (10, 11), (11, 10)]               # disconnected 2-cycle
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.rank
           for r in pagerank(df, iters=6, seeds=seeds).collect()}
    want = _reference_ppr(edges, {1}, iters=6, damping=0.85)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-9, abs=1e-15)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
    assert got[10] == 0.0 and got[11] == 0.0


def test_personalized_pagerank_rejects_absent_seeds(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(99,)], "node long")
    with pytest.raises(ValueError, match="no seed id"):
        pagerank(df, iters=2, seeds=seeds)


def test_pagerank_empty_edges_returns_empty(spark):
    df = spark.createDataFrame([], "src long, dst long")
    out = pagerank(df, iters=2)
    assert out.columns == ["node", "rank"] and out.count() == 0
