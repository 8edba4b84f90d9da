"""Iterative graph computation: PageRank by distributed power
iteration (SURVEY.md §7 extension — sibling of the min-label
propagation in operators/dedup.py::dup_clusters, exercising weighted
message passing instead of min-fold).

Scale shape: the edge list (with precomputed 1/out-degree weights) is
localCheckpoint'd ONCE and re-joined every round; each round is one
shuffle on the destination id, with the dangling-node mass folded in as
a broadcast 1-row aggregate (no per-round driver collect). Per-round
lineage is O(1) via eager checkpoints, so
iteration count does not grow the plan. This is the standard Spark
formulation (what GraphX's staticPageRank lowers to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, *, src: str = "src", dst: str = "dst",
             iters: int = 8, damping: float = 0.85,
             shuffle_partitions: int | None = None,
             seeds: DataFrame | None = None) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list.

    Returns ``(node, rank)`` for every node appearing as a source or a
    destination, with ranks summing to 1.0 (dangling-node mass is
    redistributed uniformly each round, the textbook treatment).

    Fixed ``iters`` (no convergence probe) keeps the round count — and
    therefore the job count — deterministic; callers needing a
    tolerance can compare successive runs. Each round runs exactly ONE
    job: the dangling-node mass rides along as a broadcast 1-row
    aggregate inside the rank-update plan instead of a separate
    driver-side collect.

    ``shuffle_partitions`` temporarily overrides the session shuffle
    width for the rounds: each eager checkpoint materializes the plan at
    the CURRENT width, and AQE cannot coalesce across the checkpoint
    boundary, so an iterative job on a modest node set otherwise pays
    (default width) × iters near-empty tasks. Size it to the node count
    like a stateful stream's state partitions; leave None on a cluster
    whose default already matches the graph.

    NOTE the override is SESSION-GLOBAL for the duration of the rounds
    (spark.conf, not a per-plan hint — Spark has no per-plan shuffle
    width): a concurrent query on the same SparkSession would plan at
    the overridden width, and the restore is not safe against a
    concurrent setter. Fine in a single-driver batch job; on a shared
    session run pagerank in its own SparkSession (cloned confs are
    per-session) or leave the override None.

    ``seeds`` (one-column DataFrame of node ids) switches to
    PERSONALIZED PageRank: the restart mass (and the dangling-node
    redistribution) concentrates uniformly on the seed set instead of
    all nodes, so ranks measure proximity to the seeds — the
    random-walk-with-restart primitive behind graph-based
    recommendation and local community scores. Seeds absent from the
    graph are ignored; all-absent raises. The uniform path's
    arithmetic is kept verbatim (term-by-term oracle parity).
    """
    spark = edges.sparkSession
    prev_shuffle = None
    if shuffle_partitions is not None:
        prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        return _pagerank_rounds(edges, src, dst, iters, damping, seeds)
    finally:
        if prev_shuffle is not None:
            spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)


def _pagerank_rounds(edges: DataFrame, src: str, dst: str,
                     iters: int, damping: float,
                     seeds: DataFrame | None = None) -> DataFrame:
    e = (edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
         .distinct())
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_deg"))
    weighted = (e.join(out_deg, "src")
                .select("src", "dst", (F.lit(1.0) / F.col("_deg")).alias("w"))
                .localCheckpoint(eager=False))

    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    # dangling = appears only as a destination (no out-edges)
    nodes = (nodes.join(out_deg.withColumnRenamed("src", "node"), "node", "left")
             .select("node", F.col("_deg").isNull().alias("_dangling"))
             .localCheckpoint(eager=True))
    if seeds is not None:
        sd = (seeds.select(F.col(seeds.columns[0]).alias("node"))
              .distinct().withColumn("_is_s", F.lit(True)))
        marked = nodes.join(F.broadcast(sd), "node", "left")
        ns = marked.filter(F.col("_is_s")).count()
        if ns == 0:
            raise ValueError("personalized pagerank: no seed id appears "
                             "in the graph")
        nodes = (marked.select(
            "node", "_dangling",
            F.when(F.col("_is_s"), F.lit(1.0 / ns))
            .otherwise(F.lit(0.0)).alias("_s"))
            .localCheckpoint(eager=True))
        ranks = nodes.withColumn("rank", F.col("_s"))
    else:
        n = nodes.count()
        if n == 0:
            # empty edge list → empty result, not a bare ZeroDivisionError
            # buried in 1.0/n (the seeds path already errors clearly)
            return nodes.select("node", F.lit(0.0).alias("rank"))
        ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    for _ in range(iters):
        dm = (ranks.filter(F.col("_dangling"))
              .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm")))
        contribs = (weighted.join(ranks.select(F.col("node").alias("src"), "rank"), "src")
                    .groupBy("dst")
                    .agg(F.sum(F.col("rank") * F.col("w")).alias("_c")))
        if seeds is not None:
            # restart AND dangling mass both land on the seed
            # distribution _s (0 off-seed), not uniformly
            update = (F.lit(1.0 - damping) * F.col("_s")
                      + F.lit(damping) * F.col("_dm") * F.col("_s")
                      + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0)))
            keep = ["node", "_dangling", "_s"]
        else:
            update = (F.lit((1.0 - damping) / n)
                      + F.lit(damping) * F.col("_dm") / n
                      + F.lit(damping) * F.coalesce(F.col("_c"), F.lit(0.0)))
            keep = ["node", "_dangling"]
        ranks = (nodes.join(contribs.withColumnRenamed("dst", "node"), "node", "left")
                 .crossJoin(F.broadcast(dm))
                 .select(*keep, update.alias("rank"))
                 # eager, deliberately (re-tested r15): a LAZY chain
                 # still pays one toRdd planning/codegen pass per round
                 # at build and then cascades the same work at the
                 # action — measured NO win over the eager job per
                 # round (3.42 -> 3.61 s), so the simpler eager form
                 # stays
                 .localCheckpoint(eager=True))
    return ranks.select("node", "rank")


def tree_ancestry(parents: DataFrame, *, id_col: str = "node",
                  parent_col: str = "parent",
                  max_doublings: int = 20) -> DataFrame:
    """(node, root, depth) for every node of a forest given (node,
    parent) rows — the hierarchy-flattening primitive (BOM explosion,
    org-chart rollup, category-tree ancestry, thread roots). Roots are
    rows whose parent is NULL or equals the node itself.

    POINTER DOUBLING (path doubling — the classic PRAM list-ranking
    technique, Wyllie 1979; folklore as a MapReduce pattern): state is
    (node, anc, d) with ``anc`` a known ancestor at distance ``d``.
    Each round self-joins the state on ``anc = other.node`` and
    composes the two jumps, so the known distance DOUBLES per round —
    a depth-D forest resolves in ceil(log2 D) shuffle joins instead of
    the D sequential joins of naive parent-chasing. That is the 100 TB
    difference: a 1 M-deep chain needs 20 rounds, not 1 M. Per round:
    one equi-join shuffle + an O(1)-lineage eager checkpoint;
    convergence is a 1-row aggregate (Σd is strictly monotone until
    every anc is a root, then fixes — same cheap change-detection as
    dedup.dup_clusters)."""
    state = (parents.select(
        F.col(id_col).alias("node"),
        F.coalesce(F.col(parent_col), F.col(id_col)).alias("anc"))
        .withColumn("d", F.when(F.col("anc") == F.col("node"),
                                F.lit(0)).otherwise(F.lit(1)))
        .localCheckpoint(eager=True))
    prev = object()
    for _ in range(max_doublings):
        jump = state.select(F.col("node").alias("_jn"),
                            F.col("anc").alias("_ja"),
                            F.col("d").alias("_jd"))
        # LEFT join: an anc with no (node, parent) row of its own is a
        # DANGLING parent pointer — an inner join would silently drop the
        # whole subtree under it. Coalesce treats the dangling id as a
        # root (it jumps to itself at distance 0), so those nodes resolve
        # with root = the dangling parent instead of vanishing.
        state = (state.join(jump, state["anc"] == jump["_jn"], "left")
                 .select("node",
                         F.coalesce(F.col("_ja"), F.col("anc")).alias("anc"),
                         (F.col("d") + F.coalesce(F.col("_jd"), F.lit(0)))
                         .alias("d"))
                 .localCheckpoint(eager=True))
        total = state.agg(F.sum("d")).collect()[0][0]
        if total == prev:
            break
        prev = total
    else:
        raise RuntimeError(
            f"tree_ancestry did not converge in {max_doublings} doubling "
            f"rounds (supports depth up to 2^{max_doublings}) — a cycle in "
            "the 'parent' pointers would loop forever; check the input is "
            "a forest or raise max_doublings")
    return state.select("node", F.col("anc").alias("root"),
                        F.col("d").alias("depth"))
