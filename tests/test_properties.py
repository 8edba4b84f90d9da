"""Property-based tests (hypothesis): the operators with small pure
reference implementations are checked against them on randomized
inputs — duplicates, ties, singletons, adversarial shapes the
hand-written cases miss. Example counts are tuned low (Spark round
trip per example); the generators bias toward collision-heavy small
domains so ties actually occur.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

PROP = settings(max_examples=10, deadline=None,
                suppress_health_check=[HealthCheck.function_scoped_fixture,
                                       HealthCheck.too_slow])


@PROP
@given(pts=st.lists(st.tuples(st.integers(0, 7), st.integers(0, 7)),
                    min_size=1, max_size=40))
def test_skyline_matches_brute_force(spark, pts):
    """skyline_2d (prefix-max formulation) == O(n²) dominance screen,
    on a tiny value domain where duplicate x, duplicate y, and fully
    duplicated points are all common."""
    from comix_etl_spark.operators.relational import skyline_2d

    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, x double, y long")
    got = sorted(r.id for r in skyline_2d(df, "id", "x", "y").collect())
    want = sorted(
        i for i, (x, y) in enumerate(pts)
        if not any((qx < x and qy >= y) or (qx <= x and qy > y)
                   for qx, qy in pts))
    assert got == want


def _uf_reference(edges):
    parent = {}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {k: find(k) for k in parent}


@PROP
@given(edges=st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                      min_size=1, max_size=60))
def test_dup_clusters_matches_union_find_reference(spark, edges):
    """dup_clusters' single-task fast path == a pure-Python min-root
    union-find on random multigraphs (self-loops, duplicate and
    reversed edges included). Self-loop-only nodes are their own
    keeper."""
    from comix_etl_spark.operators import dedup as D

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.doc_id: r.keeper_id for r in D.dup_clusters(df).collect()}
    real_edges = [e for e in edges if e[0] != e[1]]
    want = _uf_reference(real_edges)
    for u, v in edges:
        if u == v:                      # self-loop: own keeper
            want.setdefault(u, u)
    assert got == want


@PROP
@given(vals=st.lists(st.integers(-50, 50), min_size=1, max_size=80))
def test_global_running_sum_matches_cumsum(spark, vals):
    """The range-partitioned prefix sum == a sequential cumsum under a
    total order, including negative values and duplicated order keys
    (broken by the unique position column)."""
    from comix_etl_spark.operators.relational import global_running_sum

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "pos long, v long")
    got = {r.pos: r.running
           for r in global_running_sum(df, ["pos"], "v").collect()}
    acc, want = 0, {}
    for i, v in enumerate(vals):
        acc += v
        want[i] = acc
    assert got == want


@PROP
@given(words=st.lists(st.text(alphabet="abcd", min_size=1, max_size=4),
                      min_size=0, max_size=30),
       size=st.integers(1, 7))
def test_chunking_reconstructs_token_stream(spark, words, size):
    """Non-overlapping chunks concatenated in chunk order == the
    original token stream, for any chunk size and document length
    (including the empty document, which emits no chunks)."""
    from comix_etl_spark.operators.textstats import chunk_documents

    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    chunks = (chunk_documents(df, "doc_id", "text", chunk_size=size)
              .orderBy("chunk_id").collect())
    rebuilt = " ".join(c.chunk_text for c in chunks)
    assert rebuilt == " ".join(words)
    assert all(1 <= c.n_tokens <= size for c in chunks)


@PROP
@given(parents=st.lists(st.integers(0, 25), min_size=1, max_size=30))
def test_tree_ancestry_matches_pointer_walk(spark, parents):
    """Pointer doubling == plain parent-chasing on random forests.
    parent[i] drawn from [0, 25] then clamped to < i (guarantees
    acyclicity, node 0 self-roots); many collisions → wide and deep
    shapes both occur."""
    from comix_etl_spark.operators.graph import tree_ancestry

    p = {i: (v % i if i > 0 else 0) for i, v in enumerate(parents)}
    df = spark.createDataFrame(list(p.items()), "node long, parent long")
    got = {r.node: (r.root, r.depth)
           for r in tree_ancestry(df, max_doublings=8).collect()}

    def walk(n):
        d = 0
        while p[n] != n:
            n, d = p[n], d + 1
        return n, d

    assert got == {n: walk(n) for n in p}


@PROP
@given(iv=st.lists(st.tuples(st.integers(0, 60), st.integers(0, 20)),
                   min_size=1, max_size=25))
def test_interval_overlap_matches_brute_force_random(spark, iv):
    """Grid-bucketed interval join == O(n²) screen on random intervals
    spanning 0-80 days with a 7-day cell — start-equal ties, touching
    endpoints, and many-cell spans all occur."""
    import datetime as dt
    import itertools

    from comix_etl_spark.operators.temporal import interval_overlap_pairs

    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(days=s), base + dt.timedelta(days=s + d))
            for i, (s, d) in enumerate(iv)]
    df = spark.createDataFrame(rows, "uid long, s timestamp, e timestamp")
    got = sorted((r.id_a, r.id_b, r.overlap_days) for r in
                 interval_overlap_pairs(df, id_col="uid", start_col="s",
                                        end_col="e", cell_days=7).collect())
    spans = {i: (s, s + d) for i, (s, d) in enumerate(iv)}
    want = sorted(
        (a, b, min(spans[a][1], spans[b][1]) - max(spans[a][0], spans[b][0]) + 1)
        for a, b in itertools.combinations(spans, 2)
        if spans[a][0] <= spans[b][1] and spans[b][0] <= spans[a][1])
    assert got == want


@PROP
@given(docs=st.lists(st.lists(st.integers(0, 15), min_size=1, max_size=8),
                     min_size=2, max_size=15))
def test_prefix_filter_join_exactness(spark, docs):
    """The PPJoin pruning theorem on random token sets: prefix-filtered
    candidates + exact verify must equal the brute-force Jaccard join
    EXACTLY (recall 1.0) — tiny token domain forces heavy overlap,
    duplicate sets, and subset relations."""
    from comix_etl_spark.operators.dedup import set_similarity_join_prefix

    tau = 0.6
    sets = [sorted(set(toks)) for toks in docs]
    rows = [(i, [f"t{t}" for t in s]) for i, s in enumerate(sets)]
    df = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    got = sorted((r.id_a, r.id_b) for r in
                 set_similarity_join_prefix(df, id_col="doc_id",
                                            tokens_col="tokens",
                                            threshold=tau).collect())
    want = []
    for a in range(len(sets)):
        for b in range(a + 1, len(sets)):
            sa, sb = set(sets[a]), set(sets[b])
            j = len(sa & sb) / len(sa | sb)
            if j >= tau:
                want.append((a, b))
    assert got == sorted(want)


@PROP
@given(vals=st.lists(st.tuples(st.integers(1, 50), st.integers(1, 9)),
                     min_size=1, max_size=30))
def test_weighted_median_crossing_matches_reference(spark, vals):
    """Cumulative-weight crossing == the classic weighted-median
    definition (smallest value whose cumulative weight reaches half the
    total), with duplicate values and tied weights common."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(float(v), float(w)) for v, w in vals]
    df = spark.createDataFrame(rows, "x double, w double")
    wq = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    cum = df.select("x", F.sum("w").over(wq).alias("c"),
                    F.sum("w").over(wt).alias("t"))
    got = (cum.filter(F.col("c") * 2 >= F.col("t"))
           .agg(F.min("x")).collect()[0][0])

    total = sum(w for _, w in vals)
    acc = 0.0
    want = None
    for v, w in sorted(vals):
        acc += w
        if acc * 2 >= total:
            want = float(v)
            break
    assert got == want


@PROP
@given(vals=st.lists(st.integers(0, 9), min_size=1, max_size=120),
       capacity=st.integers(2, 6))
def test_misra_gries_fold_error_bound(vals, capacity):
    """(pure, no Spark) The shared MG fold must (a) never overcount,
    (b) undercount any value by at most the reported err, and (c) keep
    err ≤ n/(capacity+1) — the invariants heavy_hitters_exact's
    certification rests on. Batches are split at arbitrary points to
    exercise the cross-batch decrement path."""
    import pandas as pd

    from comix_etl_spark.operators.relational import misra_gries_fold

    cut = len(vals) // 2
    batches = [pd.DataFrame({"v": vals[:cut]}), pd.DataFrame({"v": vals[cut:]})]
    counters, err = misra_gries_fold((b for b in batches if len(b)), capacity)
    true = {}
    for v in vals:
        true[v] = true.get(v, 0) + 1
    assert len(counters) <= capacity
    assert err <= len(vals) // (capacity + 1)
    for v, c in counters.items():
        assert 0 < c <= true[v]              # never overcount
        assert true[v] - c <= err            # bounded undercount
    for v, t in true.items():                # absent ⇒ count ≤ err
        if v not in counters:
            assert t <= err


@PROP
@given(a=st.lists(st.integers(0, 5), min_size=1, max_size=30),
       b=st.lists(st.integers(0, 5), min_size=1, max_size=30))
def test_ks_two_sample_bounds_and_symmetry(spark, a, b):
    """0 ≤ D ≤ 1 (scaled), label flip leaves D unchanged, and D == 0
    iff the two empirical distributions are identical."""
    from comix_etl_spark.operators.profile import ks_two_sample

    rows = [(float(v), True) for v in a] + [(float(v), False) for v in b]
    df = spark.createDataFrame(rows, "v double, l boolean")
    d1 = ks_two_sample(df, "v", "l").collect()[0].d_stat_e6
    d2 = ks_two_sample(df.withColumn("l", ~df["l"]), "v", "l") \
        .collect()[0].d_stat_e6
    assert 0 <= d1 <= 1_000_000
    assert d1 == d2
    from collections import Counter
    na, nb = len(a), len(b)
    same_dist = all(Counter(a)[k] * nb == Counter(b)[k] * na
                    for k in set(a) | set(b))
    assert (d1 == 0) == same_dist


@PROP
@given(data=st.data())
def test_hamming_band_pairs_pigeonhole_exactness(spark, data):
    """The recall guarantee the whole perceptual-dedup family leans on,
    on randomized fingerprints: banded pairing over the concatenated
    bit space finds EXACTLY the all-pairs Hamming ≤ max_hamming set —
    every planted near-pair (≤ cap bit flips, pigeonhole recall) AND
    no over-cap pair survives verification, under random limb counts,
    caps, flip positions, and accidental collisions from a small base
    pool."""
    from comix_etl_spark.operators.dedup import hamming_band_pairs

    n_limbs = data.draw(st.integers(1, 3))
    # bands = max_h + 1 must keep every band ≤ 63 bits over the
    # 63·n_limbs-bit space → max_h ≥ n_limbs − 1 (the operator raises
    # otherwise, by design)
    max_h = data.draw(st.integers(max(1, n_limbs - 1), 4))
    mask = (1 << 63) - 1
    # small base pool → accidental near/far pairs are common
    bases = data.draw(st.lists(
        st.tuples(*[st.integers(0, mask) for _ in range(n_limbs)]),
        min_size=1, max_size=4))
    rows = []
    rid = 0
    for b in bases:
        for _ in range(data.draw(st.integers(1, 3))):
            flips = data.draw(st.lists(
                st.integers(0, 63 * n_limbs - 1), max_size=max_h + 2))
            limbs = list(b)
            for pos in flips:
                limbs[pos // 63] ^= 1 << (pos % 63)
            rows.append((rid, *[v & mask for v in limbs]))
            rid += 1
    cols = [f"fp{k}" for k in range(n_limbs)]
    schema = "media_id long, " + ", ".join(f"{c} long" for c in cols)
    df = spark.createDataFrame(rows, schema)
    got = sorted((r.id_a, r.id_b, r.hamming) for r in hamming_band_pairs(
        df, fp_cols=cols, max_hamming=max_h).collect())
    want = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            h = sum(bin(rows[i][1 + k] ^ rows[j][1 + k]).count("1")
                    for k in range(n_limbs))
            if h <= max_h:
                want.append((rows[i][0], rows[j][0], h))
    assert got == sorted(want)


@PROP
@given(data=st.data())
def test_majority_fingerprint_matches_reference(spark, data):
    """Per-bit strict-majority vote (ties → 0, NULL frames don't vote,
    all-NULL items drop) against a pure-Python recount, on random
    multi-item frame sets — the video/audio vote the trim-invariance
    case tests only along one axis."""
    from comix_etl_spark.operators.dedup import majority_fingerprint

    mask = (1 << 63) - 1
    items = data.draw(st.integers(1, 4))
    rows = []
    for vid in range(items):
        for _ in range(data.draw(st.integers(1, 5))):
            fp = data.draw(st.one_of(st.none(), st.integers(0, mask)))
            rows.append((vid, fp))
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = {r.media_id: (r.vfp, r.n_parts)
           for r in majority_fingerprint(df, fp_col="dhash").collect()}
    want = {}
    for vid in range(items):
        fps = [fp for v, fp in rows if v == vid and fp is not None]
        if not fps:
            continue
        out = 0
        for b in range(63):
            if sum((fp >> b) & 1 for fp in fps) * 2 > len(fps):
                out |= 1 << b
        want[vid] = (out, len(fps))
    assert got == want


@PROP
@given(data=st.data())
def test_minhash_lsh_exact_duplicate_recall(spark, data):
    """The one DETERMINISTIC recall guarantee of banded MinHash:
    exact-duplicate texts have identical signatures, so they collide
    in EVERY band and must appear as pairs with Jaccard 1.0 — for any
    banding, corpus shape, or duplicate multiplicity. (Near-dup recall
    is probabilistic by design; exact-dup recall is not.)"""
    from comix_etl_spark.operators.dedup import minhash_lsh_pairs

    n_texts = data.draw(st.integers(1, 4))
    texts = [" ".join(f"t{data.draw(st.integers(0, 9))}"
                      for _ in range(data.draw(st.integers(3, 8))))
             for _ in range(n_texts)]
    rows, rid = [], 0
    for t in texts:
        for _ in range(data.draw(st.integers(1, 3))):
            rows.append((rid, t))
            rid += 1
    bands = data.draw(st.sampled_from([2, 4, 8]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=16, bands=bands, n=3,
        threshold=0.99).collect()}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            if rows[i][1] == rows[j][1]:
                assert (rows[i][0], rows[j][0]) in got, (rows[i], rows[j])
