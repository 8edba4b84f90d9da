"""Dedup operator tests: LSH recall vs exact Jaccard, SimHash sanity,
exact-dup grouping."""

from __future__ import annotations

from pyspark.sql import functions as F

from comix_etl_spark.operators import dedup as D


def test_exact_duplicates_groups_identical_content(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string")
    out = {r.keep_id: r.n_copies for r in D.exact_duplicates(df, "doc_id", "text").collect()}
    assert out == {1: 2, 3: 1}  # 1&2 are the same content after normalization


def test_minhash_lsh_recall_vs_exact(spark, sf_small):
    """Every high-jaccard pair (well above threshold) must be found by
    LSH with 8 bands × 4 rows; banding probability at j=0.5 is ~0.96."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exact = {(r.id_a, r.id_b) for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.5).collect()}
    lsh = {(r.id_a, r.id_b) for r in
           D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=8,
                               n=3, threshold=0.5).collect()}
    assert lsh <= exact or not exact  # verification step guarantees precision
    if exact:
        recall = len(lsh & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} too low ({len(lsh)}/{len(exact)})"


def test_minhash_lsh_verified_jaccard_matches_exact(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exact = {(r.id_a, r.id_b): r.jaccard for r in
             D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3).collect()}
    lsh = {(r.id_a, r.id_b): r.jaccard for r in
           D.minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.3).collect()}
    for pair, j in lsh.items():
        assert pair in exact and exact[pair] == j  # re-verification is exact


def test_simhash_identical_docs_same_sketch(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "totally unrelated words here")],
        "doc_id long, text string")
    sk = {r._id: r.simhash for r in D.simhash(df, "doc_id", "text").collect()}
    assert sk[1] == sk[2]
    assert sk[1] != sk[3]


def test_simhash_near_pairs_finds_identicals(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta eps zeta"), (2, "alpha beta gamma delta eps zeta"),
         (3, "completely different content again")],
        "doc_id long, text string")
    pairs = {(r.id_a, r.id_b): r.hamming for r in
             D.simhash_near_pairs(df, "doc_id", "text", max_hamming=3).collect()}
    assert pairs == {(1, 2): 0}


def test_shingle_df_cap_drops_boilerplate(spark):
    rows = [(i, f"common boiler plate unique{i} word{i} tail{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = D.shingle_postings(df, "doc_id", "text", n=3).count()
    capped = D.shingle_postings(df, "doc_id", "text", n=3, df_cap=5).count()
    assert capped < uncapped  # the 'common boiler plate' shingle (df=10) is dropped


def test_dup_clusters_transitive_chain(spark):
    """A~B and B~C (A never compared to C) must share one keeper; the
    disjoint D~E pair keeps its own."""
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], "id_a long, id_b long")
    got = {r.doc_id: r.keeper_id for r in D.dup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_dup_clusters_long_path_converges(spark):
    """A path graph with diameter FAR above the round budget must still
    converge — star contraction collapses a diameter-d component in
    O(log d) rounds, not O(d) (the r4 min-label formulation would have
    needed 199 rounds here and raised)."""
    edges = [(i, i + 1) for i in range(100, 299)]  # 200-node path, diameter 199
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.doc_id: r.keeper_id
           for r in D.dup_clusters(pairs, max_iters=12,
                                   local_edge_cutoff=0).collect()}
    assert set(got.values()) == {100}
    assert len(got) == 200


def test_dup_clusters_reversed_pair_orientation(spark):
    """Pairs arriving as (big, small) must canonicalize identically."""
    pairs = spark.createDataFrame([(20, 10), (20, 30)], "id_a long, id_b long")
    got = {r.doc_id: r.keeper_id for r in D.dup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10}


def test_dup_clusters_raises_on_exhausted_rounds(spark):
    """Exhausting max_iters on a still-changing graph must be loud —
    silently emitting split components is data corruption."""
    import pytest

    edges = [(i, i + 1) for i in range(100, 164)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        D.dup_clusters(pairs, max_iters=1, local_edge_cutoff=0)


def test_dup_clusters_local_and_star_paths_agree(spark):
    """The single-task union-find fast path and the distributed
    star-contraction path must emit IDENTICAL min-label clusters on the
    same graph (chains, a star, a cycle, reversed orientations,
    singleton-free)."""
    edges = ([(i, i + 1) for i in range(0, 40)]          # long chain
             + [(100, k) for k in range(101, 110)]        # star
             + [(200, 201), (201, 202), (202, 200)]       # cycle
             + [(303, 300)])                              # reversed pair
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    local = {r.doc_id: r.keeper_id for r in D.dup_clusters(pairs).collect()}
    star = {r.doc_id: r.keeper_id
            for r in D.dup_clusters(pairs, local_edge_cutoff=0).collect()}
    assert local == star
    assert set(local.values()) == {0, 100, 200, 300}


def test_dup_clusters_string_ids_route_to_star_path(spark):
    """Non-integral id types (string doc ids) must work: the int64
    union-find fast path is skipped and the type-agnostic
    star-contraction tier labels clusters by lexicographic minimum."""
    edges = [("doc_b", "doc_a"), ("doc_b", "doc_c"),   # chain → doc_a
             ("x9", "x2"), ("x2", "x5")]               # chain → x2
    pairs = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {r.doc_id: r.keeper_id for r in D.dup_clusters(pairs).collect()}
    assert got == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
                   "x2": "x2", "x5": "x2", "x9": "x2"}


def test_dedup_clusters_lsh_matches_exact_composition(spark, sf_small):
    """The 100 TB composition (LSH candidates → connected components)
    must produce the same clusters as the exact quadratic composition
    when LSH recall is total on the corpus."""
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    exact_pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.3)
    lsh_pairs = D.minhash_lsh_pairs(docs, "doc_id", "text",
                                    num_hashes=32, bands=8, n=3, threshold=0.3)
    exact_cl = {r.doc_id: r.keeper_id for r in D.dup_clusters(exact_pairs).collect()}
    lsh_cl = {r.doc_id: r.keeper_id for r in D.dup_clusters(lsh_pairs).collect()}
    # LSH may miss borderline pairs (banding probability), never invent
    # them — so LSH clusters refine the exact ones: every LSH cluster
    # member maps into one exact cluster
    for doc, keeper in lsh_cl.items():
        assert doc in exact_cl
        assert exact_cl[doc] == exact_cl[keeper]
    # and on this corpus recall is high enough that most clusters agree
    agree = sum(1 for d in lsh_cl if lsh_cl[d] == exact_cl[d])
    assert agree / max(len(exact_cl), 1) >= 0.8


def test_ngram_df_cap_equivalent_to_dropping_hot_shingles(spark):
    """df_cap must drop pair evidence from boilerplate shingles only:
    with the cap, docs related ONLY through a hot shingle pair off less,
    while pairs sharing rare shingles keep their jaccard relationship."""
    rows = [(i, f"common boiler plate filler{i} extra{i} pad{i}") for i in range(8)]
    rows += [(100, "rare alpha beta gamma delta"), (101, "rare alpha beta gamma epsilon")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r.id_a, r.id_b) for r in
                D.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.1).collect()}
    capped = {(r.id_a, r.id_b) for r in
              D.ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.1,
                                    df_cap=5).collect()}
    assert (100, 101) in capped  # rare-shingle pair survives
    assert capped < uncapped     # boilerplate-only pairs are gone


def test_dedup_against_corpus_finds_planted_matches(spark):
    """Batch docs: one exact copy of a corpus doc, one half-overlap
    near-dup, one unique. The screen must return the copy (jaccard 1.0)
    and the near-dup with its BEST corpus match, and omit the unique."""
    from comix_etl_spark.operators.dedup import dedup_against_corpus

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, base),
         (2, "one two three four five six seven eight nine ten"),
         (3, "red orange yellow green blue indigo violet pink")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        # near-dup shares 7 of doc 1's 8 shingles (J = 7/9 ≈ 0.78):
        # with 16 single-row bands the collision odds are 1-(1-s)^16,
        # indistinguishable from certain, and the fixed hash family
        # makes the outcome reproducible run to run
        [(10, base),                                        # exact copy of 1
         (20, f"{base.rsplit(' ', 1)[0]} nope1"),           # near-dup of 1
         (30, "totally unrelated words without any overlap here")],
        "doc_id long, text string")

    got = {r.doc_id: (r.match_id, r.jaccard) for r in dedup_against_corpus(
        batch, corpus, "doc_id", "text",
        num_hashes=16, bands=16, n=3, threshold=0.2).collect()}
    assert got[10] == (1, 1.0)
    assert got[20][0] == 1 and 0.7 <= got[20][1] < 1.0
    assert 30 not in got


def test_dedup_against_corpus_empty_sides(spark):
    """Empty corpus -> no matches (everything novel); empty batch ->
    empty result. Neither errors."""
    from comix_etl_spark.operators.dedup import dedup_against_corpus

    schema = "doc_id long, text string"
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], schema)
    empty = spark.createDataFrame([], schema)
    assert dedup_against_corpus(docs, empty, "doc_id", "text").count() == 0
    assert dedup_against_corpus(empty, docs, "doc_id", "text").count() == 0


def test_url_dedup_collapses_variants_elects_keeper_and_caps_host(spark):
    """Five surface variants of one page collapse to one keeper (max
    quality, tie -> min id); per-host cap keeps the top-quality pages;
    NULL URLs drop."""
    from comix_etl_spark.operators.dedup import url_dedup

    rows = [
        # page A on host h1 — 3 crawl variants, quality elects id=2
        (1, "https://www.h1.com/p/a?utm_source=x", 10.0),
        (2, "http://h1.com/p/a", 30.0),
        (3, "h1.com/p/a/#frag", 20.0),
        # page B on h1, lower quality than A
        (4, "https://h1.com/p/b", 5.0),
        # page C on h1, lowest — capped out at per_host_cap=2
        (5, "https://h1.com/p/c", 1.0),
        # h2: one page; NULL url dropped
        (6, "https://h2.com:443/q", 9.0),
        (7, None, 99.0),
    ]
    df = spark.createDataFrame(rows, "id long, url string, q double")
    out = {r.id: r for r in url_dedup(
        df, url_col="url", id_col="id", quality_col="q",
        per_host_cap=2).collect()}
    assert set(out) == {2, 4, 6}, out
    assert out[2].n_variants == 3 and out[2].canon_url == "h1.com/p/a"
    assert out[6].host == "h2.com"

    # quality tie -> min id wins deterministically
    tie = spark.createDataFrame(
        [(9, "https://t.com/x", 1.0), (8, "http://t.com/x?fbclid=z", 1.0)],
        "id long, url string, q double")
    got = url_dedup(tie, url_col="url", id_col="id",
                    quality_col="q").collect()
    assert [r.id for r in got] == [8]
    assert got[0].n_variants == 2


def test_url_dedup_host_cap_gets_window_group_limit(spark):
    """r8: the row_number <= cap filter must keep compiling to Catalyst's
    two-sided WindowGroupLimit (map-side partial top-cap + reduce-side
    final), which is what bounds a hot host's reduce input to
    cap * #map-tasks rows. An explicit salted two-phase top-N was
    measured r8 and removed — it duplicated this optimization one
    exchange slower (PLANS.md "url_dedup host cap")."""
    import io
    from contextlib import redirect_stdout

    from comix_etl_spark.operators.dedup import url_dedup

    rows = [(i, f"https://h{i % 3}.com/p/{i}", float(i % 7))
            for i in range(60)]
    df = spark.createDataFrame(rows, "id long, url string, q double")
    out = url_dedup(df, url_col="url", id_col="id", quality_col="q",
                    per_host_cap=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    # count DISTINCT WindowGroupLimit nodes in the TREE section only
    # (formatted explain = tree, blank line, then per-node details —
    # counting the whole output double-counts each node via its detail
    # header, which is an explain-formatting quirk, not a plan
    # property). The two-sided map+reduce shape has exactly two nodes
    # (Partial + Final); a one-sided plan has one and must FAIL here.
    tree = plan.split("\n\n", 1)[0]
    n_wgl = sum("WindowGroupLimit" in ln for ln in tree.splitlines())
    assert n_wgl == 2, (n_wgl, plan)
    # and the cap itself is correct
    got = out.collect()
    per_host = {}
    for r in got:
        per_host[r.host] = per_host.get(r.host, 0) + 1
    assert all(v == 5 for v in per_host.values()), per_host
