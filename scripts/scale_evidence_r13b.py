"""r13b chunked ANN query-side evidence (VERDICT r12 #6): the
`chunk_queries=True` completion of the fat-query guard, driven at a
scale the pytests don't reach.

Claims under test:
1. **Exactness at volume.** nq=25k queries over a 100k-vector corpus,
   chunked at max_query_rows=10k (3 slices, uneven tail), must return
   EXACTLY the unchunked result (single 25k collect) — per-query
   independence makes the union exact, but only a volume run exercises
   the slice iterator against real partition boundaries.
2. **Bounded driver state, comparable wall.** The chunked path holds
   one slice of (query vectors + ADC LUTs) at a time — 10k×m×k LUT
   doubles instead of 25k — while total wall stays within ~1.5× of
   unchunked (the encode scan is localCheckpoint'd once; each slice
   adds one scoring job over the landed codes, not a new encode).

Corpus/queries: deterministic xxhash64-derived vectors (dim 32, full
entropy, no RNG in-script); 64 coarse lists, PQ m=4/k=16, nprobe=4,
k=5, rerank=20.

Usage: python scripts/scale_evidence_r13b.py
Writes: JSON to stdout + scripts/scale_evidence_r13b_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CORPUS = 100_000
N_QUERIES = 25_000
DIM = 32


def _synth_vecs(spark, n: int, salt: int):
    # full-entropy deterministic vectors: component j of row i is
    # xxhash64(i, j, salt) scaled into [-1, 1]
    return spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {DIM - 1}), j -> "
        f"cast(xxhash64(id, j, {salt}) as double) / 9.223372036854776e18"
        f") AS embedding")


def main() -> None:
    from comix_etl_spark.operators.similarity import (
        ivf_pq_topk, train_ivf_centroids, train_residual_codebooks)
    from comix_etl_spark.session import get_spark

    spark = get_spark("scale_r13b_chunked_ann")
    spark.sparkContext.setLogLevel("ERROR")
    corpus = _synth_vecs(spark, N_CORPUS, 1).localCheckpoint(eager=True)
    queries = (_synth_vecs(spark, N_QUERIES, 2)
               .selectExpr("vec_id AS query_id", "embedding")
               .localCheckpoint(eager=True))
    centers = train_ivf_centroids(corpus, n_centroids=64, seed=42,
                                  normalize=True)
    books = train_residual_codebooks(corpus, centers, m=4, k=16, seed=42)
    common = dict(centers=centers, codebooks=books, id_col="vec_id",
                  vec_col="embedding", k=5, nprobe=4, rerank=20)
    out = {"n_corpus": N_CORPUS, "n_queries": N_QUERIES, "dim": DIM}

    t0 = time.perf_counter()
    unchunked = sorted(map(tuple, ivf_pq_topk(
        corpus, queries, max_query_rows=N_QUERIES, **common).collect()))
    out["unchunked_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    chunked = sorted(map(tuple, ivf_pq_topk(
        corpus, queries, max_query_rows=10_000, chunk_queries=True,
        **common).collect()))
    out["chunked_wall_sec"] = round(time.perf_counter() - t0, 2)

    out["identical"] = chunked == unchunked
    out["result_rows"] = len(chunked)
    out["chunked_vs_unchunked_ratio"] = round(
        out["chunked_wall_sec"] / out["unchunked_wall_sec"], 3)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scale_evidence_r13b_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
