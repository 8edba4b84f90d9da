"""r14 executor-side ANN query-path evidence (VERDICT r13 #2): the
distributed `ivf_pq_topk_distributed` vs the driver-serial chunked
path, driven at bulk-scoring scale.

Claims under test:
1. **Exactness at volume.** nq=100k queries over a 100k-vector corpus:
   the distributed path (queries routed/LUT-built in an Arrow pass,
   candidates gathered by a broadcast centroid_id join, ADC in
   mapInPandas, re-rank joining the query frame) must return EXACTLY
   the chunked driver path's result — the pytest proves it at toy
   scale; only a volume run exercises real Arrow batch boundaries,
   broadcast sizes, and partitioned gathers.
2. **Cluster-parallel query wall.** The chunked path executes slices
   SERIALLY through the driver — wall grows linearly in
   nq/max_query_rows with zero cross-slice parallelism (the r13
   verdict's named ceiling). The distributed path runs the whole query
   frame as ONE job; its wall must be sublinear in slice count —
   measured here as dist_wall well under chunked_wall at 10 slices
   (ratio recorded; anything < ~0.7 demonstrates the ceiling is gone —
   in practice the gap widens with cluster size, which local[32]
   understates).

Corpus/queries: deterministic xxhash64-derived vectors (dim 32, no
RNG in-script); 64 coarse lists, PQ m=4/k=16, nprobe=4, k=5,
rerank=20 — the r13b configuration so the two rounds' numbers compare.

Usage: python scripts/scale_evidence_r14.py
Writes: JSON to stdout + scripts/scale_evidence_r14_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CORPUS = 100_000
N_QUERIES = 100_000
CHUNK = 10_000
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
        ivf_pq_topk, ivf_pq_topk_distributed, train_ivf_centroids,
        train_residual_codebooks)
    from comix_etl_spark.session import get_spark

    spark = get_spark("scale_r14_dist_ann")
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
    out = {"n_corpus": N_CORPUS, "n_queries": N_QUERIES, "dim": DIM,
           "chunk": CHUNK, "n_slices": N_QUERIES // CHUNK}

    t0 = time.perf_counter()
    chunked = sorted(map(tuple, ivf_pq_topk(
        corpus, queries, max_query_rows=CHUNK, chunk_queries=True,
        **common).collect()))
    out["chunked_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    dist = sorted(map(tuple, ivf_pq_topk_distributed(
        corpus, queries, **common).collect()))
    out["dist_wall_sec"] = round(time.perf_counter() - t0, 2)

    out["identical"] = dist == chunked
    out["result_rows"] = len(dist)
    out["dist_vs_chunked_ratio"] = round(
        out["dist_wall_sec"] / out["chunked_wall_sec"], 3)
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scale_evidence_r14_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
