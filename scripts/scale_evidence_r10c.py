"""r10c scale-evidence run: the new IVF-PQ ANN path at 1M vectors.

The registry measures ivf_pq at 500 rows (correctness); this run asks
whether the COMPOSED pipeline keeps its contract at 1M × 64-dim —
2000× the gate scale, the regime IVF-PQ exists for:

1. INDEX BUILD — ivf_pq_encode over 1M vectors must be ONE scan-local
   Arrow pass: zero shuffle, flat task distribution. This is the
   100 TB index-build shape (at cluster scale the encoded layout would
   be written bucketed-by-list; here we materialize through noop).

2. SEARCH — ivf_pq_topk (C=256 lists, nprobe=16, m=8 × 256 codes,
   rerank=200) vs brute_force_topk over the SAME corpus + queries.
   Hazards under test:
   - probed fraction: rows reaching ADC must track nprobe/C (~6%),
     NOT corpus size — measured by counting encoded rows whose list
     is in any query's probe set;
   - the candidate shuffle must be bounded (batches × rerank ×
     queries), far below corpus scale;
   - recall@10 vs brute must be usable (random uniform vectors are
     the WORST case for quantizers — structured embeddings do far
     better; the bar here is self-hit + majority overlap).

Vectors are full-entropy xxhash64-derived (the r9 lesson: modular
synthetic formulas at 1M fabricate structure that flatters or breaks
the measurement).

Usage:  SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r10c.py
Writes: JSON to stdout + /tmp/scale_evidence_r10c.json
"""

from __future__ import annotations

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_evidence_r8 import (  # noqa: E402
    last_stage_id, max_task_profile, shuffle_write_bytes, timed)

N = 1_000_000
DIM = 64
C, NPROBE, M, NCODES, RERANK = 256, 16, 8, 256, 200


def synth_vectors(spark, n: int):
    """Full-entropy synthetic embeddings: dim j of row i is
    xxhash64(i, j) scaled to (-1, 1) — no modular structure, no
    accidental duplicate clusters."""
    from pyspark.sql import functions as F

    cols = [((F.xxhash64(F.col("vec_id"), F.lit(j)) % 1_000_000)
             / 500_000.0).cast("float") for j in range(DIM)]
    return (spark.range(n).withColumnRenamed("id", "vec_id")
            .repartition(32)
            .select("vec_id", F.array(*cols).alias("embedding")))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from comix_etl_spark.operators import similarity as S

    # own builder, NOT get_spark: the engine session disables the UI,
    # and the shuffle/task metrics here come from the UI REST API
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r10c")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold",
                     str(64 * 1024 * 1024))
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"n": N, "dim": DIM, "C": C, "nprobe": NPROBE,
                 "m": M, "n_codes": NCODES, "rerank": RERANK}

    corpus = synth_vectors(spark, N).localCheckpoint()  # generator cost out of band
    queries = (corpus.filter(F.col("vec_id").isin(0, 1, 2))
               .select(F.col("vec_id").alias("query_id"), "embedding")
               .localCheckpoint())

    # --- 1. index build: one Arrow pass, zero shuffle ----------------
    import numpy as np

    t0 = time.perf_counter()
    centers = S.train_ivf_centroids(corpus, n_centroids=C, sample_rows=4096,
                                    normalize=True)
    books = S.train_residual_codebooks(corpus, centers, m=M, k=NCODES,
                                       sample_rows=4096)
    out["train_sec"] = round(time.perf_counter() - t0, 2)
    out["encode"] = timed(
        spark, lambda: S.ivf_pq_encode(corpus, centers, books))

    # probed fraction: encoded rows whose list lands in ANY query's
    # probe set (the rows ADC will actually score)
    qx = np.array([r[1] for r in queries.collect()], dtype=np.float64)
    qx = qx / np.linalg.norm(qx, axis=1)[:, None]
    ct = np.asarray(centers, dtype=np.float64)
    cs = qx @ ct.T - (ct * ct).sum(axis=1) / 2.0
    probed = sorted({int(c) for row in np.argsort(-cs, axis=1, kind="stable")
                     for c in row[:NPROBE]})
    enc = S.ivf_pq_encode(corpus, centers, books).localCheckpoint()
    out["rows_probed"] = enc.filter(F.col("centroid_id").isin(probed)).count()
    out["probed_frac"] = round(out["rows_probed"] / N, 4)
    out["distinct_probe_lists"] = len(probed)
    # list balance: a healthy coarse quantizer spreads the corpus over
    # all C lists; max/p50 near 1 means no hot list
    occ = (enc.groupBy("centroid_id").count()
           .agg(F.count("*").alias("n_lists"),
                F.max("count").alias("mx"),
                F.expr("percentile_approx(count, 0.5)").alias("p50"))
           .collect()[0])
    out["n_lists_used"] = int(occ["n_lists"])
    out["list_max"] = int(occ["mx"])
    out["list_p50"] = int(occ["p50"])

    # --- 2. search: ivf_pq vs brute over the same corpus -------------
    out["ivf_pq"] = timed(
        spark, lambda: S.ivf_pq_topk(
            corpus, queries, centers=centers, codebooks=books, k=10,
            nprobe=NPROBE, m=M, n_codes=NCODES, rerank=RERANK))
    out["brute"] = timed(
        spark, lambda: S.brute_force_topk(
            corpus, queries, k=10, query_id_col="query_id"))

    exact = {(r["query_id"], r["vec_id"])
             for r in S.brute_force_topk(corpus, queries, k=10,
                                         query_id_col="query_id").collect()}

    def recall(nprobe: int, rerank: int) -> dict:
        got = {(r["query_id"], r["vec_id"])
               for r in S.ivf_pq_topk(corpus, queries, centers=centers,
                                      codebooks=books, k=10, nprobe=nprobe,
                                      m=M, n_codes=NCODES,
                                      rerank=rerank).collect()}
        return {"recall_at_10": round(len(got & exact) / len(exact), 3),
                "self_hits": sum((q, q) in got for q in (0, 1, 2))}

    # the recall ladder separates ROUTING loss (nprobe) from ADC-ORDER
    # loss (rerank): if recall saturates as nprobe grows, the residual
    # quantizer's candidate ordering is the binding constraint, and
    # rerank depth is the knob
    out["recall_nprobe16_rerank200"] = recall(NPROBE, RERANK)
    out["recall_nprobe64_rerank200"] = recall(64, RERANK)
    out["recall_nprobe64_rerank1000"] = recall(64, 1000)

    print(json.dumps(out))
    with open("/tmp/scale_evidence_r10c.json", "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
