"""r12 streaming-ANN ingest loop at volume (VERDICT r11 #7): the text
ingest loop and the vector loop are pytest-verified at 3 micro-batches;
this measures the vector loop's per-batch economics over a
100k-vector / 20-batch sequence.

Claims under test:
1. **Per-batch probe wall is FLAT in landed-corpus size** — the loop
   lands pre-encoded IVF-PQ codes with each batch and probes read only
   codes (`batch_id < current` partition pruning); the corpus is never
   re-encoded, so batch 19 (95k landed) should cost ~batch 2 (10k
   landed) apart from the linear probed-codes scan, which at nprobe=4
   of 64 lists touches ~6% of landed rows.
2. **Match exactness at volume** — every batch i ≥ 1 plants
   ``n_planted`` exact copies of batch i-1 vectors; each must match its
   source at cosine 1.0, and novel vectors (random normal, d=64) must
   not cross the 0.98 threshold.
3. **Replay idempotency at a mid-stream crash** — after the sequence,
   batch 10 is re-applied (the crash-recovery path: foreachBatch
   re-delivers the last uncommitted batch); the matches directory must
   be byte-identical in content (same per-batch match sets).

Batches are applied through the SAME ``apply`` closure a real
``writeStream.foreachBatch`` drives (the real-stream path is
pytest-locked in test_streaming_pipeline.py); driving it directly keeps
the measurement free of trigger-scheduling noise.

Usage: python scripts/scale_evidence_r12.py [n_total] [n_batches]
Writes: JSON to stdout + scripts/scale_evidence_r12_results.json
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_PLANTED = 50
SIM_THRESHOLD = 0.98


def _batch_rows(rng, start_id: int, n: int, copy_pool):
    """n vectors: N_PLANTED exact copies drawn from copy_pool (prior
    batch), the rest novel unit-normal vectors (cosine ~N(0, 1/sqrt(d))
    to anything — far below 0.98)."""
    import numpy as np

    rows = []
    n_copy = min(N_PLANTED, len(copy_pool)) if copy_pool else 0
    for i in range(n):
        vid = start_id + i
        if i < n_copy:
            src_id, vec = copy_pool[i]
            rows.append((vid, vec, src_id))
        else:
            v = rng.normal(size=DIM)
            v = v / np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v], None))
    return rows


def main() -> None:
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    per_batch = n_total // n_batches

    import numpy as np

    from comix_etl_spark.operators.similarity import (
        train_ivf_centroids, train_residual_codebooks)
    from comix_etl_spark.session import get_spark
    from comix_etl_spark.streaming.windowed import foreach_batch_ann_ingest

    spark = get_spark("scale_r12_stream_ann")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.default_rng(42)
    # train on a 4k sample of the same distribution (the loop's
    # contract: centers/codebooks are baked in before the stream)
    sample = [( -1 - i, [float(x) for x in (lambda v: v / np.linalg.norm(v))(
        rng.normal(size=DIM))]) for i in range(4096)]
    train = spark.createDataFrame(sample, "vec_id long, embedding array<double>")
    centers = train_ivf_centroids(train, n_centroids=64, sample_rows=4096,
                                  normalize=True)
    books = train_residual_codebooks(train, centers, m=8, k=16)

    root = tempfile.mkdtemp(prefix="r12_ann_ingest_")
    apply_fn = foreach_batch_ann_ingest(root, centers, books,
                                        sim_threshold=SIM_THRESHOLD,
                                        nprobe=4, rerank=50,
                                        max_query_rows=per_batch)
    out = {"n_total": n_total, "n_batches": n_batches,
           "per_batch": per_batch, "dim": DIM, "n_planted": N_PLANTED,
           "batches": []}
    prev_rows = None
    expected = {}  # vid -> src_id for planted copies
    try:
        for b in range(n_batches):
            pool = ([(r[0], r[1]) for r in prev_rows[N_PLANTED:]]
                    if prev_rows else None)
            rows = _batch_rows(rng, b * per_batch, per_batch, pool)
            for vid, _, src in rows:
                if src is not None:
                    expected[vid] = src
            bdf = spark.createDataFrame(
                [(r[0], r[1]) for r in rows],
                "vec_id long, embedding array<double>")
            t0 = time.perf_counter()
            apply_fn(bdf, b)
            wall = round(time.perf_counter() - t0, 2)
            out["batches"].append({"batch": b, "landed_before": b * per_batch,
                                   "wall_sec": wall})
            prev_rows = rows
        # exactness: every planted copy matched to its source at 1.0,
        # nothing else crossed the threshold
        got = {r.vec_id: (r.match_id, r.cosine_sim)
               for r in spark.read.parquet(os.path.join(root, "matches"))
               .collect()}
        out["n_expected_matches"] = len(expected)
        out["n_got_matches"] = len(got)
        out["matches_exact"] = (
            set(got) == set(expected)
            and all(got[v][0] == expected[v] and got[v][1] == 1.0
                    for v in expected))
        # replay idempotency: re-apply batch 10 (crash re-delivery)
        replay_b = n_batches // 2
        # reconstruct batch `replay_b` deterministically: re-walk the rng
        rng2 = np.random.default_rng(42)
        _ = [( -1 - i, rng2.normal(size=DIM)) for i in range(4096)]
        prev = None
        target = None
        for b in range(replay_b + 1):
            pool = ([(r[0], r[1]) for r in prev[N_PLANTED:]]
                    if prev else None)
            rws = _batch_rows(rng2, b * per_batch, per_batch, pool)
            prev = rws
            target = rws
        t0 = time.perf_counter()
        apply_fn(spark.createDataFrame([(r[0], r[1]) for r in target],
                                       "vec_id long, embedding array<double>"),
                 replay_b)
        out["replay_wall_sec"] = round(time.perf_counter() - t0, 2)
        again = {r.vec_id: (r.match_id, r.cosine_sim)
                 for r in spark.read.parquet(os.path.join(root, "matches"))
                 .collect()}
        out["replay_idempotent"] = again == got
        walls = [b["wall_sec"] for b in out["batches"][2:]]  # skip warm-up
        out["probe_wall_first_vs_last"] = (
            round(out["batches"][2]["wall_sec"], 2),
            round(out["batches"][-1]["wall_sec"], 2))
        out["probe_wall_ratio_last_over_early"] = round(
            out["batches"][-1]["wall_sec"]
            / max(min(walls), 1e-9), 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scale_evidence_r12_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
