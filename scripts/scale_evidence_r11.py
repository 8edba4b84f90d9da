"""r11 VIDEO-dedup scale evidence: the majority-vote frame→video
aggregate (operators/dedup.py::majority_fingerprint) measured at
100k → 1M clips × 3 and 5 frames — the one video-specific stage the
r10 audit claimed but only measured at registry scale.

Claims under test (VERDICT r10 "Next round" #5):
1. **Frames collapse map-side**: the majority vote is a partial→final
   HashAggregate, so the shuffle carries ONE ~63-count row per VIDEO —
   shuffle bytes must be ~flat in frames-per-video (3 vs 5 frames at
   the same clip count) and linear in clip count.
2. **The election stays exact**: per-frame jitter (one flipped bit per
   frame, positions distinct-by-construction within a clip so no bit
   ever reaches a 3/5 majority) must vanish in the vote — verified
   pair count equals the planted (n/5)·C(5,2) exactly, at every scale.
3. No skew: max/p50 task time on the vote's reduce stage stays flat
   (keys are unique video ids — perfectly spread by construction).

Generator: full-entropy xxhash64 bases (the r9/r10 mod-N periodicity
trap is documented twice — never `id % K` patterned fingerprints),
groups of 5 clips, variant v=4 flips 2 STABLE bits (all frames), so
majority fingerprints sit at Hamming 0 (v0–v3) / 2 (v4) within a
group. Frame jitter flips bit (h0 + 13·f) mod 63 of frame f — 13·Δf
≢ 0 (mod 63) for Δf ∈ 1..4, so jitter positions never collide within
a clip and each jittered bit's vote is 1-of-n (never a majority).
Frames of a clip are contiguous in the generating range — the
production layout (a decode stage emits a clip's frames together),
which is what lets the partial aggregate collapse them scan-side.

Usage: SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r11.py
Writes: JSON to stdout + scripts/scale_evidence_r11_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_evidence_r8 import (  # noqa: E402
    last_stage_id, max_task_profile, shuffle_write_bytes)

MASK = (1 << 63) - 1


def _frame_fps(spark, n_clips: int, frames: int):
    """(media_id, dhash) per-frame fingerprints with group-of-5
    near-dup structure + per-frame jitter (see module docstring)."""
    base = f"(xxhash64(vid DIV 5, 1) & {MASK}L)"
    # v=4: two stable flips present in EVERY frame → survive the vote
    stable = ("CASE WHEN vid % 5 = 4 THEN "
              f"{base}"
              " ^ shiftleft(1L, CAST(pmod(xxhash64(vid DIV 5, 3), 63) AS INT))"
              " ^ shiftleft(1L, CAST(pmod(xxhash64(vid DIV 5, 4), 63) AS INT))"
              f" ELSE {base} END")
    # per-frame jitter: one flip at (h0 + 13·f) mod 63 — distinct
    # positions within a clip, so each is a 1-of-n minority vote
    jitter = ("shiftleft(1L, CAST(pmod(xxhash64(vid, 5) + 13 * f, 63)"
              " AS INT))")
    return (spark.range(n_clips * frames)
            .selectExpr(f"id DIV {frames} AS vid", f"id % {frames} AS f")
            .selectExpr("vid AS media_id",
                        f"({stable}) ^ {jitter} AS dhash"))


def exp_video(spark, n_clips: int, frames: int) -> dict:
    from comix_etl_spark.operators.dedup import (hamming_fp_dedup,
                                                 majority_fingerprint)

    out = {"n_clips": n_clips, "frames": frames}
    fps = _frame_fps(spark, n_clips, frames)

    # stage 1: the majority vote alone — wall + shuffle + skew profile
    g0, s0 = last_stage_id(spark), shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    vfp = majority_fingerprint(fps, fp_col="dhash")
    vfp.write.format("noop").mode("overwrite").save()
    out["vote"] = {
        "wall_sec": round(time.perf_counter() - t0, 2),
        "shuffle_mb": (round((shuffle_write_bytes(spark) - s0) / 1e6, 1)
                       if s0 >= 0 else None),
        **{f"task_{k}": v for k, v in max_task_profile(spark, g0).items()},
    }

    # stage 2: end-to-end (vote + banded pairing + election), exactness
    g0, s0 = last_stage_id(spark), shuffle_write_bytes(spark)
    t0 = time.perf_counter()
    kept = hamming_fp_dedup(
        majority_fingerprint(fps, fp_col="dhash")
        .select("media_id", "vfp"),
        fp_col="vfp", max_hamming=2)
    n_kept = kept.count()
    expected_kept = n_clips // 5  # min-id keeper per 5-clip group
    out["dedup"] = {
        "wall_sec": round(time.perf_counter() - t0, 2),
        "shuffle_mb": (round((shuffle_write_bytes(spark) - s0) / 1e6, 1)
                       if s0 >= 0 else None),
        "kept": n_kept, "expected_kept": expected_kept,
        "exact": n_kept == expected_kept,
        **{f"task_{k}": v for k, v in max_task_profile(spark, g0).items()},
    }
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r11")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    report = {}
    for n_clips, frames in ((100_000, 3), (100_000, 5),
                            (1_000_000, 3), (1_000_000, 5)):
        report[f"clips_{n_clips}_frames_{frames}"] = exp_video(
            spark, n_clips, frames)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scale_evidence_r11_results.json")
        with open(path, "w") as fh:
            json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
