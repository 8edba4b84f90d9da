"""r10e fingerprint-ladder sweep: the 189-bit (3-limb / 7-band) and
252-bit (4-limb / 7-band) rungs measured at 1M / 2M / 4M items —
completing the candidate-volume curve whose narrow63/wide126 points
are in scripts/scale_evidence_r10b_results.json. Same protocol:
group-of-5 near-dups (v=4 differs by 2 h-bits + 2 v-bits → summed
Hamming 4 ≤ 6 at every width; d/a limbs identical within a group),
xxhash-derived full-entropy bases, accidental = band candidates −
true pairs.

Theory under test: accidental ≈ n_bands · C(n,2) / 2^band_width —
xwide (7 × 27-bit) ⇒ ~n²·3.5/2²⁷; qwide (7 × 36-bit) ⇒ ~n²·3.5/2³⁶,
a further **512×** reduction per rung step, which is what moves the
crossover from ~120M (xwide) into the 10⁹ regime (qwide).

Usage: SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r10e.py
Writes: JSON to stdout + /tmp/scale_evidence_r10e.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _experiment_fps4(spark, n: int):
    """(media_id, dhash_h/v/d/a) with group-of-5 near-dup structure —
    the r10b generator extended to four 63-bit limbs; flips stay in
    h/v so the summed distance (4) is width-independent."""
    mask = (1 << 63) - 1
    base = {c: f"(xxhash64(id DIV 5, {s}) & {mask}L)"
            for c, s in (("h", 1), ("v", 2), ("d", 7), ("a", 9))}
    flips_h = ("CASE WHEN id % 5 = 4 THEN "
               f"{base['h']} ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 3), 63) AS INT))"
               f" ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 4), 63) AS INT))"
               f" ELSE {base['h']} END")
    flips_v = ("CASE WHEN id % 5 = 4 THEN "
               f"{base['v']} ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 5), 63) AS INT))"
               f" ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 6), 63) AS INT))"
               f" ELSE {base['v']} END")
    return spark.range(n).selectExpr(
        "id AS media_id", f"{flips_h} AS dhash_h", f"{flips_v} AS dhash_v",
        f"{base['d']} AS dhash_d", f"{base['a']} AS dhash_a")


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r10e")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from scripts.scale_evidence_r10 import _candidate_count

    report = {}
    for n in (1_000_000, 2_000_000, 4_000_000):
        fps = _experiment_fps4(spark, n).localCheckpoint(eager=True)
        true_pairs = (n // 5) * 10
        row = {"true_pairs": true_pairs}
        for tag, cols, bands in (
                ("xwide189", ["dhash_h", "dhash_v", "dhash_d"], 7),
                ("qwide252", ["dhash_h", "dhash_v", "dhash_d", "dhash_a"], 7)):
            t0 = time.perf_counter()
            cand = _candidate_count(fps, cols, bands)
            row[tag] = {
                "band_candidates": cand,
                "accidental": cand - true_pairs,
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        report[f"n_{n}"] = row
        with open("/tmp/scale_evidence_r10e.json", "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps({f"n_{n}": row}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
