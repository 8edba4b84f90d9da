"""r10b fingerprint-level scaling sweep: narrow (63-bit / 3-band) vs
wide (126-bit / 5-band) banded-Hamming candidate volume at 1M / 2M /
4M items — the curve behind the "63-bit banding caps near ~10M items,
wide fingerprints carry on" claim (PLANS.md r9 finding 1 + r10
remedy).

Fingerprints are generated DIRECTLY (no payloads, no decode): group
structure of 5 (v=0..3 identical to the base, v=4 differs by 2 h-bits
+ 2 v-bits — the same near-dup shape the image generators produce),
bases drawn from xxhash64 so every group is distinct (full entropy —
the registry-formula periodicity trap measured in r9 would fabricate
clusters here). True verified pairs are exactly 10 per group
(C(5,2)), so the accidental-candidate term is cleanly separable:
accidental = band_candidates - true_pairs.

Theory being tested: accidental ≈ n_bands · C(n,2) / 2^band_width per
band-value collision, i.e. ~n²·3/2²² for narrow (21-bit bands) and
~n²·5/2²⁶ for wide (25-bit bands) — QUADRATIC in n, so each doubling
of n should ~4× the accidental term while true pairs only double.
Where the accidental term crosses the true-pair volume is the
practical ceiling; wide shifts it ~13× right at these band counts.

Usage: SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r10b.py
Writes: JSON to stdout + /tmp/scale_evidence_r10b.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _experiment_fps(spark, n: int):
    """(media_id, dhash_h, dhash_v) with group-of-5 near-dup structure,
    63-bit non-negative limbs, xxhash-derived bases."""
    from pyspark.sql import functions as F

    mask = (1 << 63) - 1
    base_h = f"(xxhash64(id DIV 5, 1) & {mask}L)"
    base_v = f"(xxhash64(id DIV 5, 2) & {mask}L)"
    # v=4: flip 2 bits in each limb (group-dependent positions so no
    # band is systematically favored)
    flips_h = ("CASE WHEN id % 5 = 4 THEN "
               f"{base_h} ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 3), 63) AS INT))"
               f" ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 4), 63) AS INT))"
               f" ELSE {base_h} END")
    flips_v = ("CASE WHEN id % 5 = 4 THEN "
               f"{base_v} ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 5), 63) AS INT))"
               f" ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 6), 63) AS INT))"
               f" ELSE {base_v} END")
    return spark.range(n).selectExpr(
        "id AS media_id", f"{flips_h} AS dhash_h", f"{flips_v} AS dhash_v")


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r10b")
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
        fps = _experiment_fps(spark, n).localCheckpoint(eager=True)
        true_pairs = (n // 5) * 10
        row = {"true_pairs": true_pairs}
        for tag, cols, bands in (("narrow63", ["dhash_h"], 3),
                                 ("wide126", ["dhash_h", "dhash_v"], 5)):
            t0 = time.perf_counter()
            cand = _candidate_count(fps, cols, bands)
            row[tag] = {
                "band_candidates": cand,
                "accidental": cand - true_pairs,
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        report[f"n_{n}"] = row
        with open("/tmp/scale_evidence_r10b.json", "w") as fh:
            json.dump(report, fh, indent=1)
        print(json.dumps({f"n_{n}": row}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
