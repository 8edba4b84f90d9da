"""r11c store-family scale extension: (1) the MinHash-store probe at a
900k-doc corpus — one more doubling past r11b's 450k to confirm the
flat-probe claim; (2) the fingerprint store's APPEND path at 1M items —
the pytest locks append==one-shot equality at toy scale, this measures
it where it matters and re-checks the exact pair counts.

Fingerprint generator: the r10b group-of-5 xxhash64 structure (v=4
flips 2 bits → 10 true pairs per group at Hamming ≤ 2), split 90/10
into an initial build and an appended batch, so cross build↔append
pairs exist in every group (ids are interleaved mod 10).

Usage: SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r11c.py
Writes: JSON to stdout + scripts/scale_evidence_r11c_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MASK = (1 << 63) - 1


def _fps(spark, n: int):
    base = f"(xxhash64(id DIV 5, 1) & {MASK}L)"
    flip = ("CASE WHEN id % 5 = 4 THEN "
            f"{base}"
            " ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 3), 63) AS INT))"
            " ^ shiftleft(1L, CAST(pmod(xxhash64(id DIV 5, 4), 63) AS INT))"
            f" ELSE {base} END")
    return spark.range(n).selectExpr("id AS media_id", f"{flip} AS dhash")


def exp_fp_append(spark, n: int) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.dedup import (near_dup_pairs_from_store,
                                                 persist_fingerprint_store)

    fps = _fps(spark, n).localCheckpoint(eager=True)
    out = {"n_items": n, "true_pairs": (n // 5) * 10}

    t0 = time.perf_counter()
    persist_fingerprint_store(fps, "fp_scale_oneshot", fp_cols=["dhash"],
                              max_hamming=2)
    out["oneshot_build_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    one = near_dup_pairs_from_store(spark, "fp_scale_oneshot",
                                    fp_cols=["dhash"], max_hamming=2).count()
    out["oneshot_pairs"] = one
    out["oneshot_pair_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    persist_fingerprint_store(fps.filter(F.col("media_id") % 10 != 0),
                              "fp_scale_inc", fp_cols=["dhash"],
                              max_hamming=2)
    out["initial_build_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    persist_fingerprint_store(fps.filter(F.col("media_id") % 10 == 0),
                              "fp_scale_inc", fp_cols=["dhash"],
                              max_hamming=2, mode="append")
    out["append_sec"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    inc = near_dup_pairs_from_store(spark, "fp_scale_inc",
                                    fp_cols=["dhash"], max_hamming=2).count()
    out["append_pairs"] = inc
    out["append_pair_sec"] = round(time.perf_counter() - t0, 2)
    out["pairs_equal"] = one == inc == out["true_pairs"]
    spark.sql("DROP TABLE IF EXISTS fp_scale_oneshot")
    spark.sql("DROP TABLE IF EXISTS fp_scale_inc")
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    from scripts.scale_evidence_r11b import exp_store

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r11c")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.warehouse.dir", "/tmp/r11c_warehouse")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    report = {"minhash_store_1m": exp_store(spark, 1_000_000),
              "fp_append_1m": exp_fp_append(spark, 1_000_000)}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scale_evidence_r11c_results.json")
    with open(path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
