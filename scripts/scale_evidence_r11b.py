"""r11b MinHash-store probe economics at 450k corpus docs: what the
persisted (band, bucket) store actually buys over the direct
batch-vs-corpus screen, measured — the text-side counterpart of the
fingerprint-store evidence.

Claims under test:
1. **The corpus is paid once.** Direct `dedup_against_corpus` signs
   the full corpus EVERY run; the store signs it once at build, and
   the probe signs only the batch. Probe wall must be well under the
   direct wall, and roughly flat as corpus size doubles (the store
   scan is a columnar band-row read, not a text re-shingle).
2. **Verification is candidate-bounded.** The probe pushes the
   collected candidate-id set into the corpus scan (isin → row-group
   pruning), so the verify stage shingles only candidate rows — not
   the corpus (the r11 fix; a bare join computed shingles for every
   corpus row before dropping them).
3. **Outputs identical**: direct and probe return the same matches.

Generator: 30 hex words/doc from xxhash64 (full-entropy — the mod-N
trap stays documented), groups of 10 docs sharing words 3..29 and
rewriting words 0..2 per variant → Jaccard 25/31 ≈ 0.806 within a
group, far above the 0.5 threshold; batch = variant 0 of the first
5k groups, corpus = the other 9 variants of every group.

Usage: SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r11b.py
Writes: JSON to stdout + scripts/scale_evidence_r11b_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _synth_docs(spark, n: int):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "array_join(transform(sequence(0, 29), j -> "
        "hex(xxhash64(id DIV 10, j, "
        "CASE WHEN j < 3 THEN id % 10 ELSE 0 END))), ' ') AS text")


def exp_store(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.dedup import (dedup_against_corpus,
                                                 dedup_against_store,
                                                 persist_minhash_store)

    docs = _synth_docs(spark, n_docs).localCheckpoint(eager=True)
    batch = docs.filter((F.col("doc_id") % 10 == 0)
                        & (F.col("doc_id") < 50_000))
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    common = dict(id_col="doc_id", text_col="text", num_hashes=16,
                  bands=4, n=3, hash_fn="xxhash64")
    out = {"n_docs": n_docs, "n_batch": batch.count(),
           "n_corpus": corpus.count()}

    t0 = time.perf_counter()
    direct = dedup_against_corpus(batch, corpus, "doc_id", "text",
                                  num_hashes=16, bands=4, n=3,
                                  threshold=0.5, hash_fn="xxhash64")
    d_rows = sorted(map(tuple, direct.collect()))
    out["direct_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    persist_minhash_store(corpus, "mh_scale_store", **common)
    out["build_wall_sec"] = round(time.perf_counter() - t0, 2)

    for tag in ("probe_cold", "probe_warm"):
        t0 = time.perf_counter()
        stored = dedup_against_store(batch, corpus, "mh_scale_store",
                                     threshold=0.5, **common)
        s_rows = sorted(map(tuple, stored.collect()))
        out[f"{tag}_wall_sec"] = round(time.perf_counter() - t0, 2)
    out["n_matches"] = len(s_rows)
    out["identical"] = d_rows == s_rows
    spark.sql("DROP TABLE IF EXISTS mh_scale_store")
    return out


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r11b")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.warehouse.dir", "/tmp/mh_scale_warehouse")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    report = {}
    for n_docs in (250_000, 500_000):
        report[f"docs_{n_docs}"] = exp_store(spark, n_docs)
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "scale_evidence_r11b_results.json")
        with open(path, "w") as fh:
            json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
