"""r12c BM25-store probe economics: what the persisted postings table
(`persist_bm25_store` + `bm25_scores_from_store`, registry
`bm25_store_probe`) buys over the direct per-query scorer — the
retrieval-arm counterpart of the r11b MinHash-store table.

Claims under test:
1. **The corpus is tokenized once.** Direct `bm25_scores` re-tokenizes
   the FULL corpus on every query (two scans of all text); the store
   pays that once at build, and a query touches only its terms'
   posting lists (bucket-pruned columnar scan). With the planted terms
   at FIXED absolute document frequency, probe wall must stay ~flat as
   the corpus grows 225k → 450k → 900k while the direct wall grows
   with it.
2. **Outputs identical**: the probe's top-20 (doc_id, bm25) equals the
   direct top-20 exactly (bit-identical 6dp scores — the probe
   reproduces the direct IEEE summation order).

Generator: 30 unique hex words/doc from xxhash64 (full-entropy), plus
the query terms planted at fixed absolute df — 'spark' in docs
id < 30k, 'merge' < 20k, 'window' < 10k — so posting-list size is
constant across corpus scales and the probe's corpus-size term is
isolated.

Usage: SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r12c.py
Writes: JSON to stdout + scripts/scale_evidence_r12c_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = ["spark", "merge", "window"]


def _synth_docs(spark, n: int):
    return spark.range(n).selectExpr(
        "id AS doc_id",
        "concat("
        "array_join(transform(sequence(0, 29), j -> hex(xxhash64(id, j))), ' '),"
        " CASE WHEN id < 30000 THEN ' spark' ELSE '' END,"
        " CASE WHEN id < 20000 THEN ' merge' ELSE '' END,"
        " CASE WHEN id < 10000 THEN ' window' ELSE '' END) AS text")


def exp_bm25(spark, n_docs: int) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.textstats import (bm25_scores,
                                                     bm25_scores_from_store,
                                                     persist_bm25_store)

    docs = _synth_docs(spark, n_docs).localCheckpoint(eager=True)
    out = {"n_docs": n_docs}

    def _top20(df):
        return [tuple(r) for r in
                df.orderBy(F.col("bm25").desc(), F.col("doc_id"))
                .limit(20).collect()]

    t0 = time.perf_counter()
    d_rows = _top20(bm25_scores(docs, "doc_id", "text", TERMS))
    out["direct_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    persist_bm25_store(docs, "bm25_scale_store", id_col="doc_id",
                       text_col="text")
    out["build_wall_sec"] = round(time.perf_counter() - t0, 2)

    for tag in ("probe_cold", "probe_warm"):
        t0 = time.perf_counter()
        s_rows = _top20(bm25_scores_from_store(spark, "bm25_scale_store",
                                               TERMS))
        out[f"{tag}_wall_sec"] = round(time.perf_counter() - t0, 2)
    out["identical_top20"] = d_rows == s_rows
    out["n_scored"] = len(s_rows)
    spark.sql("DROP TABLE IF EXISTS bm25_scale_store")
    return out


def main() -> None:
    from comix_etl_spark.session import get_spark

    spark = get_spark("scale_r12c_bm25")
    spark.sparkContext.setLogLevel("ERROR")
    report = {}
    for n in (225_000, 450_000, 900_000):
        report[f"docs_{n}"] = exp_bm25(spark, n)
        print(json.dumps({f"docs_{n}": report[f"docs_{n}"]}))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scale_evidence_r12c_results.json"), "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
