"""r13 BM25-store DELTA-APPEND economics (VERDICT r12 #4): what
`persist_bm25_store(mode='append')` buys over a full rebuild when the
corpus grows — the missing half of the r12c probe-economics story.

Claims under test:
1. **Append cost tracks the DELTA, not the corpus.** Appending a
   450k-doc delta onto a 450k-doc store must cost about what building
   a 450k store costs — NOT what rebuilding the 900k union costs. At
   100 TB this is the difference between re-tokenizing the whole
   corpus per ingest batch and paying only for the new documents.
2. **Append is exact.** After the append, the probe's top-20
   (doc_id, bm25) must be bit-identical to BOTH (a) a probe of a
   one-shot 900k build and (b) the direct `bm25_scores` over the
   900k union — the stamped N/Σdl merge is exact integer arithmetic
   and df falls out of the unioned postings.

Generator: same fixed-df corpus as r12c (30 unique hex words/doc;
'spark' planted in doc_id < 30k, 'merge' < 20k, 'window' < 10k — all
planted docs live in the BASE half, so the delta changes corpus stats
but not posting-list membership, the worst case for a stale-stats
bug to hide in: scores move ONLY through the merged N/Σdl).

Usage: python scripts/scale_evidence_r13.py
Writes: JSON to stdout + scripts/scale_evidence_r13_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TERMS = ["spark", "merge", "window"]
N_BASE = 450_000
N_DELTA = 450_000


def _synth_docs(spark, lo: int, hi: int):
    return spark.range(lo, hi).selectExpr(
        "id AS doc_id",
        "concat("
        "array_join(transform(sequence(0, 29), j -> hex(xxhash64(id, j))), ' '),"
        " CASE WHEN id < 30000 THEN ' spark' ELSE '' END,"
        " CASE WHEN id < 20000 THEN ' merge' ELSE '' END,"
        " CASE WHEN id < 10000 THEN ' window' ELSE '' END) AS text")


def main() -> None:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.textstats import (bm25_scores,
                                                     bm25_scores_from_store,
                                                     persist_bm25_store)
    from comix_etl_spark.session import get_spark

    spark = get_spark("scale_r13_bm25_append")
    spark.sparkContext.setLogLevel("ERROR")
    base = _synth_docs(spark, 0, N_BASE).localCheckpoint(eager=True)
    delta = _synth_docs(spark, N_BASE,
                        N_BASE + N_DELTA).localCheckpoint(eager=True)
    union = base.unionByName(delta)
    out = {"n_base": N_BASE, "n_delta": N_DELTA}

    def _top20(df):
        return [tuple(r) for r in
                df.orderBy(F.col("bm25").desc(), F.col("doc_id"))
                .limit(20).collect()]

    t0 = time.perf_counter()
    persist_bm25_store(base, "bm25_r13_inc", id_col="doc_id",
                       text_col="text")
    out["build_base_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    persist_bm25_store(delta, "bm25_r13_inc", id_col="doc_id",
                       text_col="text", mode="append")
    out["append_delta_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    inc_rows = _top20(bm25_scores_from_store(spark, "bm25_r13_inc", TERMS))
    out["probe_after_append_wall_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    persist_bm25_store(union, "bm25_r13_full", id_col="doc_id",
                       text_col="text")
    out["rebuild_union_wall_sec"] = round(time.perf_counter() - t0, 2)
    full_rows = _top20(bm25_scores_from_store(spark, "bm25_r13_full", TERMS))

    t0 = time.perf_counter()
    direct_rows = _top20(bm25_scores(union, "doc_id", "text", TERMS))
    out["direct_union_wall_sec"] = round(time.perf_counter() - t0, 2)

    out["append_equals_oneshot"] = inc_rows == full_rows
    out["append_equals_direct"] = inc_rows == direct_rows
    out["append_vs_rebuild_ratio"] = round(
        out["append_delta_wall_sec"] / out["rebuild_union_wall_sec"], 3)
    for t in ("bm25_r13_inc", "bm25_r13_full"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scale_evidence_r13_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
