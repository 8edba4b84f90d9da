"""Scale-evidence harness for the dedup/ANN family (VERDICT r6 #5).

The 100 TB claims in PLANS.md are plan-asserted; this script EXECUTES the
three heaviest pair-generating operators at bench scale (sf0.1) and at a
synthetic 10× blow-up, recording wall time, cumulative shuffle-write
bytes, and the candidate/corpus ratio — the number that decides whether
banded LSH stays near-linear. Near-linear growth at 10× is the evidence
that the bucketed formulations (never all-pairs) hold at cluster scale.

The blow-up keeps duplicate STRUCTURE realistic instead of replicating
rows (verbatim copies would make every doc a near-dup of 9 others and
explode pair volume quadratically, which is not what a 10× corpus looks
like): each extra copy of a document splices the first half of its
tokens with the second half of a DIFFERENT document (pseudo-random
partner), so cross-copy Jaccard sits mostly below threshold with a
realistic tail above it. Embedding copies add seeded Gaussian noise
(sigma 0.05) so bucket occupancy grows ~10× without degenerate
collisions.

Usage:  python scripts/scale_evidence.py [--skip-build]
Writes: /tmp/scale10/{documents,embeddings}.parquet and a JSON report to
        stdout + /tmp/scale_evidence.json (PLANS.md records the table).
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = "/tmp/scale10"
COPIES = 10


def build_blowup() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    docs = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    n = len(docs)
    frames = []
    for c in range(COPIES):
        d = docs.copy()
        if c > 0:
            partner = (d.index + 37 * c) % n
            tok_a = d["text"].str.split()
            tok_b = docs.loc[partner, "text"].str.split().values
            d["text"] = [
                " ".join(a[: len(a) // 2] + b[len(b) // 2:])
                for a, b in zip(tok_a, tok_b)
            ]
        d["doc_id"] = d["doc_id"] + c * n
        frames.append(d)
    big = pd.concat(frames, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(big, preserve_index=False),
                   f"{OUT_DIR}/documents.parquet")

    emb = pq.read_table(f"{SF_DIR}/embeddings.parquet").to_pandas()
    m = len(emb)
    rng = np.random.default_rng(7)
    eframes = []
    for c in range(COPIES):
        e = emb.copy()
        if c > 0:
            mat = np.vstack(e["embedding"].to_numpy())
            mat = mat + rng.normal(0.0, 0.05, mat.shape)
            e["embedding"] = list(mat.astype(np.float64))
        e["vec_id"] = e["vec_id"] + c * m
        eframes.append(e)
    bige = pd.concat(eframes, ignore_index=True)
    pq.write_table(pa.Table.from_pandas(bige, preserve_index=False),
                   f"{OUT_DIR}/embeddings.parquet")
    print(f"built {OUT_DIR}: {len(big)} docs, {len(bige)} vectors",
          file=sys.stderr)


def shuffle_write_bytes(spark) -> int:
    """Cumulative shuffle-write bytes across all completed stages, via
    the local UI REST API (delta between snapshots brackets one op)."""
    try:
        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
        apps = json.load(urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications", timeout=5))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"http://localhost:{port}/api/v1/applications/{app_id}/stages"
            "?status=complete", timeout=5))
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception:
        return -1


def measure(spark, sf_dir: str, *, want_rows: bool = False) -> dict:
    from comix_etl_spark.operators.dedup import (dedup_against_corpus,
                                                 dup_clusters,
                                                 minhash_lsh_pairs)
    from comix_etl_spark.operators.similarity import knn_join_lsh
    from comix_etl_spark.operators.profile import ams_f2, cms_cells
    from comix_etl_spark.operators.textstats import exact_substring_dedup
    from pyspark.sql import functions as F

    def _cms(d):
        return cms_cells(d, "text", depth=4, width=1024)

    def _ams(d):
        return ams_f2(d, "text", depth=9)

    # plain reads: only documents/embeddings exist in the blow-up dir,
    # and neither carries the events-ts-unit hazard load_tables guards
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_docs, n_vecs = docs.count(), emb.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "n_vecs": n_vecs}

    # candidate volume: the band-bucket collision count BEFORE exact
    # verification — the quantity banding must keep near-linear. Uses
    # the ENGINE's own banding (minhash_band_rows), so the measurement
    # cannot drift from what the operators actually execute.
    from comix_etl_spark.operators.dedup import minhash_band_rows
    band_rows = minhash_band_rows(docs, "doc_id", "text",
                                  num_hashes=32, bands=8, n=3)
    a, b = band_rows.alias("a"), band_rows.alias("b")
    n_cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                     & (F.col("a.bucket") == F.col("b.bucket"))
                     & (F.col("a._id") < F.col("b._id")))
              .select("a._id", "b._id").distinct().count())
    out["minhash_candidates"] = n_cand
    out["cand_per_doc"] = round(n_cand / n_docs, 3)

    for name, build in [
        ("minhash_lsh_pairs", lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", threshold=0.5)),
        ("knn_join_lsh", lambda: knn_join_lsh(emb, dim=64, k=3)),
        # the scale knob under test: bits widened to log2(n/32) must
        # hold per-bucket pair work (and the candidate shuffle) constant
        ("knn_join_lsh_autobits", lambda: knn_join_lsh(
            emb, dim=64, k=3, auto_bits=True)),
        ("dup_clusters", lambda: dup_clusters(
            minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5))),
        # r7 tiers: offset-free substring dedup (token-linear anchors)
        # and the batch-vs-corpus incremental probe (cross-side LSH)
        ("substring_dedup", lambda: exact_substring_dedup(
            docs, "doc_id", "text", k=8)),
        ("dedup_incremental", lambda: dedup_against_corpus(
            docs.filter(F.col("doc_id") % 10 == 0),
            docs.filter(F.col("doc_id") % 10 != 0),
            "doc_id", "text", threshold=0.5)),
        # r7 sketches: both are bounded-exchange by construction — the
        # wall time must track the SCAN (linear), with shuffle bytes
        # flat (cells ≤ depth·width/task; AMS one partial row/task)
        ("cms_cells", lambda: _cms(docs)),
        ("ams_f2", lambda: _ams(docs)),
    ]:
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        # time build + materialization: iterative operators (dup_clusters)
        # execute during build, and the noop sink forces the rest —
        # count() alone lets Catalyst prune subtrees (e.g.
        # substring_dedup's unique-key left join: 0.19 s counted vs
        # 2.24 s materialized)
        df = build()
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        # rows only on request (--rows): the count re-executes the whole
        # operator a second, untimed time — double the script's runtime
        # for a field the scaling comparison doesn't need
        out[name] = {"rows": df.count() if want_rows else None,
                     "wall_sec": wall,
                     "shuffle_mb": round((s1 - s0) / 1e6, 1)
                     if s0 >= 0 and s1 >= 0 else None}
    return out


def main() -> None:
    if "--skip-build" not in sys.argv:
        build_blowup()
    # own session: get_spark disables the UI, and the UI REST API is the
    # shuffle-bytes source — mirror the configs that shape execution
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence")
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
    want_rows = "--rows" in sys.argv
    report = {"x1": measure(spark, SF_DIR, want_rows=want_rows),
              "x10": measure(spark, OUT_DIR, want_rows=want_rows)}
    for op in ("minhash_lsh_pairs", "knn_join_lsh", "knn_join_lsh_autobits",
               "dup_clusters", "substring_dedup", "dedup_incremental"):
        g = report["x10"][op]["wall_sec"] / max(report["x1"][op]["wall_sec"], 1e-9)
        report[f"growth_{op}"] = round(g, 2)
    print(json.dumps(report, indent=1))
    with open("/tmp/scale_evidence.json", "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
