"""r10d scale evidence: the session-2 measurement operators at 10×.

1. MINHASH PR-EVAL GROUND TRUTH — the eval's documented contract is
   "run on a sample: ground truth is O(co-shingled pairs)". This run
   MEASURES that quadratic: sf0.1 documents ×1 (5k docs) vs ×5 and
   ×10 (id-offset replicas — every replica set is mutually
   near-identical, the worst case for pair volume). Reported: truth
   pair rows, per-config candidate rows, wall, shuffle. The banding
   candidates should track the TRUE pair volume (they are
   similarity-gated); the truth join is the quadratic part — the
   number that forces the sample contract.

2. LOGREG TRAIN — 3 GD iterations at 50k vs 500k rows. Expected:
   linear wall (per-iteration one scan-local aggregate), shuffle flat
   (only |features|-value partials cross), trajectory IDENTICAL for
   the replicated corpus scaled... (not asserted here — partitioning
   determinism is pytest-locked; this measures cost only).

Usage:  SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r10d.py
Writes: JSON to stdout + /tmp/scale_evidence_r10d.json
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_evidence_r8 import timed  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def replicated_docs(spark, times: int):
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    n = d.count()
    reps = spark.range(times).withColumnRenamed("id", "_r")
    return (d.crossJoin(reps)
            .select((F.col("doc_id") + F.col("_r") * (n * 10)).alias("doc_id"),
                    "text"))


def exp_pr_eval(spark, times: int) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.functions.text import shingles
    from comix_etl_spark.operators import dedup as D

    d = replicated_docs(spark, times).localCheckpoint()
    out: dict = {"n_docs": d.count()}

    # truth volume: the quadratic term the sample contract bounds
    sh = d.select(F.col("doc_id").alias("_id"),
                  shingles(F.col("text"), 3).alias("_sh"))
    posts = sh.select("_id", F.explode("_sh").alias("shingle"))
    lists = (posts.groupBy("shingle")
             .agg(F.sort_array(F.collect_list("_id")).alias("ids"))
             .filter(F.size("ids") >= 2))
    pair_expr = F.explode(F.flatten(F.expr(
        "transform(ids, (x, i) -> transform(slice(ids, i + 2, size(ids)), "
        "y -> struct(x AS id_a, y AS id_b)))")))
    common = (lists.select(pair_expr.alias("p")).select("p.id_a", "p.id_b")
              .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("nc")))
    t = timed(spark, lambda: common)
    out["truth_join"] = t
    out["co_shingled_pairs"] = common.count()

    # candidate volume per banding config (similarity-gated — should
    # track true-duplicate volume, not the quadratic co-shingle term)
    sigs = (D.minhash_signatures(d, "doc_id", "text", 16, 3, "md5")
            .localCheckpoint())
    for n_bands in (4, 16):
        rpb = 16 // n_bands
        br = sigs.select("_id", F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     F.md5(F.concat_ws("|", *[
                         F.col("signature")[bi * rpb + j] for j in range(rpb)]))
                     .alias("bucket"))
            for bi in range(n_bands)])).alias("bb")) \
            .select("_id", "bb.band", "bb.bucket")
        a, b = br.alias("a"), br.alias("b")
        cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                       & (F.col("a.bucket") == F.col("b.bucket"))
                       & (F.col("a._id") < F.col("b._id")))
                .select(F.col("a._id"), F.col("b._id")).distinct())
        out[f"cand_bands{n_bands}"] = cand.count()
    return out


def exp_logreg(spark, n_rows: int) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.quality import logreg_train

    d = (spark.range(n_rows)
         .select(((F.col("id") % 997).cast("double") / 100.0).alias("x1"),
                 ((F.col("id") % 31).cast("double") / 31.0).alias("x2"),
                 (F.col("id") % 7 < 3).alias("y"))
         .repartition(32).localCheckpoint())
    import time
    t0 = time.perf_counter()
    trail = logreg_train(d, F.col("y"), [F.col("x1"), F.col("x2")], iters=3)
    return {"n_rows": n_rows,
            "wall_sec": round(time.perf_counter() - t0, 2),
            "final_acc": round(trail[-1]["acc"], 4)}


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r10d")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    report = {
        "pr_eval_x1": exp_pr_eval(spark, 1),
        "pr_eval_x5": exp_pr_eval(spark, 5),
        "pr_eval_x10": exp_pr_eval(spark, 10),
        "logreg_50k": exp_logreg(spark, 50_000),
        "logreg_500k": exp_logreg(spark, 500_000),
    }
    print(json.dumps(report))
    with open("/tmp/scale_evidence_r10d.json", "w") as f:
        json.dump(report, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
