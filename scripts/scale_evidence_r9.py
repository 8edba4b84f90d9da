"""r9 scale-evidence run (VERDICT r8 "Next round" #3/#4): measured
hazard-or-holds verdicts for the r8-new operator family plus the new
cached k-center variant. Three experiments:

1. KCENTER k=64 — the literal-array k-scans form re-evaluates all i
   chosen centers every round (O(k²) center-distance evaluations per
   row + an O(k·dim) literal expression to compile per round) vs the
   new ``cached=True`` running-``_md`` form (O(k) evaluations, one
   localCheckpoint per round). Pass bar: identical output, cached
   materially faster at k=64.

2. DSIR BUCKETS SWEEP — ``dsir_importance`` at buckets=4096 (the
   registry shape) vs buckets=1_000_000 (a real hashed-vocabulary
   size). The ratio table is explicitly ``F.broadcast`` — the question
   is whether that stays the right plan when the table is ~1M rows
   (~16 B/row of longs ⇒ ~tens of MB serialized) or whether it needs a
   join route. Evidence = wall + ratio-table row count + driver-side
   broadcast size estimate.

3. VOCAB GROWTH at 10x — 10 copies of sf0.1 documents with every token
   suffixed per copy (vocabulary AND occurrences both grow 10x — an
   id-offset copy alone would leave the type-table flat and measure
   nothing). The hazard under test: the groupBy(token) min-doc
   aggregate's shuffle must track vocabulary linearly and its tasks
   stay flat (Zipf head tokens partial-aggregate map-side).

Usage:  python scripts/scale_evidence_r9.py [kcenter|dsir|vocab]...
        (no args = all three)
Writes: JSON to stdout + /tmp/scale_evidence_r9.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_evidence_r8 import (  # noqa: E402
    last_stage_id, max_task_profile, shuffle_write_bytes)

SF_DIR = "/root/testdata/sf0.1"


def exp_kcenter(spark) -> dict:
    from comix_etl_spark.operators.similarity import kcenter_sample

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", "embedding"))
    out = {}
    rows = {}
    for mode, kw in [("scans", {}), ("cached", {"cached": True})]:
        t0 = time.perf_counter()
        rows[mode] = kcenter_sample(emb, k=64, **kw).collect()
        out[f"{mode}_wall_sec"] = round(time.perf_counter() - t0, 2)
    out["identical_output"] = (
        [tuple(r) for r in rows["scans"]] == [tuple(r) for r in rows["cached"]])
    out["k"] = 64
    return out


def _big_vocab_corpus(spark, n_docs: int = 200_000):
    """Synthetic corpus with a REAL hashed-vocabulary scale: 10
    corpus-unique tokens per doc ⇒ 2M unigram + 1.8M bigram types, so
    at buckets=1M essentially every bucket is occupied and the ratio
    table hits its full size. (The sf0.1 documents table has only ~31
    token types — it cannot stress a 1M-bucket table at all.)"""
    from pyspark.sql import functions as F

    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.concat(F.lit("t"), (F.col("id") * 10 + j).cast("string"))
            for j in range(10)]).alias("text"))


def exp_dsir(spark) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.sampling import dsir_importance

    docs = _big_vocab_corpus(spark)
    target = docs.filter(F.col("doc_id") % 10 == 0)
    out = {}
    for buckets in (4096, 1_000_000):
        g0 = last_stage_id(spark)
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        (dsir_importance(docs, target, id_col="doc_id", text_col="text",
                         buckets=buckets)
         .write.format("noop").mode("overwrite").save())
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        out[f"buckets_{buckets}"] = {
            "wall_sec": wall,
            "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
            **{f"task_{k}": v for k, v in
               max_task_profile(spark, g0).items()},
        }
    return out


def exp_vocab(spark) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.plans.queries import QUERIES, _t

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()

    def run(src) -> dict:
        # inline q_vocab_growth's plan over an arbitrary frame
        from pyspark.sql import Window

        from comix_etl_spark.functions import text
        n_docs = src.agg(F.count(F.lit(1)).alias("_n"))
        toks = src.select("doc_id", F.explode(text.tokens("text")).alias("tok"))
        decile = (F.least(F.lit(9),
                          F.floor(F.col("doc_id") * 10 / F.col("_n")))
                  .cast("int").alias("decile"))
        occ = (toks.crossJoin(F.broadcast(n_docs)).select(decile)
               .groupBy("decile").agg(F.count(F.lit(1)).alias("_occ")))
        first = (toks.groupBy("tok").agg(F.min("doc_id").alias("doc_id"))
                 .crossJoin(F.broadcast(n_docs)).select(decile)
                 .groupBy("decile").agg(F.count(F.lit(1)).alias("_new")))
        w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
        plan = (occ.join(first, "decile", "left")
                .select("decile", F.sum("_occ").over(w).alias("cum_tokens"),
                        F.sum(F.coalesce(F.col("_new"), F.lit(0))).over(w)
                        .alias("cum_types")))
        g0 = last_stage_id(spark)
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        rows = plan.collect()
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        return {"wall_sec": wall,
                "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
                "cum_types": rows[-1].cum_types if rows else None,
                "cum_tokens": rows[-1].cum_tokens if rows else None,
                **{f"task_{k}": v for k, v in
                   max_task_profile(spark, g0).items()}}

    copies = [docs.select(
        (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
        F.regexp_replace("text", r"(\S+)", f"$1_{i}").alias("text"))
        for i in range(10)]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    out = {"x1": run(docs.select("doc_id", "text")), "x10": run(big)}
    # the registry corpus has ~31 token types — also measure at a real
    # tokenizer-training vocabulary scale (2M types, 1x vs 10x docs)
    out["bigvocab_x1"] = run(_big_vocab_corpus(spark, 200_000))
    out["bigvocab_x10"] = run(_big_vocab_corpus(spark, 2_000_000))
    return out


def _experiment_images(spark, n: int):
    """Full-entropy RAW8 generator for the scale sweep: group-of-5
    near-dup structure like the registry's `_synthetic_images`, but the
    block pixel is xxhash64(g, block)-derived, so every group's base
    image is distinct. (The registry formula is periodic mod 244 in g —
    harmless at oracle scales where g < 244 and fully mirrored by the
    oracle, but at 1M images it collapses 200k groups onto ~244
    distinct hashes, creating ~3300-member duplicate clusters and ~1e9
    TRUE pairs: the first experiment run measured that data artifact,
    not the operator.)"""
    from pyspark.sql import functions as F

    px = ("pmod(xxhash64(doc_id DIV 5, ((i DIV 18) DIV 2) * 9 "
          "+ ((i % 18) DIV 2)), 244)")
    val = (f"CASE WHEN (doc_id % 5) = 4 AND ((i DIV 18) DIV 2) = 3 "
           f"AND ((i % 18) DIV 2) = 4 THEN 255 - ({px} + 3 * (doc_id % 5)) "
           f"ELSE {px} + 3 * (doc_id % 5) END")
    px_hex = F.expr(
        "array_join(transform(sequence(0, 287), i -> "
        f"lpad(hex({val}), 2, '0')), '')")
    return (spark.range(n).select(F.col("id").alias("doc_id"))
            .select(F.col("doc_id").alias("media_id"),
                    F.unhex(F.concat(F.lit("5257381210"), px_hex))
                    .alias("payload")))


def exp_image(spark) -> dict:
    """image_dedup at 100k vs 1M synthetic RAW8 images (group-of-5
    near-dup structure, full-entropy bases) — the hazards under test:
    the Arrow dHash stage must stay scan-parallel, and the (band,
    band-value) shuffle + pair volume must track corpus size linearly
    (groups are disjoint, so true pairs scale 1:1)."""
    from comix_etl_spark.operators.dedup import image_dedup

    out = {}
    for n in (100_000, 1_000_000):
        imgs = _experiment_images(spark, n)
        g0 = last_stage_id(spark)
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        kept = image_dedup(imgs)
        kept.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        out[f"n_{n}"] = {
            "wall_sec": wall,
            "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
            **{f"task_{k}": v for k, v in
               max_task_profile(spark, g0).items()},
        }
    return out


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r9")
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
    picks = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["kcenter", "dsir", "vocab", "image"]
    report = {}
    if "kcenter" in picks:
        report["kcenter_k64"] = exp_kcenter(spark)
    if "dsir" in picks:
        report["dsir_buckets"] = exp_dsir(spark)
    if "vocab" in picks:
        report["vocab_growth_10x"] = exp_vocab(spark)
    if "image" in picks:
        report["image_dedup_10x"] = exp_image(spark)
    print(json.dumps(report, indent=1))
    with open("/tmp/scale_evidence_r9.json", "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
