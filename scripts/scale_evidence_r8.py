"""r8 scale-evidence run (VERDICT r7 "Next round" #4): extend the
executed 10x evidence beyond the dedup/ANN family to the other
shuffle-heavy shapes (four experiments). Each experiment ends in a hazard-or-holds verdict
recorded in PLANS.md.

1. PLANTED HOT KEY x SALTING — a join where one key holds 80% of the
   fact side, run three ways: naive SMJ with AQE skew-join OFF (the
   unprotected plan), naive with AQE skew-join ON (what the session
   config ships), and the explicit ``salted_join``. Evidence = wall
   time plus the MAX single-task runtime of the densest stage (REST
   taskSummary) — skew is a max-task problem, invisible in totals.

2. PAGERANK at 10x EDGES — 10 id-offset copies of the sf0.1 supply
   graph (disjoint components: per-round shuffle must scale with |E|).
   Run at the bench-tuned 8 shuffle partitions and at 32 (the knob a
   10x cluster would set) — linear-or-better growth is the pass bar.

3. SUBSTRING-DEDUP DUPLICATION SWEEP — plant a verbatim 40-token
   boilerplate block into 10% / 50% of sf0.1 documents. The ownership
   window partitions by shingle TEXT; a boilerplate shingle's
   occurrence list all lands in ONE task's sort — the sweep measures
   whether that hot partition dominates (max task runtime again).

4. URL HOST-CAP HOT HOST — 50% of 10M pages on one host through the
   per-host cap window; Catalyst's WindowGroupLimit must keep the
   host-cap stage flat (it does — and made an explicit salted
   two-phase variant redundant; measured, then removed).

Usage:  python scripts/scale_evidence_r8.py [join|pagerank|substr|urlcap]...
        (no args = all four)
Writes: JSON to stdout + /tmp/scale_evidence_r8.json
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"


def _api(spark, path: str):
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
    base = f"http://localhost:{port}/api/v1/applications"
    app_id = json.load(urllib.request.urlopen(base, timeout=5))[0]["id"]
    return json.load(urllib.request.urlopen(f"{base}/{app_id}{path}",
                                            timeout=10))


def max_task_profile(spark, since_stage: int) -> dict:
    """(max, p50) single-task executorRunTime in ms over the densest
    stage completed after ``since_stage`` — the skew fingerprint."""
    try:
        stages = [s for s in _api(spark, "/stages?status=complete")
                  if s["stageId"] > since_stage and s["numCompleteTasks"] > 0
                  and s.get("shuffleReadBytes", 0) > 0]
        if not stages:
            return {"stage": None}
        # the stage reading the most shuffle data IS the reduce side
        # where key skew lands (generation/scan stages are uniform by
        # construction and would drown the signal)
        s = max(stages, key=lambda s: s["shuffleReadBytes"])
        q = _api(spark, f"/stages/{s['stageId']}/{s['attemptId']}"
                        "/taskSummary?quantiles=0.5,1.0")
        return {"stage": s["stageId"],
                "max_task_ms": round(q["executorRunTime"][1]),
                "p50_task_ms": round(q["executorRunTime"][0]),
                "n_tasks": s["numCompleteTasks"],
                "read_mb": round(s["shuffleReadBytes"] / 1e6, 1)}
    except Exception as ex:  # REST hiccup — report, don't fail the run
        return {"error": str(ex)[:120]}


def last_stage_id(spark) -> int:
    try:
        stages = _api(spark, "/stages")
        return max((s["stageId"] for s in stages), default=-1)
    except Exception:
        return -1


def shuffle_write_bytes(spark) -> int:
    try:
        return sum(s.get("shuffleWriteBytes", 0)
                   for s in _api(spark, "/stages?status=complete"))
    except Exception:
        return -1


def timed(spark, build) -> dict:
    s0, g0 = shuffle_write_bytes(spark), last_stage_id(spark)
    t0 = time.perf_counter()
    build().write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)
    s1 = shuffle_write_bytes(spark)
    prof = max_task_profile(spark, g0)
    return {"wall_sec": wall,
            "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
            **{f"task_{k}": v for k, v in prof.items()}}


def exp_join(spark) -> dict:
    """Planted hot key: 80% of 10M fact rows on key 0, 10k-key dim."""
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.relational import salted_join

    N, KEYS = 10_000_000, 10_000
    # 80% of the fact side on key 0 — the planted hot key
    left = spark.range(N).select(
        F.when(F.col("id") % 5 != 0, F.lit(0))
         .otherwise(F.pmod(F.xxhash64("id"), F.lit(KEYS))).alias("k"),
        F.col("id").alias("v"))
    right = spark.range(KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("attr"))

    def run(mode: str):
        prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        prev_sk = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
        # force SMJ: a broadcast join has no reduce-side skew to measure
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled",
                       "true" if mode == "aqe_skew" else "false")
        # AQE skew-split has a 256 MB partition floor; the planted hot
        # partition is ~46 MB, under it. Lowering the floor in the
        # aqe_skew mode PROVES the mechanism engages at the sizes a
        # real cluster sees (where hot partitions are GBs)
        prev_thr = spark.conf.get(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
        prev_adv = spark.conf.get(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        if mode == "aqe_skew":
            spark.conf.set("spark.sql.adaptive.skewJoin."
                           "skewedPartitionThresholdInBytes", "8m")
            spark.conf.set(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        try:
            if mode == "salted":
                j = salted_join(left, right, ["k"], salts=32)
            else:
                j = left.join(right, "k")
            # cheap post-join reduce so join OUTPUT rows are consumed
            # cluster-side, not funneled anywhere
            return timed(spark, lambda: j.groupBy(F.spark_partition_id()
                                                  .alias("p"))
                         .agg(F.sum(F.col("v") + F.col("attr"))
                              .alias("s")))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)
            spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_sk)
            spark.conf.set("spark.sql.adaptive.skewJoin."
                           "skewedPartitionThresholdInBytes", prev_thr)
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes",
                           prev_adv)

    run("plain")  # untimed warm-up: JVM/codegen cost must not land on
    # whichever mode happens to run first
    return {"naive_aqe_skew_off": run("plain"),
            "naive_aqe_skew_on": run("aqe_skew"),
            "salted_join_32": run("salted")}


def exp_pagerank(spark) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.graph import pagerank

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    base = li.select((F.col("l_suppkey") * 2).alias("src"),
                     (F.col("l_partkey") * 2 + 1).alias("dst"))
    # 10 disjoint id-offset copies: |E| and |V| both 10x, components
    # independent, so per-round shuffle must grow linearly
    off = F.lit(10_000_000)
    copies = [base.select((F.col("src") + off * c).alias("src"),
                          (F.col("dst") + off * c).alias("dst"))
              for c in range(10)]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionAll(c)
    out = {"edges_x1": base.distinct().count(),
           "edges_x10": big.distinct().count()}
    out["x1_p8"] = timed(spark, lambda: pagerank(
        base, iters=4, shuffle_partitions=8))
    out["x10_p8"] = timed(spark, lambda: pagerank(
        big, iters=4, shuffle_partitions=8))
    out["x10_p32"] = timed(spark, lambda: pagerank(
        big, iters=4, shuffle_partitions=32))
    return out


def exp_substr(spark) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.textstats import exact_substring_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    boiler = " ".join(f"boiler{i}" for i in range(40))

    def planted(rate_pct: int):
        return docs.select(
            "doc_id",
            F.when(F.pmod(F.col("doc_id"), F.lit(100)) < rate_pct,
                   F.concat(F.lit(boiler + " "), F.col("text")))
             .otherwise(F.col("text")).alias("text"))

    out = {}
    exact_substring_dedup(docs, "doc_id", "text", k=8) \
        .write.format("noop").mode("overwrite").save()  # warm-up
    for rate in (0, 10, 50):
        src = docs if rate == 0 else planted(rate)
        for mode in ("window", "agg_join"):
            out[f"dup_{rate}pct_{mode}"] = timed(
                spark, lambda s=src, m=mode: exact_substring_dedup(
                    s, "doc_id", "text", k=8, ownership=m))
    return out



def exp_urlcap(spark) -> dict:
    """Planted hot host: 50% of 10M canonical pages on one host,
    per-host cap 1000 via the row_number window. Spark inserts
    WindowGroupLimit on both sides of the exchange for rank-filter
    patterns (verified in the formatted plan, locked by
    tests/test_dedup.py), so the hot host's reduce input is bounded —
    the host-cap stage's task profile must stay FLAT. (An explicit
    salted two-phase top-N was measured here in r8 and removed: wall
    8.2 s vs 6.9 s for identical output — Catalyst already does the
    two-phase split.)"""
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.dedup import url_dedup

    N = 10_000_000
    base = spark.range(N).select(
        F.col("id"),
        F.when(F.col("id") % 2 == 0, F.lit("hot.example.com"))
         .otherwise(F.concat(F.lit("h"),
                             F.pmod(F.xxhash64("id"), F.lit(500))
                             .cast("string"),
                             F.lit(".example.com"))).alias("h"),
        (F.col("id") % 97).cast("double").alias("q"))
    docs = base.select(
        "id", "q",
        F.concat(F.lit("https://"), F.col("h"), F.lit("/p/"),
                 F.col("id").cast("string")).alias("url"))

    def run():
        return url_dedup(docs, url_col="url", id_col="id",
                         quality_col="q", per_host_cap=1000)

    run().write.format("noop").mode("overwrite").save()  # warm-up
    return {"cap_window_wgl": timed(spark, run)}


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r8")
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
        ["join", "pagerank", "substr", "urlcap"]
    report = {}
    if "join" in picks:
        report["hotkey_join"] = exp_join(spark)
    if "pagerank" in picks:
        report["pagerank_10x"] = exp_pagerank(spark)
    if "substr" in picks:
        report["substring_dedup_dup_sweep"] = exp_substr(spark)
    if "urlcap" in picks:
        report["url_hostcap_hot_host"] = exp_urlcap(spark)
    print(json.dumps(report, indent=1))
    with open("/tmp/scale_evidence_r8.json", "w") as fh:
        json.dump(report, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
