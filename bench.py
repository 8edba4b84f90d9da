"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed to FULL materialization via the noop sink
(``df.write.format("noop")``) after a warm-up of the input scans. Wall
time per query includes plan + execute. noop, not count(): Catalyst
legally prunes subtrees a count can't observe (e.g. a left join whose
right side is unique on the key — measured 0.19 s counted vs 2.24 s
materialized on substring_dedup), so count-based timings flatter any
query with that shape. r1–r6 benches were count-based; r7 onward is
noop-based — compare rounds within a convention, not across.

r8 onward each query runs $SPARK_GRAFT_BENCH_RUNS times (default 3,
back-to-back) and reports the MEDIAN: the two committed r7 single-shot
runs disagreed up to 3× on individual queries (tfidf_top_terms 0.98 vs
2.99 s with identical code), so single-query diffs were untrustworthy.
The full artifact records {median, min, runs} per query; the stdout
JSON keeps the flat name→sec map (median) the driver expects.

r12 onward the warm-up set is DERIVED: curated execution-path
representatives plus every first-timer vs the last committed
bench_local_r*.json artifact (see the in-line comment) — new query
families can no longer land their one-time cost on a timed query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from comix_etl_spark.plans.queries import QUERIES  # noqa: E402
from comix_etl_spark.session import get_spark, load_tables  # noqa: E402


CURATED_WARMUP = ("stats_topk", "order_sequence", "token_counts",
                  "doc_quality", "ann_cosine_topk", "simhash_det",
                  "ann_ivf_det", "ann_ivf_pq_det", "bpe_train",
                  "rest_datasource", "quantize_calibrated",
                  "cusum_changepoint")


def derive_warmup(registry: dict, repo_dir: str | None = None) -> list[str]:
    """Warm-up set = curated execution-path representatives plus every
    FIRST-TIMER (a registry query with no entry in the last COMMITTED
    per-round artifact, bench_local_r*.json), deduplicated in order.
    The comparison base is the last committed round artifact, NOT
    bench_local_latest.json: first-touch cost is per-session, and
    latest would mark this round's new queries "known" after one bench
    run of this session while every later run still pays their cold
    start. No committed artifact (fresh clone) ⇒ curated-only."""
    import glob
    import re

    here = repo_dir or os.path.dirname(os.path.abspath(__file__))
    committed = sorted(
        glob.glob(os.path.join(here, "bench_local_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    prev_names: set[str] = set()
    if committed:
        try:
            with open(committed[-1]) as fh:
                prev_names = set(json.load(fh)["queries"])
        except (OSError, KeyError, ValueError):
            pass
    first_timers = tuple(n for n in registry
                         if prev_names and n not in prev_names)
    seen: set[str] = set()
    return [n for n in CURATED_WARMUP + first_timers
            if n in registry and not (n in seen or seen.add(n))]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("comix_etl_spark_bench")

    # warm-up: JVM, parquet footers, view registration
    tables = load_tables(spark, sf_dir)
    for df in tables.values():
        df.count()
    # JIT/codegen warm-up: one cheap representative of each execution
    # path (codegen agg+join, window, Arrow/pandas worker pool) runs
    # untimed so the first measured queries don't absorb the JVM's
    # cold-compile cost — standard benchmarking hygiene, same for every
    # registry order
    # (agg+join codegen, window, text regex/split exprs, embeddings scan
    # + Arrow/pandas worker pool — one representative per hot path)
    # simhash_det exercises the text→sketch pandas_udf family: without it
    # the first sketch query in the run absorbs ~3 s of Arrow-worker +
    # codegen spin-up (measured r5: simhash_pairs 4.5 s cold vs 1.23 s
    # steady-state). ann_ivf_det likewise warms the IVF
    # assign-pandas_udf → broadcast-probe-join → window plan shape:
    # whichever IVF query ran first absorbed ~3.5 s one-time (the r3→r5
    # ann_ivf "trend" was exactly this first-touch cost moving with
    # registry order; steady state is ~1.3 s for the whole family)
    # bpe_train warms the iterative aggregate-lambda + localCheckpoint
    # loop path (r7): cold-vs-warm measured 11.9 s vs 3.1 s at sf0.1 —
    # the 8.8 s is one-time codegen of the fold expressions, not the
    # operator
    # rest_datasource spins up the Python DataSource runner (~4 s
    # one-time, 0.5 s steady); quantize_calibrated's calibrate-then-
    # quantize Arrow shape is likewise first-touch-heavy (5.8 s cold,
    # 0.7 s warm — isolate-profiled r7)
    # cusum_changepoint warms the global_running_sum family
    # (repartitionByRange + lazy localCheckpoint + offset window):
    # isolate-profiled r8 at 9.45 s cold vs 1.48 s steady — without the
    # warm-up the registry-order neighbor absorbs that one-time cost
    # ann_ivf_pq_det warms the composed IVF-PQ path (encode mapInPandas
    # + LUT broadcast + windowed re-rank): in the r11 artifact the
    # first-timer store/recall queries sat at the registry head and
    # absorbed the family's one-time cost (ann_ivf_pq_store 2.70 s vs
    # ~2.1 s steady) — same first-touch pattern as ann_ivf_det (r5)
    # r12: the warm-up set is no longer purely hand-maintained — every
    # FIRST-TIMER (a registry query with no entry in the last COMMITTED
    # per-round artifact, bench_local_r*.json) gets one untimed run
    # appended to the curated execution-path representatives, so a
    # brand-new family's one-time cost (codegen, worker-pool spin-up,
    # store cold paths) lands in warm-up instead of on whichever new
    # query the registry orders first. The r11 round had to patch the
    # hand list mid-round for exactly this (IVF-PQ first-timers,
    # commit 08fae91). The comparison base is the last committed round
    # artifact, NOT bench_local_latest.json: first-touch cost is
    # per-session, and latest would mark this round's new queries
    # "known" after one bench run while every later run still pays
    # their cold start.
    for warm in derive_warmup(QUERIES):
        (QUERIES[warm].builder(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())

    import gc
    import statistics

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    per_query: dict[str, float] = {}
    detail: dict[str, dict] = {}
    for name, q in QUERIES.items():
        times: list[float] = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 4))
            # drop the plan reference and collect promptly: iterative
            # operators leave localCheckpoint RDD blocks behind, and the
            # JVM ContextCleaner can only unpersist them once the Python
            # side releases its handles — otherwise dead checkpoint
            # blocks accumulate across the 100+ queries and squeeze
            # execution memory for the late ones
            del df
            gc.collect()
        per_query[name] = round(statistics.median(times), 4)
        detail[name] = {"median": per_query[name],
                        "min": min(times), "runs": times}

    total = round(sum(per_query.values()), 4)
    payload = {
        "metric": "registry_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # the registry GROWS between rounds — compare totals per-query
        # (r1: 42 queries, r2: 58), not headline-to-headline
        "n_queries": len(per_query),
        "sec_per_query": round(total / max(len(per_query), 1), 4),
        "runs_per_query": n_runs,
    }
    print(json.dumps(payload))
    # the driver keeps only the last 2 KB of stdout, which truncates the
    # per-query map to ~40 entries — persist the COMPLETE artifact so
    # round-over-round regression diffs cover every query
    # ($SPARK_GRAFT_BENCH_OUT to redirect; empty string to disable)
    out_path = os.environ.get("SPARK_GRAFT_BENCH_OUT",
                              os.path.join(os.path.dirname(
                                  os.path.abspath(__file__)),
                                  "bench_local_latest.json"))
    if out_path:
        try:
            with open(out_path, "w") as fh:
                json.dump({**payload, "query_detail": detail}, fh,
                          indent=1, sort_keys=True)
        except OSError:
            pass  # never let artifact IO fail the bench line
    spark.stop()


if __name__ == "__main__":
    main()
