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

r13 onward every run carries a HOST-DRIFT CANARY (a fixed cheap query
re-timed every ~25 registry queries; the artifact records the sample
series and its max/min dispersion) and the committed per-round artifact
is picked by the PRE-REGISTERED ``select_artifact`` rule — median total
of >=3 clean runs (trimmed canary dispersion below the bar) — instead
of post-hoc judgment over a ladder of same-day runs (the r10–r12
adjudication tax).

r14 amendments (PLANS.md "r14 bench protocol amendment", committed
before any r14 run): the clean bar tightens 1.55 → 1.45
(MAX_DISPERSION); every artifact additionally records the canary
LEVEL (absolute median vs the frozen r13 quiet reference
CANARY_REF_SEC) plus ``sec_per_query_canary_norm`` — dispersion can
only see within-run variance, the level sees a uniformly slow window;
``python bench.py select <artifacts...>`` applies the selection rule
mechanically; and ``query_detail`` splits each run into (build, exec)
so store lifecycle queries separate amortized-once build cost from
per-probe serving cost.
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

# --- host-drift canary (r13) -------------------------------------------
# Three rounds in a row the headline number needed manual host-drift
# adjudication (r10–r12 PLANS.md), and the committed local artifact was
# picked post-hoc from a ladder of same-day runs. The canary makes drift
# MEASURABLE inside one run: a fixed cheap query re-runs every
# CANARY_EVERY timed queries, and the artifact records the sample series
# plus its dispersion (max/min). A quiet host holds dispersion near 1.0;
# the r12 "run D" window (a k=1024 job reading 4× its steady state)
# would have shown >1.5 and disqualified itself.
CANARY_QUERY = "stats_topk"
CANARY_EVERY = 25

# r14 amendment (PLANS.md "r14 bench protocol amendment", committed
# before any r14 run): the clean bar tightens to 1.45 — the r13 driver
# window passed the old 1.55 bar at 1.5096 yet produced a 1.30×
# headline on code the clean local window measured at 0.890×. Quiet
# trimmed dispersion on this host is 1.35–1.37 and all three r13 clean
# candidates (1.22/1.28/1.37) remain clean at 1.45.
MAX_DISPERSION = 1.45

# Dispersion measures within-run VARIANCE — it cannot see a window
# that is uniformly slow. The canary LEVEL can: CANARY_REF_SEC is the
# absolute canary median of the r13 committed clean artifact
# (bench_local_r13.json, median of its 12 samples), frozen as the
# quiet-host reference. level = run canary median / this; the artifact
# reports sec_per_query / level as the cross-window comparison number.
# The COMMITTED headline stays the raw selected sec_per_query —
# normalization never picks the artifact (a noisy canary must not
# rescale the grade), it only rides alongside.
CANARY_REF_SEC = 0.312


def canary_dispersion(samples: list[float]) -> float:
    """TRIMMED max/min over the canary series — the run's host-noise
    score. Exactly one max and one min sample are dropped first
    (given >=4 samples): calibration on two QUIET windows (sf0.1 and
    sf0.001, r13) measured plain max/min at 1.48–1.61 — a single
    isolated GC/scheduler spike dominates it — while the trimmed form
    read a consistent 1.35–1.37 quiet vs >=1.75 for an r12-style
    sustained 1.3x degraded stretch (which leaves multiple high
    samples, surviving the single-sample trim). <2 samples can't
    measure drift (treated as clean, 1.0); a non-positive sample means
    a broken measurement (inf, never clean)."""
    if len(samples) < 2:
        return 1.0
    if min(samples) <= 0:
        return float("inf")
    s = sorted(samples)
    if len(s) >= 4:
        s = s[1:-1]
    return s[-1] / s[0]


def canary_level(samples: list[float]) -> float:
    """Absolute host-speed score of a run: the canary series' median
    over the frozen quiet-host reference (CANARY_REF_SEC). 1.0 = the
    r13-calibrated quiet window; a uniformly degraded window (which
    dispersion cannot flag) reads proportionally above 1. <=0 or empty
    samples mean a broken measurement — level is inf, never quiet."""
    import statistics as _st

    if not samples or min(samples) <= 0:
        return float("inf")
    return _st.median(samples) / CANARY_REF_SEC


def select_artifact(runs: list[dict], *, max_dispersion: float = MAX_DISPERSION,
                    min_clean: int = 3, max_attempts: int = 6):
    """THE PRE-REGISTERED artifact-selection rule (written before the
    r13 bench runs — see PLANS.md "r13 bench protocol"; the default
    clean bar tightened to MAX_DISPERSION=1.45 by the r14 amendment,
    likewise committed before any r14 run): the committed
    per-round artifact is the MEDIAN-total run among >= ``min_clean``
    same-window runs whose canary dispersion < ``max_dispersion``;
    noisy runs are discarded and rerun. If ``max_attempts`` runs still
    yield fewer clean ones, commit the lowest-dispersion run and flag
    it. No post-hoc judgment: the rule sees only (total, dispersion).

    ``runs``: chronological [{"total": sec, "dispersion": x}, ...].
    Returns (index_into_runs, status) with status one of
    "median-of-clean" | "need-more-runs" | "fallback-min-dispersion";
    index is None only for "need-more-runs". Median of an even clean
    count is the LOWER median — always an actual run, deterministic."""
    clean = [(r["total"], i) for i, r in enumerate(runs)
             if r["dispersion"] < max_dispersion]
    if len(clean) >= min_clean:
        clean.sort()  # by total, then chronological index for exact ties
        return clean[(len(clean) - 1) // 2][1], "median-of-clean"
    if len(runs) < max_attempts:
        return None, "need-more-runs"
    best = min(range(len(runs)), key=lambda i: (runs[i]["dispersion"], i))
    return best, "fallback-min-dispersion"


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

    def _round_key(p: str) -> int:
        # match the BASENAME only: a checkout directory containing
        # "_r<digits>" (e.g. /tmp/repo_r2/) would otherwise give every
        # artifact the same key and "last committed round" silently
        # degrades to glob order
        m = re.search(r"^bench_local_r(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else -1

    committed = sorted(glob.glob(os.path.join(here, "bench_local_r*.json")),
                       key=_round_key)
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

    canary_samples: list[float] = []

    def run_canary() -> None:
        # one canary SAMPLE = median of 3 back-to-back noop-sink runs
        # (the same hygiene the timed queries use): a single ~0.3 s run
        # swings ~1.5x on a QUIET host (GC pauses — measured while
        # building this), which would drown the ~1.3x sustained window
        # drift the canary exists to catch. Samples are recorded in the
        # series but NEVER in the total/queries map — they measure the
        # host window, not the registry.
        import statistics as _st

        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            (QUERIES[CANARY_QUERY].builder(spark, sf_dir)
             .write.format("noop").mode("overwrite").save())
            runs.append(time.perf_counter() - t0)
        canary_samples.append(round(_st.median(runs), 4))

    run_canary()
    for qi, (name, q) in enumerate(QUERIES.items(), start=1):
        if qi % CANARY_EVERY == 0:
            run_canary()
        times: list[float] = []
        builds: list[float] = []
        execs: list[float] = []
        for _ in range(n_runs):
            # r14 amendment #4: the builder call and the noop-sink
            # materialization are timed separately. For the store
            # lifecycle queries the builder is where persist_* store
            # builds/appends execute eagerly — the amortized-once
            # cost — while exec is the probe/serving side; for
            # ordinary queries build is millisecond plan construction.
            # The headline still sums the TOTAL (build + exec), so
            # lifecycle queries stay honest end-to-end.
            t0 = time.perf_counter()
            df = q.builder(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 4))
            execs.append(round(t2 - t1, 4))
            times.append(round(t2 - t0, 4))
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
                        "min": min(times), "runs": times,
                        "build": builds, "exec": execs}
    run_canary()

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
        # host-drift canary: samples of CANARY_QUERY interleaved every
        # CANARY_EVERY timed queries; dispersion feeds select_artifact's
        # pre-registered rule (r14 amendment: clean run = trimmed
        # dispersion < MAX_DISPERSION, and the run stamps its own
        # verdict so the rule is enforced in-process, not out-of-band)
        "canary": {"query": CANARY_QUERY, "every": CANARY_EVERY,
                   "samples": canary_samples,
                   "dispersion": round(canary_dispersion(canary_samples), 4),
                   "median": round(statistics.median(canary_samples), 4)
                   if canary_samples else None,
                   "level": round(canary_level(canary_samples), 4),
                   "ref_sec": CANARY_REF_SEC,
                   "verdict": ("clean" if canary_dispersion(canary_samples)
                               < MAX_DISPERSION else "noisy")},
        # sec_per_query divided by the canary LEVEL (absolute host
        # speed vs the frozen r13 quiet reference) — the cross-window
        # comparison number; the committed headline stays the raw
        # sec_per_query (normalization never picks the artifact)
        "sec_per_query_canary_norm": (round(
            (total / max(len(per_query), 1))
            / canary_level(canary_samples), 4)
            if canary_samples and min(canary_samples) > 0 else None),
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


def select_cli(paths: list[str]) -> int:
    """``python bench.py select run1.json run2.json ...`` — apply the
    pre-registered select_artifact rule MECHANICALLY over recorded
    artifacts (ADVICE r13: nothing previously prevented committing a
    noisy run by mistake; the ladder table in PLANS.md now records
    this command's output verbatim). Prints one JSON line with the
    per-run canary verdicts and the chosen file; exit 0 on a selection
    (including the flagged fallback), 1 when more runs are needed."""
    runs = []
    for p in paths:
        with open(p) as fh:
            d = json.load(fh)
        runs.append({"total": d["value"],
                     "dispersion": d["canary"]["dispersion"]})
    idx, status = select_artifact(runs)
    print(json.dumps({
        "rule": f"median-of->=3-clean (trimmed dispersion < {MAX_DISPERSION})",
        "runs": [{"path": p, "total": r["total"],
                  "dispersion": r["dispersion"],
                  "clean": r["dispersion"] < MAX_DISPERSION}
                 for p, r in zip(paths, runs)],
        "status": status,
        "selected": paths[idx] if idx is not None else None,
    }))
    return 0 if idx is not None else 1


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "select":
        raise SystemExit(select_cli(sys.argv[2:]))
    main()
