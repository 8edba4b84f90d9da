"""The bench warm-up derivation (r12): curated representatives plus
first-timers vs the last COMMITTED round artifact, so a new query
family never lands its one-time cost on whichever timed query runs
first."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CURATED_WARMUP, derive_warmup  # noqa: E402


def _write(d, name, queries):
    with open(os.path.join(d, name), "w") as fh:
        json.dump({"queries": {q: 1.0 for q in queries}}, fh)


def test_first_timers_vs_last_committed_round(tmp_path):
    registry = {n: None for n in
                ("stats_topk", "old_q", "brand_new_q", "newer_q")}
    # r11 is the LAST committed round: it knows old_q but not the two
    # new ones; the stale r9 artifact must not win even though it sorts
    # later alphabetically-by-name than r11
    _write(tmp_path, "bench_local_r9.json", ["stats_topk"])
    _write(tmp_path, "bench_local_r11.json", ["stats_topk", "old_q"])
    warm = derive_warmup(registry, repo_dir=str(tmp_path))
    assert warm == ["stats_topk", "brand_new_q", "newer_q"]
    # curated entries not in the registry are skipped, no duplicates
    assert all(w in registry for w in warm)
    assert len(warm) == len(set(warm))


def test_no_committed_artifact_means_curated_only(tmp_path):
    registry = {n: None for n in CURATED_WARMUP[:3] + ("mystery_q",)}
    warm = derive_warmup(registry, repo_dir=str(tmp_path))
    # nothing to diff against — no first-timer guessing, curated only
    assert warm == list(CURATED_WARMUP[:3])


def test_unreadable_artifact_degrades_to_curated(tmp_path):
    registry = {"stats_topk": None, "new_q": None}
    with open(os.path.join(tmp_path, "bench_local_r11.json"), "w") as fh:
        fh.write("{not json")
    warm = derive_warmup(registry, repo_dir=str(tmp_path))
    assert warm == ["stats_topk"]


def test_real_repo_derivation_matches_registry():
    """Against the actual committed artifacts: every derived name must
    be a registry query, curated reps lead, and any first-timer is
    genuinely absent from the last committed round artifact."""
    import glob
    import re

    from comix_etl_spark.plans.queries import QUERIES

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    warm = derive_warmup(QUERIES, repo_dir=here)
    assert all(w in QUERIES for w in warm)
    committed = sorted(
        glob.glob(os.path.join(here, "bench_local_r*.json")),
        key=lambda p: int(re.search(r"_r(\d+)", p).group(1)))
    if committed:
        prev = set(json.load(open(committed[-1]))["queries"])
        for w in warm:
            assert w in CURATED_WARMUP or w not in prev
