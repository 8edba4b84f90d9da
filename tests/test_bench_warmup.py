"""The bench warm-up derivation (r12): curated representatives plus
first-timers vs the last COMMITTED round artifact, so a new query
family never lands its one-time cost on whichever timed query runs
first."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import (CURATED_WARMUP, canary_dispersion,  # noqa: E402
                   derive_warmup, select_artifact)


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


def test_derive_warmup_ignores_round_digits_in_directory_name(tmp_path):
    """The round key must come from the artifact BASENAME: a checkout
    directory containing '_r<digits>' used to give every artifact the
    same key, silently degrading 'last committed round' to glob order."""
    d = tmp_path / "repo_r2"
    d.mkdir()
    registry = {n: None for n in ("stats_topk", "old_q", "new_q")}
    _write(d, "bench_local_r9.json", ["stats_topk"])
    _write(d, "bench_local_r11.json", ["stats_topk", "old_q"])
    warm = derive_warmup(registry, repo_dir=str(d))
    # r11 (not glob-order r9) is the base: old_q is NOT a first-timer
    assert warm == ["stats_topk", "new_q"]


def test_canary_dispersion():
    assert canary_dispersion([]) == 1.0
    assert canary_dispersion([0.3]) == 1.0
    # <4 samples: plain max/min (nothing to trim)
    assert abs(canary_dispersion([0.2, 0.3, 0.25]) - 1.5) < 1e-9
    assert canary_dispersion([0.3, 0.0]) == float("inf")
    # >=4 samples: one max and one min are trimmed — a single isolated
    # spike (the quiet-window failure mode measured in r13 calibration)
    # does not flag the run ...
    assert abs(canary_dispersion([0.30, 0.31, 0.32, 0.30, 0.45]) -
               0.32 / 0.30) < 1e-9
    # ... but a SUSTAINED degraded stretch (multiple high samples)
    # survives the trim and is caught
    assert canary_dispersion([0.30, 0.31, 0.60, 0.62, 0.61]) > 1.9


def test_select_artifact_median_of_clean():
    runs = [{"total": 400.0, "dispersion": 1.80},   # noisy, excluded
            {"total": 330.0, "dispersion": 1.35},
            {"total": 310.0, "dispersion": 1.38},
            {"total": 350.0, "dispersion": 1.32}]
    idx, status = select_artifact(runs)
    assert status == "median-of-clean"
    assert idx == 1  # median total (330) among the three clean runs


def test_select_artifact_lower_median_on_even_clean_count():
    runs = [{"total": 300.0, "dispersion": 1.0},
            {"total": 320.0, "dispersion": 1.0},
            {"total": 340.0, "dispersion": 1.0},
            {"total": 360.0, "dispersion": 1.0}]
    idx, status = select_artifact(runs)
    # lower median: always an ACTUAL run, deterministic
    assert (idx, status) == (1, "median-of-clean")


def test_select_artifact_demands_more_runs_then_falls_back():
    noisy = [{"total": 400.0 + i, "dispersion": 1.7 + i / 100}
             for i in range(5)]
    idx, status = select_artifact(noisy)
    assert (idx, status) == (None, "need-more-runs")
    noisy.append({"total": 500.0, "dispersion": 1.6})
    idx, status = select_artifact(noisy)
    # six attempts exhausted: lowest-dispersion run wins, flagged
    assert (idx, status) == (5, "fallback-min-dispersion")


def test_select_artifact_dispersion_boundary_is_exclusive():
    runs = [{"total": 300.0, "dispersion": 1.45},
            {"total": 310.0, "dispersion": 1.449},
            {"total": 320.0, "dispersion": 1.449},
            {"total": 330.0, "dispersion": 1.449}]
    idx, status = select_artifact(runs)
    # 1.45 exactly (the r14-amended MAX_DISPERSION default) is NOT
    # clean; median of the three 1.449 runs
    assert (idx, status) == (2, "median-of-clean")


def test_select_artifact_r14_bar_excludes_r13_driver_window():
    """The amendment's motivating case: the r13 driver window read
    1.5096 — clean under the old 1.55 bar, excluded under 1.45 — while
    the r13 clean candidates (1.22/1.28/1.3667) all stay clean."""
    runs = [{"total": 449.0, "dispersion": 1.5096},   # r13 driver window
            {"total": 269.0, "dispersion": 1.22},
            {"total": 328.7, "dispersion": 1.28},
            {"total": 299.7, "dispersion": 1.3667}]
    idx, status = select_artifact(runs)
    assert status == "median-of-clean"
    assert idx == 3  # median total of the three CLEAN runs, not #0


def test_canary_level_and_norm_fields():
    from bench import CANARY_REF_SEC, MAX_DISPERSION, canary_level

    # quiet window: samples at the frozen reference read level 1.0
    assert abs(canary_level([CANARY_REF_SEC] * 5) - 1.0) < 1e-9
    # uniformly slow window: dispersion is blind to it, the level sees
    # it — 1.3x samples read level 1.3
    slow = [CANARY_REF_SEC * 1.3] * 5
    from bench import canary_dispersion

    assert canary_dispersion(slow) == 1.0      # dispersion: "clean"
    assert abs(canary_level(slow) - 1.3) < 1e-9
    # broken measurement: never quiet
    assert canary_level([]) == float("inf")
    assert canary_level([0.3, 0.0]) == float("inf")
    assert MAX_DISPERSION == 1.45  # the pre-registered r14 bar


def test_select_cli_mechanical_enforcement(tmp_path, capsys):
    """ADVICE r13: the selection rule must be mechanically applicable
    over recorded artifacts — the CLI reads run JSONs and prints the
    rule's verdict."""
    import json as _json

    from bench import select_cli

    paths = []
    for i, (total, disp) in enumerate([(300.0, 1.30), (310.0, 1.35),
                                       (320.0, 1.28), (500.0, 1.60)]):
        p = tmp_path / f"run{i}.json"
        p.write_text(_json.dumps({
            "value": total, "canary": {"dispersion": disp}}))
        paths.append(str(p))
    rc = select_cli(paths)
    out = _json.loads(capsys.readouterr().out)
    assert rc == 0
    assert out["status"] == "median-of-clean"
    assert out["selected"] == paths[1]          # median of the 3 clean
    assert [r["clean"] for r in out["runs"]] == [True, True, True, False]


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
