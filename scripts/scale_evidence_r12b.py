"""r12 k-center over-selection remedy measurement (VERDICT r11 #4):
k=1024 on the sf0.1 embeddings table (2000 vectors — k selects 51% of
the corpus; the recorded results JSON stamps the measured count), fresh
session,
collect-materialized — the exact r11 protocol whose fixed-batch numbers
were b16 144.9 s / b64 112.5 s / b128 130.6 s (PLANS.md r11).

Modes: fixed batch=64 (the r11 winner, re-measured in-window as the
control) vs ``adapt_batch`` from 64 and from 128 (fetch re-sized to ~2×
the prior round's acceptance, clamped [8, max(2·batch, 128)]). Output
identity across all modes is asserted on the full 1024-row selection.

Done-criterion from the brief: adaptive wall <= the same-window fixed
b64 wall, with full-output identity.

Usage: python scripts/scale_evidence_r12b.py
Writes: JSON to stdout + scripts/scale_evidence_r12b_results.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from comix_etl_spark.operators.similarity import kcenter_sample
    from comix_etl_spark.session import get_spark

    out = {"k": 1024, "sf_dir": SF_DIR}
    rows = {}
    # ONE SPARK SESSION PER MODE: the first r12 attempt ran all three
    # modes in one session and the later modes read up to 16% high
    # (checkpoint-block accumulation + session aging) — mode order, not
    # mode, dominated the comparison.
    for mode, kw in (("fixed_b64", {"batch": 64}),
                     ("adapt_b64", {"batch": 64, "adapt_batch": True}),
                     ("adapt_b128", {"batch": 128, "adapt_batch": True})):
        spark = get_spark(f"scale_r12_kcenter_{mode}")
        spark.sparkContext.setLogLevel("ERROR")
        emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
               .select("vec_id", "embedding"))
        out["corpus"] = emb.count()
        stats: list = []
        t0 = time.perf_counter()
        rows[mode] = kcenter_sample(emb, k=1024, _round_stats=stats,
                                    **kw).collect()
        out[f"{mode}_wall_sec"] = round(time.perf_counter() - t0, 2)
        out[f"{mode}_rounds"] = len(stats)
        spark.stop()
    base = [tuple(r) for r in rows["fixed_b64"]]
    out["n_selected"] = len(base)
    out["identical_output"] = all(
        [tuple(r) for r in rows[m]] == base for m in rows)
    print(json.dumps(out, indent=1))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "scale_evidence_r12b_results.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
