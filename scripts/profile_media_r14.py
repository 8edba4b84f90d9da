"""r14 optimization measurement: decompose the media-family queries
into their pipeline stages (synthetic payload gen, Arrow decode,
vote/banding/election) so the optimization targets the stage that
actually costs, not the guess.

Usage: python scripts/profile_media_r14.py [n_runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from comix_etl_spark.session import get_spark, load_tables  # noqa: E402


def timed(spark, label, df, out, n=4):
    runs = []
    for _ in range(n):
        t0 = time.perf_counter()
        df().write.format("noop").mode("overwrite").save()
        runs.append(round(time.perf_counter() - t0, 3))
    out[label] = runs
    print(label, runs, flush=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_media_r14")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, sf_dir)
    for df in t.values():
        df.count()

    from comix_etl_spark.multimodal.media import (audio_energy_fingerprint,
                                                  image_dhash)
    from comix_etl_spark.operators.dedup import (hamming_fp_dedup,
                                                 majority_fingerprint)
    from comix_etl_spark.plans.queries import (_synthetic_images,
                                               _synthetic_videos,
                                               _synthetic_wavs)

    d = t["documents"]
    out = {}
    # warm Arrow worker pool + codegen once
    image_dhash(_synthetic_images(d)).write.format("noop").mode("overwrite").save()

    timed(spark, "img_payload_gen", lambda: _synthetic_images(d), out, n)
    timed(spark, "img_payload+dhash",
          lambda: image_dhash(_synthetic_images(d)), out, n)
    timed(spark, "img_full_dedup",
          lambda: hamming_fp_dedup(image_dhash(_synthetic_images(d)),
                                   fp_col="dhash", max_hamming=2), out, n)
    timed(spark, "vid_payload_gen",
          lambda: _synthetic_videos(d).drop("frame_idx"), out, n)
    timed(spark, "vid_payload+dhash",
          lambda: image_dhash(_synthetic_videos(d).drop("frame_idx")), out, n)
    timed(spark, "vid_payload+dhash+vote",
          lambda: majority_fingerprint(
              image_dhash(_synthetic_videos(d).drop("frame_idx"))), out, n)
    timed(spark, "wav_payload_gen", lambda: _synthetic_wavs(d), out, n)
    timed(spark, "wav_payload+afp",
          lambda: audio_energy_fingerprint(_synthetic_wavs(d)), out, n)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
