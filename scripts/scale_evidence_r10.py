"""r10 scale-evidence run (VERDICT r9 "Next round" #2/#5/#6): measured
hazard-or-holds verdicts for the r10-new wide-fingerprint path, the r9
multimodal family at 10x, and the batched k-center variant. Four
experiments:

1. IMAGE WIDE 1M — 63-bit/3-band image_dedup vs 126-bit/5-band wide
   dedup over the SAME 1M full-entropy images. The claim under test
   (PLANS.md r9 finding 1): the 63-bit accidental-candidate term
   ~n_bands*n^2/2^band_width is the ~10M-item ceiling, and widening to
   126 bits divides it ~2^4 at these band counts (21-bit vs 25-bit
   bands) while the true pair volume stays identical (same group
   structure). Evidence = wall + shuffle + BAND-JOIN CANDIDATE count
   (pre-verification) + verified pairs, both widths.

2. AUDIO 10x — audio fingerprint + hamming dedup at 100k vs 1M
   synthetic PCM WAVs. Frame magnitudes are xxhash64-derived (the
   registry's mod-97-in-g formula would collapse 200k groups onto 97
   contours at this scale and fabricate ~1e9 true pairs — the r9
   mod-244 image trap, same lesson). Hazards: the Arrow decode stage
   must stay scan-parallel; shuffle and pair volume must track corpus
   size linearly.

3. CAPTION 10x — the caption-gate -> image-dedup pair pipeline at
   sf0.1 documents x1 vs x10 (text replicated with id offsets for the
   gate; images from the full-entropy generator keyed by the new ids,
   NOT the registry's mod-244 formula). Hazard: the gate must stay
   scan-local ahead of the fingerprint stage so gated-out rows never
   reach the decode, and the election joins must track survivors
   linearly.

4. KCENTER k=512 — cached (one TakeOrdered(1) round-trip per center)
   vs batch=16 (Gonzalez over-selection, ~2 small jobs per ROUND) at
   curation-scale k. Pass bar: identical output, batched materially
   faster; report rounds actually used.

Usage:  SPARK_GRAFT_DRIVER_MEM=24g python scripts/scale_evidence_r10.py \
            [imagewide|audio|caption|kcenter]...   (no args = all)
Writes: JSON to stdout + /tmp/scale_evidence_r10.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.scale_evidence_r8 import (  # noqa: E402
    last_stage_id, max_task_profile, shuffle_write_bytes)
from scripts.scale_evidence_r9 import _experiment_images  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _wide_fps(spark, n: int):
    """Wide (h+v) fingerprints of the full-entropy experiment images."""
    from comix_etl_spark.multimodal.media import image_dhash_wide

    return image_dhash_wide(_experiment_images(spark, n))


def _candidate_count(fps, fp_cols, n_bands: int) -> int:
    """Band-join candidate volume BEFORE Hamming verification — the
    quantity the band-sizing rule bounds. Rebuilt from the operator's
    own banding internals so the count is the real join's."""
    from pyspark.sql import functions as F

    from comix_etl_spark.operators.dedup import _band_edges, _limb_band_val

    edges = _band_edges(63 * len(fp_cols), n_bands)
    notnull = F.col(fp_cols[0]).isNotNull()
    for c in fp_cols[1:]:
        notnull = notnull & F.col(c).isNotNull()
    f = fps.filter(notnull)
    bands = f.select(
        F.col("media_id").alias("_id"),
        F.explode(F.array(*[
            F.struct(F.lit(bi).alias("band"),
                     _limb_band_val(fp_cols, lo, hi).alias("bv"))
            for bi, (lo, hi) in enumerate(edges)])).alias("bb")
    ).select("_id", "bb.band", "bb.bv")
    a = bands.select(F.col("_id").alias("id_a"), "band", "bv")
    b = bands.select(F.col("_id").alias("id_b"), "band", "bv")
    return (a.join(b, ["band", "bv"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"]).count())


def exp_imagewide(spark) -> dict:
    from comix_etl_spark.operators.dedup import (
        hamming_band_pairs, hamming_fp_dedup)

    n = 1_000_000
    out = {"n": n}
    # narrow: 63-bit dHash (h-limb of the wide frame), 3 bands, ham<=2
    fps = _wide_fps(spark, n).localCheckpoint(eager=True)
    for tag, cols, mh in (("narrow63", ["dhash_h"], 2),
                          ("wide126", ["dhash_h", "dhash_v"], 4)):
        g0 = last_stage_id(spark)
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        pairs = hamming_band_pairs(fps, fp_cols=cols, max_hamming=mh).count()
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        cand = _candidate_count(fps, cols, mh + 1)
        out[tag] = {
            "n_bands": mh + 1, "max_hamming": mh,
            "band_candidates": cand, "verified_pairs": pairs,
            "pairs_wall_sec": wall,
            "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
            **{f"task_{k}": v for k, v in max_task_profile(spark, g0).items()},
        }
    # end-to-end wide dedup wall (decode + election included)
    g0 = last_stage_id(spark)
    t0 = time.perf_counter()
    (hamming_fp_dedup(_wide_fps(spark, n), fp_col=["dhash_h", "dhash_v"],
                      max_hamming=4)
     .write.format("noop").mode("overwrite").save())
    out["wide_e2e_wall_sec"] = round(time.perf_counter() - t0, 2)
    return out


def _experiment_wavs(spark, n: int):
    """Full-entropy PCM WAV generator: group-of-5 near-dup structure
    like the registry's q_audio_dedup (v=0..3 gain-scaled, v=4 a
    frame-30 spike), but frame magnitude = pmod(xxhash64(g, f), 97)+1
    so every group's contour is distinct (the registry formula is
    periodic mod 97 in g — at 200k groups it would collapse onto 97
    contours and fabricate ~1e9 true pairs)."""
    from pyspark.sql import functions as F

    from comix_etl_spark.plans.queries import _WAV_HEADER_HEX

    val = ("((doc_id % 5) + 1) * ("
           "pmod(xxhash64(doc_id DIV 5, i DIV 4), 97) + 1"
           " + CASE WHEN (doc_id % 5) = 4 AND (i DIV 4) = 30"
           " THEN 50 ELSE 0 END)")
    sample_hex = (f"lpad(hex({val} % 256), 2, '0') || "
                  f"lpad(hex({val} DIV 256), 2, '0')")
    payload = F.unhex(F.concat(
        F.lit(_WAV_HEADER_HEX),
        F.expr(f"array_join(transform(sequence(0, 255), i -> "
               f"{sample_hex}), '')")))
    return (spark.range(n).select(F.col("id").alias("doc_id"))
            .select(F.col("doc_id").alias("media_id"),
                    payload.alias("payload")))


def exp_audio(spark) -> dict:
    from comix_etl_spark.multimodal.media import audio_energy_fingerprint
    from comix_etl_spark.operators.dedup import hamming_fp_dedup

    out = {}
    for n in (100_000, 1_000_000):
        wavs = _experiment_wavs(spark, n)
        g0 = last_stage_id(spark)
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        fps = audio_energy_fingerprint(wavs).select("media_id", "afp")
        (hamming_fp_dedup(fps, fp_col="afp", max_hamming=2)
         .write.format("noop").mode("overwrite").save())
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        out[f"n_{n}"] = {
            "wall_sec": wall,
            "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
            **{f"task_{k}": v for k, v in max_task_profile(spark, g0).items()},
        }
    return out


def exp_caption(spark) -> dict:
    from pyspark.sql import functions as F

    from comix_etl_spark.functions import text
    from comix_etl_spark.multimodal.media import image_dhash
    from comix_etl_spark.operators.dedup import hamming_fp_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    n = docs.count()

    def run(d) -> dict:
        # inline q_caption_corpus_prep's plan shape, with the image
        # payloads from the FULL-ENTROPY generator keyed by doc_id
        gated = d.filter(text.quality_score("text") >= 0.8)
        n_docs = gated.count()
        # payloads generated SCAN-LOCAL on the gated frame (the
        # pipeline contract: gated-out rows never reach the decode),
        # full-entropy xxhash pixels keyed by doc_id
        px = ("pmod(xxhash64(doc_id DIV 5, ((i DIV 18) DIV 2) * 9 "
              "+ ((i % 18) DIV 2)), 244)")
        val = (f"CASE WHEN (doc_id % 5) = 4 AND ((i DIV 18) DIV 2) = 3 "
               f"AND ((i % 18) DIV 2) = 4 THEN 255 - ({px} + 3 * (doc_id % 5)) "
               f"ELSE {px} + 3 * (doc_id % 5) END")
        px_hex = F.expr("array_join(transform(sequence(0, 287), i -> "
                        f"lpad(hex({val}), 2, '0')), '')")
        pairs_src = gated.select(
            F.col("doc_id").alias("media_id"),
            F.unhex(F.concat(F.lit("5257381210"), px_hex)).alias("payload"))
        g0 = last_stage_id(spark)
        s0 = shuffle_write_bytes(spark)
        t0 = time.perf_counter()
        kept = hamming_fp_dedup(image_dhash(pairs_src), fp_col="dhash",
                                max_hamming=2)
        out_df = (kept.join(
            d.select(F.col("doc_id").alias("media_id"),
                     text.token_count("text").alias("n_tokens")),
            "media_id"))
        out_df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        s1 = shuffle_write_bytes(spark)
        return {"wall_sec": wall, "gated_rows": n_docs,
                "shuffle_mb": round((s1 - s0) / 1e6, 1) if s0 >= 0 else None,
                **{f"task_{k}": v for k, v in
                   max_task_profile(spark, g0).items()}}

    copies = [docs.select((F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
                          "text") for i in range(10)]
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    return {"x1": run(docs), "x10": run(big)}


def exp_kcenter512(spark) -> dict:
    from comix_etl_spark.operators.similarity import kcenter_sample

    emb = (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
           .select("vec_id", "embedding"))
    out = {"k": 512, "corpus": emb.count()}
    rows = {}
    for mode, kw in (("cached", {"cached": True}), ("batch16", {"batch": 16})):
        t0 = time.perf_counter()
        rows[mode] = kcenter_sample(emb, k=512, **kw).collect()
        out[f"{mode}_wall_sec"] = round(time.perf_counter() - t0, 2)
    out["identical_output"] = (
        [tuple(r) for r in rows["cached"]] == [tuple(r) for r in rows["batch16"]])
    return out


def main() -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder
             .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', os.cpu_count())}]")
             .appName("scale_evidence_r10")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.autoBroadcastJoinThreshold",
                     str(64 * 1024 * 1024))
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.ui.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    picks = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["imagewide", "audio", "caption", "kcenter"]
    report = {}

    def _flush():
        # dump after EVERY experiment so a later failure can't lose
        # earlier measurements (burned once: the audio generator bug
        # threw after the 1M imagewide run had finished)
        with open("/tmp/scale_evidence_r10.json", "w") as fh:
            json.dump(report, fh, indent=1)

    if "imagewide" in picks:
        report["image_wide_1m"] = exp_imagewide(spark); _flush()
    if "audio" in picks:
        report["audio_dedup_10x"] = exp_audio(spark); _flush()
    if "caption" in picks:
        report["caption_prep_10x"] = exp_caption(spark); _flush()
    if "kcenter" in picks:
        report["kcenter_k512"] = exp_kcenter512(spark); _flush()
    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
