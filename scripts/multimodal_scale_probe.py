"""Multimodal-family scale probe (round 9): the dedup/ANN/graph
families carry measured 10–52× exponents; this adds the same evidence
for the arrow-batched codec paths behind the three registered
multimodal queries (JPEG decode, WAV decode, and the composite
curation pipeline).

The N× corpus is the sf0.1 documents table unioned with id-shifted
copies. Asset payloads are DERIVED from doc_id (md5 seeds), so each
copy produces distinct images/audio with identical per-asset decode
cost — the measured ratio isolates the engine's scaling (map-only
decode should be exactly linear: exponent ≈ 1 is the EXPECTED value
here, unlike the sub-linear candidate-generation families; what the
probe guards against is anything super-linear sneaking into the
pipeline's join/agg tail).

Usage: python scripts/multimodal_scale_probe.py [N] [reps]  (default 10 2)
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SHIFT = 10_000_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from bigdata_project_hust_spark.checkpoint import release_all
    from bigdata_project_hust_spark import io as gio
    from bigdata_project_hust_spark.operators import multimodal
    from bigdata_project_hust_spark.plans import queries as Q

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("SPARK_GRAFT_PROBE_PARTS", "32"))
             .config("spark.driver.memory", "48g")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .appName("multimodal-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    d1 = (gio.load_table(spark, "/root/testdata/sf0.1", "documents")
          .select("doc_id").localCheckpoint())
    copies = [d1.select((F.col("doc_id") + F.lit(k * SHIFT))
                        .alias("doc_id")) for k in range(n_copies)]
    dn = copies[0]
    for c in copies[1:]:
        dn = dn.unionAll(c)
    dn = dn.localCheckpoint()
    print(f"docs: 1x={d1.count():,} {n_copies}x={dn.count():,}",
          flush=True)

    def run_noop(df):
        df.write.format("noop").mode("overwrite").save()

    ops = {
        # full JPEG path: encode UDF + real decode + stats
        "jpeg_decode_stats": lambda d: run_noop(
            multimodal.extract_pixel_stats(Q._mm_jpeg_assets(d))),
        # WAV path: Catalyst header concat + stdlib wave decode
        "wav_decode_stats": lambda d: run_noop(
            multimodal.extract_audio_stats(Q._mm_wav_assets(d))),
        # the composite pipeline: both decodes + gates + fingerprint agg
        "curation_pipeline": lambda d: run_noop(
            multimodal.extract_pixel_stats(Q._mm_jpeg_assets(d))
            .join(multimodal.extract_audio_stats(Q._mm_wav_assets(d)),
                  "asset_id")
            .where(F.col("max_gray3") - F.col("min_gray3") >= 90)
            .groupBy((F.floor(F.col("sum_r") / (F.col("n_px") * 16)))
                     .alias("fp"))
            .agg(F.count("*").alias("n"),
                 F.min("asset_id").alias("keeper"))),
    }
    for name, fn in ops.items():
        t = {}
        for tag, d in (("1x", d1), (f"{n_copies}x", dn)):
            times = []
            for _ in range(reps):
                t0 = time.time()
                fn(d)
                times.append(time.time() - t0)
                spark.catalog.clearCache()
                release_all(spark)
            t[tag] = statistics.median(times)
            print(f"{name:20s} {tag:>4s} median {t[tag]:6.2f}s",
                  flush=True)
        big = f"{n_copies}x"
        ratio = t[big] / t["1x"] if t["1x"] else float("nan")
        exp = (math.log(ratio) / math.log(n_copies)
               if n_copies > 1 else float("nan"))
        print(f"{name:20s} ratio {ratio:.2f}x at {n_copies}x docs "
              f"(exponent {exp:.2f}; map-only decode expects ≈ 1.00)",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
