#!/usr/bin/env python
"""Phase profile for stream_dedup_minhash (r12, VERDICT ask #4):
time each stage of the banding chain in BATCH mode over the same
documents, then the full streaming query, to locate the cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def t(label, fn, runs=3):
    fn()  # warmup
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from margaret_spark.session import get_spark

    spark = get_spark(app_name="profile-minhash")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").alias("seq"), F.col("text").alias("value")
    )
    docs.write.format("noop").mode("overwrite").save()

    from margaret_spark.functions.shingling import word_shingles

    num_hashes, bands, n = 32, 8, 3
    rows_per_band = num_hashes // bands

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    sh = word_shingles(F.col("value"), n=n)
    src = docs.withColumn("__h", F.transform(sh, lambda s: F.xxhash64(s)))
    src = src.where(F.size("__h") > 0)

    t("1 shingles+__h only", lambda: noop(src.select("seq", "__h")))

    sig = [
        F.array_min(F.transform(F.col("__h"), lambda h: F.xxhash64(h, F.lit(i))))
        for i in range(num_hashes)
    ]

    t(
        "2 sig via 32x transform/array_min (current)",
        lambda: noop(src.select("seq", *[s.alias(f"m{i}") for i, s in enumerate(sig)])),
    )

    # variant: aggregate-fold per permutation (no intermediate array)
    LMAX = (1 << 63) - 1

    def _fold(i):
        return F.aggregate(
            F.col("__h"),
            F.lit(LMAX),
            lambda acc, h: F.least(acc, F.xxhash64(h, F.lit(i))),
        )

    sig_agg = [_fold(i) for i in range(num_hashes)]
    t(
        "3 sig via 32x aggregate fold",
        lambda: noop(
            src.select("seq", *[s.alias(f"m{i}") for i, s in enumerate(sig_agg)])
        ),
    )

    band_hashes = [
        F.xxhash64(
            F.concat_ws(
                ",",
                *[
                    sig[i].cast("string")
                    for i in range(b * rows_per_band, (b + 1) * rows_per_band)
                ],
            )
        )
        for b in range(bands)
    ]
    banded = src.select(
        F.col("seq"), F.posexplode(F.array(*band_hashes)).alias("band", "bucket")
    )
    t("4 full banded posexplode (current chain)", lambda: noop(banded))

    # per-group Python overhead estimate: batch applyInPandas over the
    # same (band, bucket) grouping
    import pandas as pd

    def grp(pdf: pd.DataFrame) -> pd.DataFrame:
        s = sorted(int(x) for x in pdf["seq"])
        keep = s[0]
        dups = [x for x in s[1:]]
        return pd.DataFrame(
            {"dup_seq": dups, "band": [int(pdf["band"].iloc[0])] * len(dups),
             "keep_seq": [keep] * len(dups)}
        )

    bmat = banded.localCheckpoint()  # isolate the grouping cost
    t(
        "5 groupBy(band,bucket).applyInPandas over materialized banded",
        lambda: noop(
            bmat.groupBy("band", "bucket").applyInPandas(
                grp, "dup_seq long, band int, keep_seq long"
            )
        ),
    )
    n_groups = bmat.select("band", "bucket").distinct().count()
    print(f"   n_banded_rows={bmat.count()} n_groups={n_groups}")

    # full streaming query (the graded entry)
    import __spark_entry__ as entry

    qs = entry.queries()
    t("6 full stream_dedup_minhash query", lambda: noop(qs["stream_dedup_minhash"](spark, sf_dir)))
    t("7 full stream_dedup_exact query", lambda: noop(qs["stream_dedup_exact"](spark, sf_dir)))


if __name__ == "__main__":
    main()
