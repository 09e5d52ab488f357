#!/usr/bin/env python
"""Second-decade scale probe (r8 verdict ask #4): build a ~10×
synthetic corpus from the sf0.1 tables (union of re-keyed,
DECORRELATED copies — plain duplication would inflate near-dup cell
sizes and measure an adversarial corpus, not a bigger one) and time
the heaviest graded queries at sf0.1 vs 10×. Output: markdown rows
for SCALE.md.

Decorrelation: text copies re-spell every token after the first
(space -> ' c<k>'), so shingles/hash-embeddings don't collide with
the source; embedding copies rotate the vector by k dims (norm- and
distribution-preserving, cosine to the source drops to noise).

Usage: python scripts/scale10x_probe.py [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.1"
OUT = "/tmp/scale10x"
COPIES = int(os.environ.get("SCALE_COPIES", "9"))  # + the original; 9 -> 10x, 99 -> 100x
KEY_STRIDE = 10_000_000

HEAVY = [
    "docs_semantic_dedup",
    "decontaminate_semantic",
    "ann_ivf_pq_indexed",
    "dedup_semantic",
    "embeddings_contrastive",
]


def build_corpus(spark):
    from pyspark.sql import functions as F

    if os.path.exists(OUT):
        shutil.rmtree(OUT)
    os.makedirs(OUT)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    parts = [docs]
    for k in range(1, COPIES + 1):
        parts.append(
            docs.select(
                (F.col("doc_id") + k * KEY_STRIDE).alias("doc_id"),
                F.regexp_replace("text", " ", f" c{k}").alias("text"),
                "lang",
                "source",
                F.length(F.regexp_replace("text", " ", f" c{k}"))
                .cast(docs.schema["n_chars"].dataType)
                .alias("n_chars"),
            )
        )
    big_docs = parts[0]
    for p in parts[1:]:
        big_docs = big_docs.unionByName(p)
    big_docs.write.mode("overwrite").parquet(os.path.join(OUT, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    dim = len(emb.select("embedding").head()["embedding"])
    eparts = [emb]
    other = [c for c in emb.columns if c not in ("vec_id", "embedding")]
    for k in range(1, COPIES + 1):
        # rotation must stay inside the vector: r in 1..dim-1; past a
        # full cycle of rotations, flip signs so no two copies share a
        # transform (same-rotation copies would be planted EXACT dups
        # and cosine is sign-covariant, so -rot never matches +rot)
        r = (k - 1) % (dim - 1) + 1
        rot = F.concat(
            F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
        )
        if ((k - 1) // (dim - 1)) % 2 == 1:
            rot = F.transform(rot, lambda x: -x)
        eparts.append(
            emb.select(
                (F.col("vec_id") + k * KEY_STRIDE).alias("vec_id"),
                rot.alias("embedding"),
                *other,
            )
        )
    big_emb = eparts[0]
    for p in eparts[1:]:
        big_emb = big_emb.unionByName(p)
    big_emb.write.mode("overwrite").parquet(os.path.join(OUT, "embeddings.parquet"))
    n_d = spark.read.parquet(os.path.join(OUT, "documents.parquet")).count()
    n_e = spark.read.parquet(os.path.join(OUT, "embeddings.parquet")).count()
    print(f"built {OUT}: {n_d} docs, {n_e} embeddings")


def main() -> None:
    import __spark_entry__ as entry
    from margaret_spark.session import get_spark

    names = sys.argv[1:] or HEAVY
    spark = get_spark(app_name="scale10x-probe", cpus="32")
    spark.sparkContext.setLogLevel("ERROR")
    build_corpus(spark)
    qs = entry.queries()

    print(f"| query | sf0.1 s | {COPIES + 1}x s | ratio |")
    print("|---|---|---|---|")
    for name in names:
        fn = qs[name]
        best = {}
        for tag, d in (("base", SF_DIR), ("big", OUT)):
            fn(spark, d).write.format("noop").mode("overwrite").save()  # warm
            b = None
            for _ in range(int(os.environ.get("SCALE_RUNS", "2"))):
                t0 = time.time()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                b = dt if b is None or dt < b else b
            best[tag] = b
        print(
            f"| {name} | {best['base']:.2f} | {best['big']:.2f} "
            f"| {best['big'] / best['base']:.1f}x |"
        )


if __name__ == "__main__":
    main()
