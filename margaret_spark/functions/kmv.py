"""KMV (k-minimum-values) distinct sketch — Beyer et al. 2007, "On
Synopses for Distinct-Value Estimation Under Multiset Operations"
(public literature). The ONE sketch in the family that supports SET
OPERATIONS: where HLL registers can only union (max-merge), KMV
sketches intersect — the estimator a training-data platform needs
for "how many users/domains/docs do corpus A and corpus B SHARE"
without exact-joining 100 TB.

Construction: hash every key through the house deterministic md5
family (first 12 hex digits → a 48-bit integer — the same
conv-of-md5 recipe as CMS/Bloom/HLL, so the sketch TABLE is
reproducible bit-for-bit in any engine); keep the k smallest
DISTINCT hash values. With U = 2^48 the hash space:

- distinct estimate: exact |sketch| when fewer than k values exist,
  else (k−1) · U / h_(k) — the classic kth-minimum estimator.
- union: merge = k smallest of the sketch union (lossless w.r.t. the
  union's own KMV sketch).
- intersection: over the unioned sketch X (the union's KMV), count
  K∩ = |{x ∈ X present in both sides}|; ρ = K∩/|X| estimates the
  Jaccard similarity, and |A∩B| ≈ ρ · est(|A∪B|).

Scale shape: one distinct-aggregate on the 8-byte hash (map-side
combinable) followed by TakeOrdered(k) — the sketch never exceeds k
rows, estimates are tiny-table arithmetic, and merges/intersections
touch only sketch rows. Every estimate is integer-derived IEEE
division + pround, hash-exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import pround

#: hash space size: 12 md5 hex digits = 48 bits
_U = float(1 << 48)


def kmv_hash(key: Column) -> Column:
    """48-bit deterministic hash: first 12 hex digits of
    md5('k#' ∥ key) — the house md5 sketch family."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit("k#"), key.cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")


def kmv_sketch(df: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """(rk, h): the ``k`` smallest distinct key hashes, rank-numbered
    1..|sketch|. NULL keys are skipped (no distinct identity). The
    distinct aggregate is the only shuffle; the k-smallest cut is a
    TakeOrdered, never a global window over the distinct set."""
    if k < 2:
        # the estimator divides by h_(k) with k−1 in the numerator;
        # k=1 would estimate 0 for every input
        raise ValueError(f"k must be >= 2: {k}")
    d = (
        df.where(F.col(key_col).isNotNull())
        .select(kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("h").asc())  # ≤ k rows — single partition is fine
    return d.withColumn("rk", F.row_number().over(w).cast("long")).select(
        "rk", "h"
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """The union's KMV sketch: k smallest of the merged hash sets —
    lossless (equals sketching the unioned corpus directly)."""
    u = (
        a.select("h")
        .union(b.select("h"))
        .distinct()
        .orderBy(F.col("h").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("h").asc())
    return u.withColumn("rk", F.row_number().over(w).cast("long")).select(
        "rk", "h"
    )


def kmv_estimate(sketch: DataFrame, k: int = 64, round_digits: int = 6) -> DataFrame:
    """One row (n_sketch, kth, estimate): exact count when the sketch
    is not full, else the (k−1)·U/h_(k) estimator, pround'ed."""
    agg = sketch.agg(
        F.count("*").cast("long").alias("n_sketch"),
        F.max("h").alias("kth"),
    )
    est = F.when(
        F.col("n_sketch") < k, F.col("n_sketch").cast("double")
    ).otherwise(
        pround(
            F.lit(float(k - 1)) * F.lit(_U) / F.col("kth").cast("double"),
            round_digits,
        )
    )
    return agg.select("n_sketch", "kth", est.alias("estimate"))


def kmv_intersect(
    a: DataFrame, b: DataFrame, k: int = 64, round_digits: int = 6
) -> DataFrame:
    """One row (n_union_sketch, k_common, est_union,
    est_intersection): the multiset-operations estimator. X = the
    union's KMV; K∩ = members of X present in BOTH input sketches;
    est_intersection = (K∩/|X|) · est(|A∪B|). Exact when the union
    fits the sketch."""
    x = kmv_merge(a, b, k)
    flagged = (
        x.join(
            a.select(F.col("h").alias("h"), F.lit(1).alias("__ina")),
            "h",
            "left",
        )
        .join(
            b.select(F.col("h").alias("h"), F.lit(1).alias("__inb")),
            "h",
            "left",
        )
    )
    agg = flagged.agg(
        F.count("*").cast("long").alias("n_union_sketch"),
        F.max("h").alias("__kth"),
        # coalesce: sum over ZERO rows (two empty sketches) is NULL
        F.coalesce(
            F.sum(
                F.when(
                    F.col("__ina").isNotNull() & F.col("__inb").isNotNull(), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("k_common"),
    )
    est_union = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(
        pround(
            F.lit(float(k - 1)) * F.lit(_U) / F.col("__kth").cast("double"),
            round_digits,
        )
    )
    return agg.select(
        "n_union_sketch",
        "k_common",
        est_union.alias("est_union"),
        # two empty inputs: 0/0 would yield NULL — the true
        # intersection of two empty sets is exactly 0
        F.when(F.col("n_union_sketch") == 0, F.lit(0.0))
        .otherwise(
            pround(
                (F.col("k_common").cast("double") / F.col("n_union_sketch"))
                * est_union,
                round_digits,
            )
        )
        .alias("est_intersection"),
    )
