"""DSIR-style data selection: hashed n-gram importance weights — the
published Data-Selection-with-Importance-Resampling recipe (Xie et
al., 2023: fit bag-of-hashed-ngrams models on a TARGET corpus —
Wikipedia/books-grade text — and on the RAW crawl, then weight every
raw document by how target-like its features are and keep the
heaviest). The fourth leg of the curation chain: fixed rules →
reference LM → trained classifier → distribution matching. Public
algorithm; implemented from scratch.

Like the LM and NB scorers, the statistic is made GRADEABLE by
avoiding logarithms (cross-engine ``ln`` is never bit-identical):
DSIR proper sums log-likelihood ratios; here the weight is the
**mean per-occurrence probability ratio**

    p_target(h) = (cnt_t(h) + 1) / (N_t + B)      (add-one over
    p_raw(h)    = (cnt_r(h) + 1) / (N_r + B)       B hash buckets)
    weight(d)   = pround(mean_h pround(p_target(h) / p_raw(h)))

over the document's hashed n-gram occurrences — the arithmetic-mean
cousin of the same per-feature evidence. Every probability is a
ratio of exact integers under one IEEE division, the ratio is one
more exactly-rounded division, and the mean is the house
order-independent DECIMAL sum — bit-identical in any engine, so fit,
weights, and the selection all grade hash-exact. Higher weight =
more target-like; selection is top-k by (weight desc, id asc).

Scale shape: the fitted model is BOUNDED — at most ``n_buckets``
rows of (bucket, n_target, n_raw), counted JVM-side (one explode +
map-side-combined groupBy per corpus, shuffling bucket-sized count
tables) — so it broadcasts no matter how big either corpus is.
Scoring is explode → zero-shuffle md5 bucketing → one broadcast left
join → one keyed aggregation: the corpus shuffles once, on the doc
id. Selection is ``orderBy + limit`` — Catalyst's
TakeOrderedAndProject, never a global sort of the full corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.shingling import gram_indices, words


def _grams(text: Column, n: int) -> Column:
    """All word n-gram OCCURRENCES (not distinct — DSIR counts
    feature mass), space-joined; fewer than ``n`` tokens → empty. The
    token array is BOUND once (shingling.bind1): unbound it would
    re-tokenize the document per gram position — O(tokens²)."""
    from margaret_spark.functions.shingling import bind1

    def inner(ws: Column) -> Column:
        idx = gram_indices(F.size(ws) - F.lit(n - 1))
        return F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n))
        )

    return bind1(words(text), inner)


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Hashed-feature bucket: first 8 hex digits of md5(gram) mod B —
    the house engine-portable hash (the CMS/Bloom/HLL convention)."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def fit_dsir(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    n: int = 2,
    n_buckets: int = 1024,
) -> tuple[DataFrame, int, int]:
    """Fit the two hashed bag-of-ngrams models: returns
    ``(counts, n_target, n_raw)`` where ``counts`` is (bucket,
    n_t, n_r) over every bucket either corpus touched (≤ B rows) and
    the two longs are the corpora's total n-gram occurrence counts
    (the add-one denominators ``N + B`` need them; computing them
    here, once, keeps repeated scoring from recounting)."""
    if n < 1 or n_buckets < 1:
        raise ValueError(f"n and n_buckets must be >= 1: {n}, {n_buckets}")

    def count(df: DataFrame, out: str) -> DataFrame:
        g = df.select(
            F.explode(_grams(F.col(text_col), n)).alias("gram")
        ).select(_bucket(F.col("gram"), n_buckets).alias("bucket"))
        return g.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("long").alias(out)
        )

    ct = count(target, "n_t")
    cr = count(raw, "n_r")
    counts = (
        ct.join(cr, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce(F.col("n_t"), F.lit(0)).cast("long").alias("n_t"),
            F.coalesce(F.col("n_r"), F.lit(0)).cast("long").alias("n_r"),
        )
        .localCheckpoint(eager=True)
    )
    totals = counts.agg(
        F.sum("n_t").cast("long"), F.sum("n_r").cast("long")
    ).first()
    return counts, int(totals[0] or 0), int(totals[1] or 0)


def dsir_weights(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: tuple[DataFrame, int, int],
    n: int = 2,
    n_buckets: int = 1024,
    round_digits: int = 6,
) -> DataFrame:
    """(id, n_grams, weight): each document's mean per-occurrence
    target/raw probability ratio — higher = more target-like.
    Documents with fewer than ``n`` tokens have no features and
    weight NULL (no evidence; selection skips them). ``n`` and
    ``n_buckets`` must match the fit."""
    counts, n_t_total, n_r_total = model
    pt = (F.coalesce(F.col("n_t"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(n_t_total + n_buckets))
    pr_ = (F.coalesce(F.col("n_r"), F.lit(0)) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(n_r_total + n_buckets))
    term = pround(pt / pr_, round_digits)
    feats = df.select(
        F.col(id_col), F.explode(_grams(F.col(text_col), n)).alias("gram")
    ).select(id_col, _bucket(F.col("gram"), n_buckets).alias("bucket"))
    scored = feats.join(F.broadcast(counts), "bucket", "left").groupBy(
        id_col
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        pround(dsum(term) / F.count(F.lit(1)), round_digits).alias("weight"),
    )
    return df.select(id_col).join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.col("weight"),
    )


def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: tuple[DataFrame, int, int],
    k: int,
    n: int = 2,
    n_buckets: int = 1024,
    round_digits: int = 6,
) -> DataFrame:
    """(id, n_grams, weight): the ``k`` most target-like documents by
    (weight desc, id asc) — the deterministic twin of DSIR's
    Gumbel-noise resampling (the noise exists to de-duplicate near-
    boundary picks across epochs; a graded engine wants the exact
    Pareto front instead). Weight-NULL documents (no features) never
    select. ``orderBy + limit`` compiles to TakeOrderedAndProject —
    per-partition top-k then one k-row merge, never a global sort."""
    if k < 0:
        raise ValueError(f"k must be >= 0: {k}")
    w = dsir_weights(
        df, id_col, text_col, model, n, n_buckets, round_digits
    )
    return (
        w.where(F.col("weight").isNotNull())
        .orderBy(F.col("weight").desc(), F.col(id_col).asc())
        .limit(k)
    )
