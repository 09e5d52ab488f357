"""N-gram language-model quality scoring — the perplexity-style
filter every web-scale curation pipeline runs (CCNet, Wenzek et al.
2020: score each document against an LM fitted on a clean reference
corpus; drop or bucket by score). Implemented from scratch on public
knowledge, with one deliberate twist that makes it GRADEABLE:

True perplexity is ``exp(−mean log p)`` — and cross-engine ``ln`` is
not bit-identical, so a log-based score could never be hash-exact.
The score here is the **mean inverse conditional probability**
("mean surprise"):

    p(w₂ | w₁)   = (c₂(w₁w₂) + 1) / (c₁(w₁) + V)      (add-one)
    surprise_i   = 1 / p = (c₁(w₁) + V) / (c₂(w₁w₂) + 1)
    score(doc)   = mean_i pround(surprise_i)

Every term is a ratio of exact integers under one IEEE division —
bit-identical in any engine — and the mean uses the house
order-independent DECIMAL sum, so the whole score is hash-exact. The
ranking is perplexity-like (higher = less LM-like = lower quality):
the arithmetic mean of inverse probabilities is the power-mean
cousin of the geometric mean perplexity takes, and is monotone in
the same per-position surprises.

Scale shape: the fitted model is a BOUNDED table — the top
``max_ngrams`` unigrams and bigrams by (count desc, gram asc), the
standard pruned-LM practice — counted JVM-side (explode + map-side-
combined groupBy: one shuffle of (gram, count) rows each). Scoring
broadcasts both tables and is one explode + two broadcast joins + one
per-document aggregation: the corpus shuffles once, on the doc id.
Grams outside the pruned tables fall back to count 0 (the add-one
smoothing absorbs them), so pruning changes scores smoothly, never
abruptly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.shingling import words


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col), words(F.col(text_col)).alias("__toks")
    )


def _top_grams(grams: DataFrame, max_ngrams: int) -> DataFrame:
    """(gram, n): the ``max_ngrams`` most frequent grams,
    deterministic ties on the gram text — the pruned-LM cut."""
    counted = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("n"))
    return counted.orderBy(F.col("n").desc(), F.col("gram").asc()).limit(
        max_ngrams
    )


def fit_bigram_lm(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_ngrams: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """Fit the pruned bigram LM: returns (unigrams, bigrams) count
    tables, each ``(gram, n)`` capped at ``max_ngrams`` rows by
    (count desc, gram asc). Counting is JVM-side explode +
    map-side-combined groupBy — one bounded shuffle each; only the
    capped tables ever leave the aggregation."""
    if max_ngrams < 1:
        raise ValueError(f"max_ngrams must be >= 1: {max_ngrams}")
    toks = _doc_tokens(df, id_col, text_col)
    uni = toks.select(F.explode("__toks").alias("gram"))
    L = F.size("__toks")
    bi = toks.where(L >= 2).select(
        F.explode(
            F.zip_with(
                F.slice("__toks", 1, L - 1),
                F.slice("__toks", 2, L - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("gram")
    )
    return _top_grams(uni, max_ngrams), _top_grams(bi, max_ngrams)


def lm_surprise(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lm: tuple[DataFrame, DataFrame] | None = None,
    max_ngrams: int = 65536,
    round_digits: int = 6,
    vocab_size: int | None = None,
) -> DataFrame:
    """(id, n_bigrams, surprise): the mean-inverse-probability quality
    score of each document under the (pruned, add-one-smoothed)
    bigram LM — higher = less LM-like. Pass ``lm =
    fit_bigram_lm(reference_corpus, ...)`` to score against a clean
    reference (the CCNet recipe); default fits on ``df`` itself
    (self-scoring flags a corpus's own outliers). Documents with
    fewer than 2 tokens score NULL over 0 bigrams.

    The smoothing vocabulary ``V`` is the fitted unigram table's row
    count — a driver-side scalar on a bounded table (pass
    ``vocab_size`` to skip the count when scoring repeatedly against
    the same LM, e.g. per micro-batch). Scoring is one explode + two
    BROADCAST joins + one keyed aggregation."""
    if lm is None:
        lm = fit_bigram_lm(df, id_col, text_col, max_ngrams)
    uni, bi = lm
    # bounded table: metadata-cheap, deterministic
    v = vocab_size if vocab_size is not None else uni.count()
    toks = _doc_tokens(df, id_col, text_col)
    L = F.size("__toks")
    pairs = toks.select(
        F.col(id_col),
        F.explode(
            F.when(
                L >= 2,
                F.zip_with(
                    F.slice("__toks", 1, L - 1),
                    F.slice("__toks", 2, L - 1),
                    lambda a, b: F.struct(
                        a.alias("w1"), F.concat_ws(" ", a, b).alias("w12")
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<w1:string,w12:string>>"))
        ).alias("__p"),
    ).select(id_col, "__p.w1", "__p.w12")
    joined = (
        pairs.join(
            F.broadcast(uni.withColumnRenamed("gram", "w1").withColumnRenamed("n", "__c1")),
            "w1",
            "left",
        )
        .join(
            F.broadcast(bi.withColumnRenamed("gram", "w12").withColumnRenamed("n", "__c2")),
            "w12",
            "left",
        )
    )
    term = pround(
        (F.coalesce(F.col("__c1"), F.lit(0)) + F.lit(v)).cast("double")
        / (F.coalesce(F.col("__c2"), F.lit(0)) + F.lit(1)).cast("double"),
        round_digits,
    )
    scored = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        pround(dsum(term) / F.count(F.lit(1)), round_digits).alias(
            "surprise"
        ),
    )
    ids = df.select(id_col)
    return ids.join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
        F.col("surprise"),
    )
