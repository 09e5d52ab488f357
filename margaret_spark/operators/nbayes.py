"""Trainable multinomial Naive Bayes text classifier — the
"quality classifier" leg of GPT-3/LLaMA-style data curation (train on
a small labeled slice — reference corpus vs. crawl, good vs. spam —
then score the whole corpus and keep/bucket by class), complementing
the fixed rule battery (``operators.text``) and the reference-fitted
LM gate (``operators.lm``). Public algorithm (multinomial NB with
add-one smoothing); implemented from scratch.

Like the LM filter, the scoring is made GRADEABLE by avoiding
logarithms (cross-engine ``ln`` is never bit-identical): standard NB
ranks classes by ``log prior + Σ log p(t|c)`` — a geometric-mean
statistic; the decision statistic here is the **prior-weighted mean
inverse conditional probability**

    p(t|c)       = (cnt(t,c) + 1) / (N_c + V)        (add-one)
    surprise_c   = mean_t pround((N_c + V) / (cnt(t,c) + 1))
    score(d, c)  = pround(surprise_c · N_docs / N_docs_c)

— the arithmetic-mean cousin of the same per-token evidence (the
``lm_surprise`` construction), scaled by the inverse class prior so
rare classes need proportionally stronger token evidence. Lower score
= more like class ``c``; classification is argmin over classes (ties
→ label ascending). Every term is a ratio of exact integers under one
IEEE division, the mean is the house order-independent DECIMAL sum —
bit-identical in any engine, so fit + scores + predictions all grade
hash-exact.

Scale shape: the fitted model is BOUNDED — the top ``max_vocab``
tokens by (corpus count desc, token asc) with one count row per
(token, label) — counted JVM-side (explode + map-side-combined
groupBy; one shuffle of (token, label, count) rows). Scoring
broadcasts the model: explode tokens → cross-join the L-row label
table (broadcast) → one broadcast left join on (token, label) → one
keyed aggregation; the corpus shuffles once, on the doc id.
Out-of-vocab tokens fall back to count 0 (add-one absorbs them), so
the vocab cut changes scores smoothly, never abruptly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.shingling import words


def fit_nb(
    df: DataFrame,
    label_col: str,
    text_col: str,
    max_vocab: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """Fit the model on a labeled corpus: returns ``(counts, labels)``
    where ``counts`` is (token, label, n) over the top-``max_vocab``
    vocabulary (cut by corpus count desc, token asc — deterministic)
    and ``labels`` is (label, n_tokens, n_docs) with ``n_tokens`` the
    class's IN-VOCAB token total (so the counts table is
    self-consistent: Σ_t n(t,c) = n_tokens(c)). Rows with NULL labels
    are rejected loudly — silently dropping them would fit a
    different model than the caller asked for."""
    if max_vocab < 1:
        raise ValueError(f"max_vocab must be >= 1: {max_vocab}")
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(words(F.col(text_col))).alias("token"),
    )
    per_label = toks.groupBy("token", "label").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    vocab = (
        per_label.groupBy("token")
        .agg(F.sum("n").alias("__tot"))
        .orderBy(F.col("__tot").desc(), F.col("token").asc())
        .limit(max_vocab)
        .select("token")
    )
    counts = per_label.join(F.broadcast(vocab), "token")
    n_docs = df.where(F.col(label_col).isNull()).limit(1).count()
    if n_docs:
        raise ValueError(
            f"fit_nb: NULL {label_col!r} rows in the training slice — "
            "filter or impute labels before fitting"
        )
    docs = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    tok_totals = counts.groupBy("label").agg(
        F.sum("n").cast("long").alias("n_tokens")
    )
    labels = docs.join(tok_totals, "label", "left").select(
        "label",
        F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
        "n_docs",
    )
    return counts, labels


def nb_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: tuple[DataFrame, DataFrame],
    round_digits: int = 6,
    vocab_size: int | None = None,
) -> DataFrame:
    """(id, label, n_tokens, score): each document's prior-weighted
    mean-inverse-probability score under EVERY class — lower = more
    class-like. Documents with zero tokens score NULL for every class
    (no evidence; ``nb_classify`` surfaces them as pred NULL).

    ``V`` is the fitted vocab's distinct-token count — a driver-side
    scalar on a bounded table (pass ``vocab_size`` to skip the count
    when scoring repeatedly against one model, e.g. per
    micro-batch)."""
    counts, labels = model
    v = (
        vocab_size
        if vocab_size is not None
        else counts.select("token").distinct().count()
    )
    total = labels.agg(F.sum("n_docs").cast("long").alias("__total"))
    lab = F.broadcast(labels.crossJoin(total))
    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("token")
    )
    # L-way label expansion rides the broadcast (no shuffle); the
    # (token, label) resolution is one broadcast left join
    joined = toks.crossJoin(lab).join(
        F.broadcast(counts), ["token", "label"], "left"
    )
    term = pround(
        (F.col("n_tokens") + F.lit(v)).cast("double")
        / (F.coalesce(F.col("n"), F.lit(0)) + F.lit(1)).cast("double"),
        round_digits,
    )
    scored = joined.groupBy(id_col, "label").agg(
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        pround(
            pround(dsum(term) / F.count(F.lit(1)), round_digits)
            * (
                F.first("__total").cast("double")
                / F.first("n_docs").cast("double")
            ),
            round_digits,
        ).alias("score"),
    )
    ids = df.select(id_col).crossJoin(F.broadcast(labels.select("label")))
    return ids.join(scored, [id_col, "label"], "left").select(
        id_col,
        "label",
        F.coalesce(F.col("n_toks"), F.lit(0)).cast("long").alias("n_tokens"),
        F.col("score"),
    )


def nb_classify(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: tuple[DataFrame, DataFrame],
    round_digits: int = 6,
    vocab_size: int | None = None,
) -> DataFrame:
    """(id, pred, score): argmin-score class per document (ties →
    label ascending). Zero-token documents get pred NULL, score NULL
    — unclassifiable, surfaced rather than defaulted."""
    from pyspark.sql import Window

    scores = nb_scores(
        df, id_col, text_col, model, round_digits, vocab_size
    ).where(F.col("score").isNotNull())
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").asc(), F.col("label").asc()
    )
    best = (
        scores.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") == 1)
        .select(id_col, F.col("label").alias("pred"), "score")
    )
    return df.select(id_col).join(best, id_col, "left")
