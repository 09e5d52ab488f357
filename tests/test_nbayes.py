"""Unit tests for operators/nbayes.py — trainable multinomial Naive
Bayes quality classifier. Every expected value is hand-computed from
the closed-form model (add-one smoothing, prior-weighted mean inverse
conditional probability, argmin classification)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from margaret_spark.operators.nbayes import fit_nb, nb_classify, nb_scores


def _fit_fixture(spark):
    """Train corpus: per-(token,label) counts
      (x,a):3 (y,a):1 (z,a):1 (y,b):2 (z,b):1
    vocab totals x:3 y:3 z:2 -> top-2 cut keeps {x, y} (tie at 3
    broken token-ascending)."""
    train = spark.createDataFrame(
        [
            Row(doc_id=1, label="a", text="x x y"),
            Row(doc_id=2, label="a", text="x z"),
            Row(doc_id=3, label="b", text="y y z"),
        ]
    )
    return fit_nb(train, "label", "text", max_vocab=2)


def test_fit_counts_vocab_cut_and_labels(spark):
    counts, labels = _fit_fixture(spark)
    got = {(r.token, r.label): r.n for r in counts.collect()}
    # z (corpus total 2) is cut by max_vocab=2; x/y tie at 3 -> both kept
    assert got == {("x", "a"): 3, ("y", "a"): 1, ("y", "b"): 2}
    lab = {r.label: (r.n_tokens, r.n_docs) for r in labels.collect()}
    # n_tokens is the IN-VOCAB class total: a = 3+1, b = 2
    assert lab == {"a": (4, 2), "b": (2, 1)}


def test_fit_rejects_null_labels(spark):
    bad = spark.createDataFrame(
        [Row(doc_id=1, label="a", text="x"), Row(doc_id=2, label=None, text="y")]
    )
    with pytest.raises(ValueError, match="NULL"):
        fit_nb(bad, "label", "text")


def test_scores_hand_computed_with_oov(spark):
    """Doc 'x q' (q out-of-vocab): V=2, total=3 docs.
    class a (N_a=4, n_docs=2): terms x=(4+2)/(3+1)=1.5, q=(4+2)/1=6.0
      -> mean 3.75, prior scale 3/2 -> score 5.625
    class b (N_b=2, n_docs=1): terms x=(2+2)/1=4.0, q=4.0
      -> mean 4.0, prior scale 3/1 -> score 12.0"""
    model = _fit_fixture(spark)
    df = spark.createDataFrame([Row(doc_id=10, text="x q")])
    got = {
        r.label: (r.n_tokens, r.score)
        for r in nb_scores(df, "doc_id", "text", model).collect()
    }
    assert got == {"a": (2, 5.625), "b": (2, 12.0)}


def test_classify_argmin_and_zero_token_null(spark):
    model = _fit_fixture(spark)
    df = spark.createDataFrame(
        [Row(doc_id=10, text="x q"), Row(doc_id=11, text="   ")]
    )
    got = {r.doc_id: (r.pred, r.score) for r in
           nb_classify(df, "doc_id", "text", model).collect()}
    assert got[10] == ("a", 5.625)
    # zero tokens: no evidence -> surfaced as NULL, never defaulted
    assert got[11] == (None, None)


def test_classify_tie_breaks_label_ascending(spark):
    """Symmetric model: (x,a):1, (y,b):1, V=2, priors equal. An
    all-OOV doc scores 6.0 under BOTH classes -> pred 'a'."""
    train = spark.createDataFrame(
        [Row(doc_id=1, label="b", text="y"), Row(doc_id=2, label="a", text="x")]
    )
    model = fit_nb(train, "label", "text")
    df = spark.createDataFrame([Row(doc_id=10, text="zz")])
    rows = nb_classify(df, "doc_id", "text", model).collect()
    assert [(r.pred, r.score) for r in rows] == [("a", 6.0)]


def test_vocab_size_bypass_matches_counted(spark):
    model = _fit_fixture(spark)
    df = spark.createDataFrame([Row(doc_id=10, text="x y q")])
    a = nb_scores(df, "doc_id", "text", model).collect()
    b = nb_scores(df, "doc_id", "text", model, vocab_size=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_max_vocab_validation(spark):
    train = spark.createDataFrame([Row(doc_id=1, label="a", text="x")])
    with pytest.raises(ValueError, match="max_vocab"):
        fit_nb(train, "label", "text", max_vocab=0)
