"""Unit tests for operators/dsir.py — hashed n-gram importance
weights (the DSIR data-selection recipe, log-free). Expected values
are computed by a pure-python twin of the exact pipeline: md5-prefix
bucketing, add-one probability ratio with the operator's expression
tree, pround (floor(x·10⁶ + 0.5)/10⁶), and the DECIMAL(38,4)
half-up quantization of dsum."""

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import Row

from margaret_spark.operators.dsir import (
    _grams,  # noqa: F401  (imported to assert the module wires)
    dsir_select,
    dsir_weights,
    fit_dsir,
)

B = 8


def _bucket(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % B


def _bigrams(text: str) -> list[str]:
    ws = text.lower().split()
    return [" ".join(ws[i : i + 2]) for i in range(len(ws) - 1)]


def _pround(x: float, d: int = 6) -> float:
    import math

    s = float(10**d)
    return math.floor(x * s + 0.5) / s


def _ref_weight(text, counts, nt, nr):
    grams = _bigrams(text)
    if not grams:
        return 0, None
    total = Decimal(0)
    for g in grams:
        ct, cr = counts.get(_bucket(g), (0, 0))
        term = _pround(
            ((ct + 1) / float(nt + B)) / ((cr + 1) / float(nr + B))
        )
        total += Decimal(repr(term)).quantize(
            Decimal("0.0001"), ROUND_HALF_UP
        )
    return len(grams), _pround(float(total) / len(grams))


TARGET = ["the cat sat", "the cat ran far"]
RAW = ["buy pills now", "the cat sat on pills"]


def _ref_counts():
    counts: dict[int, list[int]] = {}
    for texts, i in ((TARGET, 0), (RAW, 1)):
        for t in texts:
            for g in _bigrams(t):
                counts.setdefault(_bucket(g), [0, 0])[i] += 1
    return {b: tuple(v) for b, v in counts.items()}


def _fit(spark):
    target = spark.createDataFrame([Row(text=t) for t in TARGET])
    raw = spark.createDataFrame([Row(text=t) for t in RAW])
    return fit_dsir(target, raw, "text", n=2, n_buckets=B)


def test_fit_counts_and_totals(spark):
    counts, nt, nr = _fit(spark)
    got = {r.bucket: (r.n_t, r.n_r) for r in counts.collect()}
    assert got == _ref_counts()
    assert nt == sum(len(_bigrams(t)) for t in TARGET)  # 2 + 3
    assert nr == sum(len(_bigrams(t)) for t in RAW)  # 2 + 4
    with pytest.raises(ValueError, match=">= 1"):
        fit_dsir(
            spark.createDataFrame([Row(text="a b")]),
            spark.createDataFrame([Row(text="a b")]),
            "text",
            n=0,
        )


def test_weights_match_python_twin(spark):
    model = _fit(spark)
    counts = _ref_counts()
    nt, nr = model[1], model[2]
    docs = [
        (0, "the cat sat"),          # target-heavy grams
        (1, "buy pills now"),        # raw-heavy grams
        (2, "zz qq"),                # unseen gram -> add-one fallback
        (3, "one"),                  # 1 token: no bigram -> NULL
        (4, None),                   # NULL text -> NULL
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_grams, r.weight)
        for r in dsir_weights(df, "doc_id", "text", model, n=2, n_buckets=B).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4}
    for i, t in docs:
        want = _ref_weight(t or "", counts, nt, nr)
        assert got[i] == want, (i, got[i], want)
    # target-like text must outweigh raw-like text, else the
    # statistic is inert and the test is vacuous
    assert got[0][1] > got[1][1]


def test_select_topk_deterministic(spark):
    model = _fit(spark)
    docs = [(i, t) for i, t in enumerate(TARGET + RAW + ["one", None])]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    all_w = {
        r.doc_id: r.weight
        for r in dsir_weights(df, "doc_id", "text", model, n=2, n_buckets=B).collect()
        if r.weight is not None
    }
    order = sorted(all_w, key=lambda i: (-all_w[i], i))
    got2 = [
        r.doc_id
        for r in dsir_select(df, "doc_id", "text", model, k=2, n=2, n_buckets=B).collect()
    ]
    assert got2 == order[:2]
    # k beyond the scoreable set returns every weighted doc, never
    # the NULL-weight ones; k=0 is empty; negative k raises
    got_all = {
        r.doc_id
        for r in dsir_select(df, "doc_id", "text", model, k=100, n=2, n_buckets=B).collect()
    }
    assert got_all == set(all_w)
    assert dsir_select(df, "doc_id", "text", model, k=0, n=2, n_buckets=B).count() == 0
    with pytest.raises(ValueError, match=">= 0"):
        dsir_select(df, "doc_id", "text", model, k=-1, n=2, n_buckets=B)
