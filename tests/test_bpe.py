"""Byte-level BPE: trainer determinism and hand-checked merges,
lossless encode/decode round trips (incl. multibyte UTF-8 the ASCII
graded oracle can't cover), Spark/local parity, and composition with
the token-budget / packing consumers."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from margaret_spark.operators.bpe import (
    DEFAULT_MERGES,
    DEFAULT_N_MERGES,
    SEED_TEXT,
    bpe_decode,
    bpe_encode,
    bpe_token_count,
    bpe_tokenize,
    pretokenize,
    train_bpe,
    train_bpe_from_word_counts,
)


def test_default_merges_reproducible_from_seed():
    """The default table is DERIVED, not magic: retraining from the
    embedded seed reproduces it exactly."""
    counts: dict[str, int] = {}
    for tok in pretokenize(SEED_TEXT):
        counts[tok] = counts.get(tok, 0) + 1
    assert (
        train_bpe_from_word_counts(sorted(counts.items()), DEFAULT_N_MERGES)
        == DEFAULT_MERGES
    )
    # every merge operand is a previously-created id or a raw byte
    for r, (a, b) in enumerate(DEFAULT_MERGES):
        assert a < 256 + r and b < 256 + r


def test_trainer_hand_example():
    """Sennrich's classic shape: in {low×5, lower×2, newest×6,
    widest×3} the most frequent adjacent pair merges first; ties
    break on the smallest id pair."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    m = train_bpe_from_word_counts(counts, 4)
    # 'es' (from newest×6 + widest×3 = 9) is the most frequent pair;
    # then 'est' (es+t, 9), then 'lo' (low 5 + lower 2 = 7)...
    assert m[0] == (ord("e"), ord("s"))
    assert m[1] == (256, ord("t"))  # (es, t)
    assert m[2] == (ord("l"), ord("o"))
    # deterministic: same input, same table
    assert train_bpe_from_word_counts(counts, 4) == m
    # singleton pairs are never merged (no memorizing the sample)
    assert train_bpe_from_word_counts([("ab", 1), ("cd", 1)], 8) == []


def test_encode_applies_lowest_rank_first():
    # merges: (a,b)->256 rank0, (256,c)->257 rank1, (b,c)->258 rank2.
    # "abc" must become [257] (rank0 then rank1), never [97, 258].
    merges = [(97, 98), (256, 99), (98, 99)]
    assert bpe_encode("abc", merges) == [257]
    # overlapping same-pair run merges left-to-right: aaa -> (aa) a
    merges2 = [(97, 97)]
    assert bpe_encode("aaa", merges2) == [256, 97]
    assert bpe_encode("aaaa", merges2) == [256, 256]


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=80))
def test_round_trip_lossless(s):
    """decode(encode(s)) == UTF-8 bytes of s — for ANY text, any
    characters (byte fallback: no unknown tokens)."""
    assert bpe_decode(bpe_encode(s)) == s.encode("utf-8")
    assert "".join(pretokenize(s)) == s


def test_multibyte_and_edge_inputs():
    for s in ["héllo wörld", "汉字 test", "a b", "  ", "'", "it's"]:
        ids = bpe_encode(s)
        assert bpe_decode(ids) == s.encode("utf-8")
    assert bpe_encode("") == []
    # contraction suffix splits like GPT-2
    assert pretokenize("it's fine") == ["it", "'s", " fine"]


def test_train_bpe_distributed_matches_local(spark):
    rows = [(i, t) for i, t in enumerate(
        ["low low lower", "newest newest widest", "low newest", ""]
    )]
    df = spark.createDataFrame(rows, "id long, text string")
    got = train_bpe(df, "text", n_merges=6)
    counts: dict[str, int] = {}
    for _i, t in rows:
        for tok in pretokenize(t):
            counts[tok] = counts.get(tok, 0) + 1
    want = train_bpe_from_word_counts(sorted(counts.items()), 6)
    assert got == want
    # partitioning must not change the table
    assert train_bpe(df.repartition(7), "text", n_merges=6) == want


def test_bpe_tokenize_spark_matches_local(spark):
    texts = ["the quick table scan", "stream of values", None, ""]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["token_ids"]
        for r in bpe_tokenize(df, "doc_id", "text").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == (None if t is None else bpe_encode(t))
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in bpe_token_count(df, "doc_id", "text").collect()
    }
    assert counts[2] == 0 and counts[3] == 0
    assert counts[0] == len(bpe_encode(texts[0]))


def test_bpe_counts_feed_packing_and_budget(spark):
    """The real token counts slot straight into pack_sequences and
    token_budget_sample (both take a tokens_col)."""
    from margaret_spark.operators.packing import pack_sequences
    from margaret_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(i, "the stream of values " * (i + 1), "s") for i in range(4)],
        "doc_id long, text string, source string",
    )
    counted = df.join(bpe_token_count(df, "doc_id", "text"), "doc_id")
    packed = pack_sequences(counted, "doc_id", "n_tokens", seq_len=16).collect()
    lens = {
        r["doc_id"]: len(bpe_encode("the stream of values " * (r["doc_id"] + 1)))
        for r in packed
    }
    cum = 0
    by_id = {r["doc_id"]: r for r in packed}
    for i in sorted(lens):
        r = by_id[i]
        assert r["n_tokens"] == lens[i]
        assert r["pack_first"] == cum // 16
        assert r["offset_in_first"] == cum % 16
        cum += lens[i]
        assert r["pack_last"] == (cum - 1) // 16
    kept = token_budget_sample(counted, "source", "doc_id", "n_tokens", 40)
    assert {r["doc_id"] for r in kept.collect()} <= set(lens)
    with pytest.raises(ValueError):
        token_budget_sample(counted, "source", "doc_id", "n_tokens", -1)


def test_bpe_token_count_col_matches_operator(spark):
    """The composable count Column (the streaming-ingest projection)
    equals the bpe_token_count operator row for row, NULL → 0."""
    from pyspark.sql import functions as F

    from margaret_spark.operators.bpe import (
        bpe_token_count,
        bpe_token_count_col,
    )

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "the the the"), (3, None), (4, "")],
        "id long, text string",
    )
    via_op = {
        r["id"]: r["n_tokens"]
        for r in bpe_token_count(df, "id", "text").collect()
    }
    via_col = {
        r["id"]: r["n"]
        for r in df.select(
            "id", bpe_token_count_col(F.col("text")).alias("n")
        ).collect()
    }
    assert via_col == via_op
    assert via_col[3] == 0 and via_col[4] == 0
