"""Pipeline-operator tests over the driver testdata (sf0.001) plus
small synthetic fixtures for the semantics-sensitive cases."""

import pytest

from pyspark.sql import functions as F

from margaret_spark.operators.dedup import (
    embedding_dedup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash,
    simhash_dedup_pairs,
)
from margaret_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
from margaret_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_stats,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark):
    df = spark.createDataFrame(
        [(0, "aa"), (1, "bb"), (2, "aa"), (3, "aa")], "id long, text string"
    )
    rows = {r["keep_id"]: r["dup_count"] for r in exact_dedup(df, "id", "text").collect()}
    assert rows == {0: 3, 1: 1}


NEAR_DUP_DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),  # near-dup of 0
    (2, "a completely different sentence with other words entirely"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
]


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.5).collect()
    }
    assert pairs[(0, 3)] == 1.0
    assert (0, 1) in pairs and pairs[(0, 1)] < 1.0
    assert not any(2 in p for p in pairs)


def test_mem_corpus_mutation_recounts(spark):
    """The derived-stats cache must MISS when a mem-backed corpus
    mutates between two relative max_df resolutions: MemLog builds a
    fresh createDataFrame relation per call and local relations fold
    their DATA into semanticHash, so no stale row count can be
    served (the _plan_key freshness contract for non-file sources)."""
    from pyspark.sql import types as T

    from margaret_spark.log import MemLog
    from margaret_spark.operators.dedup import _resolve_max_df

    log = MemLog(spark, value_type=T.StringType())
    for i in range(4):
        log.append(f"doc {i}")
    assert _resolve_max_df(log.df(), 0.5) == 2
    # cached: same contents resolve without a recount (and identically)
    assert _resolve_max_df(log.df(), 0.5) == 2
    for i in range(4):
        log.append(f"doc {i + 4}")
    assert _resolve_max_df(log.df(), 0.5) == 4  # recounted, not stale


def test_jaccard_max_df_forms(spark):
    from margaret_spark.operators.dedup import _resolve_max_df

    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    # "auto" floor (100) keeps a small corpus uncapped: identical result
    base = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.5).collect()
    }
    auto = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.5, max_df="auto").collect()
    }
    assert auto == base and (0, 3) in auto
    # fraction form resolves relative to corpus size
    assert _resolve_max_df(df, 0.5) == 2
    assert _resolve_max_df(df, "auto") == 100
    assert _resolve_max_df(df, 3) == 3
    assert _resolve_max_df(df, None) is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _resolve_max_df(df, 1.5)
    # a fraction cap that drops the ubiquitous shingles still finds the
    # exact dup (its pair survives on the rarer shingles)
    capped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            df, "id", "text", threshold=0.9, max_df=0.6
        ).collect()
    }
    assert (0, 3) in capped


def test_jaccard_capped_paths_agree(spark, monkeypatch):
    """The three capped-path strategies (empty stop list → uncapped
    plan, small stop list → array_except literal, large stop list →
    checkpointed broadcast anti-join) must be result-identical — only
    the physical plan differs."""
    from margaret_spark.operators import dedup as D

    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    key = lambda rows: sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in rows)
    literal = key(
        ngram_jaccard_pairs(df, "id", "text", threshold=0.1, max_df=0.6).collect()
    )
    monkeypatch.setattr(D, "_STOP_LITERAL_CAP", 0)  # force the fallback
    fallback = key(
        ngram_jaccard_pairs(df, "id", "text", threshold=0.1, max_df=0.6).collect()
    )
    monkeypatch.undo()
    assert literal == fallback and literal


def test_minhash_agrees_with_exact(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"])
        for r in minhash_dedup_pairs(df, "id", "text", threshold=0.5).collect()
    }
    # verified candidates are a subset of exact; the exact dup must survive
    assert mh <= exact
    assert (0, 3) in mh


def test_simhash_near_dups(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    sigs = {r["id"]: r["simhash"] for r in simhash(df, "id", "text").collect()}
    assert sigs[0] == sigs[3]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dedup_pairs(df, "id", "text", max_hamming=16).collect()
    }
    assert pairs[(0, 3)] == 0
    assert (0, 1) in pairs


def test_embedding_dedup_and_topk(spark):
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0], 0),  # near-dup of 0
        (2, [0.0, 1.0, 0.0], 0),
        (3, [0.0, 0.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_dedup_pairs(
            df, "vec_id", "embedding", threshold=0.99, block_col="label"
        ).collect()
    }
    assert pairs == {(0, 1)}

    topk = brute_force_topk(df, df.where(F.col("vec_id") == 0), k=2)
    got = [(r["neighbor_id"], r["rank"]) for r in topk.collect()]
    assert got == [(1, 1), (2, 2)]


def test_embedding_dedup_ivf_candidates(emb):
    """The IVF-cell candidate mode: every pair it emits must appear in
    the exact all-pairs result with the same cosine (candidates are a
    subset — a pair split across cells is a designed miss), and
    same-cell pairs must ALL be found (within-cell exactness)."""
    from margaret_spark.operators.dedup import embedding_dedup_pairs_ivf

    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_dedup_pairs(
            emb, "vec_id", "embedding", threshold=0.4
        ).collect()
    }
    ivf = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_dedup_pairs_ivf(
            emb, "vec_id", "embedding", threshold=0.4, nlist=8
        ).collect()
    }
    assert ivf  # non-degenerate at this threshold
    for pair, cos in ivf.items():
        assert exact[pair] == cos
    # within-cell exactness: recompute the cell of each id and check
    # every exact pair that landed in one cell was emitted
    from margaret_spark.operators.similarity import _nearest_cells
    from margaret_spark.functions.vectors import l2_norm

    cents = F.broadcast(
        emb.orderBy(F.col("vec_id").asc())
        .limit(8)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("embedding").alias("__cent"),
            l2_norm(F.col("embedding")).alias("__centn"),
        )
    )
    cell = {
        r["id"]: r["cent_id"]
        for r in _nearest_cells(emb, cents, "vec_id", "embedding", "id", 1, 6).collect()
    }
    for (a, b), _ in exact.items():
        if cell[a] == cell[b]:
            assert (a, b) in ivf


def test_lsh_topk_on_real_embeddings(emb):
    queries = emb.where(F.col("vec_id") < 3)
    exact = brute_force_topk(emb, queries, k=5)
    approx = lsh_bucketed_topk(emb, queries, k=5, nbits=4)
    # LSH results must be genuine vectors with correct cosines: every
    # (query, neighbor, cosine) it returns must appear in the exact
    # scoring (rank may differ due to bucketing)
    ex = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=10**6).collect()
    }
    for r in approx.collect():
        assert ex[(r["query_id"], r["neighbor_id"])] == r["cosine"]
    assert approx.groupBy("query_id").count().collect()  # non-degenerate


def test_range_search_consistent_with_topk(spark, emb):
    from margaret_spark.operators.similarity import brute_force_topk, range_search

    queries = emb.where(F.col("vec_id") < 3)
    topk = brute_force_topk(emb, queries, k=5).collect()
    radius = 0.1
    rng = {
        (r.query_id, r.neighbor_id): r.cosine
        for r in range_search(emb, queries, radius=radius).collect()
    }
    # every top-k hit above the radius must appear with the same cosine
    for r in topk:
        if r.cosine >= radius:
            assert rng[(r.query_id, r.neighbor_id)] == r.cosine
    # and nothing below the radius leaks in
    assert all(c >= radius for c in rng.values())


def test_int8_quantization_model(spark, emb):
    """Codes match the numpy model per vector (scale = max|x|/127,
    half-up rounding), reconstruction error is bounded by scale/2,
    and the zero vector quantizes to scale 0 / all-zero codes."""
    import numpy as np

    from margaret_spark.operators.quantize import quantize_embeddings

    src = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
           for r in emb.limit(50).collect()}
    got = {
        r["vec_id"]: (r["scale"], r["codes"])
        for r in quantize_embeddings(emb.limit(50), "vec_id", "embedding").collect()
    }
    for vid, x in src.items():
        scale, codes = got[vid]
        ma = float(np.abs(x).max())
        assert scale == ma / 127.0
        if ma == 0:
            assert all(c == 0 for c in codes)
            continue
        want = np.floor(x / scale + 0.5).astype(int)
        assert list(want) == codes
        assert max(abs(c) for c in codes) <= 127
        recon = np.asarray(codes) * scale
        assert float(np.abs(recon - x).max()) <= scale / 2 + 1e-12

    z = spark.createDataFrame([(0, [0.0] * 4)], "vec_id long, embedding array<float>")
    from margaret_spark.operators.quantize import quantize_embeddings as qe

    r = qe(z, "vec_id", "embedding").collect()[0]
    assert r["scale"] == 0.0 and r["codes"] == [0, 0, 0, 0]


def test_int8_topk_close_to_exact(spark, emb):
    """Quantized-cosine ranking must stay close to the float truth:
    qcosine within 0.03 of the exact cosine for every returned pair,
    recall@5 vs brute force >= 0.8 on the test corpus, zero-norm
    vectors excluded rather than NaN-ranked."""
    from margaret_spark.operators.quantize import int8_topk

    queries = emb.where(F.col("vec_id") < 5)
    approx = int8_topk(emb, queries, k=5).collect()
    exact_all = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=10**6).collect()
    }
    exact5 = {}
    for r in brute_force_topk(emb, queries, k=5).collect():
        exact5.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in approx:
        assert abs(r["qcosine"] - exact_all[(r["query_id"], r["neighbor_id"])]) <= 0.03
        total += 1
        hits += r["neighbor_id"] in exact5[r["query_id"]]
    assert total == 5 * 5
    assert hits / total >= 0.8

    z = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 0.0]), (2, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    out = int8_topk(z, z, k=5).collect()
    ids = {r["query_id"] for r in out} | {r["neighbor_id"] for r in out}
    assert 1 not in ids  # the zero vector neither queries nor matches


def test_token_stats_and_quality(docs):
    st = token_stats(docs, "doc_id", "text")
    row = st.where(F.col("doc_id") == 0).collect()[0]
    assert row["n_tokens"] > 0 and row["n_chars"] > 0
    assert st.where(F.col("n_tokens") <= 0).count() == 0
    q = quality_score(docs, "doc_id", "text")
    bad = q.where((F.col("quality") < 0) | (F.col("quality") > 1)).count()
    assert bad == 0


def test_repetition_score(spark):
    from margaret_spark.operators.text import repetition_score

    fixtures = [
        (0, "a b c a b c a b c"),      # "a b c" trigram repeats heavily
        (1, "one two three four five"),  # all trigrams distinct
        (2, "x y"),                     # too short: score 0
        (3, ""),
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    got = {r.doc_id: r.repetition for r in repetition_score(df, "doc_id", "text").collect()}
    # doc0: 7 trigrams, 3 distinct -> 4/7
    assert got[0] == round(4 / 7, 4)
    assert got[1] == 0.0
    assert got[2] == 0.0 and got[3] == 0.0


def test_ngram_contamination(spark):
    from margaret_spark.operators.dedup import ngram_contamination

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),       # shares "alpha beta gamma" etc.
            (1, "one two three four"),            # no overlap
            (2, "alpha beta gamma epsilon zeta"),
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta extra")], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_matched, r.contamination)
        for r in ngram_contamination(corpus, eval_df, "doc_id", "text").collect()
    }
    # doc0 trigrams: {a b g, b g d} both in eval -> 2/2
    assert got[0] == (2, 2, 1.0)
    assert got[1][1] == 0 and got[1][2] == 0.0
    # doc2 trigrams: {a b g, b g e, g e z}; only "alpha beta gamma" matches
    assert got[2] == (3, 1, round(1 / 3, 6))


def test_lang_id_heuristic(spark, docs):
    # NOTE: the driver's synthetic corpus assigns `lang` labels at
    # random over identical word-soup text, so agreement with the label
    # is not meaningful there. Verify the heuristic on real-language
    # fixtures + determinism on the corpus.
    fixtures = [
        (0, "the cat and the dog went to the market", "en"),
        (1, "der Hund und die Katze ist nicht ein Tier", "de"),
        (2, "el perro y la casa es que en un lugar", "es"),
        (3, "le chien et la maison est dans les champs", "fr"),
        (4, "这是 一个 中文 文档 测试", "zh"),
        (5, "xyzzy plugh qwerty", "und"),
        # widened table: more Latin stopword languages…
        (6, "il cane non sono con la casa per un giorno", "it"),
        (7, "o cachorro e um gato para a casa com ele", "pt"),
        (8, "de hond en het huis is een dier dat niet", "nl"),
        (9, "hunden och huset är det som en plats för dem", "sv"),
        (10, "pies i dom to nie jest na co się do niego", "pl"),
        (11, "bir köpek ve bu ev için ne kadar çok ama", "tr"),
        # …and script-range detection (ja outranks zh despite kanji)
        (12, "日本語のテキストです、漢字もある", "ja"),
        (13, "한국어 텍스트 입니다", "ko"),
        (14, "это русский текст для теста", "ru"),
        (15, "αυτό είναι ελληνικό κείμενο", "el"),
        (16, "זהו טקסט בעברית", "he"),
        (17, "هذا نص باللغة العربية", "ar"),
        (18, "यह हिन्दी में पाठ है", "hi"),
        (19, "นี่คือข้อความภาษาไทย", "th"),
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in fixtures], "doc_id long, text string")
    got = {r["doc_id"]: r["pred_lang"] for r in lang_id(df, "doc_id", "text").collect()}
    assert got == {i: lang for i, _, lang in fixtures}
    # deterministic over the real corpus (two runs identical)
    a = sorted(map(tuple, lang_id(docs, "doc_id", "text").collect()))
    b = sorted(map(tuple, lang_id(docs, "doc_id", "text").collect()))
    assert a == b


def test_quality_rule_flags(spark):
    from margaret_spark.operators.text import quality_rule_flags

    fixtures = [
        (0, "the quick brown fox jumps over the lazy dog again today", True),
        (1, "too short", False),                       # < 8 tokens
        (2, "1 2 3 4 5 6 7 8 9 10 11 12", False),      # symbol soup + short tokens
        (3, "a a a a a a a a a a a a", False),          # no diversity
        (4, "zrqx wvut plmk nhgt bfdc xswz qazx edcv rfvb tgbn", False),  # no stopwords
    ]
    df = spark.createDataFrame([(i, t) for i, t, _ in fixtures], "id long, text string")
    got = {r["id"]: r for r in quality_rule_flags(df, "id", "text").collect()}
    for i, _t, keep in fixtures:
        assert got[i]["keep"] == keep, (i, dict(got[i].asDict()))
    assert not got[1]["ok_length"]
    assert not got[3]["ok_diversity"]
    assert not got[4]["ok_stopwords"]
    assert got[0]["stopword_hits"] >= 2


def test_cohort_retention(spark):
    import datetime

    from margaret_spark.operators.temporal import cohort_retention

    # two users: u1 first active week 0, returns week 2; u2 week 1 only
    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = [
        (1, base),
        (1, base + datetime.timedelta(days=1)),   # same week, dedup'd
        (1, base + datetime.timedelta(days=14)),  # offset 2
        (2, base + datetime.timedelta(days=7)),   # own cohort, offset 0
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["cohort_week"].isoformat(), r["week_offset"]): r["n_users"]
        for r in cohort_retention(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_bpe_token_count_and_fingerprint(spark):
    df = spark.createDataFrame([(0, "Hello, world 42!"), (1, "")], "id long, text string")
    counts = {r["id"]: r["n_bpe_tokens"] for r in bpe_ish_token_count(df, "id", "text").collect()}
    # Hello , world 42 !  -> 5
    assert counts == {0: 5, 1: 0}
    fps = {r["id"]: r["fingerprint"] for r in doc_fingerprint(df, "id", "text").collect()}
    # reference implementation in pure python
    def rolling(s):
        acc = 0
        for ch in s.lower():
            acc = (acc * 31 + ord(ch)) % 1_000_000_007
        return acc
    assert fps[0] == rolling("Hello, world 42!")
    assert fps[1] == 0


def test_multimodal_plumbing(spark):
    from margaret_spark.operators.multimodal import (
        decode_image,
        extract_image_meta,
        make_fake_image_blob,
        resize_image,
        sample_video_frames,
    )

    rows = [(0, make_fake_image_blob(8, 6, 3)), (1, make_fake_image_blob(4, 4, 1))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")

    meta = {r["doc_id"]: (r["format"], r["width"], r["height"], r["channels"])
            for r in extract_image_meta(df, "doc_id", "blob").collect()}
    assert meta == {0: ("fimg", 8, 6, 3), 1: ("fimg", 4, 4, 1)}

    decoded = {r["doc_id"]: r for r in decode_image(df, "doc_id", "blob", fake=True).collect()}
    assert decoded[0]["width"] == 8 and len(decoded[0]["pixels"]) == 8 * 6 * 3

    with pytest.raises(Exception):  # stub path surfaces NotImplementedError
        decode_image(df, "doc_id", "blob", fake=False).collect()

    resized = resize_image(df, "doc_id", "blob", 2, 2, fake=True).collect()
    assert all(bytes(r["blob"][:4]) == b"FIMG" for r in resized)

    frames = sample_video_frames(df, "doc_id", "blob", every_n=1, fake=True).collect()
    assert len(frames) == 3 + 1  # channels double as frame count in the fake


def _py_lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_pairs_lossless(spark):
    """The PassJoin blocking must EQUAL brute force — including empty
    strings, strings shorter than tau+1 (the unsegmentable residual),
    and repeated content."""
    import random

    from margaret_spark.operators.dedup import edit_distance_pairs

    rng = random.Random(7)
    for tau, maxlen in [(1, 10), (2, 6)]:
        strs = [
            "".join(rng.choice("ab") for _ in range(rng.randint(0, maxlen)))
            for _ in range(50)
        ]
        df = spark.createDataFrame(list(enumerate(strs)), "id long, t string")
        got = {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_pairs(df, "id", "t", max_dist=tau).collect()
        }
        expect = {
            (i, j): _py_lev(strs[i], strs[j])
            for i in range(len(strs))
            for j in range(i + 1, len(strs))
            if _py_lev(strs[i], strs[j]) <= tau
        }
        assert got == expect, (tau, set(expect) - set(got), set(got) - set(expect))


def test_incremental_exact_dedup(spark):
    from margaret_spark.operators.dedup import incremental_exact_dedup

    existing = spark.createDataFrame(
        [(0, "alpha"), (1, "beta")], "id long, text string"
    )
    new = spark.createDataFrame(
        [(10, "alpha"), (11, "gamma"), (12, "gamma"), (13, "delta")],
        "id long, text string",
    )
    got = {
        r["id"]: r["status"]
        for r in incremental_exact_dedup(new, existing, "id", "text").collect()
    }
    assert got == {
        10: "dup_of_existing",
        11: "new",
        12: "dup_in_batch",
        13: "new",
    }
    # NULL text must not vanish: it forms its own content class
    new_with_null = spark.createDataFrame(
        [(20, None), (21, None), (22, "alpha")], "id long, text string"
    )
    got = {
        r["id"]: r["status"]
        for r in incremental_exact_dedup(new_with_null, existing, "id", "text").collect()
    }
    assert got == {20: "new", 21: "dup_in_batch", 22: "dup_of_existing"}


def test_table_diff(spark):
    from margaret_spark.functions.diff import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 21.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["status"] for r in table_diff(old, new, "k").collect()}
    # 3 is unchanged (incl. the NULL column) and must not appear
    assert got == {1: "removed", 2: "changed", 4: "added"}
    # NULL vs the string 'null' must not collide (length-prefixed hash)
    a = spark.createDataFrame([(1, None)], "k long, s string")
    b = spark.createDataFrame([(1, "\x00")], "k long, s string")
    assert {r["k"]: r["status"] for r in table_diff(a, b, "k").collect()} == {
        1: "changed"
    }
    # NULL keys join null-safely: the same NULL-keyed row in both
    # versions is unchanged, not a phantom added+removed pair
    c = spark.createDataFrame([(None, "x"), (5, "y")], "k long, s string")
    d = spark.createDataFrame([(None, "x"), (5, "z")], "k long, s string")
    assert {r["k"]: r["status"] for r in table_diff(c, d, "k").collect()} == {
        5: "changed"
    }


def test_fuzzy_pairs(spark):
    from margaret_spark.operators.dedup import fuzzy_pairs

    rows = [
        (0, "red widget"),
        (1, "red widgets"),   # dist 1, same block (r, 10//4==11//4? 2 vs 2) ✓
        (2, "red wadget"),    # dist 1 to 0
        (3, "blue widget"),   # different first char: never a candidate
        (4, "red bolt"),      # same first char, len 8 -> bucket 2: candidate, dist > 2
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {(r["id_a"], r["id_b"]): r["dist"] for r in
           fuzzy_pairs(df, "id", "name", max_dist=2).collect()}
    assert got == {(0, 1): 1, (0, 2): 1, (1, 2): 2}
    # verification is exact: no candidate with dist > max_dist survives
    loose = fuzzy_pairs(df, "id", "name", max_dist=9).collect()
    assert all(r["dist"] <= 9 for r in loose)
    assert (0, 4) in {(r["id_a"], r["id_b"]) for r in loose}  # same block, caught at 9


def test_dedup_clusters(spark):
    from margaret_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(1, 7)], "doc_id long, text string")
    # components: {1,2,3} (chained), {5,6}, singleton {4}
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.8), (5, 6, 0.7)], "id_a long, id_b long, jaccard double"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_dedup_clusters_long_chain(spark):
    from margaret_spark.operators.dedup import dedup_clusters

    n = 12  # diameter > 1 forces multiple propagation rounds
    docs = spark.createDataFrame([(i, "") for i in range(n)], "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "id_a long, id_b long, jaccard double"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs, "doc_id").collect()}
    assert got == {i: 0 for i in range(n)}


def test_ivf_full_probe_matches_brute_force(spark):
    from margaret_spark.operators.similarity import brute_force_topk, ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where("vec_id < 3")
    # probing every cell makes IVF exhaustive -> identical to brute force
    nlist = 8
    ivf = ivf_topk(emb, queries, k=5, nlist=nlist, nprobe=nlist).collect()
    bf = brute_force_topk(emb, queries, k=5).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in ivf)) == \
           sorted(((r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in bf))


def test_top_terms(spark):
    from margaret_spark.operators.text import top_terms

    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "a c"), (2, "b")], "doc_id long, text string"
    )
    rows = top_terms(docs, "doc_id", "text", k=2).collect()
    # df: a=2, b=2, c=1 -> top2 by (df desc, token asc) = a, b
    assert [(r["token"], r["doc_freq"], r["total_count"]) for r in rows] == [
        ("a", 2, 3), ("b", 2, 2)
    ]


def test_audio_plumbing(spark):
    from margaret_spark.operators.multimodal import (
        audio_features,
        extract_audio_meta,
        make_fake_audio_blob,
    )

    rows = [(0, make_fake_audio_blob(16000, 32000, 1)), (1, make_fake_audio_blob(8000, 8000, 2))]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    meta = {r["doc_id"]: (r["format"], r["sample_rate"], r["n_samples"], r["duration_s"])
            for r in extract_audio_meta(df, "doc_id", "blob").collect()}
    assert meta == {0: ("faud", 16000, 32000, 2.0), 1: ("faud", 8000, 8000, 1.0)}

    feats = {r["doc_id"]: r for r in audio_features(df, "doc_id", "blob", fake=True).collect()}
    assert feats[0]["rms"] > 0 and feats[0]["zero_crossings"] >= 0

    with pytest.raises(Exception):
        audio_features(df, "doc_id", "blob", fake=False).collect()


def test_curate_corpus(spark):
    from margaret_spark.operators.pipeline import curate_corpus

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "!!!! ???? 1234 5678"),  # low quality
            (3, "completely unrelated text about spark engines and parquet files"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in curate_corpus(
        docs, "doc_id", "text", min_quality=0.5, jaccard_threshold=0.3
    ).collect()}
    # 0 and 1 are near-dups -> same cluster, only 0 is canonical
    assert rows[0]["cluster_id"] == 0 and rows[1]["cluster_id"] == 0
    assert rows[0]["keep"] and not rows[1]["keep"]
    # 2 fails the quality bar even though it is its own cluster
    assert rows[2]["cluster_id"] == 2 and not rows[2]["keep"]
    assert rows[3]["keep"]


def test_training_pipeline_end_to_end(spark):
    from margaret_spark.operators.pipeline import training_pipeline

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy dog again and again today"),
            (2, "!!!! ???? 1234 5678"),  # low quality -> dropped
            (3, "completely unrelated text about spark engines and parquet files"),
        ],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in training_pipeline(
            docs,
            "doc_id",
            "text",
            min_quality=0.5,
            jaccard_threshold=0.3,
            test_fraction=0.5,
            seq_len=8,
        ).collect()
    }
    # only canonical + quality docs survive
    assert set(rows) == {0, 3}
    for r in rows.values():
        assert r.split in ("train", "test")
        if r.split == "train":
            # packed: contiguous stream positions in doc_id order
            assert r.pack_first is not None and r.pack_first >= 0
            assert r.pack_last >= r.pack_first
            assert 0 <= r.offset_in_first < 8
        else:
            assert r.pack_first is None
    # the token stream is contiguous: total tokens of train docs equals
    # last doc's end position
    train = [rows[i] for i in sorted(rows) if rows[i].split == "train"]
    if train:
        total = sum(r.n_tokens for r in train)
        last = train[-1]
        assert last.pack_last * 8 + (total - 1) % 8 >= last.pack_first * 8


def test_salted_agg_matches_plain(spark):
    from pyspark.sql import functions as F
    from margaret_spark.functions.skew import salted_agg, salted_distinct_count

    # one hot key (90% of rows) + long tail
    rows = [("hot" if i % 10 else f"k{i}", i % 7, float(i)) for i in range(2000)]
    df = spark.createDataFrame(rows, "k string, v long, x double")

    plain = {
        r["k"]: (r["n"], r["sum_v"])
        for r in df.groupBy("k").agg(F.count("*").alias("n"), F.sum("v").alias("sum_v")).collect()
    }
    salted = {
        r["k"]: (r["n"], r["sum_v"])
        for r in salted_agg(
            df, ["k"],
            partial_aggs=[F.count("*").alias("__n"), F.sum("v").alias("__s")],
            merge_aggs=[F.sum("__n").alias("n"), F.sum("__s").cast("long").alias("sum_v")],
            salt=8,
        ).collect()
    }
    assert salted == plain

    plain_dc = {
        r["k"]: r["dc"] for r in df.groupBy("k").agg(F.countDistinct("v").alias("dc")).collect()
    }
    salted_dc = {
        r["k"]: r["distinct_count"]
        for r in salted_distinct_count(df, ["k"], "v", salt=8).collect()
    }
    assert salted_dc == plain_dc


def test_salt_spreads_identical_rows(spark):
    """A hot key of IDENTICAL rows (the count(*)-per-key projection —
    only the key column survives) must still spread across salt
    buckets: a pure content hash would map every row to ONE bucket
    and the mitigation would silently do nothing."""
    from pyspark.sql import functions as F
    from margaret_spark.functions.skew import salted_agg, with_salt

    df = spark.range(0, 2000).select(F.lit("hot").alias("k")).repartition(8)
    n_buckets = with_salt(df, 16).select("__salt").distinct().count()
    assert n_buckets > 4  # spread, not funneled

    got = {
        (r["k"], r["n"])
        for r in salted_agg(
            df, ["k"],
            partial_aggs=[F.count("*").alias("__n")],
            merge_aggs=[F.sum("__n").cast("long").alias("n")],
            salt=16,
        ).collect()
    }
    assert got == {("hot", 2000)}


def test_salted_join_matches_plain(spark):
    from pyspark.sql import functions as F
    from margaret_spark.functions.skew import salted_join

    # left side: one hot key dominates; right side: several rows per key
    big_rows = [("hot" if i % 5 else f"k{i}", i) for i in range(1000)]
    other_rows = [(k, j, k + str(j)) for k in ["hot", "k5", "k10"] for j in range(3)]
    big = spark.createDataFrame(big_rows, "k string, v long")
    other = spark.createDataFrame(other_rows, "k string, j long, tag string")

    plain = sorted(
        tuple(r) for r in big.join(other, "k").select("k", "v", "j", "tag").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(big, other, "k", salt=8)
        .select("k", "v", "j", "tag")
        .collect()
    )
    assert salted == plain
    # the join key space actually includes the salt column
    plan = (
        salted_join(big, other, "k", salt=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan


def test_scd2_merge_history(spark):
    """Two sequential merges build the expected validity intervals;
    an identical batch is a no-op; schema mismatch raises."""
    from margaret_spark.functions.diff import scd2_merge

    def rows(df):
        return sorted(
            (r["k"], r["v"], r["valid_from"], r["valid_to"]) for r in df.collect()
        )

    current = spark.createDataFrame(
        [(1, "a", 1, None), (2, "b", 1, None), (3, "c", 1, None)],
        "k long, v string, valid_from int, valid_to int",
    )
    # v2: k=1 changed, k=2 identical, k=3 absent, k=4 inserted
    v2 = spark.createDataFrame(
        [(1, "a2"), (2, "b"), (4, "d")], "k long, v string"
    )
    h2 = scd2_merge(current, v2, "k", version=2)
    assert rows(h2) == [
        (1, "a", 1, 2),
        (1, "a2", 2, None),
        (2, "b", 1, None),
        (3, "c", 1, None),
        (4, "d", 2, None),
    ]
    # v3: change k=1 again — closed history untouched, intervals chain
    h3 = scd2_merge(h2, spark.createDataFrame([(1, "a3")], "k long, v string"),
                    "k", version=3)
    assert rows(h3) == [
        (1, "a", 1, 2),
        (1, "a2", 2, 3),
        (1, "a3", 3, None),
        (2, "b", 1, None),
        (3, "c", 1, None),
        (4, "d", 2, None),
    ]
    # identical batch -> no-op
    same = spark.createDataFrame([(2, "b"), (3, "c")], "k long, v string")
    assert rows(scd2_merge(h3, same, "k", version=4)) == rows(h3)
    with pytest.raises(ValueError):
        scd2_merge(h3, spark.createDataFrame([(9,)], "k long"), "k", version=5)

    # point-in-time lookup: k=1 resolves to the version valid at the
    # probe; a pre-existence probe (k=4 at v1) yields NULL attributes
    from margaret_spark.functions.diff import scd2_lookup

    probes = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 3), (1, 99), (4, 1), (4, 2), (5, 2)],
        "k long, t int",
    )
    got = {
        (r["k"], r["t"]): r["v"]
        for r in scd2_lookup(probes, h3, "k", "t").collect()
    }
    assert got == {
        (1, 1): "a",
        (1, 2): "a2",
        (1, 3): "a3",
        (1, 99): "a3",   # open row is unbounded
        (4, 1): None,    # did not exist yet
        (4, 2): "d",
        (5, 2): None,    # unknown key
    }


def test_key_skew_report(spark):
    """Top-k heavy hitters with deterministic tie ranking; shares sum
    to 1 when k covers every key; k validation."""
    import pytest as _pytest
    from margaret_spark.functions.skew import key_skew_report

    rows = [("hot",)] * 6 + [("warm",)] * 3 + [("a",)] * 2 + [("b",)] * 2 + [("cold",)]
    df = spark.createDataFrame(rows, "k string")
    got = [
        (r["k"], r["n"], r["share"], r["rank"])
        for r in key_skew_report(df, "k", k=3).orderBy("rank").collect()
    ]
    import math

    def pr(x):  # the operator prounds shares to 6 digits
        return math.floor(x * 1e6 + 0.5) / 1e6

    # a/b tie on n=2 -> key order breaks the tie
    assert got == [
        ("hot", 6, pr(6 / 14), 1),
        ("warm", 3, pr(3 / 14), 2),
        ("a", 2, pr(2 / 14), 3),
    ]
    full = key_skew_report(df, "k", k=100).collect()
    assert len(full) == 5
    assert abs(sum(r["share"] for r in full) - 1.0) < 1e-5
    with _pytest.raises(ValueError):
        key_skew_report(df, "k", k=0)
    # empty input: no rows, no division-by-zero
    assert key_skew_report(df.where(F.lit(False)), "k").collect() == []


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Equal-bucketed tables co-locate join keys: the join's executed
    plan must contain NO Exchange (the 100 TB co-located-join path)."""
    from margaret_spark.sources.writers import write_bucketed

    a = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("x")
    )
    b = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("y")
    )
    write_bucketed(a, "t_bkt_a", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed(b, "t_bkt_b", ["k"], num_buckets=8, sort_cols=["k"])
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path these tiny fixtures would
        # otherwise take: at scale both sides are too big to broadcast
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ta = spark.table("t_bkt_a")
        tb = spark.table("t_bkt_b")
        joined = ta.join(tb, "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
        spark.sql("DROP TABLE IF EXISTS t_bkt_a")
        spark.sql("DROP TABLE IF EXISTS t_bkt_b")


def test_kmeans_refined_ivf(spark, emb):
    from margaret_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        kmeans_centroids,
    )

    cents = kmeans_centroids(emb, k=4, iters=2)
    rows = cents.collect()
    assert len(rows) == 4 and all(len(r["cent"]) == 64 for r in rows)
    # deterministic across recomputation
    again = kmeans_centroids(emb, k=4, iters=2).collect()
    assert sorted((r["cent_id"], tuple(r["cent"])) for r in rows) == sorted(
        (r["cent_id"], tuple(r["cent"])) for r in again
    )

    queries = emb.where(F.col("vec_id") < 3)
    refined = ivf_topk(emb, queries, k=5, nlist=4, nprobe=2, centroids=cents)
    # every returned cosine must be a genuine exact score
    ex = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in brute_force_topk(emb, queries, k=10**6).collect()
    }
    out = refined.collect()
    assert len(out) > 0
    for r in out:
        assert ex[(r["query_id"], r["neighbor_id"])] == r["cosine"]


def test_ivf_index_matches_inflight(spark, emb, tmp_path):
    from margaret_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_search,
        ivf_topk,
        kmeans_centroids,
    )
    from margaret_spark.plans.inspect import explain_str

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, nlist=8)
    queries = emb.where(F.col("vec_id") < 3)
    indexed = ivf_index_search(spark, path, queries, k=5, nprobe=3)
    inflight = ivf_topk(emb, queries, k=5, nlist=8, nprobe=3)
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in rows
    )
    assert key(indexed.collect()) == key(inflight.collect())

    # the probe join must prune unprobed cells at the scan
    assert "dynamicpruning" in explain_str(indexed).lower()

    # kmeans-refined build: same results as in-flight with the same cells
    path2 = str(tmp_path / "ivf_km")
    cents = build_ivf_index(emb, path2, nlist=4, kmeans_iters=2)
    indexed_km = ivf_index_search(spark, path2, queries, k=5, nprobe=2)
    inflight_km = ivf_topk(
        emb, queries, k=5, nlist=4, nprobe=2,
        centroids=kmeans_centroids(emb, k=4, iters=2),
    )
    assert key(indexed_km.collect()) == key(inflight_km.collect())
    assert cents.count() == 4


def test_constraint_report(spark):
    from margaret_spark.operators import constraints as C

    df = spark.createDataFrame(
        [
            (1, "a", 5.0),
            (1, "b", -1.0),          # dup id, out-of-range v
            (None, "c", 2.0),        # null id
            (3, None, 3.0),          # null s (matches/in_set skip NULLs)
            (4, "zz", 1e12),         # bad pattern, out-of-range
        ],
        "id long, s string, v double",
    )
    ref = spark.createDataFrame([(1,), (3,)], "k long")
    rows = {
        (r["rule"], r["column"]): (r["violations"], r["total"], r["ok"])
        for r in C.constraint_report(
            df,
            [
                C.not_null("id"),
                C.unique("id"),
                C.in_range("v", 0.0, 100.0),
                C.matches("s", "^[a-c]$"),
                C.in_set("s", ["a", "b", "c"]),
                C.foreign_key("id", ref, "k"),
            ],
        ).collect()
    }
    assert rows[("not_null", "id")] == (1, 5, False)
    assert rows[("unique", "id")] == (1, 5, False)       # two 1s -> 1 extra
    assert rows[("in_range", "v")] == (2, 5, False)      # -1 and 1e12
    assert rows[("matches", "s")] == (1, 5, False)       # only 'zz'; NULL skipped
    assert rows[("in_set", "s")] == (1, 5, False)
    assert rows[("foreign_key", "id")] == (1, 5, False)  # id=4 orphaned
    # all-clean table
    clean = C.constraint_report(
        spark.createDataFrame([(1, "a", 1.0)], "id long, s string, v double"),
        [C.not_null("id"), C.unique("id"), C.in_range("v", 0.0, 2.0)],
    ).collect()
    assert all(r["ok"] for r in clean)
    with pytest.raises(ValueError):
        C.constraint_report(df, [("bogus", "id")])


def test_constraint_fk_broadcast_size_gate(spark):
    """A reference side above the gate must NOT be force-broadcast —
    the anti-join plans as a shuffle join, never a driver-materialized
    broadcast of a fact-sized table. (Auto-broadcast is disabled so
    the assertion sees only the effect of the explicit hint; the
    report's 1-row total crossJoin is excluded by matching
    BroadcastHashJoin, not the nested-loop join.)"""
    from margaret_spark.operators import constraints as C
    from margaret_spark.plans.inspect import explain_str

    child = spark.range(100).selectExpr("id as fk")
    big_ref = spark.range(10_000).selectExpr("id as k")
    small_ref = spark.range(10).selectExpr("id as k")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        gated = C.constraint_report(
            child, [C.foreign_key("fk", big_ref, "k")], fk_broadcast_rows=1_000
        )
        row = gated.collect()[0]
        assert (row["violations"], row["ok"]) == (0, True)
        assert "broadcasthashjoin" not in explain_str(gated).lower()

        # small reference still gets the hint
        hinted = C.constraint_report(
            child, [C.foreign_key("fk", small_ref, "k")], fk_broadcast_rows=1_000
        )
        assert "broadcasthashjoin" in explain_str(hinted).lower()

        # fk_broadcast_rows=None: no probe job, optimizer decides
        free = C.constraint_report(
            child, [C.foreign_key("fk", big_ref, "k")], fk_broadcast_rows=None
        )
        assert free.collect()[0]["ok"] is True
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_minhash_bands_validation(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    with pytest.raises(ValueError, match="bands"):
        minhash_dedup_pairs(df, "id", "text", num_hashes=32, bands=64).collect()
    with pytest.raises(ValueError, match="bands"):
        minhash_dedup_pairs(df, "id", "text", num_hashes=32, bands=5).collect()


def test_lsh_empty_corpus_returns_empty(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = lsh_bucketed_topk(empty, empty, k=3)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "cosine", "rank",
    ]


def test_kmeans_keeps_empty_cells(spark):
    from margaret_spark.operators.similarity import kmeans_centroids

    # two identical init vectors: every row ties to the lower cent_id,
    # which used to empty (and silently drop) the other cell
    rows = [
        (0, [1.0, 0.0]), (1, [1.0, 0.0]),
        (2, [0.9, 0.1]), (3, [0.8, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = kmeans_centroids(df, k=2, iters=2)
    assert cents.count() == 2  # the starved cell keeps its previous centroid


def test_simhash_validations_and_exact_match_mode(spark):
    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    # max_hamming=0 = exact-signature match (the 64-bit mask used to
    # overflow a long literal); the exact dup pair must surface
    pairs = {(r["id_a"], r["id_b"]) for r in
             simhash_dedup_pairs(df, "id", "text", max_hamming=0).collect()}
    assert (0, 3) in pairs
    with pytest.raises(ValueError, match="bits"):
        simhash(df, "id", "text", bits=128)
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_dedup_pairs(df, "id", "text", max_hamming=64)


def test_dedup_clusters_string_ids(spark):
    from margaret_spark.operators.dedup import dedup_clusters

    docs = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "id string"
    )
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    got = {r["id"]: r["cluster_id"] for r in dedup_clusters(docs, pairs, "id").collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "d"}


def test_running_total_preserves_double(spark):
    from margaret_spark.operators.packing import running_total

    df = spark.createDataFrame([(1, 0.5), (2, 0.75), (3, 1.25)], "id long, w double")
    got = {r["id"]: r["running_total"] for r in
           running_total(df, "w", "id").collect()}
    assert got == {1: 0.5, 2: 1.25, 3: 2.5}


def test_sample_video_frames_rejects_non_fake_blobs(spark):
    from margaret_spark.operators.multimodal import sample_video_frames

    df = spark.createDataFrame([(1, b"X" * 20)], "id long, blob binary")
    with pytest.raises(Exception):  # NotImplementedError inside the task
        sample_video_frames(df, "id", "blob", fake=True).collect()


def test_chunk_documents_model(spark):
    """Chunk boundaries vs a sequential python model, plus edges:
    empty doc (one empty chunk), exact-fit, overlap sharing."""
    from margaret_spark.operators.chunking import chunk_documents

    docs = [
        (0, ""),                           # no tokens -> 1 empty chunk
        (5, None),                         # NULL text == empty text
        (1, "a b c"),                      # n < chunk -> 1 chunk
        (2, " ".join(f"t{i}" for i in range(10))),   # exact fit 10 = chunk
        (3, " ".join(f"t{i}" for i in range(11))),   # one past -> 2 chunks
        (4, " ".join(f"t{i}" for i in range(57))),   # many
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        (r["id"], r["chunk_idx"]): (
            r["start_tok"], r["end_tok"], r["n_tokens"], r["chunk_text"]
        )
        for r in chunk_documents(df, "id", "text", chunk_tokens=10, overlap=3).collect()
    }

    def model(text, chunk=10, ov=3):
        toks = [t for t in text.lower().split() if t]
        n = len(toks)
        stride = chunk - ov
        nc = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
        out = {}
        for i in range(nc):
            s, e = i * stride, min(i * stride + chunk, n)
            out[i] = (s, e, e - s, " ".join(toks[s:e]))
        return out

    for did, text in docs:
        m = model(text or "")
        mine = {ci: v for (d, ci), v in got.items() if d == did}
        assert mine == m, (did, mine, m)
    # consecutive chunks share exactly `overlap` tokens
    for (d, ci), (s, e, _n, _t) in got.items():
        if (d, ci + 1) in got:
            s2 = got[(d, ci + 1)][0]
            assert e - s2 in (3, e - s2)  # = overlap unless final short chunk
    # validation
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=10, overlap=10).collect()
    with pytest.raises(ValueError):
        chunk_documents(df, "id", "text", chunk_tokens=0).collect()
    # zero shuffles, no UDFs: pure codegen fan-out (JVM source so the
    # plan check sees only the operator, not createDataFrame's RDD)
    from margaret_spark.plans.inspect import explain_str

    jvm_df = spark.range(4).selectExpr("id", "repeat('w ', 20) as text")
    plan = explain_str(chunk_documents(jvm_df, "id", "text"))
    assert "Exchange" not in plan and "Python" not in plan


def test_pagerank_fixed_points_and_conservation(spark):
    """Closed-form checks: a 2-cycle is a fixed point at 1/2 each; a
    symmetric 3-cycle at 1/3; total rank is conserved (≈1) on graphs
    with no dangling nodes; parallel edges weight contributions."""
    from margaret_spark.operators.graph import pagerank

    def run(edges, **kw):
        df = spark.createDataFrame(edges, "src long, dst long")
        return {
            r["node"]: r["rank"] for r in pagerank(df, "src", "dst", **kw).collect()
        }

    cycle2 = run([(0, 1), (1, 0)], iterations=4)
    assert cycle2 == {0: 0.5, 1: 0.5}
    cycle3 = run([(0, 1), (1, 2), (2, 0)], iterations=5)
    assert all(abs(v - 1 / 3) < 1e-6 for v in cycle3.values())
    # star + return edges: hub outranks leaves; total conserved
    star = run(
        [(1, 0), (2, 0), (3, 0), (0, 1), (0, 2), (0, 3)], iterations=8
    )
    assert star[0] > star[1] == star[2] == star[3]
    assert abs(sum(star.values()) - 1.0) < 1e-6
    # parallel edges double a contribution: 0 sends 2/3 to 1, 1/3 to 2
    par = run([(0, 1), (0, 1), (0, 2), (1, 0), (2, 0)], iterations=20)
    assert par[1] > par[2]
    with pytest.raises(ValueError):
        run([(0, 1)], iterations=0)
    with pytest.raises(ValueError):
        run([(0, 1)], damping=1.5)


def test_collocations_rational_pmi(spark):
    """Collocation scores match the closed-form rational PMI; the
    min-count floor filters noise; ranking is deterministic."""
    import math

    from margaret_spark.operators.text import collocations

    # "new york" appears 4x; "of the" 3x; "a b" once (filtered at 2)
    docs = [
        (0, "new york is big new york is old"),
        (1, "the best of the city of the north new york"),
        (2, "a b new york of the"),
    ]
    df = spark.createDataFrame(docs, "id long, text string")
    got = {
        (r["w1"], r["w2"]): (r["c_pair"], r["score"], r["rank"])
        for r in collocations(df, "id", "text", k=10, min_count=2).collect()
    }
    assert ("a", "b") not in got  # below the floor
    toks = [t for _, x in docs for t in x.lower().split()]
    T = float(len(toks))

    def pmi(w1, w2, c):
        raw = (c * T) / (toks.count(w1) * toks.count(w2))
        return math.floor(raw * 1e6 + 0.5) / 1e6

    assert got[("new", "york")][0] == 4
    assert got[("new", "york")][1] == pmi("new", "york", 4.0)
    assert got[("of", "the")][0] == 3
    assert got[("of", "the")][1] == pmi("of", "the", 3.0)
    ranks = [v[2] for v in got.values()]
    assert sorted(ranks) == list(range(1, len(got) + 1))
    with pytest.raises(ValueError):
        collocations(df, "id", "text", k=0)
    with pytest.raises(ValueError):
        collocations(df, "id", "text", min_count=0)


def test_pii_scan_and_redact(spark):
    from margaret_spark.operators.pii import pii_redact, pii_scan

    df = spark.createDataFrame(
        [
            (0, "mail me at jane.doe+x@sub.example.org today"),
            (1, "server at 10.0.255.3 and backup 192.168.1.1"),
            (2, "call +1 (415) 555-0138 now"),
            (3, "clean text with no identifiers at all"),
            (4, "both a@b.io and 8.8.8.8 and 555-123-4567"),
            (5, ""),
        ],
        "id long, text string",
    )
    scan = {r["id"]: r for r in pii_scan(df, "id", "text").collect()}
    assert (scan[0]["n_emails"], scan[0]["has_pii"]) == (1, True)
    assert scan[1]["n_ipv4"] == 2
    assert scan[2]["n_phones"] == 1
    assert (
        scan[3]["n_emails"], scan[3]["n_ipv4"], scan[3]["n_phones"],
        scan[3]["has_pii"],
    ) == (0, 0, 0, False)
    assert (scan[4]["n_emails"], scan[4]["n_ipv4"], scan[4]["n_phones"]) == (1, 1, 1)
    assert scan[5]["has_pii"] is False

    red = {r["id"]: r["redacted"] for r in pii_redact(df, "id", "text").collect()}
    assert red[0] == "mail me at [EMAIL] today"
    assert red[1] == "server at [IP] and backup [IP]"
    assert red[2] == "call [PHONE] now"
    assert red[3] == "clean text with no identifiers at all"
    assert red[4] == "both [EMAIL] and [IP] and [PHONE]"
    # redaction order: the email is consumed BEFORE the phone pass, so
    # its digit run never leaks a partial [PHONE]
    leak = spark.createDataFrame(
        [(0, "reach 12345678@corp.net ok")], "id long, text string"
    )
    assert pii_redact(leak, "id", "text").collect()[0]["redacted"] == "reach [EMAIL] ok"

    # pure codegen: no shuffle, no Python
    from margaret_spark.plans.inspect import explain_str

    jvm = spark.range(3).selectExpr("id", "'a@b.co 1.2.3.4' as text")
    for op in (pii_scan, pii_redact):
        plan = explain_str(op(jvm, "id", "text"))
        assert "Exchange" not in plan and "Python" not in plan


def test_ann_recall_at_k(emb):
    from margaret_spark.operators.similarity import ann_recall_at_k

    queries = emb.where(F.col("vec_id") < 4)
    # probing every cell makes the IVF exhaustive: recall exactly 1
    full = ann_recall_at_k(
        emb, queries, "vec_id", "embedding", k=5, nlist=8, nprobe=8
    ).collect()
    assert len(full) == 4
    assert all(r["recall"] == 1.0 and r["n_hits"] == r["n_exact"] for r in full)
    # recall is bounded and counts are consistent with a narrow probe
    narrow = ann_recall_at_k(
        emb, queries, "vec_id", "embedding", k=5, nlist=8, nprobe=1
    ).collect()
    for r in narrow:
        assert 0.0 <= r["recall"] <= 1.0
        assert 0 <= r["n_hits"] <= r["n_exact"] <= 5


def test_quality_percentile(spark):
    from margaret_spark.operators.text import quality_percentile

    df = spark.createDataFrame(
        [
            (0, "a short one", "s1"),
            (1, "a much longer document with several distinct words here", "s1"),
            (2, "middling text of some words", "s1"),
            (3, "lone document in its source", "s2"),
        ],
        "id long, text string, src string",
    )
    rows = {r["id"]: r for r in quality_percentile(df, "id", "text", "src").collect()}
    s1 = sorted((rows[i]["quality"], rows[i]["pctile"]) for i in (0, 1, 2))
    # percent rank spans 0..1 in quality order within the group
    assert [p for _q, p in s1] == [0.0, 0.5, 1.0]
    # single-row group scores 0 (SQL percent_rank definition)
    assert rows[3]["pctile"] == 0.0


def test_ivf_index_append_matches_full_rebuild(spark, emb, tmp_path):
    """Appending new vectors to a persisted IVF index (frozen
    centroids) must search identically to an in-flight IVF over the
    UNION with the same centroids — and identically to an index built
    from the union with those centroids."""
    from margaret_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_append,
        ivf_index_search,
        ivf_topk,
    )

    old = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    path = str(tmp_path / "ivf")
    cents = build_ivf_index(old, path, nlist=8)
    ivf_index_append(spark, path, new)

    queries = emb.where(F.col("vec_id") < 4)
    via_index = ivf_index_search(spark, path, queries, k=5, nprobe=3)
    via_flight = ivf_topk(
        emb, queries, k=5, nlist=8, nprobe=3,
        centroids=cents.select("cent_id", "cent"),
    )
    key = lambda rows: sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"]) for r in rows
    )
    assert key(via_index.collect()) == key(via_flight.collect())
    # appended rows landed inside the partitioned layout (no rewrite)
    import os

    assert any(d.startswith("cell=") for d in os.listdir(path + "/cells"))


def test_ngram_jaccard_join_cross_corpus(spark, monkeypatch):
    """The cross-corpus join must equal the self-join's pairs
    restricted to cross-side combinations, under every capped-path
    strategy (empty / literal / anti-join fallback)."""
    from margaret_spark.operators import dedup as D
    from margaret_spark.operators.dedup import ngram_jaccard_join

    df = spark.createDataFrame(NEAR_DUP_DOCS, "id long, text string")
    left = df.where(F.col("id") % 2 == 0)   # ids 0, 2
    right = df.where(F.col("id") % 2 == 1)  # ids 1, 3
    expect = {
        (a, b): j
        for (a, b), j in (
            ((r["id_a"], r["id_b"]), r["jaccard"])
            for r in ngram_jaccard_pairs(df, "id", "text", threshold=0.1).collect()
        )
        if (a % 2 == 0) != (b % 2 == 0)
    }
    # self-join emits id_a < id_b; the cross join emits (left, right) —
    # normalize to sorted tuples for comparison
    norm = lambda rows: {
        tuple(sorted((r["left_id"], r["right_id"]))): r["jaccard"] for r in rows
    }
    got = norm(
        ngram_jaccard_join(left, right, "id", "text", threshold=0.1).collect()
    )
    assert got == {tuple(sorted(k)): v for k, v in expect.items()} and got

    # capped literal path and forced fallback agree
    lit = norm(
        ngram_jaccard_join(
            left, right, "id", "text", threshold=0.1, max_df=0.6
        ).collect()
    )
    monkeypatch.setattr(D, "_STOP_LITERAL_CAP", 0)
    fb = norm(
        ngram_jaccard_join(
            left, right, "id", "text", threshold=0.1, max_df=0.6
        ).collect()
    )
    monkeypatch.undo()
    assert lit == fb


def test_duplicate_spans_semantics(spark):
    from margaret_spark.operators.dedup import duplicate_spans

    # A and B share the 10-token run t1..t10 (tokens 3..12 of A,
    # 1..10 of B); with n=4 every start in the run is duplicated and
    # the positions merge into ONE maximal span per doc. C is noise.
    shared = " ".join(f"t{i}" for i in range(1, 11))
    rows = [
        (1, "x1 x2 " + shared + " x3 x4"),
        (2, shared),
        (3, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in duplicate_spans(df, "doc_id", "text", n=4).collect()
    }
    assert spans == {(1, 3, 12, 10), (2, 1, 10, 10)}


def test_duplicate_spans_gap_splits_islands(spark):
    from margaret_spark.operators.dedup import duplicate_spans

    # Two shared runs separated by >n unshared tokens in doc 1 must
    # surface as TWO spans, not one.
    a = "a1 a2 a3 a4"
    b = "b1 b2 b3 b4"
    rows = [
        (1, a + " g1 g2 g3 g4 g5 " + b),
        (2, a),
        (3, b),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, "doc_id", "text", n=4).collect()
    )
    assert got == [(1, 1, 4), (1, 10, 13), (2, 1, 4), (3, 1, 4)]


def test_duplicate_spans_scope_any_vs_cross_doc(spark):
    from margaret_spark.operators.dedup import duplicate_spans

    # The repeated phrase lives only WITHIN doc 1: invisible to
    # cross_doc, found twice by scope='any'.
    phrase = "p1 p2 p3 p4"
    df = spark.createDataFrame(
        [(1, phrase + " mid1 mid2 mid3 mid4 mid5 " + phrase), (2, "z1 z2 z3 z4")],
        "doc_id long, text string",
    )
    assert duplicate_spans(df, "doc_id", "text", n=4).count() == 0
    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, "doc_id", "text", n=4, scope="any").collect()
    )
    assert got == [(1, 1, 4), (1, 10, 13)]


def test_duplicate_span_stats_fractions(spark):
    from margaret_spark.operators.dedup import duplicate_span_stats

    shared = "s1 s2 s3 s4"
    df = spark.createDataFrame(
        [
            (1, shared + " only in one"),          # 4 of 7 tokens duplicated
            (2, shared),                            # fully duplicated
            (3, "n1 n2 n3 n4 n5"),                  # clean
            (4, None),                              # NULL text -> 0 tokens
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_fraction)
        for r in duplicate_span_stats(df, "doc_id", "text", n=4).collect()
    }
    assert got[1] == (7, 4, round(4 / 7, 6))
    assert got[2] == (4, 4, 1.0)
    assert got[3] == (5, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_duplicate_spans_short_docs_and_validation(spark):
    import pytest as _pytest
    from margaret_spark.operators.dedup import duplicate_spans

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c")], "doc_id long, text string"
    )
    # identical docs, but both are shorter than n: no gram, no span
    assert duplicate_spans(df, "doc_id", "text", n=4).count() == 0
    with _pytest.raises(ValueError):
        duplicate_spans(df, "doc_id", "text", n=0)
    with _pytest.raises(ValueError):
        duplicate_spans(df, "doc_id", "text", scope="bogus")


def test_cut_duplicate_spans_keep_first(spark):
    from margaret_spark.operators.dedup import cut_duplicate_spans

    shared = "s1 s2 s3 s4"
    rows = [
        (1, "a b " + shared + " c"),   # owner: keeps everything
        (2, shared + " x y z"),        # later doc: loses the run
        (3, "q r s t"),                # clean
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
           for r in cut_duplicate_spans(df, "doc_id", "text", n=4).collect()}
    assert got[1] == ("a b s1 s2 s3 s4 c", 7, 0)
    assert got[2] == ("x y z", 7, 4)
    assert got[3] == ("q r s t", 4, 0)


def test_cut_duplicate_spans_fully_duplicated_doc(spark):
    from margaret_spark.operators.dedup import cut_duplicate_spans

    t = "w1 w2 w3 w4 w5"
    df = spark.createDataFrame(
        [(1, t), (2, t), (3, None)], "doc_id long, text string"
    )
    got = {r.doc_id: (r.clean_text, r.removed_tokens)
           for r in cut_duplicate_spans(df, "doc_id", "text", n=4).collect()}
    assert got[1] == (t, 0)       # owner untouched
    assert got[2] == ("", 5)      # later copy fully cut
    assert got[3] == ("", 0)      # NULL text -> empty, nothing removed


def test_cut_matches_span_report(spark):
    # every token the report marks duplicated in a non-owner doc must
    # be gone from the cut output of that doc
    from margaret_spark.operators.dedup import (
        cut_duplicate_spans,
        duplicate_spans,
    )

    rows = [
        (1, "h1 h2 h3 h4 mid m2 m3 m4 t1 t2 t3 t4"),
        (2, "h1 h2 h3 h4 zz zz2 zz3 zz4 t1 t2 t3 t4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cut = {r.doc_id: r for r in cut_duplicate_spans(df, "doc_id", "text", n=4).collect()}
    spans2 = [
        (r.span_start, r.span_end)
        for r in duplicate_spans(df, "doc_id", "text", n=4).collect()
        if r.doc_id == 2
    ]
    removed = sum(e - s + 1 for s, e in spans2)
    assert cut[2].removed_tokens == removed
    assert cut[1].removed_tokens == 0


def test_triangle_stats_k4_and_path(spark):
    from margaret_spark.operators.graph import triangle_stats

    # K4 on 1..4 (some edges reversed/duplicated + a self-loop: the
    # canonicalization must absorb all of it) plus a pendant path 5-6
    edges = [
        (1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (3, 4), (2, 4), (2, 4),
        (5, 5), (5, 6),
    ]
    df = spark.createDataFrame(edges, "s long, d long")
    got = {r.node: (r.degree, r.triangles, r.clustering_coeff)
           for r in triangle_stats(df, "s", "d").collect()}
    for v in (1, 2, 3, 4):
        assert got[v] == (3, 3, 1.0), (v, got[v])
    assert got[5] == (1, 0, 0.0)
    assert got[6] == (1, 0, 0.0)


def test_triangle_stats_open_triad(spark):
    from margaret_spark.operators.graph import triangle_stats

    # open triad 1-2-3 plus closing edge for 4-5-6: coefficient
    # distinguishes the two shapes
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (5, 6), (4, 6)], "s long, d long"
    )
    got = {r.node: (r.degree, r.triangles, r.clustering_coeff)
           for r in triangle_stats(df, "s", "d").collect()}
    assert got[2] == (2, 0, 0.0)
    assert got[5] == (2, 1, 1.0)
    assert got[1] == (1, 0, 0.0)


def test_kmeans_deterministic_separated_clusters(spark):
    from margaret_spark.operators.similarity import kmeans_assign_deterministic

    # two well-separated direction groups in 4-d: whatever the seeds,
    # two refinements must put each group in one cell
    rows = []
    for i in range(6):
        rows.append((i, [10.0 + i * 0.1, 1.0, 0.0, 0.0]))
    for i in range(6, 12):
        rows.append((i, [0.0, 0.1, 9.0 + i * 0.1, 2.0]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign_deterministic(df, k=2, iters=2).collect()
    cells = {}
    for r in out:
        cells.setdefault(r.cent_id, set()).add(r.vec_id)
    assert len(out) == 12
    groups = sorted(frozenset(v) for v in cells.values())
    assert groups == sorted(
        [frozenset(range(6)), frozenset(range(6, 12))]
    )
    # rerun is bit-identical (determinism, not just same partition)
    again = kmeans_assign_deterministic(df, k=2, iters=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_kmeans_deterministic_k_never_shrinks(spark):
    from margaret_spark.operators.similarity import kmeans_assign_deterministic

    # duplicate seed vectors: the tie sends every row to the lower
    # cent_id, but the empty cell must survive with its old centroid
    # (k preserved, no crash) and every vector still gets assigned
    rows = [(i, [1.0, 0.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_assign_deterministic(df, k=2, iters=2).collect()
    assert len(out) == 4
    assert {r.cent_id for r in out} == {0}


def test_kmeans_deterministic_iters_zero_is_seed_assignment(spark):
    from margaret_spark.operators.similarity import (
        kmeans_assign_deterministic,
    )

    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [0.9, 0.1]),
        (3, [0.1, 0.9]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r.vec_id: r.cent_id
           for r in kmeans_assign_deterministic(df, k=2, iters=0).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_histogram_exact_counts(spark):
    from margaret_spark.operators.profiling import histogram

    rows = [(i, float(i)) for i in range(10)]  # values 0..9
    df = spark.createDataFrame(rows, "id long, v double")
    got = {r.bucket: (r.lo_edge, r.hi_edge, r.n)
           for r in histogram(df, "v", bins=3).collect()}
    # width = 3.0: [0,3) [3,6) [6,9], top edge closes the last bucket
    assert got[0] == (0.0, 3.0, 3)
    assert got[1] == (3.0, 6.0, 3)
    assert got[2] == (6.0, 9.0, 4)
    total = sum(v[2] for v in got.values())
    assert total == 10


def test_histogram_grouped_degenerate_and_bounds(spark):
    from margaret_spark.operators.profiling import histogram

    df = spark.createDataFrame(
        [("a", 5.0), ("a", 5.0), ("b", 5.0), ("b", None)],
        "g string, v double",
    )
    # degenerate column (hi == lo): single bucket, NULLs dropped
    got = {(r.g, r.bucket): r.n
           for r in histogram(df, "v", bins=4, group_col="g").collect()}
    assert got == {("a", 0): 2, ("b", 0): 1}
    # explicit bounds drop out-of-range rows instead of clamping
    df2 = spark.createDataFrame(
        [(0.5,), (1.5,), (99.0,)], "v double"
    )
    kept = histogram(df2, "v", bins=2, lo=0.0, hi=2.0).collect()
    assert sum(r.n for r in kept) == 2
    # all-NULL column yields an empty frame with the right schema
    df3 = spark.createDataFrame([(None,), (None,)], "v double")
    empty = histogram(df3, "v", bins=2)
    assert empty.count() == 0
    assert empty.columns == ["bucket", "lo_edge", "hi_edge", "n"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        histogram(df2, "v", bins=0)


def test_cut_duplicate_spans_first_occurrence_mode(spark):
    from margaret_spark.operators.dedup import cut_duplicate_spans

    phrase = "p1 p2 p3 p4"
    rows = [
        # doc 1 repeats the phrase internally; doc 2 repeats it again
        (1, phrase + " gap1 gap2 gap3 gap4 gap5 " + phrase),
        (2, phrase),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # first_doc: doc 1 (owner) keeps BOTH internal copies, doc 2 loses its copy
    fd = {r.doc_id: r.clean_text
          for r in cut_duplicate_spans(df, "doc_id", "text", n=4).collect()}
    assert fd[1] == rows[0][1]
    assert fd[2] == ""
    # first_occurrence: only the doc-1 leading copy survives anywhere
    fo = {r.doc_id: (r.clean_text, r.removed_tokens)
          for r in cut_duplicate_spans(
              df, "doc_id", "text", n=4, keep="first_occurrence").collect()}
    assert fo[1] == (phrase + " gap1 gap2 gap3 gap4 gap5", 4)
    assert fo[2] == ("", 4)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        cut_duplicate_spans(df, "doc_id", "text", keep="bogus")


def test_cut_contaminated_spans(spark):
    from margaret_spark.operators.dedup import cut_contaminated_spans

    ev = spark.createDataFrame(
        [(100, "secret bench question one"), (101, "another eval item here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [
            # quotes the benchmark mid-document -> only the quote goes
            (1, "intro words secret bench question one outro words"),
            (2, "totally clean document text"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.clean_text, r.n_tokens, r.removed_tokens)
           for r in cut_contaminated_spans(
               corpus, ev, "doc_id", "text", n=3).collect()}
    assert got[1] == ("intro words outro words", 8, 4)
    assert got[2] == ("totally clean document text", 4, 0)
    assert got[3] == ("", 0, 0)
    # eval docs themselves are NOT in the output (caller passes the rest)
    assert set(got) == {1, 2, 3}


def test_lsh_nbits_bounds(spark):
    import pytest as _pytest

    from margaret_spark.operators.similarity import lsh_bucketed_topk

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError):
        lsh_bucketed_topk(df, df, nbits=64)
    with _pytest.raises(ValueError):
        lsh_bucketed_topk(df, df, nbits=0)


def test_ivf_int8_index_recall_vs_float_index(spark, emb, tmp_path):
    """The int8 IVF index must (a) partition the corpus exactly like
    the float index (same seeded centroids → same cells), (b) store
    codes/scales/integer norms instead of float vectors, and (c) rank
    within-cell candidates close enough to the float index that
    recall@5 against it stays >= 0.8 (quantized cosine drifts at most
    a few ranks on the test corpus)."""
    from margaret_spark.operators.quantize import (
        build_ivf_index_int8,
        ivf_index_search_int8,
    )
    from margaret_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_search,
    )

    fpath, qpath = str(tmp_path / "f"), str(tmp_path / "q")
    build_ivf_index(emb, fpath, nlist=16)
    build_ivf_index_int8(emb, qpath, nlist=16)

    # same cell membership, ~4x smaller payload schema
    fcells = {
        (r["cell"], r["id"]) for r in spark.read.parquet(f"{fpath}/cells").select("cell", "id").collect()
    }
    qdf = spark.read.parquet(f"{qpath}/cells")
    qcells = {(r["cell"], r["id"]) for r in qdf.select("cell", "id").collect()}
    assert qcells == fcells
    assert {f.name for f in qdf.schema.fields} == {
        "cell", "id", "scale", "codes", "cnrm"
    }

    queries = emb.where(F.col("vec_id") < 5)
    fl = {}
    for r in ivf_index_search(spark, fpath, queries, k=5, nprobe=4).collect():
        fl.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = total = 0
    for r in ivf_index_search_int8(
        spark, qpath, queries, k=5, nprobe=4
    ).collect():
        total += 1
        hits += r["neighbor_id"] in fl[r["query_id"]]
    assert total == 5 * 5
    assert hits / total >= 0.8


def test_lm_surprise_hand_checked_and_reference_fit(spark):
    """Mean inverse add-one probability against hand-computed values;
    the reference-fit path (CCNet recipe) scores unseen text higher
    than in-distribution text; short/NULL docs score NULL over 0."""
    from margaret_spark.operators.lm import fit_bigram_lm, lm_surprise

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "the cat sat"),
            (3, "zq xv qqq"),
            (4, "one"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_bigrams"], r["surprise"])
        for r in lm_surprise(docs, "doc_id", "text", max_ngrams=100).collect()
    }
    # V = 9 distinct unigrams. doc 3: both bigrams (1+9)/(1+1) = 5.0;
    # doc 2: (3+9)/(2+1) = 4.0 and (2+9)/(2+1) = 3.666667, summed at
    # the DECIMAL(38,4) dsum scale: (4.0000 + 3.6667)/2 = 3.83335
    assert out[3] == (2, 5.0)
    assert out[2] == (2, 3.83335)
    assert out[4] == (0, None) and out[5] == (0, None)

    ref = docs.where(F.col("doc_id") <= 2)  # clean reference corpus
    lm = fit_bigram_lm(ref, "doc_id", "text", max_ngrams=100)
    scored = {
        r["doc_id"]: r["surprise"]
        for r in lm_surprise(
            docs.where(F.col("doc_id").isin(2, 3)),
            "doc_id",
            "text",
            lm=lm,
        ).collect()
    }
    # in-distribution text scores lower (more LM-like) than junk
    assert scored[2] < scored[3]


def test_lm_pruning_cut_is_deterministic(spark):
    """The top-K gram cut orders by (count desc, gram asc): with K=1
    and tied counts, the lexicographically smallest gram survives."""
    from margaret_spark.operators.lm import fit_bigram_lm

    docs = spark.createDataFrame(
        [(1, "bb aa"), (2, "aa bb")], "doc_id long, text string"
    )
    uni, _bi = fit_bigram_lm(docs, "doc_id", "text", max_ngrams=1)
    assert [r["gram"] for r in uni.collect()] == ["aa"]


def test_winnow_guarantee_and_density(spark):
    """Winnowing contract (Schleimer et al. 2003): any shared token
    run of >= w+k-1 tokens yields a shared fingerprint; selected
    density stays near 2/(w+1); sub-k-token docs emit nothing; within
    one doc the same window-min is recorded once (distinct set)."""
    from margaret_spark.operators.text import winnow_fingerprints

    k, w = 4, 4
    shared = "alpha beta gamma delta epsilon zeta eta"  # w+k-1 = 7 toks
    docs = spark.createDataFrame(
        [
            (1, "p q r " + shared + " s t u v w x y z"),
            (2, shared + " one two three four five six"),
            (3, "tiny doc"),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = winnow_fingerprints(docs, "doc_id", "text", k=k, w=w)
    by_doc: dict = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["fp"]))
    assert 3 not in by_doc and 4 not in by_doc
    f1 = {fp for _p, fp in by_doc[1]}
    f2 = {fp for _p, fp in by_doc[2]}
    assert f1 & f2, "shared >= w+k-1 token run must share a fingerprint"
    # distinct (pos, fp) pairs per doc
    assert len(by_doc[1]) == len(set(by_doc[1]))
    # density: #fps <= #windows, and roughly 2/(w+1) of the grams
    n_toks = len(("p q r " + shared + " s t u v w x y z").split())
    n_grams = n_toks - k + 1
    assert len(by_doc[1]) <= n_grams - w + 1
    assert len(by_doc[1]) >= n_grams * 1 // (w + 1)


def test_winnow_oversized_doc_fails_loudly(spark):
    """A document whose k-gram count reaches the position-packing base
    (2^22) must raise, not silently alias fingerprints (r6 ADVICE:
    the bound previously lived only in a comment)."""
    import pytest

    from margaret_spark.operators.text import (
        _WINNOW_POS_BASE,
        winnow_fingerprints,
    )

    k = 2
    n_toks = _WINNOW_POS_BASE + k  # g = 2^22 + 1 >= base
    big = " ".join("a" * 1 for _ in range(n_toks))
    docs = spark.createDataFrame([(1, big)], "doc_id long, text string")
    with pytest.raises(Exception, match="packing bound"):
        winnow_fingerprints(docs, "doc_id", "text", k=k, w=4).collect()


def test_ivf_centroid_schema_validated(spark, tmp_path):
    """User-supplied centroids with wrong column names fail at build
    time with a real message, not later with an AnalysisException in
    the read path (r6 ADVICE) — both the float and int8 builders."""
    import pytest

    from margaret_spark.operators.quantize import build_ivf_index_int8
    from margaret_spark.operators.similarity import build_ivf_index

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)],
        "vec_id long, embedding array<double>",
    )
    bad = spark.createDataFrame(
        [(0, [0.0, 1.0])], "cluster_id long, center array<double>"
    )
    with pytest.raises(ValueError, match="cent_id"):
        build_ivf_index(emb, str(tmp_path / "f"), nlist=2, centroids=bad)
    with pytest.raises(ValueError, match="cent_id"):
        build_ivf_index_int8(
            emb, str(tmp_path / "q"), nlist=2, centroids=bad
        )


def _ref_dhash(grey_at, w, h):
    """Python-reference dHash over a grey(y, x) sampler: 9x8 grid via
    floor-div nearest neighbor, bit gy*8+gx set iff left < right,
    packed into a signed 64-bit long."""
    def grid(gy, gx):
        return grey_at(gy * h // 8, gx * w // 9)

    v = 0
    for b in range(64):
        gy, gx = divmod(b, 8)
        if grid(gy, gx) < grid(gy, gx + 1):
            v |= 1 << b
    return v - (1 << 64) if v >= (1 << 63) else v


def test_image_dhash_matches_reference_grey_and_rgb(spark):
    """dHash over REAL decoded PNGs equals the python reference:
    greyscale via the synthetic closed-form fixture, RGB via the
    integer-luma path ((299R+587G+114B) div 1000)."""
    from margaret_spark.operators.imagehash import image_dhash
    from margaret_spark.operators.media_codecs import encode_png
    from margaret_spark.operators.multimodal import (
        attach_synthetic_png_blobs,
    )

    rows = [(i, 16 + (i % 3), 12 + (i % 2)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, w int, h int")
    blobs = attach_synthetic_png_blobs(df, "doc_id", "w", "h")
    got = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(blobs, "doc_id", "blob").collect()
    }
    for i, w, h in rows:
        want = _ref_dhash(
            lambda y, x, i=i, w=w: (i * 31 + (y * w + x)) % 256, w, h
        )
        assert got[i] == want, (i, got[i], want)

    # RGB: luma path
    w, h = 11, 9
    px = bytes(
        ((y * w + x) * c + 13) % 256
        for y in range(h)
        for x in range(w)
        for c in (1, 2, 3)
    )
    rgb = spark.createDataFrame(
        [(1, bytearray(encode_png(w, h, px, color_type=2)))],
        "doc_id long, blob binary",
    )
    got_rgb = image_dhash(rgb, "doc_id", "blob").collect()[0]["dhash"]

    def grey(y, x):
        o = (y * w + x) * 3
        r, g, b = px[o], px[o + 1], px[o + 2]
        return (299 * r + 587 * g + 114 * b) // 1000

    assert got_rgb == _ref_dhash(grey, w, h)


def test_image_dedup_finds_planted_jpeg_near_dups(spark):
    """The LAION-style scenario: one source image re-encoded at two
    JPEG qualities is a planted near-dup pair (small Hamming); an
    unrelated image stays far. Pairs from the pigeonhole banding
    equal the brute-force Hamming filter (lossless)."""
    import itertools

    import numpy as np

    from margaret_spark.operators.imagehash import (
        image_dedup_pairs,
        image_dhash,
    )
    from margaret_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(7)
    src = rng.randint(0, 256, size=(24, 33), dtype=np.uint8)
    other = rng.randint(0, 256, size=(24, 33), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(src, quality=90))),
        (2, bytearray(encode_jpeg(src, quality=70))),  # planted near-dup
        (3, bytearray(encode_jpeg(other, quality=90))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    sig = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(df, "doc_id", "blob").collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sig[1], sig[2]) <= 10  # re-encode keeps the gradient field
    assert ham(sig[1], sig[3]) > 10  # unrelated content stays far

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in image_dedup_pairs(
            df, "doc_id", "blob", max_hamming=10
        ).collect()
    )
    want = sorted(
        (a, b, ham(sig[a], sig[b]))
        for a, b in itertools.combinations(sorted(sig), 2)
        if ham(sig[a], sig[b]) <= 10
    )
    assert got == want and (1, 2, ham(sig[1], sig[2])) in got


def test_hamming_pairs_lossless_vs_bruteforce(spark):
    """The factored pigeonhole join finds EXACTLY the brute-force
    pairs for arbitrary signatures, including the sign bit."""
    import itertools

    from margaret_spark.operators.imagehash import hamming_pairs

    sigs = [
        (1, 0),
        (2, 1),  # ham 1 from 0
        (3, -1),  # all 64 bits set
        (4, -2),  # ham 1 from -1
        (5, (1 << 63) - 1 - 7),  # sign-boundary value
        (6, 0b111),
    ]
    df = spark.createDataFrame(sigs, "id long, sig long")

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    for k in (0, 3, 6):
        got = sorted(
            (r["id_a"], r["id_b"], r["hamming"])
            for r in hamming_pairs(df, "id", "sig", max_hamming=k).collect()
        )
        vals = dict(sigs)
        want = sorted(
            (a, b, ham(vals[a], vals[b]))
            for a, b in itertools.combinations(sorted(vals), 2)
            if ham(vals[a], vals[b]) <= k
        )
        assert got == want, (k, got, want)


def test_hamming_pairs_grouped_equals_rowlevel(spark):
    """hamming_pairs_grouped (the distinct-value factorization the
    perceptual multimodal queries use) returns EXACTLY hamming_pairs'
    row set — same (id_a < id_b, hamming) triples — on signatures
    with heavy duplication, including the duplicate-value pairs
    (Hamming 0), cross-value pairs, and sign-bit values."""
    from margaret_spark.operators.imagehash import (
        hamming_pairs,
        hamming_pairs_grouped,
    )

    sigs = [
        (1, 0),
        (2, 0),  # dup of 1
        (3, 1),  # ham 1 from the 0-group
        (4, -1),
        (5, -1),  # dup of 4
        (6, -2),  # ham 1 from the -1 group
        (7, 0),  # second dup of 1
        (8, (1 << 63) - 1),  # isolated singleton value
        # r12: the adaptive guard routes to the row-level path when
        # distinct/rows ≥ 0.5 — pad the duplication so this fixture
        # stays on the VALUE-LEVEL path it exists to test (5 distinct
        # over 12 rows)
        (9, 0),
        (10, -1),
        (11, 1),
        (12, 1),
    ]
    df = spark.createDataFrame(sigs, "id long, sig long")
    # and a unique-signature fixture (D == N) that exercises the
    # guard's row-level branch — output must be identical regardless
    # of which branch ran
    uniq = spark.createDataFrame(
        [(i, i * 3) for i in range(1, 9)], "id long, sig long"
    )
    for fixture in (df, uniq):
        for k in (0, 1, 6):
            want = sorted(
                (r["id_a"], r["id_b"], r["hamming"])
                for r in hamming_pairs(
                    fixture, "id", "sig", max_hamming=k
                ).collect()
            )
            got = sorted(
                (r["id_a"], r["id_b"], r["hamming"])
                for r in hamming_pairs_grouped(
                    fixture, "id", "sig", max_hamming=k
                ).collect()
            )
            assert got == want, (k, got, want)


def test_hamming_pairs_top_bits_fold_into_last_block(spark):
    """The bits % nblocks leftover high bits are part of the LAST
    block, not uncovered: at max_hamming=6 (7 blocks of 9, last block
    9+1=10 bits) a pair differing ONLY in bit 63 is found with the
    right distance, and a pair differing in bits 62 AND 63 at
    max_hamming=0 is correctly rejected (at k=0 the single block is
    the whole signature — uncovered bits would falsely pair them
    ONLY if the exact check were ever dropped; this pins the
    partition invariant the docstring promises)."""
    from margaret_spark.operators.imagehash import hamming_pairs

    df = spark.createDataFrame(
        [(1, 0), (2, -(1 << 63)), (3, -(1 << 63) + (1 << 62))],
        "id long, sig long",
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hamming_pairs(df, "id", "sig", max_hamming=6).collect()
    )
    assert got == [(1, 2, 1), (1, 3, 2), (2, 3, 1)]
    got0 = hamming_pairs(df, "id", "sig", max_hamming=0).collect()
    assert got0 == []


def _ref_afp(samples):
    """Python-reference audio fingerprint: 65 floor-div time frames,
    absolute-amplitude frame energies, bit f set iff e[f] < e[f+1],
    packed into a signed 64-bit long."""
    n = len(samples)
    e = [
        sum(abs(x) for x in samples[f * n // 65 : (f + 1) * n // 65])
        for f in range(65)
    ]
    v = 0
    for f in range(64):
        if e[f] < e[f + 1]:
            v |= 1 << f
    return v - (1 << 64) if v >= (1 << 63) else v


def test_audio_fingerprint_matches_reference(spark):
    """The energy-gradient fingerprint over REAL decoded WAVs equals
    the python reference across frame regimes (n < 65: empty frames
    carry energy 0; n > 65: multi-sample frames), a stereo clip
    fingerprints its interleaved stream, and an empty clip is dropped
    (no signal, not a constant hash)."""
    from margaret_spark.operators.audiohash import audio_fingerprint
    from margaret_spark.operators.media_codecs import encode_wav
    from margaret_spark.operators.multimodal import (
        attach_synthetic_wav_blobs,
    )

    rows = [(i, 8000, n) for i, n in enumerate([3, 40, 64, 65, 130, 200])]
    df = spark.createDataFrame(rows, "doc_id long, rate int, n int")
    blobs = attach_synthetic_wav_blobs(df, "doc_id", "rate", "n")
    got = {
        r["doc_id"]: r["afp"]
        for r in audio_fingerprint(blobs, "doc_id", "blob").collect()
    }
    for i, _rate, n in rows:
        samples = [((i * 7 + j * 13) % 4096) - 2048 for j in range(n)]
        assert got[i] == _ref_afp(samples), (i, n)

    # stereo: the interleaved stream is fingerprinted as-is
    inter = [((j * j * 5 + j) % 4096) - 2048 for j in range(120)]
    stereo = spark.createDataFrame(
        [
            (1, bytearray(encode_wav(8000, inter, channels=2))),
            (2, bytearray(encode_wav(8000, [], channels=1))),  # empty
        ],
        "doc_id long, blob binary",
    )
    out = {
        r["doc_id"]: r["afp"]
        for r in audio_fingerprint(stereo, "doc_id", "blob").collect()
    }
    assert out == {1: _ref_afp(inter)}  # empty clip dropped


def test_audio_dedup_finds_planted_noise_near_dups(spark):
    """The multimodal-pipeline scenario: one clip plus a low-level
    additive-noise variant is a planted near-dup pair (small
    Hamming); unrelated audio stays far. Pairs from the pigeonhole
    banding equal the brute-force Hamming filter (lossless)."""
    import itertools

    from margaret_spark.operators.audiohash import (
        audio_dedup_pairs,
        audio_fingerprint,
    )
    from margaret_spark.operators.media_codecs import encode_wav

    base = [((j * j * 29 + j * 17 + 500) % 4096) - 2048 for j in range(100)]
    var = [s + (256 if j % 5 == 0 else 0) for j, s in enumerate(base)]
    other = [((j * j * 37 + j * 23 + 2500) % 4096) - 2048 for j in range(100)]
    rows = [
        (1, bytearray(encode_wav(8000, base))),
        (2, bytearray(encode_wav(8000, var))),  # planted near-dup
        (3, bytearray(encode_wav(8000, other))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    sig = {
        r["doc_id"]: r["afp"]
        for r in audio_fingerprint(df, "doc_id", "blob").collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sig[1], sig[2]) <= 10  # noise keeps the energy gradient
    assert ham(sig[1], sig[3]) > 10  # unrelated content stays far

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in audio_dedup_pairs(
            df, "doc_id", "blob", max_hamming=10
        ).collect()
    )
    want = sorted(
        (a, b, ham(sig[a], sig[b]))
        for a, b in itertools.combinations(sorted(sig), 2)
        if ham(sig[a], sig[b]) <= 10
    )
    assert got == want and (1, 2, ham(sig[1], sig[2])) in got


def test_blocked_allpairs_cosine_accepts_string_ids(spark):
    """The exact all-pairs embedding dedup must follow the input id
    TYPE (the family contract dedup_clusters documents) — the
    applyInPandas schema used to pin long and crash string-keyed
    corpora."""
    rows = [
        ("a", [1.0, 0.0]),
        ("b", [1.0, 0.001]),
        ("c", [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "doc string, embedding array<double>")
    got = embedding_dedup_pairs(
        df, "doc", "embedding", threshold=0.99, nblocks=2
    ).collect()
    assert [(r.id_a, r.id_b) for r in got] == [("a", "b")]
    assert all(r.id_a < r.id_b for r in got)


def test_lsh_empty_corpus_keeps_id_type(spark):
    from margaret_spark.operators.similarity import lsh_bucketed_topk

    df = spark.createDataFrame([], "vec_id string, embedding array<double>")
    out = lsh_bucketed_topk(df, df, k=3)
    assert out.count() == 0
    assert dict(out.dtypes)["query_id"] == "string"


def test_ann_recall_zero_denominator_reports_one(spark):
    """A query whose exact top-k is empty (it is the whole corpus) has
    recall 1.0 — the index missed nothing — not NULL from 0/0."""
    from margaret_spark.operators.similarity import ann_recall_at_k

    df = spark.createDataFrame(
        [(7, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    row = ann_recall_at_k(df, df, "vec_id", "embedding", k=3, nlist=1, nprobe=1).collect()
    assert len(row) == 1 and row[0]["n_exact"] == 0 and row[0]["recall"] == 1.0


def test_k_core_peels_chains_keeps_cliques(spark):
    """A 4-clique survives the 2-core; a chain hanging off it
    dissolves entirely; fixed rounds >= convergence equal the
    fixpoint (rounds=None)."""
    from margaret_spark.operators.graph import k_core

    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    chain = [(3, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + chain, "id_a long, id_b long")

    core = {(r.node, r.core_degree) for r in k_core(edges, "id_a", "id_b", k=2).collect()}
    assert core == {(0, 3), (1, 3), (2, 3), (3, 3)}

    fixed = {
        (r.node, r.core_degree)
        for r in k_core(edges, "id_a", "id_b", k=2, rounds=5).collect()
    }
    assert fixed == core

    # k=4 empties this graph entirely
    assert k_core(edges, "id_a", "id_b", k=4).count() == 0

    # duplicate + reversed edges collapse (simple-graph semantics)
    noisy = spark.createDataFrame(
        clique + [(b, a) for a, b in clique], "id_a long, id_b long"
    )
    assert {
        (r.node, r.core_degree)
        for r in k_core(noisy, "id_a", "id_b", k=2).collect()
    } == core


def test_k_core_guards(spark):
    import pytest as _pytest

    from margaret_spark.operators.graph import k_core

    edges = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with _pytest.raises(ValueError, match="k must be"):
        k_core(edges, "id_a", "id_b", k=0)
    with _pytest.raises(ValueError, match="rounds"):
        k_core(edges, "id_a", "id_b", k=2, rounds=-1)


def test_pair_dot_names_null_and_ragged_violations(spark):
    """pair_dot contract violations fail loudly with the cause named
    (found in the r8 part-7 review: a NULL embedding crashed pq_train
    with a bare np.stack shape error from inside numpy)."""
    import pytest
    from pyspark.sql import functions as F

    from margaret_spark.functions.vectors import pair_dot

    nulls = spark.createDataFrame(
        [(1, [1.0, 2.0], [1.0, 2.0]), (2, None, [1.0, 2.0])],
        "id long, a array<double>, b array<double>",
    )
    with pytest.raises(Exception, match="NULL vector in batch"):
        nulls.select(pair_dot(F.col("a"), F.col("b"))).collect()
    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0], [1.0, 2.0]), (2, [1.0], [1.0, 2.0])],
        "id long, a array<double>, b array<double>",
    )
    # depending on how Arrow batches the rows, raggedness surfaces as
    # either the within-side stack failure or the cross-side width
    # check — both named pair_dot errors, never a bare numpy one
    with pytest.raises(
        Exception, match="ragged vector widths|side widths differ"
    ):
        ragged.select(pair_dot(F.col("a"), F.col("b"))).collect()
    single = ragged.coalesce(1)
    with pytest.raises(
        Exception, match="ragged vector widths|side widths differ"
    ):
        single.select(pair_dot(F.col("a"), F.col("b"))).collect()


def _ref_phash(grey_at, w, h):
    """Python-reference pHash over a grey(y, x) sampler: 16x16 box
    floor-mean grid, separable integer DCT (the hardcoded basis), 64
    DC-excluded AC coefficients thresholded against the middle-pair
    sum, packed into a signed 64-bit long."""
    import numpy as np

    from margaret_spark.operators.imagehash import _PHASH_B16

    B = np.array(_PHASH_B16, dtype=np.int64)
    sums = np.zeros((16, 16), dtype=np.int64)
    cnts = np.zeros((16, 16), dtype=np.int64)
    for y in range(h):
        for x in range(w):
            sums[y * 16 // h, x * 16 // w] += grey_at(y, x)
            cnts[y * 16 // h, x * 16 // w] += 1
    g = sums // np.maximum(cnts, 1)
    flat = (B @ g @ B[:8].T).reshape(-1)
    ac = flat[1:65]
    srt = np.sort(ac)
    msum = int(srt[31]) + int(srt[32])
    sig = sum((1 << j) for j, c in enumerate(ac) if 2 * int(c) > msum)
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_phash_basis_constants_derive_from_cos():
    """The hardcoded integer DCT basis equals round(cos(pi(2i+1)u/32)
    * 4096) — the constants are protocol parameters (never recomputed
    at runtime: libm cos is not bit-identical across platforms), and
    this pins their derivation."""
    import math

    from margaret_spark.operators.imagehash import _PHASH_B16

    want = tuple(
        tuple(
            round(math.cos(math.pi * (2 * x + 1) * u / 32) * 4096)
            for x in range(16)
        )
        for u in range(9)
    )
    assert _PHASH_B16 == want


def test_image_phash_matches_reference_grey_and_rgb(spark):
    """pHash over REAL decoded PNGs equals the python reference:
    greyscale via the synthetic closed-form fixture, RGB via the
    integer-luma path."""
    from margaret_spark.operators.imagehash import image_phash
    from margaret_spark.operators.media_codecs import encode_png
    from margaret_spark.operators.multimodal import (
        attach_synthetic_png_blobs,
    )

    rows = [(i, 16 + (i % 3), 12 + (i % 2)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, w int, h int")
    blobs = attach_synthetic_png_blobs(df, "doc_id", "w", "h")
    got = {
        r["doc_id"]: r["phash"]
        for r in image_phash(blobs, "doc_id", "blob").collect()
    }
    for i, w, h in rows:
        want = _ref_phash(
            lambda y, x, i=i, w=w: (i * 31 + (y * w + x)) % 256, w, h
        )
        assert got[i] == want, (i, got[i], want)

    w, h = 11, 9
    px = bytes(
        ((y * w + x) * c + 13) % 256
        for y in range(h)
        for x in range(w)
        for c in (1, 2, 3)
    )
    rgb = spark.createDataFrame(
        [(1, bytearray(encode_png(w, h, px, color_type=2)))],
        "doc_id long, blob binary",
    )
    got_rgb = image_phash(rgb, "doc_id", "blob").collect()[0]["phash"]

    def grey(y, x):
        o = (y * w + x) * 3
        r, g, b = px[o], px[o + 1], px[o + 2]
        return (299 * r + 587 * g + 114 * b) // 1000

    assert got_rgb == _ref_phash(grey, w, h)


def test_image_phash_robust_to_reencode_and_brightness(spark):
    """pHash's selling points over dHash, pinned: a JPEG re-encode and
    a +30 brightness shift of a smooth image stay within the near-dup
    band (box means cancel pixel jitter; brightness moves only the
    EXCLUDED DC coefficient), unrelated content stays far, and the
    pigeonhole banding equals the brute-force Hamming filter."""
    import itertools

    import numpy as np

    from margaret_spark.operators.imagehash import (
        image_phash,
        phash_dedup_pairs,
    )
    from margaret_spark.operators.jpeg import encode_jpeg

    rng = np.random.RandomState(7)
    yy, xx = np.mgrid[0:24, 0:33]
    smooth = (
        (np.sin(xx / 6.0) * 60 + np.cos(yy / 4.0) * 50 + 100)
        + rng.randint(-8, 8, size=(24, 33))
    ).clip(0, 255).astype(np.uint8)
    other = ((np.sin(xx / 3.0 + 2) * 70 + yy * 3) % 256).astype(np.uint8)
    bright = np.clip(smooth.astype(int) + 30, 0, 255).astype(np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(smooth, quality=90))),
        (2, bytearray(encode_jpeg(smooth, quality=70))),  # planted near-dup
        (3, bytearray(encode_jpeg(other, quality=90))),
        (4, bytearray(encode_jpeg(bright, quality=90))),  # brightness shift
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    sig = {
        r["doc_id"]: r["phash"]
        for r in image_phash(df, "doc_id", "blob").collect()
    }

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(sig[1], sig[2]) <= 10  # re-encode
    assert ham(sig[1], sig[4]) <= 10  # brightness shift
    assert ham(sig[1], sig[3]) > 10  # unrelated content

    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_dedup_pairs(
            df, "doc_id", "blob", max_hamming=10
        ).collect()
    )
    want = sorted(
        (a, b, ham(sig[a], sig[b]))
        for a, b in itertools.combinations(sorted(sig), 2)
        if ham(sig[a], sig[b]) <= 10
    )
    assert got == want and (1, 2, ham(sig[1], sig[2])) in got


def test_vocab_oov_report_hand_fixture(spark):
    """vocab_oov_report on a hand corpus: deterministic top-V cut
    (count desc, token asc), per-group OOV masses, zero-token group
    reports NULL rate (never 0/0), every group appears."""
    import pytest
    from pyspark.sql import functions as F  # noqa: F401

    from margaret_spark.operators.text import vocab_oov_report

    rows = [
        ("a", "x x x y y z"),   # x:3 y:2 z:1
        ("a", "x y w"),         # w:1
        ("b", "z z q"),         # z:+2 q:1
        ("c", None),            # zero tokens
        ("c", ""),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    # counts: x:4 y:3 z:3 w:1 q:1 -> top_v=2 vocab = {x, y}
    # (z ties y at 3? z:1+2=3, y:3 -> order by count desc, token asc:
    #  x(4), y(3), z(3) -> top2 = x, y)
    got = {
        r["source"]: r
        for r in vocab_oov_report(df, "text", "source", top_v=2).collect()
    }
    assert set(got) == {"a", "b", "c"}
    a = got["a"]  # tokens: 9 total, oov = z w (2 occurrences), distinct 2
    assert (a.n_tokens, a.n_oov, a.n_distinct_oov) == (9, 2, 2)
    assert a.oov_rate == round(2 / 9, 6) or abs(a.oov_rate - 2 / 9) < 1e-6
    b = got["b"]  # z z q -> all 3 oov, distinct 2
    assert (b.n_tokens, b.n_oov, b.n_distinct_oov) == (3, 3, 2)
    assert b.oov_rate == 1.0
    c = got["c"]
    assert (c.n_tokens, c.n_oov, c.n_distinct_oov) == (0, 0, 0)
    assert c.oov_rate is None
    with pytest.raises(ValueError, match="top_v must be >= 1"):
        vocab_oov_report(df, "text", "source", top_v=0)


def test_simpson_index_hand_fixture(spark):
    """Simpson concentration on a hand corpus: uniform tokens hit
    1/n_distinct, a single repeated token hits 1.0, empty/NULL text
    reports NULL (never 0/0), every input row appears."""
    from margaret_spark.operators.text import simpson_index

    rows = [
        (1, "a b c d"),      # uniform: 4 * (1/4)^2 = 0.25
        (2, "x x x x x"),    # degenerate: 1.0
        (3, "a a b"),        # (4 + 1) / 9
        (4, None),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in simpson_index(df, "doc_id", "text").collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    assert got[1].simpson == 0.25 and got[1].n_distinct == 4
    assert got[2].simpson == 1.0 and got[2].n_tokens == 5
    assert abs(got[3].simpson - 5 / 9) < 1e-6
    for d in (4, 5):
        assert got[d].n_tokens == 0 and got[d].simpson is None


def test_ngram_coverage_hand_fixture(spark):
    from margaret_spark.operators.text import ngram_coverage

    fixtures = [
        (0, "a b a b a b"),        # bigrams: "a b"x3, "b a"x2 -> top "a b"
        (1, "one two three"),      # all bigrams distinct, tie on count=1
        (2, "x"),                  # too short for bigrams
        (3, ""),
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    got = {r.doc_id: r for r in ngram_coverage(df, "doc_id", "text", n=2).collect()}
    # doc0: normalized "a b a b a b" = 11 chars; top gram "a b" (3
    # chars) occurs 3x -> 9/11; every bigram duplicated -> (3*3+2*3)/11
    assert got[0].n_grams == 5
    assert got[0].top_gram == "a b" and got[0].top_count == 3
    assert got[0].top_frac == round(9 / 11, 4)
    # overlapping grams can exceed 1.0 by design (char mass counts occurrences)
    assert got[0].dup_frac == round(15 / 11, 4)
    # doc1: counts all 1 -> tie broken by lexicographically smallest gram
    assert got[1].top_gram == "one two" and got[1].top_count == 1
    assert got[1].dup_frac == 0.0
    # short/empty docs: zero counts, empty top gram, zero fractions
    for d in (2, 3):
        assert got[d].n_grams == 0 and got[d].top_gram == ""
        assert got[d].top_count == 0
        assert got[d].top_frac == 0.0 and got[d].dup_frac == 0.0


def test_gopher_battery_columns_and_values(spark):
    from margaret_spark.operators.text import gopher_repetition

    df = spark.createDataFrame(
        [(0, "p q r p q r p q r p q r")], "doc_id long, text string"
    )
    out = gopher_repetition(df, "doc_id", "text", top_ns=(2, 3), dup_ns=(3,))
    assert out.columns == ["doc_id", "top_2gram_frac", "top_3gram_frac", "dup_3gram_frac"]
    row = out.collect()[0]
    # normalized doc = 23 chars. top bigram "p q" (3 chars) x4 -> 12/23
    assert row.top_2gram_frac == round(12 / 23, 4)
    # top trigram "p q r" (5 chars) x4 -> 20/23
    assert row.top_3gram_frac == round(20 / 23, 4)
    # duplicated trigrams: "p q r"x4 (20), "q r p"x3 (15), "r p q"x3 (15) -> 50/23
    assert row.dup_3gram_frac == round(50 / 23, 4)


def test_line_repetition_hand_fixture(spark):
    from margaret_spark.operators.text import line_repetition

    fixtures = [
        (0, "aaa\nbbb\naaa"),      # line "aaa" duplicated
        (1, "one\ntwo\nthree"),    # all distinct
        (2, "solo"),               # single line
        (3, ""),                   # no lines
        (4, "x\n\nx"),             # empty segment dropped, "x" duplicated
    ]
    df = spark.createDataFrame(fixtures, "doc_id long, text string")
    got = {r.doc_id: r for r in line_repetition(df, "doc_id", "text").collect()}
    assert got[0].n_lines == 3 and got[0].n_distinct_lines == 2
    assert got[0].dup_line_frac == round(1 / 3, 4)
    # duplicated-line char mass: "aaa" x2 x len 3 = 6 of 9 total chars
    assert got[0].dup_char_frac == round(6 / 9, 4)
    assert got[1].dup_line_frac == 0.0 and got[1].dup_char_frac == 0.0
    assert got[2].n_lines == 1 and got[2].dup_line_frac == 0.0
    assert got[3].n_lines == 0 and got[3].dup_line_frac == 0.0
    assert got[4].n_lines == 2 and got[4].n_distinct_lines == 1
    assert got[4].dup_line_frac == 0.5 and got[4].dup_char_frac == 1.0


def test_ngram_contamination_bloom_equals_baseline(spark):
    from margaret_spark.operators.dedup import (
        ngram_contamination,
        ngram_contamination_bloom,
    )

    corpus = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "one two three four five six"),
            (2, "alpha beta gamma zeta eta theta"),
            (3, "xx"),          # too short for trigrams: 0 shingles
            (4, None),          # NULL text must still report a row
        ],
        "doc_id long, text string",
    )
    eval_df = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    base = {
        r.doc_id: (r.n_shingles, r.n_matched, r.contamination)
        for r in ngram_contamination(corpus, eval_df, "doc_id", "text").collect()
    }
    for kwargs in (
        {},                                 # default bitmap
        {"m_bits": 64, "k_hashes": 2},      # tiny, heavy-FP bitmap:
        # false positives are verified away, results must not change
        {"verify_broadcast": False},        # shuffle-join verify path
    ):
        got = {
            r.doc_id: (r.n_shingles, r.n_matched, r.contamination)
            for r in ngram_contamination_bloom(
                corpus, eval_df, "doc_id", "text", **kwargs
            ).collect()
        }
        assert got == base, kwargs
    # sanity on the fixture itself: contamination really binds
    assert base[0][1] > 0 and base[1][1] == 0


def test_bloom_bitmap_words_packing():
    from margaret_spark.operators.dedup import _bloom_bitmap_words

    # bit 0 -> word0 lsb; bit 63 -> word0 sign bit (two's complement
    # wrap for the Spark long literal); bit 64 -> word1 lsb
    ws = _bloom_bitmap_words([0, 63, 64], 128)
    assert len(ws) == 2
    assert ws[0] == 1 - (1 << 63)
    assert ws[1] == 1


def test_ngram_overlap_measure_scores_containment(spark):
    from margaret_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            # doc 1 is a verbatim excerpt of doc 0: every trigram of 1
            # appears in 0 -> overlap 1.0, jaccard well below it
            (0, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (1, "beta gamma delta epsilon"),
            (2, "one two three four five"),
        ],
        "doc_id long, text string",
    )
    ov = {
        (r.id_a, r.id_b): r.overlap
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.9, measure="overlap"
        ).collect()
    }
    assert ov == {(0, 1): 1.0}
    jc = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.9, measure="jaccard"
    ).collect()
    assert jc == []  # jaccard misses the excerpt at the same bar
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ngram_jaccard_pairs(docs, "doc_id", "text", measure="dice").collect()


def test_keep_best_per_cluster_argmax_and_singletons(spark):
    from margaret_spark.operators.dedup import keep_best_per_cluster

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (9, 9), (10, 9)],
        "doc_id long, cluster_id long",
    )
    scored = spark.createDataFrame(
        [(1, 0.5), (2, 0.9), (3, 0.9), (7, 0.1), (9, 0.3), (10, 0.3)],
        "doc_id long, quality double",
    )
    kept = {
        r.doc_id: (r.cluster_id, r.quality)
        for r in keep_best_per_cluster(scored, clusters, "doc_id").collect()
    }
    # cluster 1: quality tie 2 vs 3 -> smaller id wins; singleton 7
    # passes through; cluster 9: tie -> id 9
    assert kept == {2: (1, 0.9), 7: (7, 0.1), 9: (9, 0.3)}


def test_line_repetition_null_text_reports_zeros(spark):
    from margaret_spark.operators.text import line_repetition

    df = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = line_repetition(df, "doc_id", "text").collect()[0]
    assert (r.n_lines, r.n_distinct_lines) == (0, 0)
    assert r.dup_line_frac == 0.0 and r.dup_char_frac == 0.0


def test_text_novelty_and_source_matrix(spark):
    import __spark_entry__ as entry

    # novelty over a tiny planted corpus via the graded query shape:
    # reuse the operator chain directly on a fixture
    from margaret_spark.functions.shingling import word_shingles

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta"),       # shares trigrams with 1
            (1, "alpha beta gamma delta"),       # exact copy: novelty 0
            (2, "one two three four five"),      # all unique: novelty 1
            (3, "x"),                            # no trigrams
        ],
        "doc_id long, text string",
    )
    inv = docs.select(
        F.col("doc_id"), F.explode(word_shingles(F.col("text"), n=3)).alias("sh")
    )
    dfc = inv.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    per = (
        inv.join(dfc, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("df") == 1, 1).otherwise(0)).alias("u"),
        )
        .collect()
    )
    vals = {r.doc_id: (r.n, r.u) for r in per}
    assert vals[0] == (2, 0) and vals[1] == (2, 0)   # copies share all
    assert vals[2] == (3, 3)                         # fully novel
    assert 3 not in vals                             # no trigrams -> left join 0s in the query

    # source matrix orientation: (least, greatest) and counts
    from margaret_spark.operators.dedup import ngram_jaccard_pairs

    d2 = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon", "web"),
            (1, "alpha beta gamma delta epsilon", "wiki"),
            (2, "alpha beta gamma delta epsilon", "web"),
        ],
        "doc_id long, text string, source string",
    )
    pairs = ngram_jaccard_pairs(d2, "doc_id", "text", threshold=0.9)
    src = d2.select("doc_id", "source")
    j = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("sb")), "id_b")
        .select(
            F.least("sa", "sb").alias("a"), F.greatest("sa", "sb").alias("b")
        )
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    m = {(r.a, r.b): r.n for r in j}
    assert m == {("web", "web"): 1, ("web", "wiki"): 2}


def test_ngram_coverage_long_document_is_sort_bounded(spark):
    """The sorted run-length counter keeps a single long document
    sort-bounded (the old distinct×filter scan was O(G·D): a 20k-token
    doc with ~5k distinct grams = ~10^8 comparisons in ONE task; this
    must complete as a routine job). Values stay exact."""
    import random

    rng = random.Random(3)
    toks = [f"w{rng.randrange(2000)}" for _ in range(20_000)]
    doc = " ".join(toks)
    from collections import Counter

    grams = [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
    c = Counter(grams)
    top_count = max(c.values())
    top_gram = min(g for g, v in c.items() if v == top_count)
    df = spark.createDataFrame([(0, doc)], "doc_id long, text string")
    from margaret_spark.operators.text import ngram_coverage

    r = ngram_coverage(df, "doc_id", "text", n=2).collect()[0]
    assert r.n_grams == len(grams)
    assert (r.top_gram, r.top_count) == (top_gram, top_count)


def test_keep_best_per_cluster_unscored_members(spark):
    """ADVICE r9: `scored` need not cover every clustered id — an
    unscored member ranks after every scored one; an all-unscored
    cluster keeps its min-id representative with a NULL score,
    instead of vanishing."""
    from margaret_spark.operators.dedup import keep_best_per_cluster

    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)],
        "doc_id long, cluster_id long",
    )
    # cluster 1: id 3 unscored (loses to any scored member);
    # cluster 7: nobody scored (keeps min-id 7, score NULL)
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9)], "doc_id long, quality double"
    )
    kept = {
        r.doc_id: (r.cluster_id, r.quality)
        for r in keep_best_per_cluster(scored, clusters, "doc_id").collect()
    }
    assert kept == {2: (1, 0.9), 7: (7, None)}


def test_lsh_parameter_plan_math_and_guards(spark):
    """The banding planner's S-curve math against closed-form checks:
    p at threshold matches 1-(1-t^r)^b, b=1 is the AND-only corner
    (tiny p), r=1 the OR-only corner (p ~ 1), and the masses behave
    (fp grows with bands, fn shrinks; total_error has an interior
    minimum for 128 hashes at threshold 0.8)."""
    from margaret_spark.operators.dedup import lsh_parameter_plan

    rows = {
        (r.bands, r.rows_per_band): r
        for r in lsh_parameter_plan(
            spark, num_hashes=128, threshold=0.8, simpson_steps=200
        ).collect()
    }
    assert len(rows) == 8  # divisors of 128
    t = 0.8
    for (b, rr), row in rows.items():
        assert b * rr == 128
        want = 1.0 - (1.0 - t**rr) ** b
        assert abs(row.p_at_threshold - want) < 1e-4
        assert 0.0 <= row.fp_mass and 0.0 <= row.fn_mass
        assert abs(row.total_error - (row.fp_mass + row.fn_mass)) < 2e-6
    bs = sorted(b for b, _ in rows)
    fp = [rows[(b, 128 // b)].fp_mass for b in bs]
    fn = [rows[(b, 128 // b)].fn_mass for b in bs]
    assert fp == sorted(fp)  # more bands -> more collisions below t
    assert fn == sorted(fn, reverse=True)
    best = min(rows.values(), key=lambda r: r.total_error)
    assert (best.bands, best.rows_per_band) == (8, 16)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_parameter_plan(spark, num_hashes=0)
    with _pytest.raises(ValueError):
        lsh_parameter_plan(spark, threshold=1.0)
    with _pytest.raises(ValueError):
        lsh_parameter_plan(spark, simpson_steps=3)


def test_gopher_repetition_keep_cols(spark):
    """keep_cols carries payload columns through the battery's row
    pass unchanged, with the fraction values identical to the plain
    call (r11: the curation pipeline gates on the battery without a
    join-back)."""
    from margaret_spark.operators.text import gopher_repetition

    rows = [(1, "a b a b a b", 11), (2, "x y z w q v", 11)]
    df = spark.createDataFrame(rows, "doc_id long, text string, n_chars long")
    plain = {
        r.doc_id: (r.top_2gram_frac, r.dup_3gram_frac)
        for r in gopher_repetition(
            df, "doc_id", "text", top_ns=(2,), dup_ns=(3,)
        ).collect()
    }
    kept = gopher_repetition(
        df, "doc_id", "text", top_ns=(2,), dup_ns=(3,),
        keep_cols=("text", "n_chars"),
    ).collect()
    assert {r.doc_id: (r.top_2gram_frac, r.dup_3gram_frac) for r in kept} == plain
    assert {(r.doc_id, r.text, r.n_chars) for r in kept} == set(rows)
