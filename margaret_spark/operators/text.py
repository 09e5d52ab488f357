"""Text analysis operators: token/character statistics, quality
scoring, heuristic language ID, BPE-ish token counting, and document
fingerprinting — all as built-in column expressions (regexp/array/
aggregate), so a 100 TB corpus pass stays inside whole-stage codegen.

Every function here is *deterministic* and engine-portable: the exact
same arithmetic can be (and, in ``__spark_entry__``, is) expressed in
ANSI SQL for oracle checking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.shingling import gram_indices, words
from margaret_spark.functions.numeric import pround

# Per-language stopword lists for the heuristic language ID (Latin-
# script languages — non-Latin scripts are detected by character range
# in SCRIPTS below, which is both cheaper and more reliable than
# stopwords there). Order matters for deterministic tie-breaking
# (first wins ties). Table-driven: lang_id and the SQL oracle
# generator in __spark_entry__ both derive their predicates from this
# dict, so widening the table is a one-place change.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "los", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "est", "dans"],
    "it": ["il", "di", "che", "e", "la", "per", "un", "non", "sono", "con"],
    "pt": ["o", "de", "que", "e", "do", "da", "em", "um", "para", "com"],
    "nl": ["de", "het", "een", "van", "en", "in", "is", "dat", "op", "niet"],
    "sv": ["och", "att", "det", "som", "en", "av", "är", "för", "med", "på"],
    "pl": ["i", "w", "nie", "na", "to", "że", "z", "do", "się", "jest"],
    "tr": ["bir", "ve", "bu", "da", "için", "ne", "ile", "gibi", "ama", "çok"],
}

# Script-range detection for non-Latin languages: first pattern with
# any match wins, in declaration order. ja precedes zh deliberately —
# kana implies Japanese even though Japanese text also contains kanji
# from the CJK-unified range. Ranges are literal code-point spans so
# the identical character class runs under both Java regex (Spark) and
# RE2 (DuckDB oracle).
SCRIPTS = {
    "ja": r"[぀-ヿ]",   # hiragana U+3040-309F + katakana U+30A0-30FF
    "ko": r"[가-힣]",   # hangul syllables U+AC00-D7A3
    "zh": r"[一-鿿]",   # CJK unified U+4E00-9FFF
    "ru": r"[Ѐ-ӿ]",    # cyrillic U+0400-04FF
    "el": r"[Ͱ-Ͽ]",    # greek U+0370-03FF
    "he": r"[֐-׿]",    # hebrew U+0590-05FF
    "ar": r"[؀-ۿ]",    # arabic U+0600-06FF
    "hi": r"[ऀ-ॿ]",    # devanagari U+0900-097F
    "th": r"[฀-๿]",    # thai U+0E00-0E7F
}

_PUNCT_RE = r"[.,;:!?'\"()\[\]{}-]"
_DIGIT_RE = r"[0-9]"
# BPE-ish pre-tokenization: letter runs, digit runs, single other glyphs
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _count_re(col: Column, pattern: str) -> Column:
    """Occurrences of a regex — via length difference after removal,
    which is portable to engines without regexp_count."""
    return F.length(col) - F.length(F.regexp_replace(col, pattern, ""))


def token_stats(df: DataFrame, id_col: str, text_col: str, round_digits: int = 4) -> DataFrame:
    """Per-document statistics used by quality filters."""
    t = F.col(text_col)
    toks = words(t)
    n_tokens = F.size(toks)
    return df.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_tokens.alias("n_tokens"),
        pround(
            F.when(
                n_tokens > 0,
                (F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_tokens),
            ).otherwise(F.lit(0.0)),
            round_digits,
        ).alias("avg_token_len"),
        _count_re(t, _PUNCT_RE).alias("n_punct"),
        _count_re(t, _DIGIT_RE).alias("n_digits"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def repetition_score(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, round_digits: int = 4
) -> DataFrame:
    """Duplicate word-n-gram fraction per document in [0, 1] — the
    boilerplate/repetition quality signal (templated or looping text
    scores high, natural prose near 0). Pure array expressions inside
    codegen; documents shorter than n tokens score 0.

    The n-gram build is CPU-heavy per row, so the corpus is spread
    across the full parallelism first (a corpus often arrives as few
    large files whose scan parallelism would otherwise bound this)."""
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    from margaret_spark.functions.shingling import bind1

    t = F.col(text_col)

    # gram_indices is empty for docs shorter than n tokens: the naive
    # sequence(1, cnt-n+1) is DESCENDING [1, 0, ...] there and its 0
    # index makes slice() throw when evaluated — previously only the
    # outer CaseWhen's laziness prevented it (fragile across codegen
    # and subexpression-elimination changes).
    # The token array is BOUND once (shingling.bind1) and the gram
    # array materialized as a COLUMN: an unbound `ws` re-tokenized the
    # document per gram position, and `total`/`uniq` each re-built the
    # whole gram array per row — O(tokens²) per document, measured 7x
    # on the gram expansion.
    def grams(ws: Column) -> Column:
        idx = gram_indices(F.size(ws) - F.lit(n - 1))
        return F.transform(idx, lambda i: F.concat_ws(" ", F.slice(ws, i, n)))

    staged = df.select(
        F.col(id_col),
        F.size(words(t)).alias("__cnt"),
        bind1(words(t), grams).alias("__raw"),
    )
    total = F.size(F.col("__raw"))
    uniq = F.size(F.array_distinct(F.col("__raw")))
    score = F.when(
        F.col("__cnt") >= n, (total - uniq).cast("double") / total
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col), pround(score, round_digits).alias("repetition")
    )


def quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 4,
    include_tokens: bool = False,
) -> DataFrame:
    """Heuristic quality score in [0,1]: rewards reasonable length and
    lexical diversity, penalizes punctuation/digit soup. Deterministic
    rational arithmetic only. ``include_tokens=True`` adds
    ``n_tokens`` to the output — it reuses the tokenize subexpression
    the score already evaluates (one projection, one pass), so
    composed pipelines don't tokenize the corpus twice."""
    t = F.col(text_col)
    toks = words(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    diversity = F.when(
        n_tokens > 0, F.size(F.array_distinct(toks)).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(
        n_chars > 0, _count_re(t, _PUNCT_RE).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    digit_ratio = F.when(
        n_chars > 0, _count_re(t, _DIGIT_RE).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    length_term = F.least(n_tokens.cast("double") / F.lit(64.0), F.lit(1.0))
    score = (
        F.lit(0.4) * length_term
        + F.lit(0.4) * diversity
        + F.lit(0.2) * (F.lit(1.0) - F.least(punct_ratio + digit_ratio, F.lit(1.0)))
    )
    cols = [F.col(id_col), pround(score, round_digits).alias("quality")]
    if include_tokens:
        cols.append(n_tokens.cast("long").alias("n_tokens"))
    return df.select(*cols)


def quality_rule_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_tokens: int = 8,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 2.0,
    max_mean_token_len: float = 12.0,
    max_symbol_ratio: float = 0.3,
    min_distinct_ratio: float = 0.2,
    min_stopword_hits: int = 1,
    round_digits: int = 4,
) -> DataFrame:
    """Gopher/C4-style rule-based quality gates, one boolean per rule
    plus the conjunction — the standard web-corpus filter battery
    (length bounds, mean token length, symbol soup, lexical
    diversity, stopword presence as an any-language signal). All
    thresholds use the SAME rational arithmetic as :func:`quality_score`
    (pround'ed ratios), so every flag is engine-reproducible.

    Output: (id, n_tokens, mean_token_len, symbol_ratio,
    distinct_ratio, stopword_hits, ok_length, ok_token_len,
    ok_symbols, ok_diversity, ok_stopwords, keep). One narrow
    codegen projection — no shuffle at any scale."""
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    t = F.col(text_col)
    toks = words(t)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    # mean token length over the non-whitespace mass (same expression
    # family as token_stats.avg_token_len)
    mean_tl = pround(
        F.when(
            n_tokens > 0,
            F.length(F.regexp_replace(t, r"\s", "")).cast("double") / n_tokens,
        ).otherwise(F.lit(0.0)),
        round_digits,
    )
    sym = pround(
        F.when(
            n_chars > 0,
            (
                _count_re(t, _PUNCT_RE) + _count_re(t, _DIGIT_RE)
            ).cast("double")
            / n_chars,
        ).otherwise(F.lit(0.0)),
        round_digits,
    )
    distinct_ratio = pround(
        F.when(
            n_tokens > 0,
            F.size(F.array_distinct(toks)).cast("double") / n_tokens,
        ).otherwise(F.lit(0.0)),
        round_digits,
    )
    all_stop = sorted({w for sw in STOPWORDS.values() for w in sw})
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*all_stop)))
    ok_length = (n_tokens >= min_tokens) & (n_tokens <= max_tokens)
    ok_token_len = (mean_tl >= min_mean_token_len) & (
        mean_tl <= max_mean_token_len
    )
    ok_symbols = sym <= max_symbol_ratio
    ok_diversity = distinct_ratio >= min_distinct_ratio
    ok_stopwords = stop_hits >= min_stopword_hits
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tl.alias("mean_token_len"),
        sym.alias("symbol_ratio"),
        distinct_ratio.alias("distinct_ratio"),
        stop_hits.cast("long").alias("stopword_hits"),
        ok_length.alias("ok_length"),
        ok_token_len.alias("ok_token_len"),
        ok_symbols.alias("ok_symbols"),
        ok_diversity.alias("ok_diversity"),
        ok_stopwords.alias("ok_stopwords"),
        (
            ok_length & ok_token_len & ok_symbols & ok_diversity & ok_stopwords
        ).alias("keep"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic language ID, fully table-driven from SCRIPTS and
    STOPWORDS: a non-Latin script character range match wins first (in
    SCRIPTS order — ja before zh, see the table comment); otherwise
    the language whose stopword list matches the most tokens (ties
    break in STOPWORDS declaration order; no match at all ⇒ 'und').
    All predicates are regex/array codegen expressions — one narrow
    scan at any corpus size; the oracle SQL is generated from the SAME
    tables, so both engines always agree on the decision procedure.

    The scoring is CPU-heavy per row (one tokenize + a filter pass per
    stopword language + one rlike per script), so the corpus is spread
    across the full parallelism first — a corpus often arrives as few
    large files whose scan parallelism would otherwise bound this
    (measured 2.8× on the bench corpus)."""
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    t = F.col(text_col)
    toks = words(t)
    scores = {
        lang: F.size(F.filter(toks, lambda w: w.isin(*sw)))
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*scores.values())
    langs = list(STOPWORDS)
    # first language achieving the max wins (deterministic)
    sw_pred = F.when(best <= 0, F.lit("und"))
    for lang in langs[:-1]:
        sw_pred = sw_pred.when(scores[lang] == best, F.lit(lang))
    pred = sw_pred.otherwise(F.lit(langs[-1]))
    # presence test via rlike, not a count: one short-circuiting regex
    # scan per script instead of a full regexp_replace string rebuild
    for lang, pat in reversed(list(SCRIPTS.items())):
        pred = F.when(t.rlike(pat), F.lit(lang)).otherwise(pred)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


def lang_id_eval(
    df: DataFrame, id_col: str, text_col: str, lang_col: str, round_digits: int = 4
) -> DataFrame:
    """Per-true-language accuracy of :func:`lang_id` against a labeled
    column: (lang, n, n_correct, accuracy). The QA loop for the
    heuristic — one narrow scoring scan plus one small shuffle on the
    language key."""
    preds = lang_id(df, id_col, text_col)
    joined = df.select(F.col(id_col), F.col(lang_col).alias("lang")).join(
        preds, id_col
    )
    return joined.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
        ).cast("long").alias("n_correct"),
        pround(
            F.sum(
                F.when(F.col("pred_lang") == F.col("lang"), 1).otherwise(0)
            ).cast("double")
            / F.count("*"),
            round_digits,
        ).alias("accuracy"),
    )


def bpe_ish_token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token count under a BPE-style pre-tokenizer (letter runs, digit
    runs, single punctuation glyphs) — the cheap proxy for LLM token
    accounting over a corpus."""
    return df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(_BPE_RE), 0)).alias(
            "n_bpe_tokens"
        ),
    )


def doc_fingerprint(
    df: DataFrame, id_col: str, text_col: str, base: int = 31, mod: int = 1_000_000_007
) -> DataFrame:
    """Polynomial rolling hash over the lowercased text's code points
    (Karp–Rabin): fp = Σ fp·base + cp (mod m). A sequential fold via
    ``aggregate`` — exact integer arithmetic, portable to any engine
    with a reduce primitive."""
    t = F.lower(F.col(text_col))
    # split-to-chars is O(n); per-index substring would be O(n²) per doc
    codes = F.transform(
        F.filter(F.split(t, ""), lambda ch: ch != ""),
        lambda ch: F.ascii(ch).cast("long"),
    )
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + c) % mod,
    )
    return df.select(F.col(id_col), fp.alias("fingerprint"))


#: winnowing position-packing base: fp·BASE + (BASE − pos) orders a
#: window's grams by (hash asc, pos desc) under ONE integer min —
#: bounds documents at BASE−1 (≈4.2M) tokens (chunk longer docs)
_WINNOW_POS_BASE = 1 << 22


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, w: int = 4
) -> DataFrame:
    """(id, pos, fp): winnowing fingerprints (Schleimer, Wilkerson &
    Aiken 2003 — the MOSS algorithm) over the document's word
    ``k``-grams: in every window of ``w`` consecutive gram hashes the
    minimum is selected (ties → RIGHTMOST position, the paper's rule),
    and the selected (pos, hash) set is the fingerprint. The winnowing
    guarantee: any shared token run of ≥ ``w + k − 1`` tokens yields a
    shared fingerprint, with fingerprint density bounded by ~2/(w+1) —
    the LOCAL overlap detector next to the whole-document Karp–Rabin
    (:func:`doc_fingerprint`).

    Hashes are the engine-portable md5-first-8-hex construction (the
    CMS/Bloom family), and the per-window argmin packs as
    ``hash·2²² + (2²² − pos)`` so ONE integer ``array_min`` applies
    the (hash asc, pos desc) rule — the whole operator is per-row
    codegen array math, zero shuffles, zero UDFs; the only row
    multiplication is the explode of the (density-bounded) selected
    set. Documents with fewer than ``k`` tokens emit nothing; fewer
    grams than ``w`` winnows one all-grams window."""
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be >= 1: k={k}, w={w}")
    base = F.lit(_WINNOW_POS_BASE)
    empty = F.array().cast("array<long>")

    # BIND each intermediate array as a transform() lambda variable:
    # a non-lambda-variable expression referenced inside a lambda body
    # is RE-EVALUATED per element, so the naive form recomputed the
    # whole token array per gram and the whole md5 gram array per
    # window — O(g²) hashes per document (measured 10× superlinear at
    # sf0.1; 242 s → 3.8 s after binding). transform() evaluates its
    # input once per row and the lambda sees the stored value, so
    # tokenization runs once, each gram hashes once, and windowing is
    # O(g·w) integer comparisons — still zero shuffles.
    def _windows(garr: Column) -> Column:
        gn = F.size(garr)
        nwin = F.greatest(gn - F.lit(w) + F.lit(1), F.lit(1))
        wlen = F.least(F.lit(w), gn)
        return F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), nwin),
                lambda j: F.array_min(F.slice(garr, j, wlen)),
            )
        )

    def _per_doc(tarr: Column) -> Column:
        g = F.size(tarr) - F.lit(k) + F.lit(1)

        def packed(i: Column) -> Column:
            h = F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", F.slice(tarr, i, k))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            return h * base + (base - i)

        # the packing aliases once positions reach the base: (base − i)
        # goes non-positive and two different (hash, pos) grams could
        # compare equal — fail LOUDLY instead of silently corrupting
        # fingerprints (callers chunk longer docs first,
        # e.g. chunking.chunk_documents)
        over = F.raise_error(
            F.concat(
                F.lit(
                    "winnow_fingerprints: document exceeds the "
                    f"{_WINNOW_POS_BASE - 1}-gram packing bound ("
                ),
                g.cast("string"),
                F.lit(" k-grams) — chunk longer documents first"),
            )
        ).cast("array<long>")
        grams = (
            F.when(g >= F.lit(_WINNOW_POS_BASE), over)
            .when(g >= 1, F.transform(F.sequence(F.lit(1), g), packed))
            .otherwise(empty)
        )
        # the g >= 1 guard must cover the WINDOW step too: windowing
        # an empty gram array yields array_min(empty) = [NULL], which
        # would explode into a phantom (NULL, NULL) fingerprint
        return F.when(
            g >= 1, F.get(F.transform(F.array(grams), _windows), 0)
        ).otherwise(empty)

    # NULL text: the single array element is NULL, g is NULL, the
    # when() falls to the empty branch — no fingerprints
    sel = F.coalesce(
        F.get(F.transform(F.array(words(F.col(text_col))), _per_doc), 0),
        empty,
    )
    out = df.select(F.col(id_col), F.explode(sel).alias("__p"))
    # integer `div`, not `/`: packed reaches 2^54, past double's 2^53
    # exact-integer range (same rationale as packing._pack_from_cum)
    return out.select(
        F.col(id_col),
        (base - F.col("__p") % base).cast("long").alias("pos"),
        F.expr(f"__p div {_WINNOW_POS_BASE}").cast("long").alias("fp"),
    )


def top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
) -> DataFrame:
    """Corpus-level term statistics: the top-k tokens by document
    frequency (ties broken by token), with total occurrence counts.
    The building block for stopword discovery / df-cap selection
    (e.g. the ``max_df`` knob of the jaccard dedup).

    Shape at scale: explode → partial-aggregated groupBy on token →
    TakeOrdered(k). The shuffle carries one row per distinct (doc,
    token) pre-aggregated map-side, and top-k never materializes a
    full sort."""
    toks = df.repartition(df.sparkSession.sparkContext.defaultParallelism).select(
        F.col(id_col).alias("id"), F.explode(words(F.col(text_col))).alias("token")
    )
    per_doc = toks.groupBy("id", "token").agg(F.count("*").alias("__n"))
    stats = per_doc.groupBy("token").agg(
        F.count("*").alias("doc_freq"),
        F.sum("__n").cast("long").alias("total_count"),
    )
    return stats.orderBy(F.col("doc_freq").desc(), F.col("token").asc()).limit(k)


def collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 50,
    min_count: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """(w1, w2, c_pair, score, rank): the top-``k`` adjacent-token
    collocations by a PMI-style association score — the "New York"
    detector a corpus toolkit runs for phrase mining and tokenizer
    vocabulary decisions.

    score = (c_pair · T) / (c_w1 · c_w2) with T the total token count
    — the PMI ratio WITHOUT the log (same ranking order; ln differs
    cross-engine in the last ulp, the ratio is plain IEEE arithmetic
    of exact integers, so the surface is hash-exact). Pairs below
    ``min_count`` are noise-filtered; ties rank by (w1, w2).

    Shape at scale: one tokenize pass; bigram and unigram counts are
    map-side-combined groupBys on token keys; the two count joins
    shuffle on those same keys (vocabulary-sized inputs, AQE decides
    the strategy); top-k is TakeOrdered + a window over ≤ k rows. T
    is one driver-side scalar aggregation."""
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1: {min_count}")
    d = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    toks = words(F.col(text_col))
    base = d.select(toks.alias("__toks")).localCheckpoint(eager=False)
    uni = base.select(F.explode("__toks").alias("w")).groupBy("w").agg(
        F.count("*").alias("__c")
    )
    total_row = base.select(
        F.sum(F.size("__toks")).cast("long").alias("t")
    ).collect()[0]
    total = float(total_row["t"] or 0)
    idx = gram_indices(F.size(F.col("__toks")) - F.lit(1))
    pairs = base.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    F.element_at(F.col("__toks"), i).alias("w1"),
                    F.element_at(F.col("__toks"), i + F.lit(1)).alias("w2"),
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_pair"))
        .where(F.col("c_pair") >= min_count)
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("__c").alias("__c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("__c").alias("__c2"))
    scored = (
        bc.join(u1, "w1")
        .join(u2, "w2")
        .select(
            "w1",
            "w2",
            F.col("c_pair").cast("long").alias("c_pair"),
            pround(
                (F.col("c_pair").cast("double") * F.lit(total))
                / (F.col("__c1").cast("double") * F.col("__c2").cast("double")),
                round_digits,
            ).alias("score"),
        )
    )
    top = scored.orderBy(
        F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc()
    ).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("w1").asc(), F.col("w2").asc())
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def quality_percentile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(id, group, quality, pctile): the quality score calibrated
    WITHIN its group as a percent rank — the cross-source
    normalization step a mixed corpus needs before one global quality
    bar makes sense (a verbose source's 0.8 and a terse source's 0.5
    can sit at the same percentile of their distributions; filtering
    on ``pctile`` keeps the same fraction of every source).

    ``percent_rank`` = (rank − 1)/(n − 1), ties share a rank
    (SQL-standard, so the value is deterministic under any shuffle
    order), single-row groups score 0. One shuffle on the group key;
    the quality projection fuses into the same pass. At extreme
    per-group cardinality swap in an approximate-histogram rank —
    the exact window needs its group's total order."""
    from pyspark.sql import Window

    q = quality_score(df, id_col, text_col).join(
        df.select(F.col(id_col), F.col(group_col)), id_col
    )
    w = Window.partitionBy(group_col).orderBy(F.col("quality"))
    return q.select(
        F.col(id_col),
        F.col(group_col),
        F.col("quality"),
        pround(F.percent_rank().over(w), round_digits).alias("pctile"),
    )


def vocab_oov_report(
    df: DataFrame,
    text_col: str,
    group_col: str,
    top_v: int = 4096,
    round_digits: int = 6,
) -> DataFrame:
    """(``group_col``, n_tokens, n_oov, n_distinct_oov, oov_rate):
    per-group vocabulary coverage against the corpus's own
    top-``top_v`` vocabulary — the tokenizer-planning audit next to
    :func:`~margaret_spark.operators.bpe` fertility: a source whose
    OOV mass is high will fragment under a vocabulary fitted on the
    corpus mix, and its ``oov_rate`` quantifies exactly how much.

    The vocabulary is the deterministic top-``top_v`` cut by
    (occurrence count desc, token asc) — the ``nbayes`` convention —
    so the report is a pure function of the corpus and grades
    hash-exact (exact integer counts + one IEEE division). Groups
    whose documents carry zero tokens report ``oov_rate`` NULL (no
    evidence), never 0/0.

    Shape at scale: one tokenize pass; token counts are a map-side-
    combined groupBy (vocabulary-sized shuffle); the cut is
    TakeOrdered(top_v); membership is one BROADCAST left join; the
    report is one group-keyed aggregation anchored on the distinct
    group set (a group of empty documents still reports)."""
    if top_v < 1:
        raise ValueError(f"top_v must be >= 1: {top_v}")
    toks = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism
    ).select(
        F.col(group_col).alias("grp"),
        F.explode(words(F.col(text_col))).alias("token"),
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("__tot"))
        .orderBy(F.col("__tot").desc(), F.col("token").asc())
        .limit(top_v)
        .select("token", F.lit(1).alias("__inv"))
    )
    flagged = toks.join(F.broadcast(vocab), "token", "left")
    per_grp = flagged.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.when(F.col("__inv").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_oov"),
        F.count_distinct(
            F.when(F.col("__inv").isNull(), F.col("token"))
        )
        .cast("long")
        .alias("n_distinct_oov"),
    )
    groups = df.select(F.col(group_col).alias("grp")).distinct()
    return (
        groups.join(per_grp, "grp", "left")
        .select(
            F.col("grp").alias(group_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_oov"), F.lit(0)).cast("long").alias("n_oov"),
            F.coalesce(F.col("n_distinct_oov"), F.lit(0))
            .cast("long")
            .alias("n_distinct_oov"),
            pround(
                F.when(
                    F.coalesce(F.col("n_tokens"), F.lit(0)) > 0,
                    F.col("n_oov") / F.col("n_tokens"),
                ),
                round_digits,
            ).alias("oov_rate"),
        )
    )


def simpson_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """(``id_col``, n_tokens, n_distinct, simpson): per-document token
    concentration — the Simpson index ``Σ_t p_t² = (Σ_t n_t²) / N²``
    (Simpson 1949; public statistics). The log-free cousin of token
    entropy for the quality battery: a document stuck on a few tokens
    (keyword stuffing, boilerplate loops, degenerate generations)
    concentrates toward 1, diverse prose sits near 1/n_distinct —
    and unlike entropy the statistic is a ratio of EXACT integers
    under one IEEE division, so it grades hash-exact. Zero-token
    documents report NULL (no distribution), never 0/0; every input
    row gets an output row.

    Shape at scale: one tokenize pass, one (id, token)-keyed count
    (map-side combinable), one id-keyed reduction — the corpus
    shuffles twice on its own keys, nothing global."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("token"),
    )
    per_tok = toks.groupBy("id", "token").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    per_doc = per_tok.groupBy("id").agg(
        F.sum("n").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("__sumsq"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce(F.col("n_distinct"), F.lit(0)).cast("long").alias("n_distinct"),
            pround(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("__sumsq")
                    / (F.col("n_tokens") * F.col("n_tokens")),
                ),
                round_digits,
            ).alias("simpson"),
        )
    )

def _value_counts(arr: Column, fn) -> Column:
    """Hand ``fn`` the exact (g, c) value-count struct array of the
    BOUND array ``arr``, computed by sorted run-length encoding:
    sort, mark run starts (first element or value change), pair each
    start with the next start, count = the gap. O(G log G) per row —
    the naive distinct×filter scan is O(G·D), which on a single
    million-gram document is a ~10¹²-comparison straggler task; this
    keeps the per-document cost sort-bounded at ANY document length.
    Values are identical (exact counts; run starts ARE the distinct
    set). Empty in → empty out; every intermediate is bound (the
    ``bind1`` rule), and the run-start predicate guards its i−1
    lookup behind a lazy CASE (element 0 would throw).

    Input contract: ``arr`` must not contain NULL elements —
    ``array_sort`` places NULLs last and the ``!=`` run-start probe is
    NULL there, so a NULL run would silently fold into the preceding
    run's count. Every consumer feeds concat_ws/split output, which
    cannot contain NULLs."""
    from margaret_spark.functions.shingling import bind1

    def with_sorted(sg: Column) -> Column:
        size = F.size(sg)

        def with_starts(bp: Column) -> Column:
            k = F.size(bp)
            nexts = F.slice(
                F.concat(
                    F.slice(bp, 2, F.greatest(k, F.lit(1))),
                    F.array(size + F.lit(1)),
                ),
                1,
                k,
            )
            z = F.zip_with(
                bp,
                nexts,
                lambda s_, e_: F.struct(
                    F.element_at(sg, s_).alias("g"),
                    (e_ - s_).alias("c"),
                ),
            )
            return fn(z)

        starts_expr = F.filter(
            gram_indices(size),
            lambda i: F.when(i == 1, F.lit(True)).otherwise(
                F.element_at(sg, i) != F.element_at(sg, i - F.lit(1))
            ),
        )
        return bind1(starts_expr, with_starts)

    return bind1(F.array_sort(arr), with_sorted)


def _gram_coverage_struct(
    ws: Column, n: int, round_digits: int
) -> Column:
    """Per-row struct (n_grams, top_gram, top_count, top_frac,
    dup_frac) for word ``n``-grams of the bound token array ``ws`` —
    the Gopher repetition-signal kernel (Rae et al. 2021, "Scaling
    Language Models", Appendix A quality heuristics; public paper).

    Definitions (documented here because the paper leaves the char
    accounting loose, and the oracle replays exactly these):

    - the normalized document is the tokens joined by single spaces;
      ``total`` chars below is its length;
    - ``top_frac``  = occurrences(top gram) · length(top gram) / total,
      where the top gram is the most frequent n-gram, ties broken by
      the lexicographically smallest gram;
    - ``dup_frac``  = Σ over distinct n-grams occurring ≥ 2 times of
      occurrences · length(gram), divided by ``total``.

    Both fractions count EVERY occurrence's full gram length, so
    overlapping occurrences can push them above 1.0 (e.g. "a a a a"
    under n=2); Rae et al. count each character of the document at
    most once, so their published thresholds sit on a different scale
    — see :func:`streaming.quality.stream_gopher_filter` for the
    calibration note where the paper's numbers are used as defaults.

    Documents with fewer than ``n`` tokens report 0 counts/fractions
    and an empty top gram. Cost is O(G log G) per document (G grams):
    the per-gram counts come from :func:`_value_counts`' sorted
    run-length encoding (array_sort + boundary flags + a prefix-sum
    fold), never a distinct-times-filter rescan — bounded by document
    length, never by corpus size; every intermediate array is BOUND
    as a lambda variable (the ``bind1`` rule) so nothing re-evaluates
    per element.
    The top gram is picked via ``array_min`` over ``(-count, gram)``
    structs — one O(D) fold, no comparator sort, and the same struct
    ordering exists in the DuckDB oracle (``list_min``)."""
    from margaret_spark.functions.shingling import bind1

    g_expr = F.transform(
        gram_indices(F.size(ws) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
    )

    def with_g(g: Column) -> Column:
        def with_z(z: Column) -> Column:
            top = F.array_min(
                F.transform(
                    z,
                    lambda s: F.struct(
                        (-s["c"]).alias("nc"), s["g"].alias("g")
                    ),
                )
            )
            dup_mass = F.aggregate(
                z,
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.when(
                    s["c"] >= 2, s["c"].cast("long") * F.length(s["g"])
                ).otherwise(F.lit(0).cast("long")),
            )
            total = F.length(F.array_join(ws, " "))
            top_count = F.coalesce(-top["nc"], F.lit(0)).cast("long")
            top_gram = F.coalesce(top["g"], F.lit(""))
            top_frac = pround(
                F.when(
                    total > 0,
                    (top_count * F.length(top_gram)).cast("double") / total,
                ).otherwise(F.lit(0.0)),
                round_digits,
            )
            dup_frac = pround(
                F.when(
                    total > 0, dup_mass.cast("double") / total
                ).otherwise(F.lit(0.0)),
                round_digits,
            )
            return F.struct(
                F.size(g).cast("long").alias("n_grams"),
                top_gram.alias("top_gram"),
                top_count.alias("top_count"),
                top_frac.alias("top_frac"),
                dup_frac.alias("dup_frac"),
            )

        return _value_counts(g, with_z)

    return bind1(g_expr, with_g)


def ngram_coverage(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 2,
    round_digits: int = 4,
) -> DataFrame:
    """(id, n_grams, top_gram, top_count, top_frac, dup_frac): the
    detailed single-``n`` repetition report — what fraction of the
    document's characters the most frequent word n-gram covers, and
    what fraction sits inside ANY duplicated n-gram. The per-document
    drill-down behind :func:`gopher_repetition`; see
    :func:`_gram_coverage_struct` for the exact char accounting.

    Shape at scale: one narrow codegen projection, no shuffle — the
    per-row cost is bounded by document length, so the pass is linear
    in corpus size at any scale. CPU-heavy per row, so the corpus is
    spread across the full parallelism first (same rationale as
    :func:`repetition_score`)."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    from margaret_spark.functions.shingling import bind1

    s = bind1(
        words(F.col(text_col)),
        lambda ws: _gram_coverage_struct(ws, n, round_digits),
    )
    staged = df.select(F.col(id_col), s.alias("__s"))
    return staged.select(
        F.col(id_col),
        F.col("__s")["n_grams"].alias("n_grams"),
        F.col("__s")["top_gram"].alias("top_gram"),
        F.col("__s")["top_count"].alias("top_count"),
        F.col("__s")["top_frac"].alias("top_frac"),
        F.col("__s")["dup_frac"].alias("dup_frac"),
    )


def gopher_repetition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
    round_digits: int = 4,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The Gopher repetition battery (Rae et al. 2021): per document,
    ``top_{n}gram_frac`` for n in ``top_ns`` (char mass of the most
    frequent n-gram) and ``dup_{n}gram_frac`` for n in ``dup_ns``
    (char mass inside duplicated n-grams). The standard web-corpus
    repetition filter reads these against fixed thresholds (e.g. the
    paper cuts docs with top-2-gram coverage > 0.20 or dup-5-gram
    coverage > 0.15); this operator reports the raw fractions so the
    cut stays a caller-side predicate.

    One codegen projection per document — all n values are computed in
    the same row pass over one bound token array; no shuffle, linear
    in corpus size.

    ``keep_cols``: extra input columns carried through unchanged.
    Composed pipelines that gate on the battery AND keep the text
    (e.g. the curation pipeline) would otherwise JOIN the fractions
    back onto a second scan of the corpus — a sort-merge join whose
    exchanges carry the full text payload; carrying the columns
    through the projection costs nothing (same single row pass)."""
    for n in tuple(top_ns) + tuple(dup_ns):
        if n < 1:
            raise ValueError(f"n must be >= 1: {n}")
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    from margaret_spark.functions.shingling import bind1

    def battery(ws: Column) -> Column:
        fields = []
        for n in top_ns:
            fields.append(
                _gram_coverage_struct(ws, n, round_digits)["top_frac"].alias(
                    f"top_{n}gram_frac"
                )
            )
        for n in dup_ns:
            fields.append(
                _gram_coverage_struct(ws, n, round_digits)["dup_frac"].alias(
                    f"dup_{n}gram_frac"
                )
            )
        return F.struct(*fields)

    staged = df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        bind1(words(F.col(text_col)), battery).alias("__b"),
    )
    cols = [F.col(id_col)]
    for n in top_ns:
        cols.append(F.col("__b")[f"top_{n}gram_frac"].alias(f"top_{n}gram_frac"))
    for n in dup_ns:
        cols.append(F.col("__b")[f"dup_{n}gram_frac"].alias(f"dup_{n}gram_frac"))
    return staged.select(*cols, *[F.col(c) for c in keep_cols])


def line_repetition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = r"\n",
    round_digits: int = 4,
) -> DataFrame:
    """(id, n_lines, n_distinct_lines, dup_line_frac, dup_char_frac):
    line-level repetition — the other half of the Gopher battery
    (duplicate-line fraction and the char mass inside duplicated
    lines). Lines are the non-empty segments after splitting on the
    ``sep`` regex; they are compared EXACTLY (no trimming beyond the
    empty-segment drop), and the char denominator is the sum of line
    lengths (separators carry no mass).

    Same shape as :func:`ngram_coverage`: one codegen projection, no
    shuffle, per-row cost O(L·D) in lines × distinct lines — bounded
    by document size, linear in corpus size."""
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    from margaret_spark.functions.shingling import bind1

    # NULL text behaves as the empty document (0 lines, 0 fractions):
    # split(NULL) is NULL and every array fold would propagate it into
    # NULL counts, breaking the every-row-reports contract
    lines_expr = F.coalesce(
        F.filter(F.split(F.col(text_col), sep), lambda seg: seg != ""),
        F.array().cast("array<string>"),
    )

    def with_lines(l: Column) -> Column:
        def with_z(z: Column) -> Column:
            n_lines = F.size(l).cast("long")
            n_distinct = F.size(z).cast("long")
            char_total = F.aggregate(
                l,
                F.lit(0).cast("long"),
                lambda acc, seg: acc + F.length(seg).cast("long"),
            )
            dup_chars = F.aggregate(
                z,
                F.lit(0).cast("long"),
                lambda acc, s: acc
                + F.when(
                    s["c"] >= 2, s["c"].cast("long") * F.length(s["g"])
                ).otherwise(F.lit(0).cast("long")),
            )
            dup_line_frac = pround(
                F.when(
                    n_lines > 0,
                    (n_lines - n_distinct).cast("double") / n_lines,
                ).otherwise(F.lit(0.0)),
                round_digits,
            )
            dup_char_frac = pround(
                F.when(
                    char_total > 0, dup_chars.cast("double") / char_total
                ).otherwise(F.lit(0.0)),
                round_digits,
            )
            return F.struct(
                n_lines.alias("n_lines"),
                n_distinct.alias("n_distinct_lines"),
                dup_line_frac.alias("dup_line_frac"),
                dup_char_frac.alias("dup_char_frac"),
            )

        return _value_counts(l, with_z)

    staged = df.select(
        F.col(id_col), bind1(lines_expr, with_lines).alias("__s")
    )
    return staged.select(
        F.col(id_col),
        F.col("__s")["n_lines"].alias("n_lines"),
        F.col("__s")["n_distinct_lines"].alias("n_distinct_lines"),
        F.col("__s")["dup_line_frac"].alias("dup_line_frac"),
        F.col("__s")["dup_char_frac"].alias("dup_char_frac"),
    )
