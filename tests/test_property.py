"""Property-based contract tests: the query algebra on both backends
must agree with an independent list-slicing model for every
combination of bounds, limit, reverse, and seq-wrap — a generative
version of the reference's golden table (``test/simple.go:126-254``).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from margaret_spark import Gt, Gte, Limit, Lt, Lte, MemLog, OffsetLog, Reverse, SeqWrap

VALUES = [v * 10 for v in range(7)]  # seqs 0..6


@pytest.fixture(scope="module")
def logs(spark, tmp_path_factory):
    mem = MemLog(spark)
    mem.append_many(VALUES)
    off = OffsetLog(spark, str(tmp_path_factory.mktemp("prop") / "log"))
    off.append_many(VALUES)
    return [mem, off]


spec_strategy = st.fixed_dictionaries(
    {
        "lo": st.one_of(
            st.none(),
            st.tuples(st.sampled_from(["gt", "gte"]), st.integers(-2, 8)),
        ),
        "hi": st.one_of(
            st.none(),
            st.tuples(st.sampled_from(["lt", "lte"]), st.integers(-2, 8)),
        ),
        "limit": st.one_of(st.none(), st.integers(0, 8)),
        "reverse": st.booleans(),
        "seqwrap": st.booleans(),
    }
)


def model(case):
    entries = list(enumerate(VALUES))
    if case["lo"] is not None:
        kind, s = case["lo"]
        entries = [e for e in entries if (e[0] > s if kind == "gt" else e[0] >= s)]
    if case["hi"] is not None:
        kind, s = case["hi"]
        entries = [e for e in entries if (e[0] < s if kind == "lt" else e[0] <= s)]
    if case["reverse"]:
        entries = entries[::-1]
    if case["limit"] is not None:
        entries = entries[: case["limit"]]
    return entries if case["seqwrap"] else [v for _, v in entries]


def specs_of(case):
    specs = []
    if case["lo"] is not None:
        kind, s = case["lo"]
        specs.append(Gt(s) if kind == "gt" else Gte(s))
    if case["hi"] is not None:
        kind, s = case["hi"]
        specs.append(Lt(s) if kind == "lt" else Lte(s))
    if case["limit"] is not None:
        specs.append(Limit(case["limit"]))
    if case["reverse"]:
        specs.append(Reverse(True))
    if case["seqwrap"]:
        specs.append(SeqWrap(True))
    return specs


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=spec_strategy)
def test_query_algebra_matches_model(logs, case):
    expect = model(case)
    for log in logs:
        got = list(log.query(*specs_of(case)))
        assert got == expect, f"{type(log).__name__} {case}: {got} != {expect}"


# --- chunking: generative twin of the sequential model --------------------

chunk_case = st.fixed_dictionaries(
    {
        "texts": st.lists(
            st.text(
                alphabet=st.sampled_from("ab \t\n"), min_size=0, max_size=60
            ),
            min_size=1,
            max_size=6,
        ),
        "chunk": st.integers(1, 12),
        "overlap": st.integers(0, 11),
    }
)


def _chunk_model(text, chunk, ov):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    stride = chunk - ov
    nc = 1 + max(0, -(-(n - chunk) // stride)) if n > chunk else 1
    out = []
    for i in range(nc):
        s, e = i * stride, min(i * stride + chunk, n)
        out.append((i, s, e, e - s, " ".join(toks[s:e])))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=chunk_case)
def test_chunk_documents_matches_model(spark, case):
    from margaret_spark.operators.chunking import chunk_documents

    chunk, ov = case["chunk"], min(case["overlap"], case["chunk"] - 1)
    df = spark.createDataFrame(
        list(enumerate(case["texts"])), "id long, text string"
    )
    got = {}
    rows = chunk_documents(
        df, "id", "text", chunk_tokens=chunk, overlap=ov
    ).collect()
    for r in rows:
        got.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["start_tok"], r["end_tok"], r["n_tokens"], r["chunk_text"])
        )
    for i, text in enumerate(case["texts"]):
        assert sorted(got[i]) == _chunk_model(text, chunk, ov), (i, text)


# --- sublog rank algebra: generative twin over the RANK domain ------------


@pytest.fixture(scope="module")
def sub_mlogs(spark, tmp_path_factory):
    from margaret_spark.multilog import MemMultiLog, OffsetMultiLog

    members = [3, 7, 12, 20, 41]  # arbitrary non-dense main seqs
    mem = MemMultiLog(spark)
    off = OffsetMultiLog(
        spark, str(tmp_path_factory.mktemp("subprop") / "ml")
    )
    subs = []
    for ml in (mem, off):
        s = ml.get("k")
        for v in members:
            s.append(v)
        subs.append(s)
    return members, subs


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=spec_strategy)
def test_sublog_rank_algebra_matches_model(sub_mlogs, case):
    """The §2.2 algebra over the rank domain (sublog.Query,
    roaring/qry.go:86-147): bounds/limit/reverse/wrap apply to RANKS,
    values are the rank-ordered member seqs."""
    members, subs = sub_mlogs
    entries = list(enumerate(members))  # (rank, main_seq)
    c = dict(case)
    if c["lo"] is not None:
        kind, s = c["lo"]
        entries = [e for e in entries if (e[0] > s if kind == "gt" else e[0] >= s)]
    if c["hi"] is not None:
        kind, s = c["hi"]
        entries = [e for e in entries if (e[0] < s if kind == "lt" else e[0] <= s)]
    if c["reverse"]:
        entries = entries[::-1]
    if c["limit"] is not None:
        entries = entries[: c["limit"]]
    expect = entries if c["seqwrap"] else [v for _, v in entries]
    for sub in subs:
        got = list(sub.query(*specs_of(case)))
        assert got == expect, f"{type(sub._mlog).__name__} {case}"


# ---------------------------------------------------------------------------
# bounded-horizon dedup rule vs the sequential model (no Spark: the
# applyInPandasWithState function is driven directly with a fake state)
# ---------------------------------------------------------------------------


class _FakeState:
    """The GroupState surface _window_dedup_func uses."""

    def __init__(self):
        self._v = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        assert self._v is not None
        return self._v

    def update(self, v):
        self._v = tuple(v)

    def remove(self):
        self._v = None


@settings(max_examples=60, deadline=None)
@given(
    contents=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=40),
    ttl=st.integers(min_value=1, max_value=12),
    cuts=st.sets(st.integers(min_value=1, max_value=39), max_size=6),
)
def test_window_dedup_rule_matches_model_any_batching(contents, ttl, cuts):
    """For ANY content stream and ANY micro-batch split, the stateful
    function emits exactly the rows the SQL rule keeps (prev IS NULL
    OR seq - prev > ttl), and per-key state is always one long."""
    import pandas as pd

    from margaret_spark.streaming.stateful import _window_dedup_func_factory

    # sequential model over the whole stream
    last_seen: dict[int, int] = {}
    expect = set()
    for seq, c in enumerate(contents):
        if c not in last_seen or seq - last_seen[c] > ttl:
            expect.add(seq)
        last_seen[c] = seq

    # drive the per-key function over random batch boundaries
    fn = _window_dedup_func_factory(ttl)
    bounds = sorted(b for b in cuts if b < len(contents)) + [len(contents)]
    states: dict[int, _FakeState] = {}
    got = set()
    start = 0
    for end in bounds:
        batch = list(enumerate(contents))[start:end]
        per_key: dict[int, list[int]] = {}
        for seq, c in batch:
            per_key.setdefault(c, []).append(seq)
        for c, seqs in per_key.items():
            st_ = states.setdefault(c, _FakeState())
            pdfs = iter([pd.DataFrame({"seq": seqs})])
            for out in fn((str(c),), pdfs, st_):
                got.update(int(s) for s in out["keep_seq"])
        start = end
    assert got == expect, (contents, ttl, bounds)
    for c, st_ in states.items():
        if st_.exists:
            assert st_.get == (max(s for s, x in enumerate(contents) if x == c),)


# --- duplicate-span property: Spark result == sequential model -------------

def _span_model(texts, n, scope):
    """Reference implementation of duplicate_spans: positional grams,
    duplicated-gram set, per-doc island merge."""
    toks = {i: [w for w in (t or "").lower().split() if w] for i, t in texts}
    grams = []  # (doc, pos1based, gram)
    for i, ws in toks.items():
        for p in range(len(ws) - n + 1):
            grams.append((i, p + 1, tuple(ws[p : p + n])))
    by_gram = {}
    for i, p, g in grams:
        by_gram.setdefault(g, []).append(i)
    if scope == "cross_doc":
        dup = {g for g, ids in by_gram.items() if min(ids) != max(ids)}
    else:
        dup = {g for g, ids in by_gram.items() if len(ids) >= 2}
    out = set()
    for i in sorted(toks):
        hits = sorted(p for d, p, g in grams if d == i and g in dup)
        start = prev = None
        for p in hits:
            if prev is None or p > prev + n:
                if start is not None:
                    out.add((i, start, prev + n - 1, prev + n - start))
                start = p
            prev = p
        if start is not None:
            out.add((i, start, prev + n - 1, prev + n - start))
    return out


span_case = st.fixed_dictionaries(
    {
        # tiny alphabet forces cross-doc and within-doc collisions
        "texts": st.lists(
            st.lists(
                st.sampled_from(["a", "b", "c"]), min_size=0, max_size=14
            ).map(" ".join),
            min_size=1,
            max_size=5,
        ),
        "n": st.integers(min_value=1, max_value=4),
        "scope": st.sampled_from(["cross_doc", "any"]),
    }
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=span_case)
def test_duplicate_spans_matches_model(spark, case):
    from margaret_spark.operators.dedup import duplicate_spans

    texts = list(enumerate(case["texts"]))
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.n_tokens)
        for r in duplicate_spans(
            df, "doc_id", "text", n=case["n"], scope=case["scope"]
        ).collect()
    }
    assert got == _span_model(texts, case["n"], case["scope"])


# ---------------------------------------------------------------------------
# codec round-trips: any valid PNG of the supported subset (mixed
# per-scanline filters — encoders in the wild choose per line) and any
# PCM16 WAV must decode back to the exact sample stream
# ---------------------------------------------------------------------------

png_case = st.fixed_dictionaries(
    {
        "w": st.integers(1, 12),
        "h": st.integers(1, 10),
        "ctype": st.sampled_from([0, 2, 6]),
        "seed": st.integers(0, 2**31),
        "filters": st.lists(st.integers(0, 4), min_size=10, max_size=10),
    }
)


@given(case=png_case)
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_mixed_filters(case):
    import random
    import struct
    import zlib

    from margaret_spark.operators.media_codecs import (
        _CHANNELS,
        _PNG_SIG,
        _chunk,
        _paeth,
        decode_png,
    )

    w, h, ctype = case["w"], case["h"], case["ctype"]
    ch = _CHANNELS[ctype]
    rng = random.Random(case["seed"])
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    stride = w * ch
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = px[y * stride : (y + 1) * stride]
        ftype = case["filters"][y % len(case["filters"])]
        filt = bytearray(line)
        if ftype == 1:
            for i in range(stride - 1, ch - 1, -1):
                filt[i] = (filt[i] - line[i - ch]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                filt[i] = (filt[i] - prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                filt[i] = (filt[i] - ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                filt[i] = (filt[i] - _paeth(a, prev[i], c)) & 0xFF
        raw.append(ftype)
        raw += filt
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    blob = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )
    gw, gh, gch, out = decode_png(blob)
    assert (gw, gh, gch) == (w, h, ch)
    assert out == px


wav_case = st.fixed_dictionaries(
    {
        "rate": st.integers(1, 192_000),
        "channels": st.integers(1, 4),
        "frames": st.integers(0, 50),
        "seed": st.integers(0, 2**31),
    }
)


@given(case=wav_case)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_any_rate_channels(case):
    import random

    from margaret_spark.operators.media_codecs import (
        decode_wav,
        encode_wav,
        wav_meta,
    )

    rng = random.Random(case["seed"])
    n = case["frames"] * case["channels"]
    samples = [rng.randrange(-32768, 32768) for _ in range(n)]
    blob = encode_wav(case["rate"], samples, channels=case["channels"])
    assert wav_meta(blob) == (case["rate"], case["frames"], case["channels"])
    rate, ch, got = decode_wav(blob)
    assert (rate, ch) == (case["rate"], case["channels"])
    assert got == samples


# --- Gopher repetition kernels vs a pure-Python model ---------------

_tok = st.sampled_from(["a", "b", "ab", "ccc", "dd"])
_doc = st.lists(_tok, min_size=0, max_size=12).map(" ".join)


def _pr4(x: float) -> float:
    import math

    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _cov_model(text: str, n: int):
    from collections import Counter

    toks = [t for t in text.split() if t]
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    total = len(" ".join(toks))
    c = Counter(grams)
    if c:
        ng, cnt = min(((-v, g) for g, v in c.items()))[1], max(c.values())
        top_gram, top_count = ng if c[ng] == cnt else min(
            g for g, v in c.items() if v == cnt
        ), cnt
    else:
        top_gram, top_count = "", 0
    top_frac = _pr4(top_count * len(top_gram) / total) if total > 0 else 0.0
    dup = sum(v * len(g) for g, v in c.items() if v >= 2)
    dup_frac = _pr4(dup / total) if total > 0 else 0.0
    return len(grams), top_gram, top_count, top_frac, dup_frac


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(_doc, min_size=1, max_size=6),
    n=st.integers(1, 4),
)
def test_ngram_coverage_matches_model(spark, docs, n):
    from margaret_spark.operators.text import ngram_coverage

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_grams, r.top_gram, r.top_count, r.top_frac, r.dup_frac)
        for r in ngram_coverage(df, "doc_id", "text", n=n).collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _cov_model(d, n), (d, n)


def _line_model(text: str):
    segs = [s for s in (text or "").split("\n") if s != ""]
    n, nd = len(segs), len(set(segs))
    from collections import Counter

    c = Counter(segs)
    chars = sum(len(s) for s in segs)
    dup = sum(v * len(s) for s, v in c.items() if v >= 2)
    return (
        n,
        nd,
        _pr4((n - nd) / n) if n > 0 else 0.0,
        _pr4(dup / chars) if chars > 0 else 0.0,
    )


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["x", "yy", "x yy", ""]), min_size=0, max_size=6
        ).map("\n".join),
        min_size=1,
        max_size=6,
    )
)
def test_line_repetition_matches_model(spark, docs):
    from margaret_spark.operators.text import line_repetition

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (
            r.n_lines, r.n_distinct_lines, r.dup_line_frac, r.dup_char_frac
        )
        for r in line_repetition(df, "doc_id", "text").collect()
    }
    for i, d in enumerate(docs):
        assert got[i] == _line_model(d), repr(d)
