"""BM25 / TF-IDF retrieval: scored against a pure-python reference
model on a small fixture, plus shape/determinism checks on the real
corpus."""

import math
import os

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.search import bm25_search, tf_idf_vectors

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()

DOCS = [
    (0, "spark shuffles data between stages"),
    (1, "spark spark spark tuning guide"),
    (2, "a totally unrelated cooking recipe"),
    (3, "data pipelines move data between systems and stages"),
    (4, "tiny doc"),
]


def _ref_bm25(query, k1=1.2, b=0.75, idf_mode="ln"):
    toks = {i: t.lower().split() for i, t in DOCS}
    n = len(DOCS)
    avgdl = float(sum(len(v) for v in toks.values())) / float(n)
    qterms = sorted(set(query.lower().split()))
    dfreq = {
        t: sum(1 for v in toks.values() if t in v)
        for t in qterms
        if any(t in v for v in toks.values())
    }
    scores = {}
    for i, v in toks.items():
        s = 0.0
        nt = 0
        for t in qterms:
            tf = v.count(t)
            if tf == 0 or t not in dfreq:
                continue
            df = dfreq[t]
            if idf_mode == "ln":
                idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            else:
                idf = (n + 1.0) / (df + 0.5)
            raw = idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (len(v) / avgdl)))
            s += math.floor(raw * 1e6 + 0.5) / 1e6
            nt += 1
        if nt:
            scores[i] = (round(s, 6), nt)
    return scores


@pytest.mark.parametrize("idf_mode", ["ln", "rational"])
def test_bm25_matches_reference(spark, idf_mode):
    df = spark.createDataFrame(DOCS, "id long, text string")
    got = {
        r["id"]: (round(r["score"], 6), r["n_terms"])
        for r in bm25_search(
            df, "id", "text", "spark data stages", k=10, idf=idf_mode
        ).collect()
    }
    ref = _ref_bm25("spark data stages", idf_mode=idf_mode)
    assert set(got) == set(ref)
    for i in got:
        assert got[i][1] == ref[i][1]
        assert got[i][0] == pytest.approx(ref[i][0], abs=2e-6)


def test_bm25_ranking_properties(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    rows = bm25_search(df, "id", "text", "spark", k=3).collect()
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks) and ranks[0] == 1
    # doc 1 repeats "spark" 3x and is short — it must outrank doc 0
    by_rank = [r["id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert by_rank[0] == 1
    with pytest.raises(ValueError):
        bm25_search(df, "id", "text", "   ")
    with pytest.raises(ValueError):
        bm25_search(df, "id", "text", "spark", idf="bogus")


def test_bm25_topk_limit(docs):
    out = bm25_search(docs, "doc_id", "text", "table hash", k=5).collect()
    assert len(out) == 5
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]


def test_tfidf_vectors(spark):
    df = spark.createDataFrame(DOCS, "id long, text string")
    rows = tf_idf_vectors(df, "id", "text", vocab_size=3).collect()
    vocab = {r["token"] for r in rows}
    assert len(vocab) <= 3
    # "spark" (df=2) and "data" (df=2) are top tokens with ties on name
    assert "data" in vocab and "spark" in vocab
    # weight for doc 1's "spark": tf=3, dl=5, df=2, n=5
    w = {(r["id"], r["token"]): r["weight"] for r in rows}
    expect = (3 / 5) * ((5 + 1.0) / (2 + 0.5))
    assert w[(1, "spark")] == pytest.approx(math.floor(expect * 1e6 + 0.5) / 1e6)


def test_truncate_embeddings_and_matryoshka_recall(spark):
    """Matryoshka truncation keeps the first dims components; the
    prefix search through topk_recall reports sane per-query recall,
    and a full-width 'truncation' has recall exactly 1.0 (the approx
    arm IS the exact arm)."""
    import pytest
    from pyspark.sql import functions as F

    from margaret_spark.operators.similarity import (
        brute_force_topk,
        topk_recall,
        truncate_embeddings,
    )

    rows = [
        (i, [float((i * 7 + j * 3) % 11 - 5) for j in range(8)])
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tr = truncate_embeddings(df, 4)
    got = tr.where(F.col("vec_id") == 3).collect()[0]["embedding"]
    assert got == rows[3][1][:4]
    with pytest.raises(ValueError, match="dims must be >= 1"):
        truncate_embeddings(df, 0)

    queries = df.where(F.col("vec_id") < 4)
    exact = brute_force_topk(df, queries, k=3).select(
        "query_id", "neighbor_id"
    )
    approx = brute_force_topk(
        tr, tr.where(F.col("vec_id") < 4), k=3
    ).select("query_id", "neighbor_id")
    qids = queries.select(F.col("vec_id").alias("query_id"))
    rec = {r.query_id: r for r in topk_recall(exact, approx, qids).collect()}
    assert len(rec) == 4
    for r in rec.values():
        assert r.n_exact == 3 and 0.0 <= r.recall <= 1.0
    # full-width prefix: approx == exact => recall 1.0 everywhere
    full = topk_recall(exact, exact, qids).collect()
    assert all(r.recall == 1.0 and r.n_hits == 3 for r in full)


def test_pca_power_iteration_finds_planted_direction(spark):
    """PCA on a strongly anisotropic hand corpus: points spread along
    (0.6, 0.8) with tiny orthogonal noise. The power iterate converges
    to the planted direction, the sign convention makes the first
    nonzero component positive, the eigenvalue approximates the
    planted variance, and the covariance table is symmetric."""
    import pytest

    from margaret_spark.operators.pca import (
        covariance_matrix,
        pca_top_component,
        power_iteration,
    )

    # t in [-10, 10) along (0.6, 0.8); orthogonal jitter +/- 0.05
    rows = []
    for i in range(40):
        t = (i - 20) * 0.5
        o = ((i * 7) % 5 - 2) * 0.025
        rows.append((i, [0.6 * t - 0.8 * o, 0.8 * t + 0.6 * o]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cov = covariance_matrix(df, "embedding")
    c = {(r.i, r.j): r.c for r in cov.collect()}
    assert c[(0, 1)] == c[(1, 0)]  # symmetric
    assert c[(0, 0)] > 0 and c[(1, 1)] > 0

    out = {r.pos: r for r in pca_top_component(df, iters=12).collect()}
    v0, v1 = out[0].component, out[1].component
    assert v0 > 0  # sign convention: first nonzero positive
    assert abs(v0 - 0.6) < 0.01 and abs(v1 - 0.8) < 0.01
    lam = out[0].eigenvalue
    assert out[1].eigenvalue == lam  # one value on every row
    # planted variance along the direction: E[t^2] over the grid
    want = sum(((i - 20) * 0.5) ** 2 for i in range(40)) / 40
    assert abs(lam - want) / want < 0.05

    with pytest.raises(ValueError, match="iters must be >= 0"):
        power_iteration(cov, 2, iters=-1)
    with pytest.raises(ValueError, match="empty corpus"):
        pca_top_component(df.where("vec_id < 0"))

    # method passthrough: the relational covariance path reaches the
    # same eigenvector (bit-identical arithmetic, pytest-pinned at the
    # covariance layer; here the composed surface)
    rel = {
        r.pos: r.component
        for r in pca_top_component(df, iters=12, method="relational").collect()
    }
    assert rel == {p: r.component for p, r in out.items()}

    # arrow int64-exactness guard: at comp_digits=16 the safe batch is
    # ~14 rows, so a 40-row single-partition batch must fail loudly
    # (numpy int64 overflow would otherwise wrap SILENTLY)
    # (the executor-side ValueError surfaces PySpark-wrapped)
    with pytest.raises(Exception, match="int64-exactness bound"):
        covariance_matrix(df.coalesce(1), "embedding", comp_digits=16).collect()


def test_pca_project_recovers_planted_coordinate(spark):
    """Projecting the planted-direction corpus onto its own fitted
    component recovers each point's coordinate along (0.6, 0.8)."""
    from margaret_spark.operators.pca import pca_project, pca_top_component

    rows = []
    for i in range(40):
        t = (i - 20) * 0.5
        o = ((i * 7) % 5 - 2) * 0.025
        rows.append((i, [0.6 * t - 0.8 * o, 0.8 * t + 0.6 * o]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    comp = pca_top_component(df, iters=12)
    got = {r.vec_id: r.proj for r in pca_project(df, comp).collect()}
    assert len(got) == 40
    for i in range(40):
        t = (i - 20) * 0.5
        assert abs(got[i] - t) < 0.05, (i, got[i], t)


def test_power_iteration_rejects_sparse_covariance(spark):
    # the packed array indexes as ca[i*d+j]: a sparse (i, j, c) input
    # would silently SHIFT every later entry — must fail loudly
    import pytest as _pytest

    from margaret_spark.operators.pca import power_iteration

    sparse = spark.createDataFrame(
        [(0, 0, 1.0), (1, 1, 1.0), (0, 1, 0.5)],  # missing (1, 0)
        "i long, j long, c double",
    )
    with _pytest.raises(Exception, match="must be dense"):
        power_iteration(sparse, 2, iters=1).collect()


def test_covariance_arrow_equals_relational(spark):
    # the arrow grammian must be BIT-identical to the relational
    # pround/DECIMAL tree — same floors, same division tail
    import random

    from margaret_spark.operators.pca import covariance_matrix

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    rel = {
        (r["i"], r["j"]): r["c"]
        for r in covariance_matrix(df, "embedding", method="relational").collect()
    }
    arr = {
        (r["i"], r["j"]): r["c"]
        for r in covariance_matrix(df, "embedding", method="arrow").collect()
    }
    assert rel == arr
    assert len(arr) == 36


def test_covariance_arrow_guards(spark):
    import pytest as _pytest

    from margaret_spark.operators.pca import covariance_matrix

    big = spark.createDataFrame(
        [(0, [100.0, 0.0]), (1, [0.0, 100.0])],
        "vec_id long, embedding array<double>",
    )
    with _pytest.raises(Exception, match="relational"):
        covariance_matrix(big, "embedding", method="arrow").collect()
    ragged = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(Exception, match="ragged|width"):
        covariance_matrix(ragged, "embedding", method="arrow").collect()
    with _pytest.raises(ValueError, match="method"):
        covariance_matrix(big, "embedding", method="bogus")
