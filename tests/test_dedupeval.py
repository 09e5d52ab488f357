"""Dedup-quality eval harness (operators.dedupeval): planting is
deterministic and content-free, metrics are exact set arithmetic, and
on an organic-dup-free corpus the families hit their known scores."""

import hashlib

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.dedupeval import (
    PLANT_OFFSET,
    PLANT_PREFIXES,
    pair_metrics,
    plant_embedding_duplicates,
    plant_text_duplicates,
)


def _clean_docs(spark, n=40, tokens=30):
    """Organic-dup-free corpus: every doc uses its own vocabulary."""
    rows = [
        (i, " ".join(f"w{i}x{j}" for j in range(tokens))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string"), rows


def _expected_sel(ids):
    return sorted(
        i
        for i in ids
        if hashlib.md5(str(i).encode()).hexdigest()[0] in PLANT_PREFIXES
    )


def test_plant_text_duplicates_selection_and_truth(spark):
    docs, rows = _clean_docs(spark)
    planted, truth = plant_text_duplicates(docs, "doc_id", "text", mutate="none")
    sel = _expected_sel([i for i, _ in rows])
    t = sorted((r.id_a, r.id_b) for r in truth.collect())
    assert t == [(i, i + PLANT_OFFSET) for i in sel]
    assert planted.count() == len(rows) + len(sel)
    # exact copies really are exact; token copies differ by one suffix
    texts = {r.doc_id: r.text for r in planted.collect()}
    for i in sel:
        assert texts[i + PLANT_OFFSET] == texts[i]
    planted2, _ = plant_text_duplicates(docs, "doc_id", "text", mutate="token")
    texts2 = {r.doc_id: r.text for r in planted2.collect()}
    for i in sel:
        assert texts2[i + PLANT_OFFSET] == texts2[i] + f" zqdup{i}"
    with pytest.raises(ValueError):
        plant_text_duplicates(docs, "doc_id", "text", mutate="scramble")


def test_pair_metrics_exact_math_and_normalization(spark):
    # pred has a reversed pair, a duplicate, one hit, one miss
    pred = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 4), (5, 6)], "id_a long, id_b long"
    )
    truth = spark.createDataFrame(
        [(1, 2), (3, 4), (7, 8)], "id_a long, id_b long"
    )
    row = pair_metrics(pred, truth).collect()[0]
    assert (row.n_pred, row.n_truth, row.tp) == (3, 3, 2)
    assert row.precision == pytest.approx(2 / 3, abs=1e-6)
    assert row.recall == pytest.approx(2 / 3, abs=1e-6)
    assert row.f1 == pytest.approx(4 / 6, abs=1e-6)
    # empty prediction: ratios pin to 0.0, no NULL/NaN
    empty = pred.where(F.lit(False))
    row = pair_metrics(empty, truth).collect()[0]
    assert (row.n_pred, row.n_truth, row.tp) == (0, 3, 0)
    assert (row.precision, row.recall, row.f1) == (0.0, 0.0, 0.0)


def test_exact_family_perfect_on_clean_corpus(spark):
    docs, _ = _clean_docs(spark)
    planted, truth = plant_text_duplicates(docs, "doc_id", "text", mutate="none")
    h = planted.select("doc_id", F.md5("text").alias("h"))
    pred = (
        h.alias("a")
        .join(h.alias("b"), "h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
    )
    row = pair_metrics(pred, truth).collect()[0]
    assert (row.precision, row.recall, row.f1) == (1.0, 1.0, 1.0)


def test_jaccard_and_minhash_recall_on_clean_corpus(spark):
    from margaret_spark.operators.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_pairs,
    )

    docs, _ = _clean_docs(spark, n=40, tokens=30)
    planted, truth = plant_text_duplicates(docs, "doc_id", "text", mutate="token")
    # one appended token on a 30-token doc: jaccard = 28/32 = 0.875,
    # far above the 0.2 threshold; disjoint vocab kills cross pairs
    jac = ngram_jaccard_pairs(planted, "doc_id", "text", threshold=0.2)
    row = pair_metrics(jac, truth).collect()[0]
    assert (row.precision, row.recall) == (1.0, 1.0)
    # banding at jaccard .875 with 16 bands of 4 collides w.p. ~1;
    # assert >=0.9 to keep hash-layout slack
    mh = minhash_dedup_pairs(planted, "doc_id", "text", threshold=0.2)
    row = pair_metrics(mh, truth).collect()[0]
    assert row.precision == 1.0
    assert row.recall >= 0.9
    # and the banding can only LOSE pairs vs the exact family
    assert row.tp <= pair_metrics(jac, truth).collect()[0].tp


def test_simhash_eval_structure_and_determinism(spark):
    from margaret_spark.operators.dedup import simhash_dedup_pairs

    docs, _ = _clean_docs(spark, n=30, tokens=30)
    planted, truth = plant_text_duplicates(docs, "doc_id", "text", mutate="token")
    pred = simhash_dedup_pairs(planted, "doc_id", "text", max_hamming=3)
    a = pair_metrics(pred, truth).collect()[0]
    b = pair_metrics(pred, truth).collect()[0]
    assert a == b
    # disjoint vocabularies: any predicted pair IS a planted pair
    # (precision 1.0 whenever anything is predicted at all)
    assert a.n_truth == truth.count()
    assert a.precision in (0.0, 1.0)
    assert a.tp == a.n_pred


def test_embedding_family_perfect_on_separated_vectors(spark):
    from margaret_spark.operators.dedup import embedding_dedup_pairs_ivf

    # 24 well-separated unit-ish vectors in R^8 (one-hot + tiny tail)
    rows = [
        (i, [1.0 if j == i % 8 else 0.001 * ((i + j) % 5) for j in range(8)])
        for i in range(24)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    planted, truth = plant_embedding_duplicates(
        emb, "vec_id", "embedding", eps=0.01
    )
    pred = embedding_dedup_pairs_ivf(
        planted, "vec_id", "embedding", threshold=0.9, nlist=4
    )
    row = pair_metrics(pred, truth).collect()[0]
    # +0.01 on every component keeps cosine ~0.9999 and the cell
    # unchanged -> every planted pair is found...
    assert row.recall == 1.0
    # ...but same-axis vectors (i ≡ i+8 mod 8) are organic near-dups,
    # so planted-precision is a lower bound BY DESIGN — it must still
    # count every planted pair
    assert row.tp == row.n_truth


def test_id_metrics_math(spark):
    from margaret_spark.operators.dedupeval import id_metrics

    pred = spark.createDataFrame([(1,), (1,), (2,), (5,)], "doc_id long")
    truth = spark.createDataFrame([(1,), (2,), (3,), (4,)], "doc_id long")
    row = id_metrics(pred, truth, "doc_id").collect()[0]
    assert (row.n_pred, row.n_truth, row.tp) == (3, 4, 2)
    assert row.precision == pytest.approx(2 / 3, abs=1e-6)
    assert row.recall == pytest.approx(0.5, abs=1e-6)
    assert row.f1 == pytest.approx(4 / 7, abs=1e-6)
    # empty truth: all ratios pin to 0.0
    row = id_metrics(pred, truth.where(F.lit(False)), "doc_id").collect()[0]
    assert (row.n_truth, row.recall, row.precision) == (0, 0.0, 0.0)


def test_plant_ingest_batch_and_incremental_eval(spark):
    from margaret_spark.operators.dedup import incremental_exact_dedup
    from margaret_spark.operators.dedupeval import (
        id_metrics,
        plant_ingest_batch,
    )

    docs, rows = _clean_docs(spark)
    incoming, truth = plant_ingest_batch(docs, "doc_id", "text")
    sel = _expected_sel([i for i, _ in rows])
    fresh = sorted(
        i
        for i, _ in rows
        if hashlib.md5(str(i).encode()).hexdigest()[0] in ("3", "4")
    )
    # batch composition: copies at +OFFSET, fresh at +2*OFFSET with a
    # suffix no original contains
    got = {r.doc_id: r.text for r in incoming.collect()}
    assert sorted(got) == sorted(
        [i + PLANT_OFFSET for i in sel] + [i + 2 * PLANT_OFFSET for i in fresh]
    )
    originals = {t for _, t in rows}
    for i in sel:
        assert got[i + PLANT_OFFSET] in originals
    for i in fresh:
        assert got[i + 2 * PLANT_OFFSET].endswith(f" zqnew{i}")
        assert got[i + 2 * PLANT_OFFSET] not in originals
    # on a clean corpus the exact incremental detector is perfect
    labeled = incremental_exact_dedup(incoming, docs, "doc_id", "text")
    pred = labeled.where(F.col("status") == "dup_of_existing").select("doc_id")
    m = id_metrics(pred, truth, "doc_id").collect()[0]
    assert (m.n_pred, m.n_truth, m.tp) == (len(sel), len(sel), len(sel))
    assert m.precision == 1.0 and m.recall == 1.0 and m.f1 == 1.0


def test_plant_cross_corpus_boundary_and_eval(spark):
    from margaret_spark.operators.dedup import ngram_jaccard_join
    from margaret_spark.operators.dedupeval import plant_cross_corpus

    docs, rows = _clean_docs(spark)
    existing, incoming, truth = plant_cross_corpus(docs, "doc_id", "text")
    evens = [i for i, _ in rows if i % 2 == 0]
    odds = [i for i, _ in rows if i % 2 == 1]
    sel = _expected_sel(evens)
    assert sorted(r.doc_id for r in existing.collect()) == evens
    assert sorted(r.doc_id for r in incoming.collect()) == sorted(
        odds + [i + PLANT_OFFSET for i in sel]
    )
    # every truth pair crosses the corpus boundary
    t = sorted((r.id_a, r.id_b) for r in truth.collect())
    assert t == [(i, i + PLANT_OFFSET) for i in sel]
    # clean corpus: the join finds exactly the planted pairs
    pred = ngram_jaccard_join(
        existing, incoming, "doc_id", "text",
        threshold=0.2, mode="word", n=3, max_df="auto",
    ).select(F.col("left_id").alias("id_a"), F.col("right_id").alias("id_b"))
    m = pair_metrics(pred, truth).collect()[0]
    assert m.precision == 1.0 and m.recall == 1.0


def test_plant_excerpt_and_overlap_eval(spark):
    from margaret_spark.operators.dedup import ngram_jaccard_pairs
    from margaret_spark.operators.dedupeval import plant_excerpt_duplicates

    docs, rows = _clean_docs(spark)
    planted, truth = plant_excerpt_duplicates(docs, "doc_id", "text")
    sel = _expected_sel([i for i, _ in rows])
    texts = {r.doc_id: r.text for r in planted.collect()}
    for i in sel:
        # the copy is exactly the first half of its source's tokens
        toks = texts[i].split()
        assert texts[i + PLANT_OFFSET] == " ".join(toks[: (len(toks) + 1) // 2])
    # overlap at 0.9 finds every planted excerpt; jaccard at the same
    # bar finds none (clean corpus: excerpt jaccard ~ 0.5)
    ov = ngram_jaccard_pairs(
        planted, "doc_id", "text", threshold=0.9, measure="overlap"
    ).select("id_a", "id_b")
    m = pair_metrics(ov, truth).collect()[0]
    assert m.precision == 1.0 and m.recall == 1.0
    jc = ngram_jaccard_pairs(planted, "doc_id", "text", threshold=0.9)
    assert jc.count() == 0


def test_keep_best_eval_drops_planted_excerpts_on_clean_corpus(spark):
    from margaret_spark.operators.dedup import (
        dedup_clusters,
        keep_best_per_cluster,
        ngram_jaccard_pairs,
    )
    from margaret_spark.operators.dedupeval import (
        id_metrics,
        plant_excerpt_duplicates,
    )
    from margaret_spark.operators.text import quality_score

    # per-doc unique vocab, no token repeats: the excerpt's diversity
    # equals the source's, so the length term decides and every
    # planted excerpt must be dropped
    docs, rows = _clean_docs(spark)
    planted, truth = plant_excerpt_duplicates(docs, "doc_id", "text")
    pairs = ngram_jaccard_pairs(
        planted, "doc_id", "text", threshold=0.9, measure="overlap"
    ).select("id_a", "id_b")
    clusters = dedup_clusters(planted, pairs, "doc_id")
    kept = keep_best_per_cluster(
        quality_score(planted, "doc_id", "text"), clusters, "doc_id"
    )
    dropped = planted.select("doc_id").join(
        kept.select("doc_id"), "doc_id", "left_anti"
    )
    m = id_metrics(
        dropped, truth.select(F.col("id_b").alias("doc_id")), "doc_id"
    ).collect()[0]
    assert m.precision == 1.0 and m.recall == 1.0
