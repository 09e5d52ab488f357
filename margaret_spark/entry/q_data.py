"""Graded contract queries: dedup, ANN/vector, text-analysis and document-pipeline families (split from __spark_entry__)."""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.vectors import cosine_sim
from margaret_spark.operators.dedup import (
    embedding_dedup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from margaret_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
from margaret_spark.operators.temporal import asof_join, range_join
from margaret_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from margaret_spark.qry import Gt, Gte, Limit, Lte, Reverse, build_plan, apply_plan
from margaret_spark.indexes import latest_by_key, fanout
from margaret_spark.entry.common import _defer_cleanup, _events, _t



# ---------------------------------------------------------------------------
# Beyond-reference: dedup / similarity / text / multimodal
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text")


def q_dedup_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs with the deterministic df-cap
    (max_df='auto' = max(100, n_docs/2)): shingles in over half the
    corpus are dropped by a broadcast stop-list anti-join BEFORE the
    posting lists form, so no O(df²) in-array pair blow-up survives at
    any corpus size. The oracle mirrors the cap with the same
    HAVING-count stop CTE, so results stay hash-exact on the capped
    universe."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )


def q_dedup_lsh_plan(spark, sf_dir):
    """MinHash-LSH banding design table (dedup.lsh_parameter_plan):
    one row per divisor split of 128 hashes into bands×rows, scored by
    the S-curve p(s)=1−(1−s^r)^b at jaccard threshold 0.8 — collision
    probability at the threshold plus the false-positive /
    false-negative masses (composite Simpson on a fixed grid). The
    planning half the minhash family was missing: pick the split with
    the smallest total_error BEFORE paying a corpus-scale banding
    pass. Every power is a left-fold of multiplications (pow with a
    runtime exponent is the non-portable ln family), so the whole
    table is hash-exact."""
    from margaret_spark.operators.dedup import lsh_parameter_plan

    return lsh_parameter_plan(
        spark, num_hashes=128, threshold=0.8, simpson_steps=200
    )


def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH verified pairs (no SQL oracle: hash-permutation
    banding isn't expressible; the exact twin is q_dedup_jaccard)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.2)


def q_dedup_simhash(spark, sf_dir):
    """SimHash hamming pairs (no SQL oracle: bit-sig banding).
    max_hamming=3 on 64-bit signatures is the classic near-dup
    setting; with 4 pigeonhole blocks of 16 bits, block buckets stay
    small and the candidate join cheap."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=3)


def q_dedup_embedding(spark, sf_dir):
    """Candidate-based embedding near-dup (the 100 TB path): vectors
    are assigned to their nearest IVF cell (same deterministic seeded
    centroids as ann_ivf) and pairs are cosine-verified WITHIN a cell
    only — an equi-join keyed on cell id, O(N²/nlist) cosines, never
    the all-pairs O(N²) stage. The oracle mirrors the cell CTE, so the
    candidates+verify result is hash-exact. The exact all-pairs mode
    remains available as ``embedding_dedup_pairs`` (blocked-matrix
    scoring) for corpora small enough to afford it."""
    from margaret_spark.operators.dedup import embedding_dedup_pairs_ivf

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_dedup_pairs_ivf(
        emb, "vec_id", "embedding", threshold=0.45, nlist=16
    )


def q_dedup_cross_corpus(spark, sf_dir):
    """Cross-corpus near-dup JOIN (dedup.ngram_jaccard_join): the
    even-id half of the corpus (existing) against the odd-id half
    (new crawl) at exact n-gram Jaccard ≥ 0.2 — the near-dup version
    of dedup_incremental, completing the ingest-dedup matrix (exact /
    containment / near-dup). Same group-then-combine shape and
    max_df='auto' cap (resolved over the COMBINED corpora) as the
    self-join; the oracle mirrors both."""
    from margaret_spark.operators.dedup import ngram_jaccard_join

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_join(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
        threshold=0.2,
        mode="word",
        n=3,
        max_df="auto",
    )


def _planted_docs(spark, sf_dir, mutate):
    from margaret_spark.operators.dedupeval import plant_text_duplicates

    docs = _t(spark, sf_dir, "documents")
    return plant_text_duplicates(docs, "doc_id", "text", mutate=mutate)


def q_dedup_eval_exact(spark, sf_dir):
    """Dedup-quality harness, exact family: plant EXACT copies of the
    md5-selected 3/16 of the corpus (operators.dedupeval), predict
    pairs by content-hash equality, score precision/recall/f1 against
    the planted truth. Harness-only shape: the md5(text) equi-self-
    join emits O(group²) pairs per duplicate group — fine on a planted
    eval sample; production dedup uses exact_dedup's group-by.
    Hash-exact (integer counts, single IEEE divisions)."""
    from margaret_spark.operators.dedupeval import pair_metrics

    planted, truth = _planted_docs(spark, sf_dir, "none")
    h = planted.select("doc_id", F.md5("text").alias("__h"))
    pred = (
        h.alias("a")
        .join(h.alias("b"), "__h")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
    )
    return pair_metrics(pred, truth)


def q_dedup_eval_jaccard(spark, sf_dir):
    """Dedup-quality harness, n-gram Jaccard family: plant one-token-
    mutated copies, run the graded detector config (threshold 0.2,
    word trigrams, max_df='auto' — resolved over the PLANTED corpus on
    both engines), score against planted truth. Recall < 1 only where
    a doc is too short for the mutated copy to clear the threshold;
    precision < 1 only from organic near-dups (documented lower
    bound). Hash-exact."""
    from margaret_spark.operators.dedupeval import pair_metrics

    planted, truth = _planted_docs(spark, sf_dir, "token")
    pred = ngram_jaccard_pairs(
        planted, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return pair_metrics(pred, truth)


def q_dedup_eval_minhash(spark, sf_dir):
    """Dedup-quality harness, MinHash-LSH family (rows-only by the
    same declared design as dedup_minhash: hash-permutation banding is
    not oracle-expressible). Measures what the banding trade actually
    costs: recall here vs the exact-Jaccard eval's recall is the
    banding miss rate on identical planted truth."""
    from margaret_spark.operators.dedupeval import pair_metrics

    planted, truth = _planted_docs(spark, sf_dir, "token")
    pred = minhash_dedup_pairs(planted, "doc_id", "text", threshold=0.2)
    return pair_metrics(pred, truth)


def q_dedup_eval_simhash(spark, sf_dir):
    """Dedup-quality harness, SimHash family (rows-only: bit-sig
    banding, same declared set as dedup_simhash). max_hamming=3 on
    64-bit signatures, the graded detector config."""
    from margaret_spark.operators.dedupeval import pair_metrics

    planted, truth = _planted_docs(spark, sf_dir, "token")
    pred = simhash_dedup_pairs(planted, "doc_id", "text", max_hamming=3)
    return pair_metrics(pred, truth)


def q_dedup_eval_embedding(spark, sf_dir):
    """Dedup-quality harness, embedding-IVF family: plant +0.01-
    shifted copies of the selected embeddings (cosine just under 1.0),
    run the graded IVF detector (threshold 0.45, 16 seeded cells),
    score against planted truth. A missed planted pair here is
    EXACTLY the IVF cell-split miss the operator's docstring declares
    — this query quantifies it. Hash-exact."""
    from margaret_spark.operators.dedup import embedding_dedup_pairs_ivf
    from margaret_spark.operators.dedupeval import (
        pair_metrics,
        plant_embedding_duplicates,
    )

    emb = _t(spark, sf_dir, "embeddings")
    planted, truth = plant_embedding_duplicates(
        emb, "vec_id", "embedding", eps=0.01
    )
    pred = embedding_dedup_pairs_ivf(
        planted, "vec_id", "embedding", threshold=0.45, nlist=16
    )
    return pair_metrics(pred, truth)


def q_dedup_threshold_histogram(spark, sf_dir):
    """Threshold-calibration histogram: pair counts per 0.1-wide
    jaccard bucket over the capped trigram pair universe (floor of
    the pround'ed similarity ×10 — identical double bits on both
    engines, so the bucketing replays exactly). THE query a curation
    team runs before picking the dedup threshold: where the organic
    near-dup mass sits vs where boilerplate collisions start. One
    extra aggregation over the dedup_jaccard pipeline; hash-exact."""
    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        threshold=0.1, mode="word", n=3, max_df="auto",
    )
    return (
        pairs.groupBy(
            F.floor(F.col("jaccard") * 10).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def q_dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size distribution (n_clusters per size) over
    the connected components of the capped-jaccard pair graph — the
    collapse-impact report (how many docs a dedup pass would remove,
    and whether mass sits in pairs or in mega-clusters). Two keyed
    aggregations over the dedup_clusters output; hash-exact."""
    from margaret_spark.operators.dedup import dedup_clusters

    pairs = ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        threshold=0.2, mode="word", n=3, max_df="auto",
    )
    clusters = dedup_clusters(
        _t(spark, sf_dir, "documents"), pairs, "doc_id"
    )
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).cast("long").alias("__sz")
    )
    return sizes.groupBy(F.col("__sz").alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("long").alias("n_clusters")
    )


def q_dedup_eval_spans(spark, sf_dir):
    """Dedup-quality harness, exact-substring SPAN family: plant one
    shared 12-token span (from the lowest-id ≥12-token doc) into the
    md5-selected 3/16 of the corpus, run the graded word-8-gram span
    detector, score doc-level precision/recall (id_metrics) against
    the planted truth (victims ∪ the donor — the donor's own span
    occurrence is genuine duplication once copies exist). The 12
    appended tokens guarantee 5 shared interior 8-grams per victim,
    so planted recall is structural; organic duplicated passages make
    planted-precision the documented lower bound. Hash-exact."""
    from margaret_spark.operators.dedup import duplicate_spans
    from margaret_spark.operators.dedupeval import PLANT_PREFIXES, id_metrics
    from margaret_spark.operators.text import words

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    donor = (
        docs.where(F.size(words(F.col("text"))) >= 12)
        .orderBy("doc_id")
        .limit(1)
    )
    span = donor.select(
        F.col("doc_id").alias("__donor_id"),
        F.concat_ws(" ", F.slice(words(F.col("text")), 1, 12)).alias("__span"),
    )
    is_victim = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin(*PLANT_PREFIXES)
    planted = docs.crossJoin(F.broadcast(span)).select(
        "doc_id",
        F.when(
            is_victim, F.concat(F.col("text"), F.lit(" "), F.col("__span"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
        "__donor_id",
    )
    pred = (
        duplicate_spans(
            planted.select("doc_id", "text"), "doc_id", "text", n=8,
            scope="cross_doc",
        )
        .select("doc_id")
        .distinct()
    )
    truth = planted.where(
        is_victim | (F.col("doc_id") == F.col("__donor_id"))
    ).select("doc_id")
    return id_metrics(pred, truth, "doc_id")


def q_dedup_repeated_substrings(spark, sf_dir):
    """Suffix-array-bar repeat ENUMERATION (operators.suffixes
    .suffix_repeats — VERDICT r9 optional #8): the 20 longest maximal
    repeated token substrings of the corpus with exact occurrence /
    document counts, the memorization-audit artifact the span family
    detects-and-cuts but never names. Spark side builds prefix-doubling
    ranks (7 rounds of keyed dense-id assignment — the distributed
    suffix-array recipe), takes adjacent-suffix LCPs through per-doc
    rank matrices in one codegen aggregate, and tests left/right
    maximality on the O(1) two-window equality key; the oracle replays
    the DEFINITION (enumerate every substring, count, test maximality),
    so agreement proves the semantics, not the construction."""
    from margaret_spark.operators.suffixes import suffix_repeats

    docs = _t(spark, sf_dir, "documents")
    return suffix_repeats(docs, "doc_id", "text", min_len=5, top_k=20)


def q_decontaminate_longest_overlaps(spark, sf_dir):
    """Cross-corpus longest-overlap leakage audit (suffixes
    .suffix_repeats with tag_col/require_cross): the 20 longest
    maximal repeated substrings that appear on BOTH sides of the
    train/test split (doc_id % 10), with total and test-side
    occurrence/document counts — "what is the longest test-set string
    appearing verbatim in the training corpus", the ExactSubstr
    leakage report (Lee et al. 2022). Same machinery and oracle
    discipline as dedup_repeated_substrings; maximality stays
    union-wide (safe: a same-count extension of a cross string is
    itself cross and is reported instead)."""
    from margaret_spark.operators.suffixes import suffix_repeats

    docs = _t(spark, sf_dir, "documents").withColumn(
        "__is_test", F.col("doc_id") % 10 == 0
    )
    return suffix_repeats(
        docs, "doc_id", "text", min_len=5, top_k=20,
        tag_col="__is_test", require_cross=True,
    )


def q_dedup_spans(spark, sf_dir):
    """Exact-substring duplicate SPANS (dedup.duplicate_spans): the
    maximal cross-document repeated word-8-gram runs of every
    document, as 1-based inclusive token intervals — span-level dedup
    (Lee et al. 2022), the repeated-passage detector document-level
    jaccard can't express. Min/max-only gram aggregation (no posting
    lists, no O(df²)), equi-join back on the 32-byte gram hash,
    gaps-and-islands merge per document."""
    from margaret_spark.operators.dedup import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", n=8, scope="cross_doc")


def q_dedup_span_stats(spark, sf_dir):
    """Per-document duplicated-token mass (dedup.duplicate_span_stats):
    the share of each document covered by cross-document duplicate
    spans — the cut-threshold signal built on q_dedup_spans (spans are
    maximal and disjoint, so their lengths sum exactly)."""
    from margaret_spark.operators.dedup import duplicate_span_stats

    docs = _t(spark, sf_dir, "documents")
    return duplicate_span_stats(docs, "doc_id", "text", n=8, scope="cross_doc")


def q_dedup_span_cut(spark, sf_dir):
    """Keep-first span removal (dedup.cut_duplicate_spans): every
    cross-document duplicated word-8-gram passage is cut from all but
    its first-occurrence (min doc_id) document and the surviving
    tokens rejoined — the transformation half of span-level dedup
    (q_dedup_spans reports, this rewrites). Same min-only gram
    aggregation + islands merge, plus one codegen array filter to
    rebuild the text."""
    from margaret_spark.operators.dedup import cut_duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return cut_duplicate_spans(docs, "doc_id", "text", n=8)


def q_dedup_span_cut_all(spark, sf_dir):
    """Strict keep-ONE-occurrence span removal
    (dedup.cut_duplicate_spans(keep='first_occurrence')): exactly one
    copy of every duplicated word-8-gram passage survives corpus-wide
    — the first in (doc_id, position) order — so repeats WITHIN the
    owner document are cut too (the strict Lee-et-al semantic;
    q_dedup_span_cut is the cross-document-only variant)."""
    from margaret_spark.operators.dedup import cut_duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return cut_duplicate_spans(
        docs, "doc_id", "text", n=8, keep="first_occurrence"
    )


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the jaccard near-dup pairs: every doc
    labeled with the min doc_id of its duplicate component (iterative
    min-label propagation — the one algorithm here that is a driver
    LOOP of DataFrame jobs, converging in O(diameter) rounds)."""
    from margaret_spark.operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return dedup_clusters(docs, pairs, "doc_id")


def q_docs_kcore(spark, sf_dir):
    """k-core of the near-dup graph (graph.k_core, Seidman 1983): the
    maximal subgraph where every document keeps ≥ 2 near-dup
    neighbors — separates REAL template families (mutually similar
    cliques) from incidental pairwise matches before cluster
    collapse. Fixed 4 peel rounds (converges in 1 on this corpus;
    extra rounds are no-ops — pytest pins the fixpoint), so the
    unrolled-CTE oracle is hash-exact."""
    from margaret_spark.operators.graph import k_core

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return k_core(pairs, "id_a", "id_b", k=2, rounds=4)


def q_ann_recall(spark, sf_dir):
    """Recall@5 of the IVF index against brute force
    (operators.similarity.ann_recall_at_k) — the eval that justifies
    the nlist/nprobe settings of every other ANN query here. Both
    arms are the library operators at the SAME parameterization as
    ann_topk / ann_ivf; the oracle composes those two queries' SQL as
    CTEs and counts the per-query neighbor-id overlap, so the metric
    (exact integer counts + one IEEE division) is hash-exact."""
    from margaret_spark.operators.similarity import ann_recall_at_k

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ann_recall_at_k(
        emb, queries, "vec_id", "embedding", k=5, nlist=16, nprobe=4
    )


def q_embeddings_pca(spark, sf_dir):
    """PCA by power iteration (operators.pca.pca_top_component): the
    corpus's principal direction + Rayleigh eigenvalue after 12 fixed
    rounds — covariance as ONE distributed grammian pass (per-row d²
    pround'ed products, (i,j)-keyed DECIMAL partial sums), iteration
    on the bounded d²-row table. The oracle replays the identical
    mean/center/product/round chain as unrolled MATERIALIZED CTEs —
    hash-exact (exactness never depends on convergence; this
    synthetic corpus is near-isotropic, the power-iteration worst
    case, which the operator docstring documents)."""
    from margaret_spark.operators.pca import pca_top_component

    emb = _t(spark, sf_dir, "embeddings")
    return pca_top_component(emb, iters=12)


def q_embeddings_pca_project(spark, sf_dir):
    """The PCA transform half (operators.pca.pca_project): every
    corpus vector's coordinate along the fitted principal direction
    (4 power rounds here — the projection is the thing under test;
    exactness never depends on convergence). The component table is
    bounded (d rows), broadcast as one array; the projection is the
    fixed-order left fold of pround'd products per row — one scan,
    zero shuffles. Hash-exact."""
    from margaret_spark.operators.pca import pca_project, pca_top_component

    emb = _t(spark, sf_dir, "embeddings")
    comp = pca_top_component(emb, iters=4)
    return pca_project(emb, comp)


def q_ann_matryoshka(spark, sf_dir):
    """Matryoshka-truncation ANN (operators.similarity
    .truncate_embeddings + brute_force_topk): exact top-5 by cosine
    over the FIRST 16 of 64 dimensions — the MRL serving trade (search
    the 4×-smaller prefix, re-rank survivors at full width if needed).
    The oracle slices the same prefix (DuckDB 1-based inclusive
    ``embedding[1:16]``) through the identical cosine tree, so ranks
    and rounded cosines are hash-exact."""
    from margaret_spark.operators.similarity import truncate_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    tr = truncate_embeddings(emb, 16)
    return brute_force_topk(tr, tr.where(F.col("vec_id") < 5), k=5)


def q_ann_matryoshka_recall(spark, sf_dir):
    """Recall@5 of the 16-dim Matryoshka prefix against the full
    64-dim exact top-5 (operators.similarity.topk_recall — the shared
    metric tail every approximate-search variant evaluates through).
    THE number that decides whether the 4× prefix cut is safe for a
    given corpus. Exact integer counts + one IEEE division —
    hash-exact."""
    from margaret_spark.operators.similarity import (
        topk_recall,
        truncate_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    tr = truncate_embeddings(emb, 16)
    exact = brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = brute_force_topk(
        tr, tr.where(F.col("vec_id") < 5), k=5
    ).select("query_id", "neighbor_id")
    qids = queries.select(F.col("vec_id").alias("query_id")).distinct()
    return topk_recall(exact, approx, qids)


def q_ann_ivf(spark, sf_dir):
    """IVF-cell ANN: seeded centroids, corpus bucketed by nearest cell,
    queries probe their 4 nearest cells only."""
    from margaret_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=5, nlist=16, nprobe=4)


def q_ann_ivf_indexed(spark, sf_dir):
    """The persisted-IVF serving path: build once (corpus written
    Hive-partitioned by cell, norms precomputed), then search — the
    broadcast probe set triggers dynamic partition pruning, so the
    scan reads only probed cells. Same centroids as ann_ivf, so the
    same oracle checks bit-identical results."""
    import tempfile

    from margaret_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_search,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="margaret_ivf_idx_")
    build_ivf_index(emb, path, nlist=16)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_index_search(spark, path, queries, k=5, nprobe=4)


def q_ann_ivf_pq_indexed(spark, sf_dir):
    """The persisted IVFADC serving path (pq.build_ivfpq_index /
    ivfpq_index_search): centroids + residual codebook + per-vector
    codes written Hive-partitioned by cell — bytes per vector,
    partition-pruned probes, broadcast residual LUTs. Same
    construction as ann_ivf_pq, so the same composed oracle checks
    bit-identical results (index == in-flight pinned in pytest)."""
    import tempfile

    from margaret_spark.operators.pq import build_ivfpq_index, ivfpq_index_search

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="margaret_ivfpq_idx_")
    build_ivfpq_index(emb, path, nlist=16, m=4, codes=8, iters=1)
    queries = emb.where(F.col("vec_id") < 5)
    return ivfpq_index_search(spark, path, queries, k=5, nprobe=4)


def q_ann_ivf_int8(spark, sf_dir):
    """The int8-quantized persisted IVF index
    (operators.quantize.build_ivf_index_int8 / ivf_index_search_int8):
    cells store codes + scales + precomputed integer norms (the 4×
    storage cut compounding with partition-pruned reads — the actual
    100 TB ANN deployment shape). Cell assignment/probing use float
    cosine against the same seeded centroids as ann_ivf; candidate
    ranking is the quantized cosine (scales cancel — pure integer
    dots under one sqrt/division tree), so the whole pipeline is
    hash-exact like ann_topk_int8."""
    import tempfile

    from margaret_spark.operators.quantize import (
        build_ivf_index_int8,
        ivf_index_search_int8,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="margaret_ivf_int8_")
    build_ivf_index_int8(emb, path, nlist=16)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_index_search_int8(spark, path, queries, k=5, nprobe=4)


def q_text_simpson(spark, sf_dir):
    """Per-document token concentration (operators.text.simpson_index):
    the Simpson index (sum of n_t^2) / N^2 — the log-free entropy
    cousin of the quality battery (keyword stuffing / degenerate
    generations concentrate toward 1). Exact integer counts + one IEEE
    division; zero-token documents report NULL. Hash-exact."""
    from margaret_spark.operators.text import simpson_index

    docs = _t(spark, sf_dir, "documents")
    return simpson_index(docs, "doc_id", "text")


def q_text_vocab_oov(spark, sf_dir):
    """Per-source vocabulary coverage (operators.text
    .vocab_oov_report): OOV token mass against the corpus's own
    deterministic top-16 vocabulary (the synthetic corpus carries 31
    distinct tokens, so the cut BINDS — real OOV mass at every SF) — the tokenizer-planning audit
    next to text_bpe_fertility (a high-OOV source fragments under a
    vocabulary fitted on the corpus mix). Exact integer counts + one
    IEEE division; the oracle re-derives the vocabulary cut and the
    per-source masses in SQL — hash-exact."""
    from margaret_spark.operators.text import vocab_oov_report

    docs = _t(spark, sf_dir, "documents")
    return vocab_oov_report(docs, "text", "source", top_v=16)


def q_text_topterms(spark, sf_dir):
    from margaret_spark.operators.text import top_terms

    return top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text", k=50)


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (operators.dedup.incremental_exact_dedup):
    even doc_ids play the existing corpus, odd ones the incoming
    batch; each new doc is labeled dup_of_existing / dup_in_batch /
    new. The only shuffled payload is a 32-byte content hash; corpus
    membership is a hash semi-join. Oracle mirrors the semantics over
    text equality directly."""
    from margaret_spark.operators.dedup import incremental_exact_dedup

    docs = _t(spark, sf_dir, "documents")
    existing = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    return incremental_exact_dedup(new, existing, "doc_id", "text")


def q_orders_diff(spark, sf_dir):
    """Keyed table diff (functions.diff.table_diff): a synthetic new
    version of orders (every 97th key dropped, every 89th surviving
    key repriced, every 101st key re-added under a fresh key) diffed
    against the original — added/removed/changed, nothing wider than
    (key, 32-byte row hash) crossing the shuffle, unchanged mass
    filtered before materialization."""
    from margaret_spark.functions.diff import table_diff

    orders = _t(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 97 != 0)
    changed = base.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    added = orders.where(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    new = changed.unionByName(added)
    return table_diff(orders, new, "o_orderkey")


def q_text_quality_rules(spark, sf_dir):
    """Gopher/C4-style rule battery (operators.text.quality_rule_flags):
    per-rule booleans + the conjunction, all pround'ed rational
    arithmetic in one narrow codegen projection — the standard
    web-corpus filter set, oracle-exact per rule."""
    from margaret_spark.operators.text import quality_rule_flags

    return quality_rule_flags(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_events_cohorts(spark, sf_dir):
    """Weekly cohort retention triangle (operators.temporal.
    cohort_retention): cohort = ISO week of first activity; cells
    count active users per (cohort, week offset). Distinct + min ride
    one user-keyed exchange; nothing is keyed on time alone."""
    from margaret_spark.operators.temporal import cohort_retention

    ev = _events(spark, sf_dir)
    return cohort_retention(ev, "user_id", "ts")


def q_pack_sequences_grouped(spark, sf_dir):
    """Per-source sequence packing (operators.packing.
    pack_sequences_grouped): every source gets its own token stream —
    the domain-separated pretraining layout. Window cumsum per source,
    identical pack arithmetic to the global packing; oracle mirrors
    the partitioned cumsum."""
    from margaret_spark.operators.packing import pack_sequences_grouped
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return pack_sequences_grouped(
        base, "source", "doc_id", "n_tokens", seq_len=256
    )


def q_sample_token_budget(spark, sf_dir):
    """Corpus mixing by token budget (operators.sampling.
    token_budget_sample): within each source, the deterministic
    (md5-ordered) prefix of documents whose cumulative token count
    stays inside a 1500-token budget. Exact integer window arithmetic
    — the oracle reproduces the kept rows and the running totals
    bit-for-bit. One shuffle on the source key."""
    from margaret_spark.operators.sampling import token_budget_sample
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return token_budget_sample(base, "source", "doc_id", "n_tokens", budget=1500)


def q_fuzzy_part_names(spark, sf_dir):
    """Blocked edit-distance record linkage (operators.dedup.
    fuzzy_pairs) over part names: candidates share (first char,
    length//4), verified with levenshtein ≤ 2 inside the join
    condition. The oracle mirrors the blocking exactly (the
    candidates+verify contract, like MinHash banding)."""
    from margaret_spark.operators.dedup import fuzzy_pairs

    part = _t(spark, sf_dir, "part")
    return fuzzy_pairs(part, "p_partkey", "p_name", max_dist=2, len_bucket=4)


def q_edit_pairs_part_names(spark, sf_dir):
    """LOSSLESS edit-distance self-join (operators.dedup.
    edit_distance_pairs, PassJoin-style segment pigeonhole): every
    pair of part names within levenshtein 1, found via the
    (segment, index, length) equi-join — no cross join — and REQUIRED
    to equal the naive quadratic truth: the oracle IS the brute-force
    all-pairs filter, so a single false negative from the blocking
    hash-mismatches."""
    from margaret_spark.operators.dedup import edit_distance_pairs

    part = _t(spark, sf_dir, "part")
    return edit_distance_pairs(part, "p_partkey", "p_name", max_dist=1)


def q_search_bm25(spark, sf_dir):
    """Inverted-index BM25 keyword retrieval (operators.search): one
    tokenize pass, tf and doc-length on the same id-keyed exchange,
    broadcast per-term idf weights, TakeOrdered top-k (no corpus-wide
    window). Rational idf mode — every score is integer-derived
    rational arithmetic with DECIMAL-summed terms, so the oracle
    reproduces scores bit-for-bit (the classic ln idf is in the
    library; cross-engine ln differs in the last ulp so it is not on
    the hash-exact surface)."""
    from margaret_spark.operators.search import bm25_search

    docs = _t(spark, sf_dir, "documents")
    return bm25_search(docs, "doc_id", "text", "spark table hash scan", k=10)


def q_search_tfidf(spark, sf_dir):
    """Sparse TF-IDF vectors over the corpus top-50 vocabulary
    (operators.search.tf_idf_vectors): (doc_id, token, weight) with
    ln-free idf — oracle-exact."""
    from margaret_spark.operators.search import tf_idf_vectors

    docs = _t(spark, sf_dir, "documents")
    return tf_idf_vectors(docs, "doc_id", "text", vocab_size=50)


#: One checkpointed near-dup pair subtree per (session, sf_dir):
#: corpus_curation and training_data consume the IDENTICAL
#: ngram_jaccard_pairs frame (threshold=0.2, word 3-grams,
#: max_df='auto'), so the most expensive stage of both pipelines is
#: materialized once per curation session and reused — the
#: materialized-intermediate pattern any production curation run uses
#: (r2 verdict #1a). Results are bit-identical with or without the
#: cache; dedup_jaccard / dedup_clusters deliberately do NOT use it so
#: the operator itself stays honestly measured.
_CURATION_PAIRS_CACHE: dict = {}


def _curation_pairs(spark, sf_dir):
    hit = _CURATION_PAIRS_CACHE.get(sf_dir)
    if hit is not None and hit[0] is spark:
        return hit[1]
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    ).localCheckpoint(eager=False)
    _CURATION_PAIRS_CACHE[sf_dir] = (spark, pairs)
    return pairs


def q_corpus_curation(spark, sf_dir):
    """The end-to-end curation pipeline: quality bar + canonical
    near-dup representative per cluster (operators.pipeline), riding
    the shared checkpointed pair subtree (see _curation_pairs)."""
    from margaret_spark.operators.pipeline import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    return curate_corpus(
        docs, "doc_id", "text", min_quality=0.5, jaccard_threshold=0.2,
        pairs=_curation_pairs(spark, sf_dir),
    )


def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=5)


def q_ann_range(spark, sf_dir):
    """Radius search (operators.similarity.range_search): every
    neighbor with cosine ≥ 0.25 for each of 5 query vectors. Queries
    broadcast; the corpus streams through the scoring filter once —
    no ranking window, zero shuffles."""
    from margaret_spark.operators.similarity import range_search

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return range_search(emb, queries, radius=0.25)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (no SQL oracle: seeded-hyperplane buckets;
    exactness of returned cosines is covered by tests against the
    brute-force twin)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_bucketed_topk(emb, queries, k=5, nbits=4)


def q_embeddings_quantize_int8(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding corpus
    (operators.quantize) — the 4× storage/bandwidth scale path for
    similarity search. scale = max|x|/127, code = floor(x/scale+0.5):
    every step (float32→double cast, max, abs, IEEE division, the
    house half-up floor) is engine-portable, so the oracle reproduces
    each vector's codes bit-for-bit; the graded surface summarizes
    them as exact integer stats. Map-only codegen array expressions,
    zero shuffles, no Python."""
    from margaret_spark.operators.quantize import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(emb, "vec_id", "embedding")
    c = F.col("codes")
    int_sum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    return qz.select(
        "vec_id",
        pround(F.col("scale"), 9).alias("scale"),
        int_sum(c).alias("code_sum"),
        int_sum(F.transform(c, F.abs)).alias("code_abs_sum"),
        F.array_min(c).cast("int").alias("code_min"),
        F.array_max(c).cast("int").alias("code_max"),
        F.size(c).cast("int").alias("n_codes"),
    )


def q_ann_topk_int8(spark, sf_dir):
    """Exhaustive top-k over the int8-quantized corpus
    (operators.quantize.int8_topk): the same broadcast-queries scan
    shape as ann_topk, but each pair is an integer dot over codes and
    the scales cancel out of the cosine — pure integer arithmetic
    under one sqrt/division tree, hash-exact cross-engine (the float
    path needs rounding; this one is exact by construction)."""
    from margaret_spark.operators.quantize import int8_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return int8_topk(emb, queries, k=5)


def q_text_stats(spark, sf_dir):
    return token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_quality(spark, sf_dir):
    return quality_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_langid(spark, sf_dir):
    return lang_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_langid_eval(spark, sf_dir):
    """Per-true-language accuracy of the widened (10 stopword
    languages + 9 script ranges) heuristic against the labeled `lang`
    column — the precision check that keeps the table honest as it
    grows. Oracle is generated from the SAME language tables."""
    from margaret_spark.operators.text import lang_id_eval

    return lang_id_eval(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "lang"
    )


def q_text_bpe_count(spark, sf_dir):
    return bpe_ish_token_count(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit per source (the budgeting number a
    training pipeline needs before it can convert corpus bytes to
    token budgets): chars-per-BPE-token and BPE-tokens-per-word by
    source, over the REAL byte-level tokenizer (operators.bpe). All
    ratios are exact-integer division under pround — hash-exact; the
    oracle re-tokenizes with the recursive-CTE BPE encoder."""
    from margaret_spark.functions.numeric import pround as _pround
    from margaret_spark.functions.shingling import words
    from margaret_spark.operators.bpe import bpe_token_count_col

    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("__ch"),
        F.coalesce(bpe_token_count_col(F.col("text")), F.lit(0))
        .cast("long")
        .alias("__nt"),
        # size(NULL) is -1 (not NULL) in Spark — coalesce the ARRAY
        F.size(
            F.coalesce(words(F.col("text")), F.array().cast("array<string>"))
        )
        .cast("long")
        .alias("__nw"),
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__ch").cast("long").alias("total_chars"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.sum("__nw").cast("long").alias("total_words"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        "total_tokens",
        "total_words",
        _pround(
            F.when(
                F.col("total_tokens") > 0,
                F.col("total_chars").cast("double") / F.col("total_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("chars_per_token"),
        _pround(
            F.when(
                F.col("total_words") > 0,
                F.col("total_tokens").cast("double") / F.col("total_words"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("tokens_per_word"),
    )


def q_text_winnow(spark, sf_dir):
    """Winnowing fingerprints (operators.text.winnow_fingerprints —
    Schleimer et al. 2003, the MOSS local fingerprinting): per-window
    minimum of md5 word-4-gram hashes, ties to the rightmost position,
    packed argmin under one integer array_min. Pure per-row codegen
    array math, zero shuffles; the oracle re-derives every selected
    (pos, fp) in SQL from the same md5 family — hash-exact."""
    from margaret_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=4, w=4
    )


def q_text_lm_surprise(spark, sf_dir):
    """Perplexity-style LM quality scoring (operators.lm): mean
    inverse add-one conditional probability under a PRUNED bigram LM
    (top-512 unigrams/bigrams by (count desc, gram asc) — the cap
    binds at sf0.01, so the pruning cut itself is graded). Every term
    is a ratio of exact integers under one IEEE division and the mean
    is the house DECIMAL sum, so the whole score is hash-exact —
    unlike log-based perplexity (cross-engine ln differs). Scoring is
    one explode + two broadcast joins + one keyed aggregation."""
    from margaret_spark.operators.lm import lm_surprise

    return lm_surprise(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_ngrams=512
    )


def _nb_model(spark, sf_dir):
    """The shared text_nb_* fit: train on the doc_id % 3 == 0 slice,
    labeled by a real text property (token count ≥ 40 → 'long'), with
    max_vocab=16 < the corpus's 31 distinct tokens so the pruning cut
    itself is graded (OOV tokens exercise the add-one fallback)."""
    from margaret_spark.functions.shingling import words
    from margaret_spark.operators.nbayes import fit_nb

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        "text",
        F.when(F.size(words(F.col("text"))) >= 40, F.lit("long"))
        .otherwise(F.lit("short"))
        .alias("label"),
    )
    return docs, fit_nb(train, "label", "text", max_vocab=16)


def q_text_nb_quality(spark, sf_dir):
    """Trainable quality classifier (operators.nbayes): multinomial
    Naive Bayes fitted on a labeled slice, scoring EVERY document
    against every class — the GPT-3/LLaMA-style curation leg next to
    the fixed rules and the LM gate. The decision statistic is the
    prior-weighted mean INVERSE conditional probability (the log-free
    lm_surprise construction: integer ratios under IEEE division +
    DECIMAL mean), so fit, pruning cut, smoothing and scores are all
    hash-exact — the oracle re-derives counts, the top-16 vocab cut,
    V, priors and every per-token term in SQL."""
    from margaret_spark.operators.nbayes import nb_scores

    docs, model = _nb_model(spark, sf_dir)
    return nb_scores(docs, "doc_id", "text", model)


def q_text_nb_classify(spark, sf_dir):
    """The argmin-score classification over q_text_nb_quality's
    scores (ties → label ascending; zero-token documents surface as
    pred NULL). Graded hash-exact — the oracle takes the same
    row_number window over its re-derived scores."""
    from margaret_spark.operators.nbayes import nb_classify

    docs, model = _nb_model(spark, sf_dir)
    return nb_classify(docs, "doc_id", "text", model)


def _dsir_model(spark, sf_dir):
    """The shared corpus_dsir_* fit: even docs play the TARGET corpus
    (curated reference), odd docs the RAW crawl; hashed word-bigram
    features into 64 buckets (B << the ~1k distinct bigrams, so the
    hashing itself — collisions included — is graded)."""
    from margaret_spark.operators.dsir import fit_dsir

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    model = fit_dsir(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "text",
        n=2,
        n_buckets=64,
    )
    return docs, model


def q_corpus_dsir_weights(spark, sf_dir):
    """DSIR-style data selection (operators.dsir): hashed word-bigram
    bag models fitted on a target corpus and on the raw crawl, every
    document weighted by its mean per-occurrence target/raw
    probability ratio — the distribution-matching leg of the curation
    chain (rules → LM gate → trained classifier → DSIR), made log-free
    so it grades hash-exact. The oracle re-derives the bucket counts,
    totals, add-one ratios and DECIMAL mean in SQL."""
    from margaret_spark.operators.dsir import dsir_weights

    docs, model = _dsir_model(spark, sf_dir)
    return dsir_weights(docs, "doc_id", "text", model, n=2, n_buckets=64)


def q_corpus_dsir_select(spark, sf_dir):
    """The selection half of DSIR: top-50 most target-like documents
    by (weight desc, doc_id asc) — the deterministic twin of the
    paper's Gumbel resampling, compiled to TakeOrderedAndProject
    (per-partition top-k + one 50-row merge, never a global sort).
    Graded hash-exact against the oracle's ORDER BY ... LIMIT."""
    from margaret_spark.operators.dsir import dsir_select

    docs, model = _dsir_model(spark, sf_dir)
    return dsir_select(docs, "doc_id", "text", model, k=50, n=2, n_buckets=64)


def q_text_fingerprint(spark, sf_dir):
    return doc_fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: text re-encoded as an opaque blob, with
    typed metadata extracted engine-side (byte length, first code
    point). The decode stage itself is the stubbed mapInPandas pass in
    margaret_spark.operators.multimodal."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.ascii(F.col("text")).cast("long").alias("first_cp"),
    )


def q_training_data(spark, sf_dir):
    """The FULL corpus→training-data composition
    (operators.pipeline.training_pipeline): quality bar + canonical
    dedup keep, deterministic train/test split, and 512-token
    sequence packing of the train split — every stage
    hash-deterministic, the whole pipeline oracle-checked as one
    query."""
    from margaret_spark.operators.pipeline import training_pipeline

    docs = _t(spark, sf_dir, "documents")
    return training_pipeline(
        docs,
        "doc_id",
        "text",
        min_quality=0.5,
        jaccard_threshold=0.2,
        test_fraction=0.1,
        seq_len=512,
        pairs=_curation_pairs(spark, sf_dir),
    )


def q_chunk_documents(spark, sf_dir):
    """Long-document chunking (operators.chunking): each document's
    token stream split into 64-token windows overlapping by 16 — the
    preprocessing step every context-bounded training / retrieval
    pipeline runs. Pure codegen fan-out (sequence + explode + array
    slice), zero shuffles; boundaries are a closed form of n_tokens,
    so the oracle reproduces every field including the chunk text."""
    from margaret_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, overlap=16
    )


def _pii_salted_docs(spark, sf_dir):
    """Documents with deterministic PII appended (both engines build
    the IDENTICAL string, so detection runs over nontrivial matches
    on every row — the synthetic corpus itself carries few)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 192.168."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" call +1 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )


_PII_SALT_SQL = (
    "SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com or 192.168.' || CAST(doc_id % 256 AS VARCHAR) "
    "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR) "
    "|| ' call +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') "
    "AS text FROM documents"
)

# one redaction oracle, two graded surfaces (batch pii_redact and the
# streaming at-ingest scrub — same expression chain by construction)
_PII_REDACT_SQL = (
    "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z]{2,})+', '[EMAIL]', 'g'), "
    "'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IP]', 'g'), "
    "'\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '[PHONE]', 'g') AS redacted "
    f"FROM ({_PII_SALT_SQL})"
)


def q_pii_scan(spark, sf_dir):
    """PII detection (operators.pii): per-document email / IPv4 /
    phone match counts as pure codegen regexp expressions — the scrub
    gate a corpus runs before anything ships. Patterns stick to the
    Java-regex ∩ RE2 dialect (ASCII classes, non-capturing groups, no
    lookaround), so counts are engine-identical and the query is
    hash-exact. Zero shuffles."""
    from margaret_spark.operators.pii import pii_scan

    return pii_scan(_pii_salted_docs(spark, sf_dir), "doc_id", "text")


def q_pii_redact(spark, sf_dir):
    """PII redaction (operators.pii): every match replaced by its
    placeholder in a fixed order (emails before phones, so an email's
    digits never leak as a partial phone match). The FULL redacted
    text is on the graded surface — any engine divergence in match
    boundaries or replacement semantics hash-mismatches."""
    from margaret_spark.operators.pii import pii_redact

    return pii_redact(_pii_salted_docs(spark, sf_dir), "doc_id", "text")


def _pagerank_edges(docs, nn):
    """The deterministic synthetic citation graph shared by
    docs_pagerank and corpus_prior (one place, no drift)."""
    d = F.col("doc_id")
    return (
        docs.select(d.alias("src"), ((d * 7 + 1) % nn).alias("dst"))
        .unionByName(docs.select(d.alias("src"), ((d * 13 + 3) % nn).alias("dst")))
        .unionByName(docs.select(d.alias("src"), ((d * 31 + 5) % nn).alias("dst")))
    )


def q_corpus_prior(spark, sf_dir):
    """Curation prior composition: content quality × link importance —
    the two signals a web-corpus selection policy actually combines
    (C4-style content scores and a crawl-graph importance prior).
    rank_norm = pround(rank·N) recenters PageRank at mean 1;
    prior = pround((quality + rank_norm)/2). Every stage reuses the
    already-graded subtrees (quality_score, pagerank), so the whole
    composition stays hash-exact."""
    from margaret_spark.operators.graph import pagerank
    from margaret_spark.operators.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    nn = docs.count()
    ranks = pagerank(
        _pagerank_edges(docs.select("doc_id"), nn), "src", "dst",
        iterations=6, damping=0.85,
    ).select(F.col("node").alias("doc_id"), "rank")
    q = quality_score(docs, "doc_id", "text")
    rank_norm = pround(F.col("rank") * F.lit(float(nn)), 6)
    return (
        q.join(ranks, "doc_id")
        .select(
            "doc_id",
            "quality",
            rank_norm.alias("rank_norm"),
            pround((F.col("quality") + rank_norm) / F.lit(2.0), 6).alias("prior"),
        )
    )


def q_docs_pagerank(spark, sf_dir):
    """Link-graph importance (operators.graph.pagerank): 6 damped
    power-iteration rounds over a deterministic synthetic citation
    graph (each doc links to (id·7+1)%N, (id·13+3)%N, (id·31+5)%N —
    parallel edges and self-loops included, no dangling nodes) — the
    corpus-importance prior a web-scale pipeline computes over its
    crawl's link graph. Per-edge contributions are pround'ed and
    DECIMAL-summed (shuffle-order-independent), each rank pround'ed
    again, so the fixed-K iteration is hash-exact against a generated
    6-level CTE chain that evaluates the identical IEEE trees."""
    from margaret_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    nn = docs.count()
    ranks = pagerank(
        _pagerank_edges(docs, nn), "src", "dst", iterations=6, damping=0.85
    )
    return ranks.select(F.col("node").alias("doc_id"), "rank")


def q_events_histogram(spark, sf_dir):
    """Exact equi-width histogram (profiling.histogram): the value
    distribution per event_type on one shared 20-bucket grid over the
    column's exact [min, max] — the distribution fingerprint taken
    before writing filters/clamps; unlike the approx_quantile
    sketches this is integer-exact counting over IEEE bucket math,
    so it grades hash-exact."""
    from margaret_spark.operators.profiling import histogram

    ev = _t(spark, sf_dir, "events")
    return histogram(ev, "value", bins=20, group_col="event_type")


def q_embeddings_kmeans(spark, sf_dir):
    """Deterministic embedding clustering
    (similarity.kmeans_assign_deterministic): 2 Lloyd refinements from
    the 8 lowest-id seeds, pround/DECIMAL-exact means — the corpus
    clustering step (topic bucketing, diversity sampling, IVF cell
    refinement) as a graded, hash-exact surface; the float-avg
    production variant stays in kmeans_centroids."""
    from margaret_spark.operators.similarity import kmeans_assign_deterministic

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assign_deterministic(emb, k=8, iters=2)


def q_dedup_semantic_pairs(spark, sf_dir):
    """SemDeDup pair stage (operators.semdedup.semantic_dedup_pairs,
    after Abbas et al. 2023): within-cluster embedding near-dup pairs
    over the Lloyd-refined cells — an equality self-join keyed on
    cent_id (O(Σ|cell|²) cosines, never all-pairs; k grows with N at
    scale), Arrow pair_dot scoring, pround'ed cosine ≥ 0.4. Graded
    hash-exact: the oracle re-derives the k-means CTEs and the pair
    join bit-for-bit."""
    from margaret_spark.operators.semdedup import scaled_k, semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    # k follows the data (max(8, ceil(sqrt N)) — semdedup.scaled_k; the
    # oracle derives the same k with a LIMIT subquery): fixed k is
    # superlinear, cells grow with N (r9 10x probe: 9.9x wall at 10x)
    return semantic_dedup_pairs(
        emb, k=scaled_k(emb.count(), 8), iters=2, threshold=0.4
    )


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup keeps (operators.semdedup.semantic_prune): drop every
    row dominated by a smaller-id same-cluster row within 0.4 cosine
    (the pair set's id_b side, removed with one left-anti join) —
    the curation decision itself, not just the candidate pairs.
    Graded hash-exact against the same generated oracle chain."""
    from margaret_spark.operators.semdedup import scaled_k, semantic_prune

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_prune(
        emb, k=scaled_k(emb.count(), 8), iters=2, threshold=0.4
    )


def q_dedup_semantic_incremental(spark, sf_dir):
    """Incremental SemDeDup (semdedup.semantic_dedup_incremental):
    the odd-id half of the embedding corpus (new crawl) deduped
    against the even-id half (existing corpus) at the SEMANTIC level
    — clusters fitted on existing and FROZEN (the at-ingest-model
    house rule), every new vector labeled dup_of_existing /
    dup_in_batch / new. Completes the ingest-dedup matrix (exact /
    containment / text near-dup / semantic). Hash-exact."""
    from margaret_spark.operators.semdedup import (
        scaled_k,
        semantic_dedup_incremental,
    )

    emb = _t(spark, sf_dir, "embeddings")
    existing = emb.where(F.col("vec_id") % 2 == 0)
    # k from the FIT corpus (the frozen existing half)
    return semantic_dedup_incremental(
        emb.where(F.col("vec_id") % 2 == 1),
        existing,
        k=scaled_k(existing.count(), 8), iters=1, threshold=0.4,
    )


def q_decontaminate_semantic(spark, sf_dir):
    """SEMANTIC decontamination — the modern complement of the exact
    n-gram stage (`decontaminate`/`decontaminate_spans`): flag every
    TRAIN document whose hashed embedding is near-duplicate to a
    TEST-set document (paraphrases and re-crawls that exact n-gram
    matching misses). Composed from the library's own parts: the
    vocabulary-free hashing-trick embedding (hashembed) feeds the
    frozen-model incremental semantic matcher (clusters fitted on the
    TEST set and frozen — arrivals never move the cells; checks are
    cell-scoped equality joins, O(|train|·|cell|), never
    |train|·|test|). Output: (doc_id, cent_id, contaminated) for
    every train document. Hash-exact."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings
    from margaret_spark.operators.semdedup import semantic_dedup_incremental

    docs = _t(spark, sf_dir, "documents")
    # pin the hashing-trick embedding once: four consumers (two
    # assignment passes + two vector joins) would otherwise recompute
    # the md5-per-token map build per branch
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    test = emb.where(F.col("doc_id") % 10 == 0)
    train = emb.where(F.col("doc_id") % 10 != 0)
    # batch_dups=False: decontamination asks only "is this train doc
    # near the TEST set" — the train x train in-batch pass is the
    # dominant cost (O(|train|^2/k) pair cosines) and cannot change
    # the answer
    from margaret_spark.operators.semdedup import scaled_k

    out = semantic_dedup_incremental(
        train, test, k=scaled_k(test.count(), 8), iters=1, threshold=0.88,
        id_col="doc_id", vec_col="embedding", batch_dups=False,
    )
    return out.select(
        "doc_id",
        "cent_id",
        (F.col("status") == "dup_of_existing").alias("contaminated"),
    )


def q_ann_pq_codes(spark, sf_dir):
    """Product-quantization encoding (operators.pq, after Jégou et
    al. 2011): 4 subspaces × 8 codes, 1 Lloyd round per subspace (all
    subspaces trained in ONE DataFrame program keyed on sub), each
    vector's nearest code per subspace with its pround'ed
    quantization error — the 64×-compression stage of the ANN ladder
    (float → int8 → PQ). Graded hash-exact: squared L2 goes through
    the dot identity so the oracle evaluates the identical tree."""
    from margaret_spark.operators.pq import pq_encode, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=4, codes=8, iters=1)
    return pq_encode(emb, cb, m=4)


def q_ann_pq_distortion(spark, sf_dir):
    """Per-subspace PQ quantization-error audit
    (operators.pq.pq_distortion_report): the number that sizes a PQ
    deployment (m, codes) before anyone trusts ADC distances — a
    fat mean_dist2 means the codebook is too coarse for that
    dimension range. One bounded aggregation over the code table;
    hash-exact (the oracle aggregates the identical pround'd dist2
    values under DECIMAL sums)."""
    from margaret_spark.operators.pq import (
        pq_distortion_report,
        pq_encode,
        pq_train,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=4, codes=8, iters=1)
    return pq_distortion_report(pq_encode(emb, cb, m=4))


def q_ann_pq_topk(spark, sf_dir):
    """ADC top-k over PQ codes (operators.pq.pq_topk): per query a
    broadcast m×k lookup table of pround'ed subspace distances; a
    corpus row's approximate distance is the DECIMAL-exact sum of its
    m looked-up entries (order-independent); top-5 by (distance asc,
    id asc). The probe side reads only the CODE table — at 100 TB the
    original vectors stay cold. Graded hash-exact."""
    from margaret_spark.operators.pq import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(emb, emb.where(F.col("vec_id") < 5), k=5, m=4, codes=8, iters=1)


def q_ann_pq_recall(spark, sf_dir):
    """Recall@5 of ADC-over-PQ-codes against brute force — the eval
    that closes the quantization ladder: ann_pq_distortion measures
    reconstruction error, THIS measures what that error costs in
    retrieval quality (the number an operator actually tunes m/codes
    against). Both arms at the graded parameterizations; the shared
    topk_recall metric tail (exact integer counts + one IEEE
    division) keeps it hash-exact."""
    from margaret_spark.operators.pq import pq_topk
    from margaret_spark.operators.similarity import topk_recall

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    # pq_topk scores the whole code table, so the query's own code is
    # in its list (distance ~0) while brute force excludes self — ask
    # for k+1, drop self, keep the first 5 by the PQ rank (the re-rank
    # replays deterministically on both engines)
    six = pq_topk(emb, q, k=6, m=4, codes=8, iters=1).where(
        F.col("vec_id") != F.col("query_id")
    )
    w = Window.partitionBy("query_id").orderBy("rank")
    approx = (
        six.withColumn("__rr", F.row_number().over(w))
        .where(F.col("__rr") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    qids = q.select(F.col("vec_id").alias("query_id")).distinct()
    return topk_recall(exact, approx, qids)


def q_ann_ivf_pq(spark, sf_dir):
    """IVFADC (operators.pq.ivfpq_topk, Jégou et al. 2011 §V): the
    composed IVF + residual-PQ search — 16 seeded cells, PQ codebooks
    trained on the residuals v − cent(cell), queries probe their 4
    nearest cells and score ONLY those cells' code rows through a
    broadcast per-(query, cell) residual lookup table. The index the
    cluster stores is (cell, 4 codes) per vector — bytes — and the
    probe never scans the corpus: the true 100 TB ANN serving shape.
    Graded hash-exact against the composed ann_ivf + PQ oracle."""
    from margaret_spark.operators.pq import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 5),
        k=5, nlist=16, nprobe=4, m=4, codes=8, iters=1,
    )


def q_embeddings_contrastive(spark, sf_dir):
    """Contrastive triplet mining (semdedup.contrastive_triplets,
    FaceNet-style hard-negative selection): anchor-positive =
    within-cluster pairs at cosine >= 0.4; per anchor the hardest
    same-cluster negative below 0.3 (highest cosine under the bar, id
    tiebreak) attaches to each positive — the training-pair prep step
    for embedding models, mined deterministically from the corpus
    itself. One cluster-scoped pair pass split two ways; hash-exact."""
    from margaret_spark.operators.semdedup import contrastive_triplets, scaled_k

    emb = _t(spark, sf_dir, "embeddings")
    return contrastive_triplets(
        emb, k=scaled_k(emb.count(), 8), iters=2,
        pos_threshold=0.4, neg_threshold=0.3, n_neg=1,
    )


def q_docs_hash_embed(spark, sf_dir):
    """Hashing-trick document embeddings (operators.hashembed, after
    Weinberger et al. 2009): every document's 64-dim signed
    bucket-count vector, L2-normalized — vocabulary-free text
    vectorization that feeds the whole vector stack (semantic dedup,
    k-means, ANN, PQ) on corpora without a neural embedding column.
    Emitted exploded as (doc_id, pos, val); graded hash-exact — one
    md5 per token drives bucket and sign, counts are exact integers,
    and the normalization tree is IEEE-identical in the oracle."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings

    docs = _t(spark, sf_dir, "documents")
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64)
    return emb.select(
        "doc_id", F.posexplode(F.col("embedding")).alias("pos", "val")
    )


def q_docs_semantic_dedup(spark, sf_dir):
    """The full text → vector → SemDeDup composition: hashed doc
    embeddings (q_docs_hash_embed's operator) pruned by
    semdedup.semantic_prune over scaled_k (max(32, ceil(√N)))
    Lloyd-refined cells at 0.88 cosine — semantic near-dup curation
    for corpora with NO model embeddings at all. Keeps ~434/500 at
    sf0.01 (k floors to 32 there, unchanged). Graded hash-exact:
    the oracle chains the hashed-embedding CTEs into the re-sourced
    k-means + pair-join chain."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings
    from margaret_spark.operators.semdedup import scaled_k, semantic_prune

    docs = _t(spark, sf_dir, "documents")
    # pin the hashing-trick embedding once: the Lloyd rounds, the
    # assignment, and the vector join all consume it — unpinned, the
    # md5-per-token map build recomputes per consumer (the
    # decontaminate_semantic lesson)
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    # k = max(32, ceil(sqrt(n_docs))) — semdedup.scaled_k: the r9 10x
    # probe measured fixed k=32 at 17x wall for 10x docs (cells grow
    # with N, pair stage N^2/k); sqrt-k balances assignment and pairs
    # at N^1.5. Floor 32 keeps sf0.01 (500 docs) exactly as before.
    return semantic_prune(
        emb, k=scaled_k(docs.count(), 32), iters=1, threshold=0.88,
        id_col="doc_id", vec_col="embedding",
    )


def q_docs_triangles(spark, sf_dir):
    """Triangle census of the near-dup graph (graph.triangle_stats
    over the capped-jaccard pairs): per-document degree, triangle
    count, and local clustering coefficient — the cohesion diagnostic
    that tells template families (cliques, coeff→1) from boilerplate
    shingle-collision hubs (high degree, no closure) before
    cluster-collapse. Ordered node-iterator join: each {a<b<c}
    triangle found exactly once via two equi-joins."""
    from margaret_spark.operators.dedup import ngram_jaccard_pairs
    from margaret_spark.operators.graph import triangle_stats

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return triangle_stats(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "doc_id"
    )


def q_text_collocations(spark, sf_dir):
    """Collocation mining (operators.text.collocations): the top-50
    adjacent-token pairs by rational PMI (c_pair·T / (c_w1·c_w2), the
    log-free association ratio — identical ranking, engine-exact
    arithmetic) with a min-count noise floor — the phrase-mining pass
    behind tokenizer vocab decisions. Map-side-combined bigram and
    unigram counts, two token-keyed joins, TakeOrdered top-k."""
    from margaret_spark.operators.text import collocations

    docs = _t(spark, sf_dir, "documents")
    return collocations(docs, "doc_id", "text", k=50, min_count=5)


def q_quality_pctile(spark, sf_dir):
    """Per-source quality calibration (operators.text.
    quality_percentile): each document's quality score re-expressed as
    its percent rank WITHIN its source — the normalization that makes
    one quality bar meaningful across sources with different score
    distributions. percent_rank is SQL-standard (ties share a rank,
    (rank-1)/(n-1)), so the surface is hash-exact; the quality score
    itself is the same pround'ed rational arithmetic both engines
    already agree on."""
    from margaret_spark.operators.text import quality_percentile

    docs = _t(spark, sf_dir, "documents")
    return quality_percentile(docs, "doc_id", "text", "source")


def q_source_quality_report(spark, sf_dir):
    """The curation dashboard: per source, doc counts, exact-decimal
    average quality and repetition, and how many docs fall below the
    quality bar. Two narrow scoring passes joined on doc_id, one
    shuffle on source; averages go through exact decimal sums of the
    per-row rounded scores, so the report reproduces bit-for-bit."""
    from margaret_spark.operators.text import quality_score, repetition_score

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs, "doc_id", "text")
    r = repetition_score(docs, "doc_id", "text")
    joined = docs.select("doc_id", "source").join(q, "doc_id").join(r, "doc_id")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        pround(dsum("quality", scale=6) / F.count("*"), 6).alias("avg_quality"),
        pround(dsum("repetition", scale=6) / F.count("*"), 6).alias(
            "avg_repetition"
        ),
        F.sum(F.when(F.col("quality") < 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_below_bar"),
    )


def q_docs_length_histogram(spark, sf_dir):
    """Corpus EDA: document-length histogram per language (fixed
    100-char buckets). Map-side partial aggregation; shuffle bytes =
    |languages × buckets|, independent of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / F.lit(100)).cast("long")
    return (
        docs.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def q_text_repetition(spark, sf_dir):
    """Duplicate-trigram fraction per doc (operators.text
    .repetition_score) — the boilerplate/repetition quality rule."""
    from margaret_spark.operators.text import repetition_score

    return repetition_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination (operators.dedup.ngram_contamination):
    the eval set is the deterministic 5% hash sample of the corpus;
    every remaining document is scored by how many of its distinct
    trigrams appear anywhere in the eval set (broadcast containment
    join — the corpus never shuffles on shingles)."""
    from margaret_spark.operators.dedup import ngram_contamination
    from margaret_spark.operators.sampling import hash_sample, hex_threshold

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    )
    return ngram_contamination(rest, eval_df, "doc_id", "text", mode="word", n=3)


def q_decontaminate_eval(spark, sf_dir):
    """Contamination-detector eval: PLANT leakage (a 6-token span from
    the lowest-id ≥10-token eval doc, appended to the md5-selected
    3/16 of train docs), run the graded ngram_contamination detector,
    score doc-level precision/recall against the planted truth
    (operators.dedupeval.id_metrics). The 6 contiguous planted tokens
    guarantee 4 matching interior trigrams, so the detection bar is
    n_matched ≥ 4; organic eval/train overlap makes planted-precision
    a documented lower bound. Hash-exact."""
    from margaret_spark.operators.dedup import ngram_contamination
    from margaret_spark.operators.dedupeval import PLANT_PREFIXES, id_metrics
    from margaret_spark.operators.sampling import hash_sample, hex_threshold
    from margaret_spark.operators.text import words

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    )
    donor = (
        eval_df.where(F.size(words(F.col("text"))) >= 10)
        .orderBy("doc_id")
        .limit(1)
    )
    span = donor.select(
        F.concat_ws(" ", F.slice(words(F.col("text")), 1, 6)).alias("__span")
    )
    is_victim = F.substring(
        F.md5(F.col("doc_id").cast("string")), 1, 1
    ).isin(*PLANT_PREFIXES)
    corpus = (
        rest.select("doc_id", "text", is_victim.alias("__v"))
        .crossJoin(F.broadcast(span))
        .select(
            "doc_id",
            F.when(
                F.col("__v"), F.concat(F.col("text"), F.lit(" "), F.col("__span"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
            "__v",
        )
    )
    scored = ngram_contamination(
        corpus.select("doc_id", "text"), eval_df, "doc_id", "text"
    )
    pred = scored.where(F.col("n_matched") >= 4).select("doc_id")
    truth = corpus.where(F.col("__v")).select("doc_id")
    return id_metrics(pred, truth, "doc_id")


def q_decontaminate_spans(spark, sf_dir):
    """Span-level decontamination (dedup.cut_contaminated_spans): the
    same 5% hash-sample eval split as q_decontaminate, but instead of
    flagging documents by overlap fraction, every trigram run that
    appears in the eval set is CUT from the remaining corpus — the
    salvage path that keeps a mostly-clean document's clean mass. The
    eval gram universe broadcasts; the corpus never shuffles on
    grams."""
    from margaret_spark.operators.dedup import cut_contaminated_spans
    from margaret_spark.operators.sampling import hash_sample, hex_threshold

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    )
    return cut_contaminated_spans(rest, eval_df, "doc_id", "text", n=3)


def q_docs_scd2(spark, sf_dir):
    """SCD2 history merge (functions.diff.scd2_merge): a v2 crawl
    batch applied to the v1 document table — every 13th key absent
    from the batch (stays open untouched), every present 7th key
    re-measured (old row closed at v2, new open row), every 11th key
    re-added under a fresh id (inserted open). The oracle states the
    expected history in closed form from the same arithmetic — the
    merge's full-outer hash comparison must reproduce it exactly."""
    from margaret_spark.functions.diff import scd2_merge

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    current = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    present = docs.where(F.col("doc_id") % 13 != 0).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.col("n_chars") + F.lit(1)
        ).otherwise(F.col("n_chars")),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    changes = present.unionByName(added)
    return scd2_merge(current, changes, "doc_id", version=2)


def q_docs_scd2_lookup(spark, sf_dir):
    """Point-in-time lookup against the SCD2 history
    (functions.diff.scd2_lookup): every key probed at versions 1 AND 2
    — v1 probes see pre-change attributes (and NULL for keys that
    didn't exist yet), v2 probes see the post-merge state. Key-equi
    join with the interval check as a residual predicate, so the plan
    partitions on the key like any equi-join."""
    from margaret_spark.functions.diff import scd2_lookup

    history = q_docs_scd2(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id")
    )
    all_keys = docs.unionByName(added)
    probes = all_keys.select("doc_id", F.lit(1).alias("probe_v")).unionByName(
        all_keys.select("doc_id", F.lit(2).alias("probe_v"))
    )
    return scd2_lookup(probes, history, "doc_id", "probe_v")


def q_stream_docs_scd2(spark, sf_dir):
    """Streaming SCD2 ingest (streaming/scd.py): the v2 change batch
    arrives as JSON payloads on a real log; the stream merges it into
    a crash-safe versioned history directory (publish-first manifest,
    re-run-idempotent batches). Same change construction as the batch
    docs_scd2, so the published history is graded against the SAME
    closed-form oracle."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_history, stream_scd2

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    current = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    present = docs.where(F.col("doc_id") % 13 != 0).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.col("n_chars") + F.lit(1)
        ).otherwise(F.col("n_chars")),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    changes = present.unionByName(added)
    payload = changes.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "source", "n_chars")).alias("j"),
    )
    schema = "doc_id long, source string, n_chars int"
    base = tempfile.mkdtemp(prefix="stream_scd2_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(payload, value_col="j", order_by="doc_id")
        stream_scd2(
            log,
            lambda b: b.select(
                F.from_json(F.col("value"), schema).alias("c"), "seq"
            ).select("c.*", "seq"),
            "doc_id",
            current,
            os.path.join(base, "hist"),
            os.path.join(base, "ckpt"),
            version_of=lambda _b: 2,
            available_now=True,
        )
        out = read_history(spark, os.path.join(base, "hist"))
        return out
    finally:
        _defer_cleanup(base)


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for a pretraining loader
    (operators.packing.pack_sequences): documents in doc_id order are
    laid out as one contiguous token stream and cut into 2048-token
    packs; each doc gets (pack_first, offset_in_first, pack_last).
    The prefix sum is the two-pass partition-offset technique — no
    global window, no single hot partition. Token counts are the
    engine-portable whitespace tokenization (text_stats)."""
    from margaret_spark.operators.packing import pack_sequences
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    return pack_sequences(toks, "doc_id", "n_tokens", seq_len=2048)


def q_text_ngram_coverage(spark, sf_dir):
    """Top/duplicate bigram char coverage per document
    (operators.text.ngram_coverage): the detailed single-n Gopher
    repetition report — which bigram dominates each document, how
    many occurrences, and what fraction of the document's characters
    the top / any duplicated bigram covers."""
    from margaret_spark.operators.text import ngram_coverage

    return ngram_coverage(_t(spark, sf_dir, "documents"), "doc_id", "text", n=2)


def q_text_gopher_battery(spark, sf_dir):
    """The Gopher repetition battery (operators.text
    .gopher_repetition, Rae et al. 2021): per document, the char mass
    of the most frequent {2,3,4}-gram and the char mass inside
    duplicated {3,4}-grams. dup_ns stops at 4 because this corpus has
    no duplicated 5-grams at any graded SF (the paper's 5..10 range
    would grade all-zero columns — the "cut must bind" rule)."""
    from margaret_spark.operators.text import gopher_repetition

    return gopher_repetition(
        _t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        top_ns=(2, 3, 4),
        dup_ns=(3, 4),
    )


def q_text_line_repetition(spark, sf_dir):
    """Line-level repetition (operators.text.line_repetition) over a
    deterministically PLANTED multi-line corpus — the driver documents
    are single-line word soup, so the query first lays each document
    out as 6-token lines and appends a copy of the first line to every
    doc_id % 3 == 0 document (the planted duplicate), then measures
    duplicate-line fraction and duplicated-line char mass. The oracle
    replays the identical construction, so the planted third binds the
    nonzero branch and the rest pin the zero branch."""
    from margaret_spark.functions.shingling import bind1, gram_indices, words
    from margaret_spark.operators.text import line_repetition

    docs = _t(spark, sf_dir, "documents")

    def mk_lines(ws):
        n_lines = F.ceil(F.size(ws) / F.lit(6.0)).cast("int")
        return F.transform(
            gram_indices(n_lines),
            lambda i: F.concat_ws(" ", F.slice(ws, (i - F.lit(1)) * 6 + 1, 6)),
        )

    lines = bind1(words(F.col("text")), mk_lines)
    text2 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat_ws("\n", F.concat(lines, F.slice(lines, 1, 1))),
    ).otherwise(F.concat_ws("\n", lines))
    planted = docs.select("doc_id", text2.alias("text"))
    return line_repetition(planted, "doc_id", "text")


def q_dedup_eval_incremental(spark, sf_dir):
    """Dedup-quality harness, incremental-ingest family: plant a
    daily-ingest batch (exact copies of the md5-selected 3/16 +
    guaranteed-fresh docs, operators.dedupeval.plant_ingest_batch),
    run the graded incremental detector
    (dedup.incremental_exact_dedup), and score the documents it labels
    dup_of_existing against the planted copy ids — document-level
    metrics (id_metrics), because the incremental detector's output is
    a per-document label, not a pair list. Hash-exact."""
    from margaret_spark.operators.dedup import incremental_exact_dedup
    from margaret_spark.operators.dedupeval import (
        id_metrics,
        plant_ingest_batch,
    )

    docs = _t(spark, sf_dir, "documents")
    incoming, truth = plant_ingest_batch(docs, "doc_id", "text")
    labeled = incremental_exact_dedup(
        incoming, docs.select("doc_id", "text"), "doc_id", "text"
    )
    pred = labeled.where(F.col("status") == "dup_of_existing").select(
        "doc_id"
    )
    return id_metrics(pred, truth, "doc_id")


def q_dedup_eval_cross(spark, sf_dir):
    """Dedup-quality harness, cross-corpus family: even ids play the
    existing corpus, incoming is the odd ids plus one-token-mutated
    copies of the selected even docs
    (operators.dedupeval.plant_cross_corpus); the graded cross-corpus
    detector (dedup.ngram_jaccard_join, threshold 0.2, word trigrams,
    max_df='auto' over the combined corpora) is scored against the
    planted cross-boundary truth pairs. Recall measures the join's
    planted-dup sensitivity; precision is the documented lower bound
    (organic cross-corpus near-dups count against it). Hash-exact."""
    from margaret_spark.operators.dedup import ngram_jaccard_join
    from margaret_spark.operators.dedupeval import (
        pair_metrics,
        plant_cross_corpus,
    )

    docs = _t(spark, sf_dir, "documents")
    existing, incoming, truth = plant_cross_corpus(docs, "doc_id", "text")
    pred = ngram_jaccard_join(
        existing,
        incoming,
        "doc_id",
        "text",
        threshold=0.2,
        mode="word",
        n=3,
        max_df="auto",
    ).select(
        F.col("left_id").alias("id_a"), F.col("right_id").alias("id_b")
    )
    return pair_metrics(pred, truth)


def q_decontaminate_bloom(spark, sf_dir):
    """Bloom-prefiltered decontamination
    (dedup.ngram_contamination_bloom): the identical contract to
    q_decontaminate — same eval split, same trigram containment, same
    output — but the corpus shingles probe a 16 KB broadcast Bloom
    bitmap inside codegen FIRST, and only bloom-positives reach the
    exact verify join. Bloom has no false negatives, so the oracle is
    the decontaminate oracle verbatim; what this query grades is that
    the scale path (bitmap prefilter + candidate-only verify) is
    value-identical to the baseline."""
    from margaret_spark.operators.dedup import ngram_contamination_bloom
    from margaret_spark.operators.sampling import hash_sample, hex_threshold

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    )
    return ngram_contamination_bloom(rest, eval_df, "doc_id", "text")


def q_dedup_semantic_hier_pairs(spark, sf_dir):
    """Hierarchical SemDeDup pair stage (semdedup
    .semantic_dedup_pairs_hier): the LINEAR-PATH variant of
    dedup_semantic_pairs — coarse ∛N-way Lloyd cells refined by a
    per-cell ∛N-way sub-level, pairs joined on (cent_id, sub_id).
    Flat √N clustering balances at N^1.5; two ∛N levels balance at
    N^(4/3). Both branching factors follow the data (icbrt_ceil; the
    oracle derives the same value with a cbrt-plus-integer-correction
    subquery). Graded hash-exact against the generated two-level
    Lloyd oracle chain."""
    from margaret_spark.operators.semdedup import (
        icbrt_ceil,
        semantic_dedup_pairs_hier,
    )

    emb = _t(spark, sf_dir, "embeddings")
    b = icbrt_ceil(emb.count(), 4)
    return semantic_dedup_pairs_hier(
        emb, k1=b, k2=b, iters=2, threshold=0.4
    )


def q_dedup_semantic_hier(spark, sf_dir):
    """Hierarchical SemDeDup keeps (semdedup.semantic_prune_hier):
    the dominance prune over the two-level quantizer cells — same
    curation decision as dedup_semantic, N^(4/3) shape. Hash-exact."""
    from margaret_spark.operators.semdedup import (
        icbrt_ceil,
        semantic_prune_hier,
    )

    emb = _t(spark, sf_dir, "embeddings")
    b = icbrt_ceil(emb.count(), 4)
    return semantic_prune_hier(emb, k1=b, k2=b, iters=2, threshold=0.4)


def q_dedup_eval_semantic_hier(spark, sf_dir):
    """Dedup-quality harness, hierarchical-SemDeDup family: plant
    +0.01-shifted embedding copies, run the two-level quantizer pair
    detector at threshold 0.45, score against planted truth. A missed
    planted pair here is the hierarchy's CELL-SPLIT miss (source and
    copy landing in different (cent_id, sub_id) cells) — the exact
    trade the N^(4/3) shape buys, quantified on the same planted truth
    as the flat-IVF eval arm so the two recalls are directly
    comparable. Hash-exact."""
    from margaret_spark.operators.dedupeval import (
        pair_metrics,
        plant_embedding_duplicates,
    )
    from margaret_spark.operators.semdedup import (
        icbrt_ceil,
        semantic_dedup_pairs_hier,
    )

    emb = _t(spark, sf_dir, "embeddings")
    planted, truth = plant_embedding_duplicates(
        emb, "vec_id", "embedding", eps=0.01
    )
    b = icbrt_ceil(planted.count(), 4)
    pred = semantic_dedup_pairs_hier(
        planted, k1=b, k2=b, iters=2, threshold=0.45
    ).select("id_a", "id_b")
    return pair_metrics(pred, truth)


def q_dedup_overlap(spark, sf_dir):
    """Containment-dup pairs (ngram_jaccard_pairs with
    measure='overlap'): the Szymkiewicz–Simpson overlap coefficient
    |A∩B| / min(|A|,|B|) over the same capped trigram universe as
    dedup_jaccard — an excerpt fully contained in a longer document
    scores 1.0 where jaccard reports only |A|/|B|, so this is the
    family that catches quotes and boilerplate-wrapped reposts. Same
    group-then-combine plan; hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.3, mode="word", n=3,
        max_df="auto", measure="overlap",
    )


def q_dedup_keep_best(spark, sf_dir):
    """Quality-aware cluster collapse (dedup.keep_best_per_cluster):
    connected components over the graded jaccard pair graph, then ONE
    kept doc per cluster — the (quality desc, doc_id asc) argmax under
    text.quality_score — instead of the min-id representative. The
    curation decision a real pipeline makes: keep the best-written
    copy of each duplicate family. Hash-exact (recursive-closure
    clusters + the quality arithmetic both replay in SQL)."""
    from margaret_spark.operators.dedup import (
        dedup_clusters,
        keep_best_per_cluster,
    )
    from margaret_spark.operators.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    clusters = dedup_clusters(docs, pairs, "doc_id")
    scored = quality_score(docs, "doc_id", "text")
    return keep_best_per_cluster(scored, clusters, "doc_id")


def q_dedup_eval_overlap(spark, sf_dir):
    """Dedup-quality harness, containment family: plant HALF-DOC
    excerpts of the selected 3/16 (dedupeval.plant_excerpt_duplicates),
    run the overlap-coefficient detector at 0.9 — every excerpt
    trigram appears in its source, so overlap scores the planted pairs
    1.0 where jaccard would sit near 0.5 and miss them. Recall < 1
    only where the df-cap removed enough of an excerpt's trigrams;
    precision is the planted lower bound. Hash-exact."""
    from margaret_spark.operators.dedupeval import (
        pair_metrics,
        plant_excerpt_duplicates,
    )

    docs = _t(spark, sf_dir, "documents")
    planted, truth = plant_excerpt_duplicates(docs, "doc_id", "text")
    pred = ngram_jaccard_pairs(
        planted, "doc_id", "text", threshold=0.9, mode="word", n=3,
        max_df="auto", measure="overlap",
    ).select("id_a", "id_b")
    return pair_metrics(pred, truth)


def q_pack_semantic(spark, sf_dir):
    """Semantically-ordered packing: hashed doc embeddings → Lloyd
    cells (scaled_k) → per-CLUSTER contiguous token streams
    (pack_sequences_grouped with group = cent_id) — the in-batch
    semantic-coherence layout (curriculum / retrieval-style batches
    where a sequence holds topically-related documents instead of
    crawl-order noise). Pure composition of three graded operators;
    hash-exact end-to-end (hashembed CTEs → re-sourced k-means chain →
    partitioned cumsum in the oracle)."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings
    from margaret_spark.operators.packing import pack_sequences_grouped
    from margaret_spark.operators.semdedup import scaled_k
    from margaret_spark.operators.similarity import (
        kmeans_assign_deterministic,
    )
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    k = scaled_k(docs.count(), 32)
    assigned = kmeans_assign_deterministic(
        emb, k=k, iters=2, id_col="doc_id", vec_col="embedding"
    )
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = assigned.select("doc_id", "cent_id").join(toks, "doc_id")
    return pack_sequences_grouped(
        base, "cent_id", "doc_id", "n_tokens", seq_len=256
    )


def q_dedup_semantic_incremental_hier(spark, sf_dir):
    """Incremental hierarchical SemDeDup (semdedup
    .semantic_dedup_incremental_hier): the odd-id half deduped against
    the even-id half through the FROZEN two-level quantizer — the
    N^(4/3) family's ingest form, completing its pairs/prune/
    incremental/at-ingest symmetry with the flat family. Hash-exact
    against the generated frozen-fit + two-stage-assignment oracle."""
    from margaret_spark.operators.semdedup import (
        icbrt_ceil,
        semantic_dedup_incremental_hier,
    )

    emb = _t(spark, sf_dir, "embeddings")
    existing = emb.where(F.col("vec_id") % 2 == 0)
    new = emb.where(F.col("vec_id") % 2 == 1)
    b = icbrt_ceil(existing.count(), 4)
    return semantic_dedup_incremental_hier(
        new, existing, k1=b, k2=b, iters=1, threshold=0.4
    )


# per-session build cache for the persisted hierarchical index: the
# serving shape FREEZES the model (VERDICT r9 ask #2), so repeated
# executions of q_ann_hier_indexed — the bench's warmup + best-of-N —
# measure the probe stages against one build, exactly like production
# serving. Keyed by sf_dir; the tempdir lives for the session.
_HIER_INDEX_CACHE: dict[str, str] = {}


def q_ann_hier_indexed(spark, sf_dir):
    """The persisted two-level hierarchical serving path
    (semdedup.build_hier_index / hier_index_search): frozen coarse +
    sub centroid tables on disk, corpus vectors Hive-partitioned by
    (cell, sub) with precomputed norms — the broadcast probe set
    triggers dynamic partition pruning on BOTH partition levels, so
    the scan reads only the ~nprobe2 probed sub-cells per query.
    Same model parameters as ann_hier, and hier_index_search ranks
    through the same _hier_probes/_hier_topk code, so the same
    generated two-level oracle checks bit-identical results (index ==
    in-flight additionally pinned in pytest). The build (one fit) is
    paid once per session; measured executions are probe-only — the
    production serving shape for the N^(4/3) family."""
    import tempfile

    from margaret_spark.operators.semdedup import (
        build_hier_index,
        hier_index_search,
    )

    path = _HIER_INDEX_CACHE.get(sf_dir)
    if path is None:
        emb = _t(spark, sf_dir, "embeddings")
        path = tempfile.mkdtemp(prefix="margaret_hier_idx_")
        build_hier_index(emb, path, iters=2)
        _HIER_INDEX_CACHE[sf_dir] = path
        # r11 ADVICE: remove the persisted index at session teardown
        # (it is still reused across executions within the session)
        _defer_cleanup(path)
    queries = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 5)
    return hier_index_search(spark, path, queries, k=5, nprobe1=2, nprobe2=4)


def q_ann_hier(spark, sf_dir):
    """Two-level IVF ANN (semdedup.hier_ivf_topk): one hierarchical
    quantizer fit serves both the N^(4/3) dedup family and SEARCH —
    queries probe their 2 nearest coarse cells, then the 4 nearest
    sub-cells among those cells' sub-centroids, and score only those
    sub-cells' members (exact cosine top-5, self excluded). Probe
    fan-in is nprobe1·k2 sub-centroid scorings instead of a flat
    index's k1·k2, candidate mass is sub-cell-sized. Hash-exact
    against the generated two-level probe oracle."""
    from margaret_spark.operators.semdedup import hier_ivf_topk, icbrt_ceil

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    b = icbrt_ceil(emb.count(), 4)
    return hier_ivf_topk(
        emb, queries, k=5, k1=b, k2=b, iters=2, nprobe1=2, nprobe2=4
    )


def q_export_shards_balanced(spark, sf_dir):
    """Size-balanced shard assignment (sharding
    .assign_shards_balanced): sorted round-robin over the global
    (n_chars desc, doc_id asc) rank into 64 shards — the export used
    when per-shard BYTES must match (balanced downstream tasks);
    byte skew between shards is bounded by one maximal document,
    where hash sharding only concentrates statistically. Global rank
    is the two-pass partition-offset prefix sum (no single-partition
    window — plan-pinned for the packing family). Hash-exact: the
    oracle is one window rank + the modulo deal."""
    from margaret_spark.operators.sharding import assign_shards_balanced

    docs = _t(spark, sf_dir, "documents")
    return assign_shards_balanced(docs, "doc_id", "n_chars", 64)


def q_dedup_eval_keep_best(spark, sf_dir):
    """Dedup-quality harness, quality-aware-collapse family: plant
    half-doc excerpts, cluster via the overlap detector at 0.9, run
    keep_best_per_cluster under text.quality_score, and score the
    DROPPED set against the planted excerpt ids — measures how often
    the collapse keeps the fuller copy (an excerpt usually loses on
    the length term; a diversity-dense excerpt can legitimately win,
    which is exactly what this eval quantifies instead of asserting).
    Precision < 1 from organic containment clusters (documented lower
    bound). Hash-exact."""
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

    docs = _t(spark, sf_dir, "documents")
    planted, truth = plant_excerpt_duplicates(docs, "doc_id", "text")
    pairs = ngram_jaccard_pairs(
        planted, "doc_id", "text", threshold=0.9, mode="word", n=3,
        max_df="auto", measure="overlap",
    ).select("id_a", "id_b")
    clusters = dedup_clusters(planted, pairs, "doc_id")
    scored = quality_score(planted, "doc_id", "text")
    kept = keep_best_per_cluster(scored, clusters, "doc_id")
    dropped = planted.select("doc_id").join(
        kept.select("doc_id"), "doc_id", "left_anti"
    )
    return id_metrics(dropped, truth.select(F.col("id_b").alias("doc_id")), "doc_id")


def q_dedup_rates_by_source(spark, sf_dir):
    """Per-source duplication report: connected components over the
    graded jaccard pair graph, then per source — docs, docs collapsed
    into another doc's cluster (doc_id != cluster_id), and the dup
    fraction. THE table a curation team reads to decide which sources
    to distrust (a mirror-heavy source shows a high collapse rate).
    One join + one aggregation over the cluster output; hash-exact."""
    from margaret_spark.operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    clusters = dedup_clusters(docs, pairs, "doc_id")
    j = clusters.join(docs.select("doc_id", "source"), "doc_id")
    from margaret_spark.functions.numeric import pround

    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") != F.col("cluster_id"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_collapsed"),
        )
        .select(
            "source",
            "n_docs",
            "n_collapsed",
            pround(
                F.col("n_collapsed").cast("double") / F.col("n_docs"), 6
            ).alias("dup_frac"),
        )
    )


def q_ann_hier_recall(spark, sf_dir):
    """Recall@5 of the two-level hierarchical IVF against brute force
    — the eval that justifies ann_hier's nprobe1/nprobe2 settings,
    via the shared topk_recall metric tail (exact integer counts +
    one IEEE division; hash-exact). Completes the recall-eval
    discipline: every approximate index here (IVF, PQ, Matryoshka,
    hierarchical) ships with its measured recall."""
    from margaret_spark.operators.semdedup import hier_ivf_topk, icbrt_ceil
    from margaret_spark.operators.similarity import topk_recall

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    b = icbrt_ceil(emb.count(), 4)
    approx = hier_ivf_topk(
        emb, q, k=5, k1=b, k2=b, iters=2, nprobe1=2, nprobe2=4
    ).select("query_id", "neighbor_id")
    return topk_recall(
        exact, approx, q.select(F.col("vec_id").alias("query_id"))
    )


def q_text_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a document's
    distinct trigrams that appear NOWHERE else in the corpus
    (corpus-df = 1) — boilerplate- and template-heavy documents score
    near 0, genuinely novel text near 1; the curation battery's
    complement to the within-document repetition signals. One
    inverted-index pass + one df aggregation + one per-doc share;
    every count exact, one IEEE division. Hash-exact."""
    from margaret_spark.functions.numeric import pround
    from margaret_spark.functions.shingling import word_shingles

    docs = _t(spark, sf_dir, "documents")
    inv = docs.select(
        F.col("doc_id"),
        F.explode(word_shingles(F.col("text"), n=3)).alias("sh"),
    )
    df_counts = inv.groupBy("sh").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    per_doc = (
        inv.join(df_counts, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("__df") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_unique"),
        )
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias("n_unique"),
        pround(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_unique").cast("double") / F.col("n_grams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("novelty"),
    )


def q_dedup_source_matrix(spark, sf_dir):
    """Cross-source near-dup matrix: per (source_a ≤ source_b) pair,
    how many jaccard near-dup pairs cross that source boundary — the
    mirror-detection table (two sources sharing heavy pair mass are
    mirrors/syndicators of each other). One pair pass + two source
    joins + one aggregation; hash-exact."""
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa")), "id_a")
        .join(src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb")), "id_b")
    )
    return (
        j.select(
            F.least(F.col("__sa"), F.col("__sb")).alias("source_a"),
            F.greatest(F.col("__sa"), F.col("__sb")).alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def q_training_data_v2(spark, sf_dir):
    """The round-9-continuation end-to-end curation pipeline — the
    session's new operators composed as one graded query:

    1. GATE by the Gopher repetition battery (top-bigram char
       coverage ≤ 0.09 AND duplicated-trigram char mass ≤ 0.02 — the
       same cuts as the at-ingest stream_gopher_filter);
    2. CLUSTER the survivors' jaccard near-dup graph (threshold 0.2,
       max_df='auto' resolved over the SURVIVORS) and collapse each
       cluster to its best-written copy (keep_best_per_cluster under
       text.quality_score);
    3. deal the kept docs into 16 SIZE-BALANCED shards
       (assign_shards_balanced over n_chars).

    Output (doc_id, cluster_id, quality, n_chars, shard) — one row
    per kept document. Every stage hash-deterministic; the oracle
    restates the battery, the recursive closure, the quality argmax
    and the balanced deal as one chain."""
    from margaret_spark.operators.dedup import (
        dedup_clusters,
        keep_best_per_cluster,
    )
    from margaret_spark.operators.sharding import assign_shards_balanced
    from margaret_spark.operators.text import gopher_repetition, quality_score

    docs = _t(spark, sf_dir, "documents")
    # the battery carries text/n_chars through its single row pass
    # (keep_cols) instead of being joined back onto a second scan of
    # the corpus — the join was a sort-merge whose exchanges moved the
    # full text payload once more (r11 optimization round, guide §2.4)
    battery = gopher_repetition(
        docs, "doc_id", "text", top_ns=(2,), dup_ns=(3,),
        keep_cols=("text", "n_chars"),
    )
    survivors = (
        battery.where(
            (F.col("top_2gram_frac") <= 0.09)
            & (F.col("dup_3gram_frac") <= 0.02)
        )
        .select("doc_id", "text", "n_chars")
        .localCheckpoint(eager=False)
    )
    pairs = ngram_jaccard_pairs(
        survivors, "doc_id", "text", threshold=0.2, mode="word", n=3,
        max_df="auto",
    )
    clusters = dedup_clusters(survivors, pairs, "doc_id")
    kept = keep_best_per_cluster(
        quality_score(survivors, "doc_id", "text"), clusters, "doc_id"
    )
    sized = kept.join(survivors.select("doc_id", "n_chars"), "doc_id")
    shards = assign_shards_balanced(sized, "doc_id", "n_chars", 16)
    return (
        kept.join(shards.select("doc_id", "n_chars", "shard"), "doc_id")
        .select("doc_id", "cluster_id", "quality", "n_chars", "shard")
    )


def q_ann_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of the three graded approximate indexes
    (similarity.rrf_fuse, Cormack et al. 2009): the flat IVF, the
    two-level hierarchical IVF, and the Matryoshka prefix search —
    each at its graded parameterization — fused by
    Σ 1/(60 + rank_i) and re-ranked top-5. The retrieval ensemble a
    serving stack runs when no single index dominates; cost is
    queries·k·|arms|, corpus-size-free. Hash-exact (fixed-order IEEE
    score tree; the oracle composes the three arm chains)."""
    from margaret_spark.operators.semdedup import hier_ivf_topk, icbrt_ceil
    from margaret_spark.operators.similarity import (
        ivf_topk,
        rrf_fuse,
        truncate_embeddings,
    )

    from concurrent.futures import ThreadPoolExecutor

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5)
    b = icbrt_ceil(emb.count(), 4)

    # The three arms are independent and each runs its fit jobs at
    # BUILD time (Lloyd collects + checkpoints), so building them
    # sequentially serializes three job chains that never saturate the
    # executor pool. Submit them from a small thread pool (guide §2.6:
    # overlap independent jobs) — each arm's result is unchanged, the
    # fuse consumes the same three DataFrames.
    def _arm1():
        return ivf_topk(emb, q, k=5, nlist=16, nprobe=4)

    def _arm2():
        return hier_ivf_topk(
            emb, q, k=5, k1=b, k2=b, iters=2, nprobe1=2, nprobe2=4
        )

    def _arm3():
        tr = truncate_embeddings(emb, 16)
        return brute_force_topk(tr, tr.where(F.col("vec_id") < 5), k=5)

    with ThreadPoolExecutor(max_workers=3) as pool:
        f1, f2, f3 = pool.submit(_arm1), pool.submit(_arm2), pool.submit(_arm3)
        a1, a2, a3 = f1.result(), f2.result(), f3.result()
    return rrf_fuse([a1, a2, a3], k=5)
