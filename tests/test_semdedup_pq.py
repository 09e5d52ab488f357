"""SemDeDup semantic pruning (operators.semdedup) and product
quantization (operators.pq): planted-duplicate recall, dominance
semantics, codebook invariants, ADC vs exact ranking."""

import math

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.pq import pq_encode, pq_topk, pq_train
from margaret_spark.operators.semdedup import (
    semantic_dedup_pairs,
    semantic_prune,
)


def _unit(vals):
    n = math.sqrt(sum(v * v for v in vals))
    return [v / n for v in vals]


@pytest.fixture(scope="module")
def planted(spark):
    """Two well-separated directions, 8-dim; ids 0-3 cluster A
    (0 and 1 near-identical, 2 and 3 distinct-ish), ids 10-11
    cluster B near-identical. Cross-cluster cosines ~0."""
    a = [1.0, 0.0, 0.0, 0.0, 0.2, 0.0, 0.1, 0.0]
    b = [0.0, 1.0, 0.0, 0.3, 0.0, 0.1, 0.0, 0.0]
    rows = [
        (0, _unit(a)),
        (1, _unit([v + 0.01 * (i % 3) for i, v in enumerate(a)])),
        (2, _unit([v + (0.8 if i == 2 else 0.0) for i, v in enumerate(a)])),
        (3, _unit([v + (0.9 if i == 5 else 0.0) for i, v in enumerate(a)])),
        (10, _unit(b)),
        (11, _unit([v + 0.01 * (i % 2) for i, v in enumerate(b)])),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_pairs_find_planted_dups_within_clusters(planted):
    pairs = semantic_dedup_pairs(planted, k=2, iters=2, threshold=0.98)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert (0, 1) in got and (10, 11) in got
    # never a cross-cluster pair: every pair shares a cent_id by
    # construction, and the near-orthogonal directions can't reach
    # the threshold anyway
    assert all(not ({p[0], p[1]} == {1, 10}) for p in got)


def test_semantic_prune_drops_exactly_the_dominated_rows(planted):
    kept = semantic_prune(planted, k=2, iters=2, threshold=0.98)
    ids = sorted(r.vec_id for r in kept.collect())
    # 1 dominated by 0, 11 by 10; the distinct-ish rows survive
    assert ids == [0, 2, 3, 10]
    # output carries the final cluster assignment
    cols = set(kept.columns)
    assert cols == {"vec_id", "cent_id", "cent_cosine"}


def test_semantic_prune_keeps_everything_below_threshold(planted):
    kept = semantic_prune(planted, k=2, iters=1, threshold=1.1)
    assert kept.count() == planted.count()


@pytest.fixture(scope="module")
def pqcorpus(spark):
    """24 deterministic 8-dim vectors with two obvious groups per
    half-space so 2-subspace codebooks have structure to find."""
    rows = []
    for i in range(24):
        base = [0.0] * 8
        base[i % 4] = 1.0 + 0.05 * (i % 3)
        base[4 + (i % 2)] = 0.5 + 0.1 * (i % 5)
        rows.append((i, base))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_train_shapes_and_empty_code_retention(pqcorpus):
    cb = pq_train(pqcorpus, m=2, codes=4, iters=2)
    rows = cb.collect()
    # every (sub, code) survives every round even if a cell empties
    assert sorted((r.sub, r.code_id) for r in rows) == [
        (s, c) for s in range(2) for c in range(4)
    ]
    assert all(len(r.cent) == 4 for r in rows)


def test_pq_encode_assigns_every_subspace(pqcorpus):
    cb = pq_train(pqcorpus, m=2, codes=4, iters=1)
    enc = pq_encode(pqcorpus, cb, m=2)
    assert enc.count() == 24 * 2
    assert enc.select("vec_id", "sub").distinct().count() == 48
    code_ids = {r.code_id for r in enc.select("code_id").distinct().collect()}
    assert code_ids <= {0, 1, 2, 3}


def test_pq_topk_self_is_rank_one_and_adc_orders_sanely(pqcorpus):
    queries = pqcorpus.where(F.col("vec_id") < 3)
    tk = pq_topk(pqcorpus, queries, k=4, m=2, codes=4, iters=1)
    by_q = {}
    for r in tk.collect():
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) == 4
        # the query itself shares every code with itself → minimal
        # quantized distance; ties break on id so it may not be
        # LITERALLY rank 1, but it must be in the minimal-dist group
        self_d = [r.adist for r in rs if r.vec_id == qid]
        assert self_d and self_d[0] == rs[0].adist
        assert [r.adist for r in rs] == sorted(r.adist for r in rs)


def test_ivfpq_probes_only_cells_and_excludes_self(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from margaret_spark.operators.pq import ivfpq_topk

    tk = ivfpq_topk(
        df, df.where(F.col("vec_id") < 3),
        k=3, nlist=4, nprobe=2, m=2, codes=4, iters=1,
    )
    got = tk.collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        assert all(r.vec_id != qid for r in rs)  # self excluded
        assert sorted(r.rank for r in rs) == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r.rank)
        assert [r.adist for r in ordered] == sorted(r.adist for r in rs)


def test_ivfpq_recall_against_exact_neighbors(spark):
    """With generous probes/codes on a small corpus, IVFADC's top-3
    must overlap the exact cosine top-3 — the ANN contract."""
    import random

    rng = random.Random(11)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from margaret_spark.operators.pq import ivfpq_topk
    from margaret_spark.operators.similarity import brute_force_topk

    qs = df.where(F.col("vec_id") < 2)
    approx = ivfpq_topk(df, qs, k=3, nlist=2, nprobe=2, m=4, codes=8, iters=2)
    exact = brute_force_topk(df, qs, k=4)
    a = {}
    for r in approx.collect():
        a.setdefault(r.query_id, set()).add(r.vec_id)
    e = {}
    for r in exact.collect():
        if r.neighbor_id != r.query_id:
            e.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(a[q] & e.get(q, set())) for q in a)
    total = sum(len(v) for v in a.values())
    assert hits / total >= 0.5, (hits, total, a, e)


def test_pq_rejects_indivisible_dim(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not divisible"):
        pq_train(df, m=2, codes=1, iters=0)


def test_pq_rejects_empty_corpus(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        pq_train(df, m=2, codes=1, iters=0)


def test_hash_doc_embeddings_contract(spark):
    """Every input row gets a row; token-less docs are the zero
    vector; identical texts embed identically; normalized rows have
    unit norm; the embedding is a pure function of the text."""
    import math

    from margaret_spark.operators.hashembed import hash_doc_embeddings

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),
            (3, ""),
            (4, None),
            (5, "entirely different words here altogether"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.embedding for r in hash_doc_embeddings(df, dim=16).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    assert all(len(v) == 16 for v in out.values())
    assert out[1] == out[2]
    assert out[3] == [0.0] * 16 and out[4] == [0.0] * 16
    for d in (1, 5):
        assert abs(math.sqrt(sum(x * x for x in out[d])) - 1.0) < 1e-12
    assert out[1] != out[5]

    raw = {
        r.doc_id: r.embedding
        for r in hash_doc_embeddings(df, dim=16, normalize=False).collect()
    }
    # un-normalized entries are signed integer counts
    assert all(x == int(x) for x in raw[1])
    assert sum(abs(x) for x in raw[1]) > 0


def test_hash_doc_embeddings_rejects_bad_dim(spark):
    import pytest as _pytest

    from margaret_spark.operators.hashembed import hash_doc_embeddings

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="dim"):
        hash_doc_embeddings(df, dim=0)


def test_contrastive_triplets_semantics(planted):
    """Positives are near-dup pairs; the attached negative is the
    HARDEST same-cluster non-dup (highest cosine below the bar);
    anchors without a qualifying negative emit nothing."""
    from margaret_spark.operators.semdedup import contrastive_triplets

    out = contrastive_triplets(
        planted, k=2, iters=2,
        pos_threshold=0.98, neg_threshold=0.9, n_neg=1,
    ).collect()
    rows = {(r.anchor, r.positive): r for r in out}
    # cluster A: positive (0,1); hard negatives exist (2,3 in-cell)
    assert (0, 1) in rows
    r = rows[(0, 1)]
    assert r.negative in (2, 3) and r.neg_cos < 0.9
    assert r.pos_cos >= 0.98
    # cluster B has positive (10,11) but NO other member -> no triplet
    assert all(a != 10 for a, _ in rows)


def test_contrastive_triplets_guards(spark):
    import pytest as _pytest

    from margaret_spark.operators.semdedup import contrastive_triplets

    df = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with _pytest.raises(ValueError, match="pos_threshold"):
        contrastive_triplets(df, pos_threshold=0.2, neg_threshold=0.5)
    with _pytest.raises(ValueError, match="n_neg"):
        contrastive_triplets(df, n_neg=0)


def test_ivfpq_index_build_search_equals_inflight(spark, tmp_path):
    """The persisted IVFADC index returns EXACTLY the in-flight
    ivfpq_topk result with the same parameters, and the probe scan
    reads only probed cell partitions (dynamic pruning via the
    broadcast LUT join)."""
    import random

    from margaret_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_search,
        ivfpq_topk,
    )

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where(F.col("vec_id") < 3)

    path = str(tmp_path / "ivfpq")
    build_ivfpq_index(df, path, nlist=4, m=2, codes=4, iters=1)
    got = {
        (r.query_id, r.vec_id): (r.adist, r.rank)
        for r in ivfpq_index_search(spark, path, qs, k=3, nprobe=2).collect()
    }
    want = {
        (r.query_id, r.vec_id): (r.adist, r.rank)
        for r in ivfpq_topk(
            df, qs, k=3, nlist=4, nprobe=2, m=2, codes=4, iters=1
        ).collect()
    }
    assert got == want and len(got) > 0


def test_semantic_dedup_incremental_statuses(spark):
    """Planted fixture: a new vector near an existing one is
    dup_of_existing; two near-identical new vectors with no existing
    match make (earlier, later) = (new, dup_in_batch); an isolated
    new vector is new. Frozen existing-side clusters."""
    from margaret_spark.operators.semdedup import semantic_dedup_incremental

    a = _unit([1.0, 0.0, 0.1, 0.0])
    b = _unit([0.0, 1.0, 0.0, 0.2])
    c = _unit([0.5, 0.5, 0.5, 0.5])
    existing = spark.createDataFrame(
        [(0, a), (2, b)], "vec_id long, embedding array<double>"
    )
    new = spark.createDataFrame(
        [
            (1, _unit([v + 0.01 for v in a])),   # ~ existing 0
            (3, c),                               # first of a new pair
            (5, _unit([v + 0.005 for v in c])),   # ~ new 3
            (7, _unit([-0.9, 0.1, 0.3, -0.2])),   # isolated
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.status
        for r in semantic_dedup_incremental(
            new, existing, k=2, iters=1, threshold=0.95
        ).collect()
    }
    assert out[1] == "dup_of_existing"
    assert out[3] == "new" and out[5] == "dup_in_batch"
    assert out[7] == "new"
    assert len(out) == 4
    # batch_dups=False skips the new x new pass: dup_of_existing flags
    # are IDENTICAL (the decontamination contract); in-batch dups
    # surface as plain 'new'
    fast = {
        r.vec_id: r.status
        for r in semantic_dedup_incremental(
            new, existing, k=2, iters=1, threshold=0.95, batch_dups=False
        ).collect()
    }
    assert fast[1] == "dup_of_existing"
    assert fast[3] == "new" and fast[5] == "new" and fast[7] == "new"
    assert {i for i, st in out.items() if st == "dup_of_existing"} == {
        i for i, st in fast.items() if st == "dup_of_existing"
    }


def test_ivfpq_index_append_serves_new_vectors(spark, tmp_path):
    """Appended vectors are indistinguishable from build-time rows:
    their codes equal a frozen-model encode, and a search over the
    appended index returns them when they are the nearest codes."""
    import random

    from margaret_spark.operators.pq import (
        build_ivfpq_index,
        ivfpq_index_append,
        ivfpq_index_search,
    )

    rng = random.Random(5)
    old = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(30)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "idx")
    build_ivfpq_index(old, path, nlist=4, m=2, codes=4, iters=1)
    n_before = spark.read.parquet(path + "/codes").count()

    # append near-copies of vectors 0 and 1 with fresh ids
    base = {r.vec_id: r.embedding for r in old.where(F.col("vec_id") < 2).collect()}
    new = spark.createDataFrame(
        [(100 + i, [v + 0.001 for v in base[i]]) for i in (0, 1)],
        "vec_id long, embedding array<double>",
    )
    ivfpq_index_append(spark, path, new)
    codes = spark.read.parquet(path + "/codes")
    assert codes.count() == n_before + 2 * 2  # m=2 rows per vector
    assert codes.where(F.col("id") >= 100).count() == 4

    # a near-copy query must surface its appended twin
    qs = old.where(F.col("vec_id") == 0)
    got = ivfpq_index_search(spark, path, qs, k=3, nprobe=4).collect()
    ids = [r.vec_id for r in sorted(got, key=lambda r: r.rank)]
    assert 100 in ids, ids


def test_semantic_decontamination_flags_planted_paraphrase(spark):
    """The decontaminate_semantic composition: a train document whose
    text token-multiset matches a test document embeds identically
    (hashing-trick vectors are token functionals) and flags
    contaminated; unrelated train docs do not."""
    from pyspark.sql import functions as F

    from margaret_spark.operators.hashembed import hash_doc_embeddings
    from margaret_spark.operators.semdedup import semantic_dedup_incremental

    rows = [
        (10, "the quick brown fox jumps over the lazy dog"),   # test
        (20, "completely different content about spark plans"), # test
        (1, "quick the brown fox jumps over the lazy dog the"), # train: same bag + one dup token
        (3, "unrelated training text with its own vocabulary"),
        (7, "another unrelated training document entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = hash_doc_embeddings(df, "doc_id", "text", dim=32)
    test = emb.where(F.col("doc_id") % 10 == 0)
    train = emb.where(F.col("doc_id") % 10 != 0)
    out = {
        r.doc_id: r.status
        for r in semantic_dedup_incremental(
            train, test, k=2, iters=1, threshold=0.95,
            id_col="doc_id", vec_col="embedding",
        ).collect()
    }
    assert set(out) == {1, 3, 7}
    assert out[1] == "dup_of_existing"  # the planted near-paraphrase
    assert out[3] != "dup_of_existing" and out[7] != "dup_of_existing"


def test_pq_distortion_report_reflects_codebook_size(spark):
    """More codes -> less quantization error: the distortion report's
    per-subspace mean under an 8-code codebook is <= the 2-code one on
    the same corpus, and a perfect codebook (codes == corpus size,
    1 round) reports zero mean for every subspace."""
    from pyspark.sql import functions as F  # noqa: F401

    from margaret_spark.operators.pq import (
        pq_distortion_report,
        pq_encode,
        pq_train,
    )

    rows = [
        (i, [float((i * 13 + j * 7) % 17 - 8) for j in range(8)])
        for i in range(12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def mean_by_sub(codes):
        cb = pq_train(df, m=2, codes=codes, iters=1)
        rep = pq_distortion_report(pq_encode(df, cb, m=2))
        return {r.sub: r for r in rep.collect()}

    small, big = mean_by_sub(2), mean_by_sub(8)
    assert set(small) == set(big) == {0, 1}
    for sub in (0, 1):
        assert big[sub].n == 12 and small[sub].n == 12
        assert big[sub].mean_dist2 <= small[sub].mean_dist2


def test_scaled_k_rule_and_oracle_parity():
    """k = max(floor, ceil(sqrt(N))) — exact integer rule, and the
    DuckDB LIMIT-subquery twin picks the identical k for every corpus
    size that matters (incl. perfect squares and off-by-one sizes)."""
    import duckdb

    from margaret_spark.entry.oracle_builders import _scaled_k_limit
    from margaret_spark.operators.semdedup import scaled_k

    assert scaled_k(0, 8) == 8
    assert scaled_k(63, 8) == 8
    assert scaled_k(65, 8) == 9
    assert scaled_k(500, 8) == 23
    assert scaled_k(500, 32) == 32
    assert scaled_k(2000, 8) == 45
    assert scaled_k(2500, 8) == 50  # perfect square
    assert scaled_k(2499, 8) == 50
    assert scaled_k(2501, 8) == 51
    con = duckdb.connect()
    for n in [1, 63, 64, 65, 500, 2000, 2499, 2500, 2501, 50000]:
        con.execute(f"CREATE OR REPLACE TABLE t AS SELECT range AS id FROM range({n})")
        got = con.execute(
            "SELECT count(*) FROM (SELECT id FROM t ORDER BY id LIMIT "
            + _scaled_k_limit("t", 8) + ")"
        ).fetchone()[0]
        assert got == min(scaled_k(n, 8), n), (n, got)


def test_icbrt_ceil_exact_integer_cube_root():
    from margaret_spark.operators.semdedup import icbrt_ceil

    assert icbrt_ceil(0, 1) == 1
    assert icbrt_ceil(1, 1) == 1
    assert icbrt_ceil(27, 1) == 3      # perfect cube stays exact
    assert icbrt_ceil(28, 1) == 4
    assert icbrt_ceil(10**9, 1) == 1000
    assert icbrt_ceil(10**9 + 1, 1) == 1001
    assert icbrt_ceil(5, 4) == 4       # floor binds


@pytest.fixture(scope="module")
def hier_planted(spark):
    """Two coarse directions, each with two SPREAD low-id vectors (the
    sub-level seeds) and a near-identical pair whose members must land
    in the same sub-cell (they sit far from the second seed)."""
    a = [1.0, 0.0, 0.0, 0.0, 0.2, 0.0, 0.1, 0.0]
    b = [0.0, 1.0, 0.0, 0.3, 0.0, 0.1, 0.0, 0.0]

    def bump(v, i, x):
        return [c + (x if j == i else 0.0) for j, c in enumerate(v)]

    rows = [
        (0, _unit(a)),                      # seed A1
        (1, _unit(bump(a, 2, 2.0))),        # seed A2 (far from A1)
        (2, _unit(bump(a, 4, 0.3))),        # near-dup pair close to A1
        (3, _unit(bump(bump(a, 4, 0.3), 6, 0.01))),
        (8, _unit(b)),                      # seed B1
        (9, _unit(bump(b, 5, 2.0))),        # seed B2
        (10, _unit(bump(b, 6, 0.3))),       # near-dup pair close to B1
        (11, _unit(bump(bump(b, 6, 0.3), 7, 0.01))),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hier_assignment_partitions_and_pairs_same_cell(hier_planted):
    from margaret_spark.operators.semdedup import (
        _hier_assigned_with_vectors,
        semantic_dedup_pairs_hier,
    )

    assigned = _hier_assigned_with_vectors(
        hier_planted, k1=2, k2=2, iters=2,
        id_col="vec_id", vec_col="embedding",
        round_digits=6, comp_digits=9, sum_scale=12,
    )
    rows = assigned.collect()
    # every vector assigned exactly once; sub_id within 1..k2
    assert sorted(r.id for r in rows) == [0, 1, 2, 3, 8, 9, 10, 11]
    assert all(1 <= r.sub_id <= 2 for r in rows)
    cell = {r.id: (r.cent_id, r.sub_id) for r in rows}
    pairs = semantic_dedup_pairs_hier(
        hier_planted, k1=2, k2=2, iters=2, threshold=0.9
    ).collect()
    # a pair is only ever emitted inside one (cent, sub) cell
    for p in pairs:
        assert cell[p.id_a] == cell[p.id_b] == (p.cent_id, p.sub_id)
    # both planted near-identical pairs are found
    found = {(p.id_a, p.id_b) for p in pairs}
    assert (2, 3) in found and (10, 11) in found


def test_hier_prune_drops_exactly_the_dominated_rows(hier_planted):
    from margaret_spark.operators.semdedup import semantic_prune_hier

    kept = semantic_prune_hier(
        hier_planted, k1=2, k2=2, iters=2, threshold=0.9
    ).collect()
    ids = sorted(r.vec_id for r in kept)
    # the 0.3-bump members sit within 0.9 cosine of their seed too:
    # 2 and 3 are dominated by 0, 10 and 11 by 8 — seeds survive
    assert ids == [0, 1, 8, 9]


def test_hier_cell_split_miss_is_the_documented_trade(planted):
    """When a coarse cell's ONLY members are the near-dup pair itself
    and k2 matches, both become sub-seeds and the pair SPLITS — the
    cell-split miss the dedup_eval_semantic_hier arm quantifies."""
    from margaret_spark.operators.semdedup import semantic_dedup_pairs_hier

    pairs = semantic_dedup_pairs_hier(
        planted, k1=2, k2=2, iters=2, threshold=0.9
    ).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    # cluster B = {10, 11} alone: its dup pair is the seed set -> split
    assert (10, 11) not in found


def test_hier_incremental_statuses(spark, hier_planted):
    from margaret_spark.operators.semdedup import (
        semantic_dedup_incremental_hier,
    )

    existing = hier_planted  # 0,1,2,3 (A-dir) and 8,9,10,11 (B-dir)
    rows = {r.vec_id: r.embedding for r in hier_planted.collect()}
    new = spark.createDataFrame(
        [
            (20, rows[2]),    # same as existing 2 -> dup_of_existing
            (21, [v for v in rows[10]]),  # same as existing 10 -> dup
            (22, [1.0 if i == 7 else 0.0 for i in range(8)]),  # new axis
            (23, [1.0 if i == 7 else 0.0 for i in range(8)]),  # dup of 22 in batch
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: r.status
        for r in semantic_dedup_incremental_hier(
            new, existing, k1=2, k2=2, iters=1, threshold=0.95
        ).collect()
    }
    assert out[20] == "dup_of_existing" and out[21] == "dup_of_existing"
    assert out[22] == "new" and out[23] == "dup_in_batch"
    # batch_dups=False never reports in-batch dups
    out2 = {
        r.vec_id: r.status
        for r in semantic_dedup_incremental_hier(
            new, existing, k1=2, k2=2, iters=1, threshold=0.95,
            batch_dups=False,
        ).collect()
    }
    assert out2[23] == "new" and out2[20] == "dup_of_existing"


def test_hier_ivf_topk_recall_and_structure(spark):
    """Two-level IVF search: ranks are dense and cosine-ordered, self
    is excluded, and with generous probes the top-3 overlaps the
    exact cosine top-3 (the ANN contract, same bar as IVFADC)."""
    import random

    from margaret_spark.operators.semdedup import hier_ivf_topk
    from margaret_spark.operators.similarity import brute_force_topk

    rng = random.Random(13)
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where(F.col("vec_id") < 3)
    approx = hier_ivf_topk(
        df, qs, k=3, k1=3, k2=3, iters=1, nprobe1=2, nprobe2=4
    )
    got = approx.collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        assert all(r.neighbor_id != qid for r in rs)
        ordered = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in ordered] == list(range(1, len(rs) + 1))
        assert [r.cosine for r in ordered] == sorted(
            (r.cosine for r in rs), reverse=True
        )
    exact = brute_force_topk(df, qs, k=4)
    e = {}
    for r in exact.collect():
        if r.neighbor_id != r.query_id:
            e.setdefault(r.query_id, set()).add(r.neighbor_id)
    a = {q: {r.neighbor_id for r in rs} for q, rs in by_q.items()}
    hits = sum(len(a[q] & e.get(q, set())) for q in a)
    total = sum(len(v) for v in a.values())
    assert hits / total >= 0.5, (hits, total)


def test_rrf_fuse_math_and_missing_arms(spark):
    from margaret_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id long, neighbor_id long, rank int"
    )
    b = spark.createDataFrame(
        [(0, 11, 1), (0, 12, 2)], "query_id long, neighbor_id long, rank int"
    )
    out = {r.neighbor_id: (r.rrf, r.rank) for r in rrf_fuse([a, b], k=3).collect()}
    # 11 appears in both arms: 1/62 + 1/61; 10 and 12 in one each
    assert out[11][0] == round(1 / 62 + 1 / 61, 6) and out[11][1] == 1
    assert out[10][0] == round(1 / 61, 6)
    assert out[12][0] == round(1 / 62, 6)
    # equal scores tie-break on neighbor id: 10 (1/61) beats 12 (1/62)
    assert out[10][1] == 2 and out[12][1] == 3
    import pytest as _pytest

    with _pytest.raises(ValueError):
        rrf_fuse([], k=3)


def test_hier_empty_coarse_cell_seeded_and_arrivals_kept(spark):
    """ADVICE r9 (semdedup._sub_assign): a coarse cell empty at fit
    time (Lloyd keeps stale centroids for drained cells) must still
    carry >=1 sub-centroid, so a NEW arrival nearest that cell is
    assigned, not silently dropped by the cent_id equi-join.

    Construction: two near-identical init vectors (angle eps small
    enough that every fit-corpus cosine ROUNDS equal at 6 digits) ->
    the cent_id-asc tiebreak drains cell 1 in every round AND in the
    final assignment; an arrival at a wider angle sees the stale
    cell-1 centroid strictly closer than the moved cell-0 mean."""
    from margaret_spark.operators.semdedup import (
        assign_to_hier_centroids,
        hier_centroids,
    )

    eps = 0.0005
    v1 = [math.cos(eps), math.sin(eps)]
    fit = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, v1)]
        + [(i, [1.0, 0.0]) for i in range(2, 6)],
        "vec_id long, embedding array<double>",
    )
    cents, subc = hier_centroids(fit, k1=2, k2=2, iters=1)
    cent_ids = {r.cent_id for r in cents.collect()}
    sub_ids = {r.cent_id for r in subc.select("cent_id").distinct().collect()}
    assert cent_ids == {0, 1}
    # the guarantee: EVERY coarse cell has at least one sub-centroid
    assert cent_ids <= sub_ids
    # the seeded cell's sub0 is the coarse centroid itself
    seeded = {
        (r.cent_id, r.sub_id): r.cent
        for r in subc.where(F.col("cent_id") == 1).collect()
    }
    assert list(seeded) == [(1, 1)]
    stale = {r.cent_id: r.cent for r in cents.collect()}[1]
    assert seeded[(1, 1)] == pytest.approx(stale)
    # fit corpus all landed in cell 0 (cell 1 drained by the tiebreak)
    arrivals = spark.createDataFrame(
        [(100, [math.cos(0.1), math.sin(0.1)])],
        "vec_id long, embedding array<double>",
    )
    out = assign_to_hier_centroids(arrivals, cents, subc).collect()
    assert len(out) == 1  # per-row contract: nothing dropped
    assert (out[0].cent_id, out[0].sub_id) == (1, 1)


def test_hier_fit_unchanged_by_seed_on_nonempty_cells(planted):
    """The empty-cell seed must not perturb cells that have members:
    on a corpus with no drained cell, subc carries no extra rows and
    every sub-centroid comes from the data."""
    from margaret_spark.operators.semdedup import hier_centroids

    cents, subc = hier_centroids(planted, k1=2, k2=2, iters=1)
    members = {r.cent_id for r in subc.select("cent_id").distinct().collect()}
    assert members == {r.cent_id for r in cents.collect()}
    # k2=2 and both cells have >=2 members -> exactly 2 subs per cell
    per_cell = {
        r.cent_id: r.n
        for r in subc.groupBy("cent_id").agg(F.count("*").alias("n")).collect()
    }
    assert all(n == 2 for n in per_cell.values())


def test_hier_index_build_search_equals_inflight(spark, tmp_path):
    """The persisted hierarchical index (VERDICT r9 ask #2) returns
    EXACTLY the in-flight hier_ivf_topk result under the same frozen
    model, and the vector scan carries dynamic-pruning partition
    filters on BOTH (cell, sub) levels."""
    import random

    from margaret_spark.operators.semdedup import (
        build_hier_index,
        hier_index_search,
        hier_ivf_topk,
    )

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = df.where(F.col("vec_id") < 3)

    path = str(tmp_path / "hier")
    build_hier_index(df, path, k1=4, k2=4, iters=1)
    out = hier_index_search(spark, path, qs, k=3, nprobe1=2, nprobe2=4)
    got = {
        (r.query_id, r.neighbor_id): (r.cosine, r.rank)
        for r in out.collect()
    }
    cents = spark.read.parquet(path + "/cents")
    subc = spark.read.parquet(path + "/subc")
    want = {
        (r.query_id, r.neighbor_id): (r.cosine, r.rank)
        for r in hier_ivf_topk(
            df, qs, k=3, nprobe1=2, nprobe2=4, cents=cents, subc=subc
        ).collect()
    }
    assert got == want and len(got) > 0
    fmt = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruningexpression(cell" in fmt
    assert "dynamicpruningexpression(sub" in fmt


def test_hier_index_append_serves_new_vectors(spark, tmp_path):
    """Appended vectors land in their frozen-model (cell, sub)
    partition and are served by subsequent searches; the quantizer
    tables are untouched (arrivals never move the cells)."""
    import random

    from margaret_spark.operators.semdedup import (
        build_hier_index,
        hier_index_append,
        hier_index_search,
    )

    rng = random.Random(11)
    old = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "hidx")
    build_hier_index(old, path, k1=4, k2=4, iters=1)
    n_before = spark.read.parquet(path + "/vectors").count()
    subc_before = sorted(
        map(tuple, spark.read.parquet(path + "/subc").collect())
    )

    base = {r.vec_id: r.embedding for r in old.where(F.col("vec_id") < 2).collect()}
    new = spark.createDataFrame(
        [(100 + i, [v + 0.001 for v in base[i]]) for i in (0, 1)],
        "vec_id long, embedding array<double>",
    )
    hier_index_append(spark, path, new)
    vecs = spark.read.parquet(path + "/vectors")
    assert vecs.count() == n_before + 2
    assert vecs.where(F.col("id") >= 100).count() == 2
    assert (
        sorted(map(tuple, spark.read.parquet(path + "/subc").collect()))
        == subc_before
    )

    qs = old.where(F.col("vec_id") == 0)
    got = hier_index_search(spark, path, qs, k=3, nprobe1=2, nprobe2=4)
    ids = [r.neighbor_id for r in sorted(got.collect(), key=lambda r: r.rank)]
    assert 100 in ids, ids


def test_assign_keep_vec_paths_agree(spark):
    """assign_to_centroids keep_vec/keep_norm: the kernel path (int
    cent ids) and the pair-scoring fallback (non-integral cent ids
    force it) return identical assignments with the vector and norm
    attached — r11 pinned after the join-back removal."""
    from pyspark.sql import functions as F

    from margaret_spark.operators.similarity import assign_to_centroids

    vecs = [(i, [float(i % 5) + 0.5, float((i * 3) % 7), 1.0]) for i in range(40)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.5]), (1, [0.0, 1.0, 1.5]), (2, [2.0, 2.0, 0.1])],
        "cent_id int, cent array<double>",
    )
    kernel = assign_to_centroids(
        df, cents, keep_vec="__kv", keep_norm="__kn"
    ).collect()
    # string cent ids bypass the kernel (non-integral) -> fallback path
    fb = assign_to_centroids(
        df, cents.withColumn("cent_id", F.col("cent_id").cast("string")),
        keep_vec="__kv", keep_norm="__kn",
    ).collect()
    k = {r["vec_id"]: (int(r["cent_id"]), r["cosine"], tuple(r["__kv"]), r["__kn"]) for r in kernel}
    f = {r["vec_id"]: (int(r["cent_id"]), r["cosine"], tuple(r["__kv"]), r["__kn"]) for r in fb}
    assert k == f and len(k) == 40
