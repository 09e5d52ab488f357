"""Deterministic sampling / splitting operators (operators.sampling).

The contract: membership is a pure function of the id — stable across
runs, partitionings, and corpus growth — and fractions land near
their targets on uniform ids.
"""

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.sampling import (
    hash_sample,
    hash_split,
    hex_threshold,
    stratified_sample,
    train_test_split,
    weighted_sample,
)


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(2000).withColumn(
        "grp", (F.col("id") % 7).cast("string")
    )


def test_hex_threshold_bounds():
    assert hex_threshold(0.0) == "00000000"
    assert hex_threshold(1.0) == "g"
    assert hex_threshold(0.2) == "33333333"
    with pytest.raises(ValueError):
        hex_threshold(1.5)


def test_hash_sample_deterministic_and_near_fraction(ids):
    a = sorted(r.id for r in hash_sample(ids, "id", 0.3).collect())
    b = sorted(r.id for r in hash_sample(ids, "id", 0.3).collect())
    assert a == b
    # uniform md5 → binomial(2000, 0.3); ±5 sigma ≈ ±102
    assert 498 <= len(a) <= 702


def test_hash_sample_nested_fractions(ids):
    # a smaller sample is a subset of a larger one (threshold ordering)
    small = set(r.id for r in hash_sample(ids, "id", 0.1).collect())
    big = set(r.id for r in hash_sample(ids, "id", 0.4).collect())
    assert small <= big


def test_hash_sample_stable_under_repartition(ids):
    base = set(r.id for r in hash_sample(ids, "id", 0.25).collect())
    rep = set(
        r.id for r in hash_sample(ids.repartition(13), "id", 0.25).collect()
    )
    assert base == rep


def test_train_test_split_partition_and_growth_stability(spark):
    d1 = spark.range(1000)
    d2 = spark.range(2000)
    s1 = {r.id: r.split for r in train_test_split(d1, "id", 0.2).collect()}
    s2 = {r.id: r.split for r in train_test_split(d2, "id", 0.2).collect()}
    # every row of the smaller corpus keeps its assignment in the larger
    assert all(s2[i] == s1[i] for i in s1)
    frac = sum(1 for v in s1.values() if v == "test") / len(s1)
    assert 0.13 <= frac <= 0.27


def test_hash_split_three_way(ids):
    rows = hash_split(
        ids, "id", {"train": 0.8, "val": 0.1, "test": 0.1}
    ).collect()
    counts = {}
    for r in rows:
        counts[r.split] = counts.get(r.split, 0) + 1
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 2000
    with pytest.raises(ValueError):
        hash_split(ids, "id", {"a": 0.5, "b": 0.3})


def test_split_consistent_with_sample(ids):
    # the test split IS the 0.1 hash sample — tables sampled with the
    # same key stay aligned
    test_ids = set(
        r.id
        for r in train_test_split(ids, "id", 0.1).where(
            F.col("split") == "test"
        ).collect()
    )
    sampled = set(r.id for r in hash_sample(ids, "id", 0.1).collect())
    assert test_ids == sampled


def test_deterministic_shuffle(spark):
    """The epoch shuffle is a bijection onto 0..n-1, reproduces the
    naive global row_number, is seed-sensitive, and is invariant to
    the input's physical partitioning."""
    import hashlib

    from margaret_spark.operators.sampling import deterministic_shuffle

    df = spark.range(200).select(F.col("id").alias("doc_id"))
    got = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(df, "doc_id", seed=3).collect()
    }
    assert sorted(got.values()) == list(range(200))
    order = sorted(
        range(200), key=lambda i: (hashlib.md5(f"{i}#3".encode()).hexdigest(), i)
    )
    assert got == {doc: pos for pos, doc in enumerate(order)}
    # different seed -> different permutation; same seed + different
    # physical layout -> identical positions
    other = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(df, "doc_id", seed=4).collect()
    }
    assert other != got
    relaid = {
        r["doc_id"]: r["shuffle_pos"]
        for r in deterministic_shuffle(df.repartition(7), "doc_id", seed=3).collect()
    }
    assert relaid == got


def test_dense_seq_broadcast_offsets_identical(spark, monkeypatch):
    """Past _MAP_LITERAL_CAP partitions the offset map ships as a
    broadcast join instead of a create_map literal — same seqs."""
    from margaret_spark.functions import seqassign

    df = spark.range(500).repartition(13).select(F.col("id"))
    lit_path = {
        r["id"]: r["seq"] for r in seqassign.with_dense_seq(df).collect()
    }
    assert sorted(lit_path.values()) == list(range(500))
    monkeypatch.setattr(seqassign, "_MAP_LITERAL_CAP", 1)
    bc_path = {
        r["id"]: r["seq"] for r in seqassign.with_dense_seq(df).collect()
    }
    assert sorted(bc_path.values()) == list(range(500))
    # both paths assign partition-major positions over the same layout:
    # per-partition contiguity is what the log's ingest relies on
    monkeypatch.setattr(seqassign, "_MAP_LITERAL_CAP", 4096)
    ordered = spark.range(300).select(F.col("id"))
    a = {r["id"]: r["seq"] for r in seqassign.with_dense_seq(
        ordered.repartitionByRange(7, "id").sortWithinPartitions("id")
    ).collect()}
    monkeypatch.setattr(seqassign, "_MAP_LITERAL_CAP", 1)
    b = {r["id"]: r["seq"] for r in seqassign.with_dense_seq(
        ordered.repartitionByRange(7, "id").sortWithinPartitions("id")
    ).collect()}
    assert a == b == {i: i for i in range(300)}


def test_stratified_sample_quota_and_determinism(ids):
    out = stratified_sample(ids, "grp", "id", 5)
    rows = out.collect()
    per = {}
    for r in rows:
        per[r.grp] = per.get(r.grp, 0) + 1
    assert all(v == 5 for v in per.values())  # every stratum has ≥5 rows here
    again = sorted((r.grp, r.id) for r in out.collect())
    assert again == sorted((r.grp, r.id) for r in rows)


def test_stratified_sample_salted_identical(ids):
    # the salted two-phase mode is a pure execution-shape change:
    # (md5(id), id) is a total order, so every true top-k row wins its
    # salt bucket and the phase-2 window returns exactly the unsalted
    # answer — for any salt
    plain = sorted((r.grp, r.id) for r in stratified_sample(ids, "grp", "id", 5).collect())
    for s in (1, 3, 16):
        salted = sorted(
            (r.grp, r.id)
            for r in stratified_sample(ids, "grp", "id", 5, salt=s).collect()
        )
        assert salted == plain


def test_stratified_sample_small_stratum_kept_whole(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id long, grp string"
    )
    rows = stratified_sample(df, "grp", "id", 10).collect()
    assert len(rows) == 3


def test_token_budget_sample(spark):
    from margaret_spark.operators.sampling import token_budget_sample
    import hashlib

    rows = [(i, "a" if i < 20 else "b", 10 + i % 5) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, src string, toks long")
    out = token_budget_sample(df, "src", "id", "toks", budget=50).collect()
    # python reference: same md5 order, same keep rule
    by_src = {}
    for i, s, t in rows:
        by_src.setdefault(s, []).append((hashlib.md5(str(i).encode()).hexdigest(), i, t))
    expect = {}
    for s, lst in by_src.items():
        cum = 0
        for _h, i, t in sorted(lst):
            if cum < 50:
                expect[(i, s)] = (t, cum + t)
            cum += t
    got = {(r["id"], r["src"]): (r["toks"], r["cum_tokens"]) for r in out}
    assert got == expect
    # budget exceeded by at most one doc per stratum
    for s in ("a", "b"):
        tot = sum(t for (i, x), (t, _c) in got.items() if x == s)
        assert tot < 50 + 15  # 50 + max doc size
    with pytest.raises(ValueError):
        token_budget_sample(df, "src", "id", "toks", budget=-1)


def test_weighted_sample_extremes_and_rate(spark):
    df = spark.range(1000).select(
        F.col("id"),
        F.when(F.col("id") < 200, F.lit(0.0))
        .when(F.col("id") < 400, F.lit(1.0))
        .otherwise(F.lit(0.5))
        .alias("w"),
    )
    kept = [r.id for r in weighted_sample(df, "id", "w").collect()]
    assert not any(i < 200 for i in kept)  # weight 0 → never kept
    assert sum(1 for i in kept if 200 <= i < 400) == 200  # weight 1 → always
    mid = sum(1 for i in kept if i >= 400)
    # binomial(600, 0.5) ± 5 sigma
    assert 239 <= mid <= 361
    # deterministic across runs
    assert kept == [r.id for r in weighted_sample(df, "id", "w").collect()]


def test_weighted_sample_equals_hash_sample_on_constant_weight(spark):
    df = spark.range(500).withColumn("w", F.lit(0.3))
    a = {r.id for r in weighted_sample(df, "id", "w").collect()}
    b = {r.id for r in hash_sample(df, "id", 0.3).collect()}
    assert a == b


def test_hash_sample_no_shuffle(ids):
    plan = hash_sample(ids, "id", 0.5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- mixture_weights (temperature corpus mixing) ---------------------------


def test_mixture_weights_sqrt_temperature(spark):
    import math

    from margaret_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [("a", 1, 100), ("a", 2, 300), ("b", 3, 10000), ("c", 4, 0)],
        "src string, id long, n_tokens long",
    )
    rows = {
        r["src"]: r.asDict()
        for r in mixture_weights(df, "src", "n_tokens").collect()
    }
    assert rows["a"]["n_docs"] == 2 and rows["a"]["n_tokens"] == 400
    # scaled = pround(sqrt(tokens), 6)
    for s, tok in (("a", 400), ("b", 10000), ("c", 0)):
        exp = math.floor(math.sqrt(tok) * 1e6 + 0.5) / 1e6
        assert rows[s]["tokens_scaled"] == exp
    total = sum(rows[s]["tokens_scaled"] for s in rows)
    for s in rows:
        exp_w = math.floor(rows[s]["tokens_scaled"] / total * 1e6 + 0.5) / 1e6
        assert rows[s]["weight"] == exp_w
    # weights form a distribution (up to rounding)
    assert abs(sum(r["weight"] for r in rows.values()) - 1.0) < 1e-5
    # sqrt scaling up-samples the small source relative to its share
    assert rows["a"]["weight"] > 400 / 10400


def test_mixture_weights_temperature_one_is_proportional(spark):
    from margaret_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [("a", 1, 100), ("b", 2, 300)], "src string, id long, n_tokens long"
    )
    rows = {
        r["src"]: r["weight"]
        for r in mixture_weights(df, "src", "n_tokens", temperature=1.0).collect()
    }
    assert rows["a"] == 0.25 and rows["b"] == 0.75


def test_mixture_weights_bad_temperature(spark):
    import pytest as _pytest

    from margaret_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame([("a", 1, 1)], "src string, id long, n_tokens long")
    with _pytest.raises(ValueError):
        mixture_weights(df, "src", "n_tokens", temperature=0)


def test_materialize_mixture_budgets_and_admission(spark):
    """The assembled mix: budgets = floor(weight * total) (sqrt
    temperature-2 weights), each source admits its deterministic
    md5-order prefix until the budget fills (exceed-by-at-most-one),
    and a small up-sampled source whose budget exceeds its mass keeps
    everything."""
    from pyspark.sql import functions as F

    from margaret_spark.operators.sampling import materialize_mixture

    df = spark.createDataFrame(
        [(i, "big" if i < 16 else "small", 100) for i in range(20)],
        "id long, src string, toks long",
    )
    out = materialize_mixture(df, "src", "id", "toks", total_tokens=1000)
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["src"], []).append(r)
    # sqrt(1600)=40, sqrt(400)=20 -> weights 2/3, 1/3
    assert {r["budget"] for r in by_src["big"]} == {666}
    assert {r["budget"] for r in by_src["small"]} == {333}
    # big: admitted until cum-toks < 666 -> 7 docs (cum 700: exceed by one)
    assert len(by_src["big"]) == 7
    assert max(r["cum_tokens"] for r in by_src["big"]) == 700
    # small: budget 333 > guards nothing away (400 total, last cum-100=300<333)
    assert len(by_src["small"]) == 4
    # deterministic: same call, same rows
    again = {(r["id"], r["cum_tokens"]) for r in materialize_mixture(
        df, "src", "id", "toks", total_tokens=1000
    ).collect()}
    assert again == {(r["id"], r["cum_tokens"]) for r in rows}

    import pytest as _p

    with _p.raises(ValueError, match="non-negative"):
        materialize_mixture(df, "src", "id", "toks", total_tokens=-1)


def _greedy_unimax(caps, budget):
    # sequential published greedy: ascending caps, each takes
    # min(cap, remaining / remaining_groups)
    out = []
    remaining = float(budget)
    n = len(caps)
    for i, c in enumerate(sorted(caps)):
        share = remaining / (n - i)
        a = min(float(c), share)
        out.append(round(a, 6))
        remaining -= a
    return out


def test_unimax_allocation_matches_greedy(spark):
    from margaret_spark.operators.sampling import unimax_allocation

    rows = []
    caps = {"a": 10, "b": 20, "c": 70}
    for g, n in caps.items():
        for i in range(n):
            rows.append((f"{g}{i}", g, 1))
    df = spark.createDataFrame(rows, "id string, src string, toks int")

    got = {
        r["src"]: r["alloc"]
        for r in unimax_allocation(df, "src", "toks", budget=60).collect()
    }
    assert got == {"a": 10.0, "b": 20.0, "c": 30.0}

    # budget below L*min(cap): everyone takes the equal share
    got = {
        r["src"]: r["alloc"]
        for r in unimax_allocation(df, "src", "toks", budget=15).collect()
    }
    assert got == {"a": 5.0, "b": 5.0, "c": 5.0}

    # budget above sum(caps): all capped, leftover unallocated
    got = {
        r["src"]: r["alloc"]
        for r in unimax_allocation(df, "src", "toks", budget=1000).collect()
    }
    assert got == {"a": 10.0, "b": 20.0, "c": 70.0}

    # epoch cap scales the per-group ceiling
    got = {
        r["src"]: r["alloc"]
        for r in unimax_allocation(
            df, "src", "toks", budget=1000, max_epochs=2.0
        ).collect()
    }
    assert got == {"a": 20.0, "b": 40.0, "c": 140.0}

    # randomized agreement with the sequential greedy
    import random

    rng = random.Random(7)
    for trial in range(5):
        caps2 = {f"s{j}": rng.randint(1, 50) for j in range(6)}
        budget = rng.randint(0, 200)
        rows2 = [
            (f"{g}-{i}", g, 1) for g, n in caps2.items() for i in range(n)
        ]
        df2 = spark.createDataFrame(rows2, "id string, src string, toks int")
        got2 = [
            r["alloc"]
            for r in unimax_allocation(df2, "src", "toks", budget=budget)
            .orderBy("cap", "src")
            .collect()
        ]
        want = _greedy_unimax(list(caps2.values()), budget)
        assert got2 == pytest.approx(want, abs=1e-6), (caps2, budget)


def test_materialize_unimax_admission(spark):
    from margaret_spark.operators.sampling import materialize_unimax

    rows = [(f"{g}{i}", g, 3) for g in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, "id string, src string, toks int")
    out = materialize_unimax(df, "src", "id", "toks", budget=30)
    per = {}
    for r in out.collect():
        per.setdefault(r["src"], []).append(r)
        assert r["budget"] == 15
    # 3-token docs against a 15-token budget: exactly 5 kept per group
    assert {g: len(v) for g, v in per.items()} == {"a": 5, "b": 5}
    for v in per.values():
        assert max(x["cum_tokens"] for x in v) == 15
