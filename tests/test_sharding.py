"""Deterministic hash-sharded export (operators.sharding)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from margaret_spark.operators.sharding import (
    assign_shards,
    list_shards,
    read_shard,
    shard_manifest,
    write_shards,
)


def _expected_shard(i: int, n: int, salt: str = "") -> int:
    return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:8], 16) % n


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(
        [(i, f"doc-{i}", (i * 7) % 100 + 1) for i in range(500)],
        "doc_id long, text string, n_tokens long",
    )


def test_assignment_matches_reference_md5(spark, corpus):
    got = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(corpus, "doc_id", 16).collect()
    }
    for i in range(500):
        assert got[i] == _expected_shard(i, 16)


def test_assignment_stable_under_growth(spark, corpus):
    base = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(corpus.where("doc_id < 100"), "doc_id", 8).collect()
    }
    full = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(corpus, "doc_id", 8).collect()
    }
    assert all(full[i] == base[i] for i in base)


def test_salt_changes_universe(spark, corpus):
    a = {r["doc_id"]: r["shard"] for r in assign_shards(corpus, "doc_id", 16).collect()}
    b = {
        r["doc_id"]: r["shard"]
        for r in assign_shards(corpus, "doc_id", 16, salt="epoch1").collect()
    }
    assert any(a[i] != b[i] for i in a)
    for i in b:
        assert b[i] == _expected_shard(i, 16, salt="epoch1")


def test_manifest_balance_and_totals(spark, corpus):
    rows = shard_manifest(corpus, "doc_id", 8, size_col="n_tokens").collect()
    assert sum(r["n_rows"] for r in rows) == 500
    total = sum(r["total_size"] for r in rows)
    assert total == sum((i * 7) % 100 + 1 for i in range(500))
    # md5 uniformity: with 500 rows over 8 shards (mean 62.5) every
    # shard lands well inside 3x of the mean
    for r in rows:
        assert 20 <= r["n_rows"] <= 120


def test_write_read_roundtrip(spark, corpus, tmp_path):
    path = str(tmp_path / "shards")
    write_shards(corpus, path, "doc_id", 8)
    assert list_shards(path) == list(range(8))
    man = {
        r["shard"]: r["n_rows"]
        for r in shard_manifest(corpus, "doc_id", 8).collect()
    }
    back = spark.read.parquet(path)
    assert back.count() == 500
    counts = {
        r["shard"]: r["n"]
        for r in back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    }
    assert counts == man
    # per-shard read prunes to that partition and round-trips content
    one = read_shard(spark, path, 3)
    ids = sorted(r["doc_id"] for r in one.collect())
    assert ids == sorted(i for i in range(500) if _expected_shard(i, 8) == 3)


def test_bad_num_shards(spark, corpus):
    with pytest.raises(ValueError):
        assign_shards(corpus, "doc_id", 0)


def test_list_shards_rejects_foreign_entries(spark, tmp_path):
    """A stray shard=<non-integer> directory must fail loudly with the
    path named, not crash with a bare int() ValueError (and non-shard
    entries are simply ignored)."""
    import os

    import pytest as _pytest

    from margaret_spark.operators.sharding import list_shards, write_shards

    df = spark.createDataFrame([(i, f"d{i}") for i in range(20)], "doc_id long, t string")
    path = str(tmp_path / "shards")
    write_shards(df, path, "doc_id", num_shards=4)
    assert list_shards(path) == sorted(list_shards(path))
    os.mkdir(os.path.join(path, "shard=3.bak"))
    with _pytest.raises(ValueError, match="shard=3.bak"):
        list_shards(path)
    os.rmdir(os.path.join(path, "shard=3.bak"))
    os.mkdir(os.path.join(path, "_staging"))
    assert len(list_shards(path)) >= 1  # non-shard entries ignored


def test_assign_shards_balanced_skew_bound_and_determinism(spark):
    from margaret_spark.operators.sharding import assign_shards_balanced

    rows = [(i, (i * 37) % 500 + 1) for i in range(200)] + [(200, None)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars int")
    out = assign_shards_balanced(df, "doc_id", "n_chars", 8).collect()
    assert len(out) == 201  # NULL size still lands in a shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.n_chars or 0)
    assert set(by_shard) == set(range(8))
    totals = {s: sum(v) for s, v in by_shard.items()}
    # sorted round-robin: byte skew bounded by one maximal item
    assert max(totals.values()) - min(totals.values()) <= 500
    # row counts differ by at most one
    counts = {s: len(v) for s, v in by_shard.items()}
    assert max(counts.values()) - min(counts.values()) <= 1
    # deterministic across runs
    again = assign_shards_balanced(df, "doc_id", "n_chars", 8).collect()
    assert sorted((r.doc_id, r.shard) for r in again) == sorted(
        (r.doc_id, r.shard) for r in out
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        assign_shards_balanced(df, "doc_id", "n_chars", 0)


def test_assign_shards_balanced_null_interleaves_with_zero(spark):
    """ADVICE r9: NULL sizes rank AS 0 — interleaved with genuine
    zero-size rows by id, not banished after them (the oracle now
    ORDER BYs COALESCE(n_chars, 0) to match)."""
    from margaret_spark.operators.sharding import assign_shards_balanced

    rows = [(0, 5), (1, None), (2, 0), (3, None), (4, 0), (5, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars int")
    out = {
        r.doc_id: r.shard
        for r in assign_shards_balanced(df, "doc_id", "n_chars", 2).collect()
    }
    # rank order: (5,0) (1,5) -> NULL=0 ties with zeros, id asc:
    # (0,1) (0,2) (0,3) (0,4) -> shards 0 1 0 1 0 1
    assert out == {0: 0, 5: 1, 1: 0, 2: 1, 3: 0, 4: 1}
