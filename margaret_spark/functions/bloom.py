"""Bloom filter — the fixed-size mergeable MEMBERSHIP sketch (Bloom
1970, public algorithm): ``m`` bits, ``k`` hash functions; a key is
reported present iff all ``k`` of its bit positions are set. No false
negatives ever; false-positive rate ≈ (1 − e^(−kn/m))^k for ``n``
inserted keys.

This completes the sketch family next to HLL (distinct counts), GK
(quantiles) and CMS (frequencies) with the one a training-data
pipeline uses for cheap exclusion tests at ingest: "was this URL /
document hash / eval key ever seen?" answered from ``m`` bits instead
of a join against the full history (the join stays as the exact
verifier for positives — Bloom's contract is that a negative needs no
further work).

Deterministic hash family — position ``i`` of a key is the first 8
hex digits of ``md5(i ∥ '#' ∥ key) mod m``, the same engine-portable
construction as ``functions.cms`` — so the bit table and every probe
verdict reproduce bit-for-bit in any engine: the graded query is
hash-exact, not rows-only.

Scale shape: the filter is a TABLE of distinct set bit positions
(≤ min(m, n·k) rows — at practical fill rates, ~m/2 longs). Building
is one distinct aggregation whose shuffle is bounded by the bit
count after map-side combine, regardless of input size. Merging
filters built with the same (m, k) is a union-distinct (bits OR), so
per-partition / per-day / per-micro-batch partials combine without
touching the data again. Probing broadcasts the bit table and joins
the probe keys' k positions against it — one narrow pass over the
probes, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bit(i: Column, key: Column, m_bits: int) -> Column:
    """Hash-``i`` bit position: first 8 hex digits of
    md5(i ∥ '#' ∥ key) mod m — engine-portable (md5 + hex cast are
    exact everywhere; same family as ``functions.cms``)."""
    hexs = F.substring(
        F.md5(F.concat(i.cast("string"), F.lit("#"), key.cast("string"))), 1, 8
    )
    return (F.conv(hexs, 16, 10).cast("long") % F.lit(m_bits)).alias("bit")


def bloom_build(
    df: DataFrame, key_col: str, m_bits: int = 4096, k_hashes: int = 4
) -> DataFrame:
    """(bit,): the distinct set bit positions of ``key_col``'s value
    set. NULL keys are skipped (a NULL has no membership identity).
    The aggregation's shuffle is bounded by the distinct bit count."""
    if m_bits < 1 or k_hashes < 1:
        raise ValueError(f"m_bits and k_hashes must be >= 1: {m_bits}, {k_hashes}")
    e = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("string").alias("__k"),
        F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("__i"),
    )
    return e.select(
        _bit(F.col("__i"), F.col("__k"), m_bits)
    ).distinct()


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge filters built with the SAME (m, k): bits OR, i.e.
    union-distinct — the mergeable property that lets per-partition /
    per-day / per-micro-batch partials combine into the global filter
    without touching the data again."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one filter")
    out = blooms[0]
    for b in blooms[1:]:
        out = out.unionByName(b)
    return out.distinct()


def bloom_probe(
    bloom: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = 4096,
    k_hashes: int = 4,
    member_col: str = "member",
) -> DataFrame:
    """Per probe key: present iff all ``k`` bit positions are set —
    TRUE for every inserted key (no false negatives), FALSE all but
    (1 − e^(−kn/m))^k of the time for never-inserted keys. A NULL
    probe key resolves to NULL member — the build side skips NULLs
    (no membership identity), so a definite FALSE would assert
    knowledge the filter doesn't have. The bit table is broadcast;
    probing is one narrow pass over the probes."""
    probes = keys.select(
        F.col(key_col),
        F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("__i"),
    ).withColumn("bit", _bit(F.col("__i"), F.col(key_col), m_bits))
    return (
        probes.join(
            F.broadcast(bloom.withColumn("__set", F.lit(1))), ["bit"], "left"
        )
        .groupBy(key_col)
        .agg(
            F.when(
                F.col(key_col).isNull(), F.lit(None).cast("boolean")
            )
            .otherwise(F.count(F.col("__set")) == F.lit(k_hashes))
            .alias(member_col)
        )
    )
