"""Dedup-quality evaluation harness: planted ground truth +
precision/recall of every near-duplicate family against it.

Every dedup operator in this library trades recall for scale
(banding, pigeonhole blocks, IVF cells). This module MEASURES that
trade instead of asserting it: deterministically plant duplicate
copies into a corpus (known truth pairs), run a detector, and score
its predicted pairs — the ``topk_recall`` analogue for the dedup
matrix.

Determinism contract (the graded queries are hash-exact where the
underlying detector is): planting selects source docs by an
md5-prefix predicate (content-free, fraction-of-corpus, no global
window), copy ids are ``id + id_offset``, and mutations are pure
string/array expressions — every piece replays identically in the
DuckDB oracle. Metrics are exact integer counts under single IEEE
divisions (``pround``), with ``f1 = 2·tp/(n_pred+n_truth)`` (the
single-division harmonic form) so cross-engine float parity holds.

Interpretation note: ``precision`` is measured against the PLANTED
truth only. On a corpus with organic (pre-existing) duplicates a
correct detector reports those too, so planted-precision is a lower
bound; recall over planted pairs is the clean signal. The pytest
suite uses an organic-dup-free synthetic corpus where precision is
exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import pround

#: Planted copy ids are ``source_id + PLANT_OFFSET`` — far above any
#: testdata id space, and the oracle uses the same literal.
PLANT_OFFSET = 1_000_000_000

#: md5(id) first-hex-digit selector: 3/16 of the corpus gets a
#: planted copy. Content-free and portable (both engines md5 the
#: decimal string form of the id).
PLANT_PREFIXES = ("0", "1", "2")


def _selected(df: DataFrame, id_col: str) -> DataFrame:
    return df.where(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).isin(
            *PLANT_PREFIXES
        )
    )


def plant_text_duplicates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    mutate: str = "token",
    id_offset: int = PLANT_OFFSET,
) -> tuple[DataFrame, DataFrame]:
    """(planted, truth): union ``docs`` (projected to id+text) with
    mutated copies of the md5-selected subset.

    ``mutate='none'`` plants EXACT copies (for the exact-dedup eval);
    ``mutate='token'`` appends one unique token (`` zqdup<id>``) so
    near-dup detectors see a high-but-not-1.0 similarity — shingle
    families lose ~2-3 grams, embedding-hash families shift one
    bucket. Truth is (id_a=source, id_b=copy)."""
    if mutate == "none":
        mtext = F.col(text_col)
    elif mutate == "token":
        mtext = F.concat(
            F.col(text_col), F.lit(" zqdup"), F.col(id_col).cast("string")
        )
    else:
        raise ValueError(f"unknown mutate mode: {mutate}")
    base = docs.select(F.col(id_col), F.col(text_col))
    sel = _selected(base, id_col)
    copies = sel.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col), mtext.alias(text_col)
    )
    truth = sel.select(
        F.col(id_col).alias("id_a"),
        (F.col(id_col) + F.lit(id_offset)).alias("id_b"),
    )
    return base.unionByName(copies), truth


def plant_embedding_duplicates(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    eps: float = 0.01,
    id_offset: int = PLANT_OFFSET,
) -> tuple[DataFrame, DataFrame]:
    """(planted, truth): embedding twin of
    :func:`plant_text_duplicates` — copies shift every component by
    ``+eps`` (a pure elementwise transform both engines replay; note
    a SCALED copy would be useless truth, cosine is scale-invariant),
    so cosine(source, copy) is just under 1.0 and cell assignments
    almost always agree."""
    # widen to double FIRST: the +eps transform yields array<double>,
    # and a float/double union would fail to resolve (and the oracle
    # replays the same explicit widening, so values stay bit-equal)
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    sel = _selected(base, id_col)
    copies = sel.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.transform(F.col(vec_col), lambda x: x + F.lit(float(eps))).alias(
            vec_col
        ),
    )
    truth = sel.select(
        F.col(id_col).alias("id_a"),
        (F.col(id_col) + F.lit(id_offset)).alias("id_b"),
    )
    return base.unionByName(copies), truth


def pair_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_digits: int = 6,
) -> DataFrame:
    """One row: (n_pred, n_truth, tp, precision, recall, f1) of the
    predicted pair set against the truth pair set. Pairs are
    normalized to (least, greatest) and deduplicated, so orientation
    and multiplicity never skew the counts. One full-outer join on the
    normalized pair key + one global aggregation — no driver-side
    set math. Zero-denominator cases pin the ratio to 0.0."""

    def norm(df: DataFrame, flag: str) -> DataFrame:
        return (
            df.select(
                F.least(F.col(id_a), F.col(id_b)).alias("__a"),
                F.greatest(F.col(id_a), F.col(id_b)).alias("__b"),
            )
            .distinct()
            .withColumn(flag, F.lit(1).cast("long"))
        )

    return _flag_metrics(
        norm(pred, "__p").join(norm(truth, "__t"), ["__a", "__b"], "full_outer"),
        round_digits,
    )


def id_metrics(
    pred: DataFrame,
    truth: DataFrame,
    id_col: str,
    round_digits: int = 6,
) -> DataFrame:
    """Document-level twin of :func:`pair_metrics`: one row
    (n_pred, n_truth, tp, precision, recall, f1) of a predicted id SET
    against a truth id set — the metric for detectors that flag
    documents rather than pairs (contamination, quality gates)."""

    def norm(df: DataFrame, flag: str) -> DataFrame:
        return (
            df.select(F.col(id_col).alias("__k"))
            .distinct()
            .withColumn(flag, F.lit(1).cast("long"))
        )

    return _flag_metrics(
        norm(pred, "__p").join(norm(truth, "__t"), ["__k"], "full_outer"),
        round_digits,
    )


def _flag_metrics(joined: DataFrame, round_digits: int) -> DataFrame:
    agg = joined.agg(
        F.coalesce(F.sum("__p"), F.lit(0)).cast("long").alias("n_pred"),
        F.coalesce(F.sum("__t"), F.lit(0)).cast("long").alias("n_truth"),
        F.coalesce(F.sum(F.col("__p") * F.col("__t")), F.lit(0))
        .cast("long")
        .alias("tp"),
    )
    ratio = lambda num, den: F.when(den > 0, pround(num / den, round_digits)).otherwise(  # noqa: E731
        F.lit(0.0)
    )
    tp = F.col("tp").cast("double")
    return agg.select(
        "n_pred",
        "n_truth",
        "tp",
        ratio(tp, F.col("n_pred").cast("double")).alias("precision"),
        ratio(tp, F.col("n_truth").cast("double")).alias("recall"),
        ratio(
            F.lit(2.0) * tp,
            (F.col("n_pred") + F.col("n_truth")).cast("double"),
        ).alias("f1"),
    )


def plant_ingest_batch(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    fresh_prefixes: tuple[str, ...] = ("3", "4"),
    id_offset: int = PLANT_OFFSET,
) -> tuple[DataFrame, DataFrame]:
    """(incoming, truth): the planted daily-ingest batch for the
    incremental-dedup eval — EXACT copies of the md5-selected 3/16
    (ids ``+id_offset``) plus guaranteed-fresh documents (a disjoint
    md5 selection, ids ``+2·id_offset``, with a per-id `` zqnew<id>``
    suffix no existing document can contain). Truth is the copy id
    set: a correct incremental detector labels exactly those
    ``dup_of_existing``. Same determinism contract as
    :func:`plant_text_duplicates`."""
    base = docs.select(F.col(id_col), F.col(text_col))
    sel = _selected(base, id_col)
    copies = sel.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col), F.col(text_col)
    )
    fresh = base.where(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 1).isin(
            *fresh_prefixes
        )
    ).select(
        (F.col(id_col) + F.lit(2 * id_offset)).alias(id_col),
        F.concat(
            F.col(text_col), F.lit(" zqnew"), F.col(id_col).cast("string")
        ).alias(text_col),
    )
    truth = sel.select((F.col(id_col) + F.lit(id_offset)).alias(id_col))
    return copies.unionByName(fresh), truth


def plant_cross_corpus(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    id_offset: int = PLANT_OFFSET,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(existing, incoming, truth): the planted two-corpus fixture for
    the cross-corpus near-dup eval — even ids play the existing
    corpus, incoming is the odd ids plus one-token-mutated copies of
    the md5-selected EVEN docs (so every truth pair crosses the corpus
    boundary). Truth is (source id_a, copy id_b)."""
    base = docs.select(F.col(id_col), F.col(text_col))
    existing = base.where(F.col(id_col) % 2 == 0)
    sel = _selected(existing, id_col)
    copies = sel.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.concat(
            F.col(text_col), F.lit(" zqdup"), F.col(id_col).cast("string")
        ).alias(text_col),
    )
    incoming = base.where(F.col(id_col) % 2 == 1).unionByName(copies)
    truth = sel.select(
        F.col(id_col).alias("id_a"),
        (F.col(id_col) + F.lit(id_offset)).alias("id_b"),
    )
    return existing, incoming, truth


def plant_excerpt_duplicates(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    id_offset: int = PLANT_OFFSET,
) -> tuple[DataFrame, DataFrame]:
    """(planted, truth): excerpt twin of :func:`plant_text_duplicates`
    — the md5-selected subset gets a copy holding only its FIRST HALF
    (ceil(n/2) tokens). Every trigram of the excerpt appears in its
    source, so a containment detector (overlap coefficient) scores the
    pair 1.0 while jaccard sits near |A|/|B| ≈ 0.5 — the planted truth
    that separates the two families."""
    base = docs.select(F.col(id_col), F.col(text_col))
    sel = _selected(base, id_col)
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != ""
    )
    half = F.concat_ws(
        " ",
        F.slice(toks, 1, F.ceil(F.size(toks) / F.lit(2.0)).cast("int")),
    )
    copies = sel.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        half.alias(text_col),
    )
    truth = sel.select(
        F.col(id_col).alias("id_a"),
        (F.col(id_col) + F.lit(id_offset)).alias("id_b"),
    )
    return base.unionByName(copies), truth
