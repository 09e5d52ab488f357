"""End-to-end corpus curation: the composition a training-data
pipeline actually runs — quality scoring, near-dup clustering, and a
canonical keep/drop decision — as one DataFrame program.

Composition shape at scale: the quality pass is a narrow per-document
projection; clustering reuses the jaccard pair generator (inverted
index, one shuffle) and the iterative min-label propagation; the
final join is keyed on doc id (no skew — ids are unique). Everything
before the label loop is a single Catalyst plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from margaret_spark.operators.dedup import dedup_clusters, ngram_jaccard_pairs
from margaret_spark.operators.packing import pack_sequences
from margaret_spark.operators.sampling import train_test_split
from margaret_spark.operators.text import quality_score


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.2,
    mode: str = "word",
    n: int = 3,
    max_df: int | float | str | None = "auto",
    include_tokens: bool = False,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(id, quality, cluster_id, keep[, n_tokens]): keep a document
    iff it meets the quality bar AND it is its duplicate-cluster's
    canonical representative (the smallest id in the component —
    singletons represent themselves).

    ``max_df`` defaults to ``"auto"`` (see dedup._resolve_max_df): a
    shingle in over half the corpus carries no near-dup signal but
    creates the largest O(df²) posting buckets — an uncapped pipeline
    is a scale-killer on web corpora, so the opinionated composition
    caps by default. Pass ``None`` to disable.

    ``include_tokens=True`` adds ``n_tokens`` from the SAME tokenize
    pass that scores quality — downstream consumers (packing) then
    skip a second full tokenize over the corpus.

    ``pairs`` injects a precomputed near-dup pair frame
    (id_a, id_b, ...) — pass a checkpointed
    :func:`~margaret_spark.operators.dedup.ngram_jaccard_pairs` result
    when several pipeline stages consume the same pair set, so the
    most expensive subtree of the whole pipeline is computed once per
    curation session instead of once per consumer."""
    if pairs is None:
        pairs = ngram_jaccard_pairs(
            df, id_col, text_col, threshold=jaccard_threshold, mode=mode, n=n,
            max_df=max_df,
        )
    clusters = dedup_clusters(df, pairs, id_col)
    # include_tokens rides the quality projection (one tokenize pass
    # serves both the score and the downstream packing)
    quality = quality_score(df, id_col, text_col, include_tokens=include_tokens)
    cols = [
        F.col(id_col),
        F.col("quality"),
        F.col("cluster_id"),
        (
            (F.col("quality") >= min_quality)
            & (F.col(id_col) == F.col("cluster_id"))
        ).alias("keep"),
    ]
    if include_tokens:
        cols.append(F.col("n_tokens"))
    return quality.join(clusters, id_col).select(*cols)


def training_pipeline(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.2,
    test_fraction: float = 0.1,
    seq_len: int = 2048,
    max_df: int | float | str | None = "auto",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Corpus → training data, end-to-end: curate (quality bar +
    canonical dedup representative), hash-split into train/test, and
    pack the train split into fixed-length token sequences.

    Returns one row per KEPT document:
    (id, split, n_tokens, pack_first, pack_last, offset_in_first) —
    test documents carry NULL pack columns (they never enter the
    token stream). Every stage is deterministic (md5 split, prefix-sum
    packing), so the whole pipeline reproduces bit-for-bit.

    Scale shape: curation is the §curate_corpus plan; the split is a
    narrow projection; packing range-partitions only the train
    keepers (a fraction of the corpus) for the two-pass prefix sum.
    ``pairs`` (see :func:`curate_corpus`) shares one checkpointed
    near-dup pair subtree across every pipeline that consumes it."""
    # materialize the keep-set once (WITH its token counts — computed
    # in the same projection as the quality score, so the corpus is
    # tokenized once, not once for curation and again for packing): it
    # is reused by the split and, through the prefix sum's driver-side
    # totals collection, the packing — without the checkpoint the
    # whole curation pipeline would re-run for each consumer
    curated = (
        curate_corpus(
            df, id_col, text_col, min_quality, jaccard_threshold,
            max_df=max_df, include_tokens=True, pairs=pairs,
        )
        .where(F.col("keep"))
        .select(id_col, "n_tokens")
        .localCheckpoint(eager=False)
    )
    split = train_test_split(curated.select(id_col), id_col, test_fraction)
    # small (id, split, n_tokens) relation reused by packing + output
    base = split.join(curated, id_col).localCheckpoint(eager=False)
    train = base.where(F.col("split") == "train")
    packs = pack_sequences(train, id_col, "n_tokens", seq_len)
    return base.join(
        packs.select(id_col, "pack_first", "pack_last", "offset_in_first"),
        id_col,
        "left",
    ).select(
        id_col, "split", "n_tokens", "pack_first", "pack_last", "offset_in_first"
    )
