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
from margaret_spark.operators.text import quality_score


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.2,
    mode: str = "word",
    n: int = 3,
) -> DataFrame:
    """(id, quality, cluster_id, keep): keep a document iff it meets
    the quality bar AND it is its duplicate-cluster's canonical
    representative (the smallest id in the component — singletons
    represent themselves)."""
    pairs = ngram_jaccard_pairs(
        df, id_col, text_col, threshold=jaccard_threshold, mode=mode, n=n
    )
    clusters = dedup_clusters(df, pairs, id_col)
    quality = quality_score(df, id_col, text_col)
    return (
        quality.join(clusters, id_col)
        .select(
            id_col,
            "quality",
            "cluster_id",
            (
                (F.col("quality") >= min_quality)
                & (F.col(id_col) == F.col("cluster_id"))
            ).alias("keep"),
        )
    )
