"""Large-scale training-data pipeline operators — the beyond-reference
extension surface (BASELINE.json north star). All hot paths are
JVM-side DataFrame expressions; Python appears only in Arrow-batched
``mapInPandas`` for genuinely imperative work (multimodal decode)."""

from margaret_spark.operators.dedup import (
    exact_dedup,
    ngram_contamination,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_dedup_pairs,
    simhash,
    simhash_dedup_pairs,
    embedding_dedup_pairs,
)
from margaret_spark.operators.similarity import (
    brute_force_topk,
    build_ivf_index,
    ivf_index_search,
    ivf_topk,
    kmeans_centroids,
    lsh_bucketed_topk,
    range_search,
)
from margaret_spark.operators.text import (
    token_stats,
    lang_id,
    quality_score,
    repetition_score,
    bpe_ish_token_count,
    doc_fingerprint,
)
from margaret_spark.operators.graph import pagerank
from margaret_spark.operators.packing import (
    pack_sequences,
    running_total,
)
from margaret_spark.operators.sampling import (
    hash_sample,
    train_test_split,
    hash_split,
    stratified_sample,
    weighted_sample,
)

__all__ = [
    "exact_dedup",
    "ngram_contamination",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "minhash_dedup_pairs",
    "simhash",
    "simhash_dedup_pairs",
    "embedding_dedup_pairs",
    "brute_force_topk",
    "build_ivf_index",
    "ivf_index_search",
    "ivf_topk",
    "kmeans_centroids",
    "lsh_bucketed_topk",
    "pagerank",
    "range_search",
    "token_stats",
    "lang_id",
    "quality_score",
    "repetition_score",
    "bpe_ish_token_count",
    "doc_fingerprint",
    "hash_sample",
    "train_test_split",
    "hash_split",
    "stratified_sample",
    "weighted_sample",
    "pack_sequences",
    "running_total",
]
