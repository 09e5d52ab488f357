"""Reusable column-level helpers, all JVM-side built-ins (no Python UDFs
in any hot path)."""

from margaret_spark.functions.seqassign import with_dense_seq
from margaret_spark.functions.numeric import dsum, davg, round_div
from margaret_spark.functions.vectors import cosine_sim, dot, l2_norm
from margaret_spark.functions.shingling import char_shingles, word_shingles, words

__all__ = [
    "with_dense_seq",
    "dsum",
    "davg",
    "round_div",
    "cosine_sim",
    "dot",
    "l2_norm",
    "char_shingles",
    "word_shingles",
    "words",
]
