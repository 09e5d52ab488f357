"""Long-document chunking: split each document's token stream into
fixed-size overlapping windows — the standard preprocessing step for
context-bounded training and retrieval indexing (every RAG/embedding
pipeline runs exactly this before embedding).

Scale shape: everything is per-row array math in whole-stage codegen —
tokenize once, compute the chunk count in closed form, ``explode`` a
``sequence`` of chunk indices, and slice the token array per chunk.
Zero shuffles, no UDFs; the fan-out (row → chunks) is the only row
multiplication, bounded by ``n_tokens / (chunk_tokens − overlap)``.

Determinism: chunk boundaries are a pure closed form of
(n_tokens, chunk_tokens, overlap), so an oracle recomputes every
field — including the chunk text — from the same whitespace
tokenization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.shingling import words


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 512,
    overlap: int = 64,
    include_text: bool = True,
) -> DataFrame:
    """(id, chunk_idx, start_tok, end_tok, n_tokens[, chunk_text]):
    one row per chunk of each document's (lowercased, whitespace)
    token stream.

    Chunk ``i`` covers tokens ``[i·stride, min(i·stride + chunk_tokens,
    n))`` with ``stride = chunk_tokens − overlap``; the chunk count is
    ``1 + ceil(max(0, n − chunk_tokens) / stride)``, so consecutive
    chunks share exactly ``overlap`` tokens and the final chunk is the
    only short one. A document with no tokens still yields one empty
    chunk (every document stays represented downstream).
    """
    if chunk_tokens < 1:
        raise ValueError(f"chunk_tokens must be >= 1: {chunk_tokens}")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError(
            f"overlap must be in 0..chunk_tokens-1: {overlap} (chunk_tokens={chunk_tokens})"
        )
    stride = chunk_tokens - overlap
    # NULL text must behave like empty text (one empty chunk). Without
    # the coalesce, words(NULL)=NULL makes size() NULL, and least/
    # greatest SKIP nulls — so `end = least(start+chunk_tokens, NULL)`
    # would resolve to chunk_tokens and a NULL-text document would
    # claim a phantom full-size chunk.
    toks: Column = F.coalesce(
        words(F.col(text_col)), F.array().cast("array<string>")
    )
    n = F.size(toks)
    n_chunks = (
        F.lit(1)
        + F.ceil(F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride))
    ).cast("int")
    base = df.select(
        F.col(id_col),
        toks.alias("__toks"),
        n.alias("__n"),
        F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1))).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * F.lit(stride)
    end = F.least(start + F.lit(chunk_tokens), F.col("__n"))
    out = [
        F.col(id_col),
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("int").alias("start_tok"),
        end.cast("int").alias("end_tok"),
        (end - start).cast("int").alias("n_tokens"),
    ]
    if include_text:
        # 1-based slice of the token array; length 0 gives ''
        out.append(
            F.array_join(
                F.slice(F.col("__toks"), start + F.lit(1), end - start), " "
            ).alias("chunk_text")
        )
    return base.select(*out)
