"""Vector math over ``array<float|double>`` columns.

Three execution strategies, all with IDENTICAL float results (the
same left-to-right IEEE accumulation order, so values are bit-equal
and oracle-stable):

- ``dim=None`` (default): ``zip_with``/``aggregate`` higher-order
  functions — a sequential left fold, evaluated by the interpreted
  expression path (~µs per element). Fine for per-ROW work (norms,
  LSH signing), too slow inside pair joins.
- ``dim<=16``: the fold unrolled into a plain expression chain
  ``((0.0 + a0·b0) + a1·b1) + …`` compiled by whole-stage codegen.
  Deliberately capped: past ~16 terms the generated consume method
  exceeds HotSpot's ~8 KB JIT limit (DontCompileHugeMethods) and the
  whole stage silently drops to bytecode interpretation — measured
  30-60× slower. Passing dim>16 falls back to the HOF fold.
- :func:`pair_dot`: an Arrow-batched pandas UDF accumulating
  per-DIMENSION over the batch (``acc += A[:,i]·B[:,i]``) — the fold
  order per row is unchanged, but the work is numpy-vectorized across
  rows. This is the pair-scoring hot path: ~35 µs/pair interpreted
  vs ~1 µs/pair here, measured on 2M candidate pairs.

Pair-scoring operators should also precompute per-row norms BEFORE
the join: ``cosine = dot(a,b) / (norm_a · norm_b)`` evaluates the
norm |corpus| times instead of |pairs| times, with the same product
expression as ``cosine_sim``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# past this many unrolled terms the codegen'd consume method blows the
# JIT's huge-method limit and the stage runs interpreted (see module doc)
_UNROLL_LIMIT = 16


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Sequential-fold dot product (deterministic accumulation order).
    Small known widths are unrolled for codegen; arrays shorter than
    ``dim`` yield NULL there (vs. the HOF's truncate-to-shorter)."""
    if dim is not None and dim <= _UNROLL_LIMIT:
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i].cast("double") * b[i].cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column, dim: int | None = None) -> Column:
    if dim is not None and dim <= _UNROLL_LIMIT:
        acc = F.lit(0.0)
        for i in range(dim):
            acc = acc + a[i].cast("double") * a[i].cast("double")
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine_sim(a: Column, b: Column, dim: int | None = None) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


@F.pandas_udf(T.DoubleType())
def _pair_dot_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    if len(va) == 0:
        return pd.Series(np.zeros(0, dtype=np.float64))
    if va.isna().any() or vb.isna().any():
        # name the contract violation: without this check a NULL row
        # surfaces as a cryptic np.stack shape error from inside numpy
        raise ValueError(
            "pair_dot: NULL vector in batch — vector operators require "
            "non-NULL fixed-width arrays; filter NULL rows upstream "
            "(e.g. .where(col.isNotNull()))"
        )
    try:
        A = np.stack(va.to_numpy())
        B = np.stack(vb.to_numpy())
    except ValueError as e:
        raise ValueError(
            "pair_dot: ragged vector widths in batch — all vectors on "
            "both sides must share one dimension; validate widths "
            "upstream (size(col))"
        ) from e
    if A.shape != B.shape:
        raise ValueError(
            f"pair_dot: side widths differ ({A.shape[1]} vs {B.shape[1]}) "
            "— both sides must share one dimension"
        )
    # per-dimension sequential accumulation: for each row this is the
    # exact left fold 0.0 + a0*b0 + a1*b1 + ... (bit-equal to dot()),
    # vectorized across the Arrow batch. float32 -> float64 casts are
    # exact, matching CAST(x AS DOUBLE).
    acc = np.zeros(len(va), dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i].astype(np.float64) * B[:, i].astype(np.float64)
    return pd.Series(acc)


def pair_dot(a: Column, b: Column) -> Column:
    """Arrow-batched dot product for pair-scoring joins (see module
    doc). Requires fixed-width, non-null vectors within a batch —
    violations fail loudly with the cause named (NULL row, ragged
    widths, or side-width mismatch), never a bare numpy shape error."""
    return _pair_dot_udf(a, b)


def infer_dim(df: DataFrame, vec_col: str) -> int | None:
    """Vector width from the first row (one tiny job), or None on an
    empty input — callers fall back to the HOF path then."""
    row = df.select(F.size(F.col(vec_col)).alias("n")).limit(1).collect()
    return int(row[0]["n"]) if row else None


def centroid_dots(vec: Column, matrix: list) -> Column:
    """array<double>: the left-fold dot of ``vec`` against EVERY row
    of the bounded ``matrix`` (a collected k×d centroid table,
    closure-shipped to the workers once per task) — the pair-scoring
    kernel reshaped for one-side-small joins.

    Why this exists (r10 100× probe): scoring N vectors against k
    broadcast centroids as a crossJoin + :func:`pair_dot` ships BOTH
    arrays per pair through the Arrow pipe — O(N·k·d) bytes; at the
    third decade (500k docs × 708 cells × 64 dims ≈ 1 TB per
    assignment pass) the 32 Python workers sat at ~18 % CPU,
    pipe-bound. This kernel ships each vector ONCE — O(N·d) bytes, a
    k× cut — and computes the k dots per row with the SAME
    per-dimension sequential accumulation as :func:`pair_dot`
    (acc(row, c) = 0.0 + a0·c0 + a1·c1 + …, vectorized across rows
    AND centroids), so every dot is bit-equal to the pair kernel and
    to the JVM/oracle left fold. Same loud contracts: NULL rows and
    ragged widths fail with the cause named."""
    M = np.asarray([list(map(float, row)) for row in matrix], dtype=np.float64)
    if M.ndim != 2:
        raise ValueError(
            f"centroid_dots: matrix must be k x d, got shape {M.shape}"
        )

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _udf(va: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=object)
        if va.isna().any():
            raise ValueError(
                "centroid_dots: NULL vector in batch — vector operators "
                "require non-NULL fixed-width arrays; filter NULL rows "
                "upstream (e.g. .where(col.isNotNull()))"
            )
        try:
            A = np.stack(va.to_numpy()).astype(np.float64)
        except ValueError as e:
            raise ValueError(
                "centroid_dots: ragged vector widths in batch — all "
                "vectors must share one dimension; validate widths "
                "upstream (size(col))"
            ) from e
        if A.shape[1] != M.shape[1]:
            raise ValueError(
                f"centroid_dots: vector width {A.shape[1]} != centroid "
                f"width {M.shape[1]}"
            )
        acc = np.zeros((A.shape[0], M.shape[0]), dtype=np.float64)
        # per-dimension sequential accumulation — the exact left fold
        # of pair_dot/dot(), vectorized over (rows x centroids)
        for i in range(A.shape[1]):
            acc += A[:, i : i + 1] * M[None, :, i]
        return pd.Series(list(acc))

    return _udf(vec)


def group_dots(vec: Column, group: Column, groups: dict) -> Column:
    """array<double>: the left-fold dot of ``vec`` against every
    member vector of its ``group`` — :func:`centroid_dots` reshaped
    for GROUP-KEYED one-side-small joins (a row only ever meets its
    own group's centroids: the hier sub-assignment's cell, the PQ
    assignment's subspace).

    ``groups`` maps group key → the bounded member-vector list
    (caller-ordered; the returned dots follow that order, so the
    caller re-attaches member ids/norms positionally). The whole map
    is closure-shipped once per task — callers must bound its total
    row count (the ``_MATRIX_KERNEL_MAX_K``-style guard) and fall
    back to the pair-scoring join past it.

    Why: the equi-join + :func:`pair_dot` shape ships BOTH vectors
    per (row × member) pair through the Arrow pipe — O(N·g·d) bytes
    for per-group fan-out g; this ships each row vector ONCE
    (O(N·d)) and returns only the g dots. The accumulation is the
    identical per-dimension sequential fold, so every dot is
    bit-equal to the pair kernel and the JVM/oracle left fold. Same
    loud contracts: NULL rows/groups, ragged widths, and unknown
    group keys fail with the cause named."""
    mats: dict[int, np.ndarray] = {}
    for key, rows in groups.items():
        M = np.asarray([list(map(float, r)) for r in rows], dtype=np.float64)
        if M.ndim != 2:
            raise ValueError(
                f"group_dots: group {key!r} must be a non-empty list of "
                f"fixed-width vectors, got array shape {M.shape}"
            )
        mats[int(key)] = M

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _udf(va: pd.Series, ga: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=object)
        if va.isna().any():
            raise ValueError(
                "group_dots: NULL vector in batch — vector operators "
                "require non-NULL fixed-width arrays; filter NULL rows "
                "upstream (e.g. .where(col.isNotNull()))"
            )
        if ga.isna().any():
            raise ValueError(
                "group_dots: NULL group key in batch — assign a group "
                "to every row upstream"
            )
        try:
            A = np.stack(va.to_numpy()).astype(np.float64)
        except ValueError as e:
            raise ValueError(
                "group_dots: ragged vector widths in batch — all "
                "vectors must share one dimension; validate widths "
                "upstream (size(col))"
            ) from e
        g = ga.to_numpy()
        out = np.empty(len(va), dtype=object)
        for key in pd.unique(g):
            M = mats.get(int(key))
            if M is None:
                raise ValueError(
                    f"group_dots: unknown group key {key!r} — every row "
                    "must belong to a group in the shipped map"
                )
            idx = np.nonzero(g == key)[0]
            S = A[idx]
            if S.shape[1] != M.shape[1]:
                raise ValueError(
                    f"group_dots: vector width {S.shape[1]} != group "
                    f"{key!r} member width {M.shape[1]}"
                )
            acc = np.zeros((len(idx), M.shape[0]), dtype=np.float64)
            # the identical per-dimension sequential fold (see
            # centroid_dots), vectorized over (rows x members)
            for i in range(S.shape[1]):
                acc += S[:, i : i + 1] * M[None, :, i]
            for j, row_dots in zip(idx, acc):
                out[j] = row_dots
        return pd.Series(out)

    return _udf(vec, group)
