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


def _top_idx(K: np.ndarray, n: int, desc: bool) -> np.ndarray:
    """Per-row indices of the top-``n`` entries of ``K`` under Spark's
    total order on the key column with index-ascending tiebreak —
    i.e. exactly the rows ``row_number() OVER (ORDER BY key
    [DESC|ASC], idx ASC) <= n`` keeps. Doubles compare IEEE-equal, so
    a stable sort (first occurrence on ties = lowest index) matches
    the ``idx ASC`` tiebreak; Spark orders NaN GREATER than every
    value including +Infinity, in both directions.

    Returns shape (rows, min(n, K.shape[1]))."""
    nan = np.isnan(K)
    X = np.where(nan, np.inf, K) if nan.any() else K
    if desc:
        order = (
            np.argmax(X, axis=1)[:, None]
            if n == 1
            else np.argsort(-X, axis=1, kind="stable")[:, :n]
        )
    else:
        order = (
            np.argmin(X, axis=1)[:, None]
            if n == 1
            else np.argsort(X, axis=1, kind="stable")[:, :n]
        )
    # exact-NaN guard: mapping NaN→+inf merges it with a TRUE +inf key
    # (only possible for x/0 inputs — never unit-norm'd real vectors);
    # Spark orders NaN above +inf, so re-rank such rows the slow exact
    # way. In practice this branch never runs.
    if nan.any():
        bad = np.nonzero((K == np.inf).any(axis=1) & nan.any(axis=1))[0]
        for r in bad:
            if desc:  # NaN greatest → first
                key = [
                    (0, 0.0, i) if np.isnan(v) else (1, -v, i)
                    for i, v in enumerate(K[r])
                ]
            else:  # NaN greatest → last
                key = [
                    (1, 0.0, i) if np.isnan(v) else (0, v, i)
                    for i, v in enumerate(K[r])
                ]
            key.sort()
            order[r] = [i for _, _, i in key[: order.shape[1]]]
    return order


def _pround_np(x: np.ndarray, digits: int) -> np.ndarray:
    """numpy twin of functions.numeric.pround — the identical IEEE
    tree floor(x·10^d + 0.5)/10^d (floor's integer value is exactly
    representable at these magnitudes, so BIGINT-vs-double floor
    results are bit-equal)."""
    scale = float(10**digits)
    return np.floor(x * scale + 0.5) / scale


def centroid_best(
    vec: Column,
    norm: Column,
    matrix: list,
    cent_ids: list,
    cent_norms: list,
    n: int,
    round_digits: int,
) -> Column:
    """array<struct<c:bigint, s:double>>: the ``n`` nearest centroids
    of the bounded collected table per row, by (pround'ed cosine desc,
    cent_id asc), in rank order — :func:`centroid_dots` with the
    RANKING pushed into the kernel.

    Why: the dots-then-rank shape (posexplode k dots → element_at →
    ``row_number() OVER (PARTITION BY id)``) materializes N·k rows in
    the JVM and pays a full shuffle+sort for the window — per
    assignment pass. Ranking inside the batch returns only the ≤n
    winners per row: no explode, no exchange, no sort. Every score is
    the identical IEEE tree on the identical per-dimension left-fold
    dots (see :func:`_pround_np`); ties and NaN follow Spark's window
    order exactly (see :func:`_top_idx`), so the kept rows are
    bit-equal to the window's. ``matrix``/``cent_ids``/``cent_norms``
    are caller-collected and pre-sorted by cent_id (the tiebreak
    contract). Same loud contracts as centroid_dots."""
    M = np.asarray([list(map(float, row)) for row in matrix], dtype=np.float64)
    if M.ndim != 2:
        raise ValueError(f"centroid_best: matrix must be k x d, got shape {M.shape}")
    ids = np.asarray([int(i) for i in cent_ids], dtype=np.int64)
    cns = np.asarray([float(x) for x in cent_norms], dtype=np.float64)
    if not (len(ids) == len(cns) == M.shape[0]):
        raise ValueError(
            f"centroid_best: ids/norms/matrix row counts differ "
            f"({len(ids)}/{len(cns)}/{M.shape[0]})"
        )

    @F.pandas_udf(T.ArrayType(T.StructType([
        T.StructField("c", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ])))
    def _udf(va: pd.Series, na: pd.Series) -> pd.Series:
        if len(va) == 0:
            return pd.Series([], dtype=object)
        if va.isna().any():
            raise ValueError(
                "centroid_best: NULL vector in batch — vector operators "
                "require non-NULL fixed-width arrays; filter NULL rows "
                "upstream (e.g. .where(col.isNotNull()))"
            )
        try:
            A = np.stack(va.to_numpy()).astype(np.float64)
        except ValueError as e:
            raise ValueError(
                "centroid_best: ragged vector widths in batch — all "
                "vectors must share one dimension; validate widths "
                "upstream (size(col))"
            ) from e
        if A.shape[1] != M.shape[1]:
            raise ValueError(
                f"centroid_best: vector width {A.shape[1]} != centroid "
                f"width {M.shape[1]}"
            )
        acc = np.zeros((A.shape[0], M.shape[0]), dtype=np.float64)
        # the identical per-dimension sequential fold (see centroid_dots)
        for i in range(A.shape[1]):
            acc += A[:, i : i + 1] * M[None, :, i]
        sims = _pround_np(
            acc / (na.to_numpy(dtype=np.float64)[:, None] * cns[None, :]),
            round_digits,
        )
        order = _top_idx(sims, n, desc=True)
        rows = np.arange(len(va))[:, None]
        win_ids = ids[order]
        win_sims = sims[rows, order]
        return pd.Series(
            [
                [(int(c), float(s)) for c, s in zip(ci, si)]
                for ci, si in zip(win_ids, win_sims)
            ]
        )

    return _udf(vec, norm)


def group_best(
    vec: Column,
    group: Column,
    scalar: Column,
    groups: dict,
    member_ids: dict,
    member_scalars: dict,
    mode: str,
    round_digits: int,
) -> Column:
    """struct<i:bigint, s:double>: the best member of the row's
    ``group`` — :func:`group_dots` with the RANKING pushed into the
    kernel (the same argument as :func:`centroid_best`: no explode of
    g dots per row, no map-literal lookups, no window exchange+sort).

    ``mode='cosine'``: score = pround(dot/(scalar·member_scalar)),
    best = max (scalar: row norm, member_scalars: member norms).
    ``mode='dist2'``: score = pround((scalar+member_scalar) − 2·dot),
    best = min (scalar: row self-dot, member_scalars: member
    self-dots). Ties → lowest member INDEX, so callers must pre-sort
    each group's members by the tiebreak id ascending; ``i`` is that
    member's id from ``member_ids``. Every score is the identical
    IEEE tree on the identical left-fold dots; NaN follows Spark's
    window order (see :func:`_top_idx`). Same loud contracts as
    group_dots."""
    if mode not in ("cosine", "dist2"):
        raise ValueError(f"group_best: unknown mode {mode!r}")
    mats: dict[int, tuple[int, int]] = {}  # key -> (class, row in class)
    by_count: dict[int, list] = {}
    dims = set()
    for key, rows in sorted(groups.items()):
        M = np.asarray([list(map(float, r)) for r in rows], dtype=np.float64)
        if M.ndim != 2:
            raise ValueError(
                f"group_best: group {key!r} must be a non-empty list of "
                f"fixed-width vectors, got array shape {M.shape}"
            )
        mids = np.asarray([int(i) for i in member_ids[key]], dtype=np.int64)
        mscs = np.asarray(
            [float(x) for x in member_scalars[key]], dtype=np.float64
        )
        if not (len(mids) == len(mscs) == M.shape[0]):
            raise ValueError(
                f"group_best: group {key!r} ids/scalars/matrix row counts "
                f"differ ({len(mids)}/{len(mscs)}/{M.shape[0]})"
            )
        dims.add(M.shape[1])
        bucket = by_count.setdefault(M.shape[0], [])
        mats[int(key)] = (M.shape[0], len(bucket))
        bucket.append((M, mids, mscs))
    if len(dims) > 1:
        raise ValueError(
            f"group_best: member widths differ across groups: {sorted(dims)}"
        )
    # per size class: (n_groups, count, d) member tensor plus the
    # (n_groups, count) id / scalar matrices — the per-dimension fold
    # vectorizes across every group of one size at once, so per batch
    # the Python-op count is O(size-classes · d + rows), independent
    # of the group count
    tensors = {
        c: (
            np.stack([m for m, _, _ in ms]),
            np.stack([i for _, i, _ in ms]),
            np.stack([s for _, _, s in ms]),
        )
        for c, ms in by_count.items()
    }
    desc = mode == "cosine"

    @F.pandas_udf(T.StructType([
        T.StructField("i", T.LongType()),
        T.StructField("s", T.DoubleType()),
    ]))
    def _udf(va: pd.Series, ga: pd.Series, sa: pd.Series) -> pd.DataFrame:
        if len(va) == 0:
            return pd.DataFrame({"i": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="float64")})
        if va.isna().any():
            raise ValueError(
                "group_best: NULL vector in batch — vector operators "
                "require non-NULL fixed-width arrays; filter NULL rows "
                "upstream (e.g. .where(col.isNotNull()))"
            )
        if ga.isna().any():
            raise ValueError(
                "group_best: NULL group key in batch — assign a group "
                "to every row upstream"
            )
        try:
            A = np.stack(va.to_numpy()).astype(np.float64)
        except ValueError as e:
            raise ValueError(
                "group_best: ragged vector widths in batch — all "
                "vectors must share one dimension; validate widths "
                "upstream (size(col))"
            ) from e
        d = next(iter(dims))
        if A.shape[1] != d:
            raise ValueError(
                f"group_best: vector width {A.shape[1]} != group "
                f"member width {d}"
            )
        try:
            cls_idx = [mats[int(k)] for k in ga.to_numpy()]
        except KeyError as e:
            raise ValueError(
                f"group_best: unknown group key {e.args[0]!r} — every "
                "row must belong to a group in the shipped map"
            ) from None
        cls = np.fromiter((c for c, _ in cls_idx), dtype=np.int64, count=len(cls_idx))
        gix = np.fromiter((i for _, i in cls_idx), dtype=np.int64, count=len(cls_idx))
        sc = sa.to_numpy(dtype=np.float64)
        out_i = np.empty(len(va), dtype=np.int64)
        out_s = np.empty(len(va), dtype=np.float64)
        for c in np.unique(cls):
            rows = np.nonzero(cls == c)[0]
            T3, I2, S2 = tensors[int(c)]
            idx = gix[rows]
            S = A[rows]
            acc = np.zeros((len(rows), int(c)), dtype=np.float64)
            # the identical per-dimension sequential fold (see
            # centroid_dots), vectorized over (rows x members) for
            # every group of this size at once
            for i in range(d):
                acc += S[:, i : i + 1] * T3[idx, :, i]
            msc = S2[idx]
            if desc:
                K = _pround_np(acc / (sc[rows][:, None] * msc), round_digits)
            else:
                K = _pround_np(
                    (sc[rows][:, None] + msc) - (2.0 * acc), round_digits
                )
            win = _top_idx(K, 1, desc=desc)[:, 0]
            r = np.arange(len(rows))
            out_i[rows] = I2[idx][r, win]
            out_s[rows] = K[r, win]
        return pd.DataFrame({"i": out_i, "s": out_s})

    return _udf(vec, group, scalar)


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
    # Groups are bucketed by member COUNT so the per-dimension fold
    # vectorizes across every group of one size at once — per batch
    # the Python-op count is O(size-classes · d + rows), independent
    # of the number of groups (a per-group loop was measured to cost
    # ~k1·k2 · d tiny numpy calls per batch on the hier family).
    mats: dict[int, tuple[int, int]] = {}  # key -> (class, row in class)
    by_count: dict[int, list] = {}
    dims = set()
    for key, rows in sorted(groups.items()):
        M = np.asarray([list(map(float, r)) for r in rows], dtype=np.float64)
        if M.ndim != 2:
            raise ValueError(
                f"group_dots: group {key!r} must be a non-empty list of "
                f"fixed-width vectors, got array shape {M.shape}"
            )
        dims.add(M.shape[1])
        bucket = by_count.setdefault(M.shape[0], [])
        mats[int(key)] = (M.shape[0], len(bucket))
        bucket.append(M)
    if len(dims) > 1:
        raise ValueError(
            f"group_dots: member widths differ across groups: {sorted(dims)}"
        )
    # (n_groups_of_count, count, d) tensor per size class
    tensors = {c: np.stack(ms) for c, ms in by_count.items()}

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
        d = next(iter(dims))
        if A.shape[1] != d:
            raise ValueError(
                f"group_dots: vector width {A.shape[1]} != group "
                f"member width {d}"
            )
        try:
            cls_idx = [mats[int(k)] for k in ga.to_numpy()]
        except KeyError as e:
            raise ValueError(
                f"group_dots: unknown group key {e.args[0]!r} — every "
                "row must belong to a group in the shipped map"
            ) from None
        cls = np.fromiter((c for c, _ in cls_idx), dtype=np.int64, count=len(cls_idx))
        gix = np.fromiter((i for _, i in cls_idx), dtype=np.int64, count=len(cls_idx))
        out = np.empty(len(va), dtype=object)
        for c in np.unique(cls):
            rows = np.nonzero(cls == c)[0]
            T3 = tensors[int(c)]
            idx = gix[rows]
            S = A[rows]
            acc = np.zeros((len(rows), int(c)), dtype=np.float64)
            # the identical per-dimension sequential fold (see
            # centroid_dots), vectorized over (rows x members) for
            # every group of this size at once
            for i in range(d):
                acc += S[:, i : i + 1] * T3[idx, :, i]
            for j, row_dots in zip(rows, acc):
                out[j] = row_dots
        return pd.Series(out)

    return _udf(vec, group)
