"""PCA by power iteration over the embedding corpus — covariance as
one distributed grammian aggregation, the principal component by
fixed-round power iteration (classic numerical linear algebra; public
knowledge). The embedding-pipeline use: find the dominant direction of
a corpus (drift monitoring, whitening decisions, "is this corpus
anisotropic enough for a prefix/PQ cut to be safe").

Made GRADEABLE by the house exactness recipe, one tool per phase:
the DISTRIBUTED sums (means, covariance entries) pround every product
before an order-independent DECIMAL sum; the BOUNDED iteration uses
sequential left folds of pround'ed terms in a fixed ascending order
(the ``_DOT`` portability pattern) — both bit-identical in any
engine, so fit, iterates, the sign convention, and the
Rayleigh-quotient eigenvalue all grade hash-exact.

Scale shape: the DISTRIBUTED work is one pass. The default covariance
executor is a per-Arrow-batch numpy grammian emitting ≤ d² exact
int64 partial sums per batch (so the shuffle carries batches·d² tiny
rows, never d² per INPUT row — see :func:`covariance_matrix`); a
pure-relational posexplode form is kept as the oracle-shaped
reference, bit-identical by construction and pinned so in tests. The
iteration then collapses the bounded covariance table into ONE ROW
and runs each round as a chained single-row projection — no
per-round shuffles (see :func:`power_iteration`).

Convergence is the textbook (λ2/λ1)^t — fast on real embedding
corpora (strong spectral decay), slow on near-isotropic synthetic
data; the graded query fixes the round count and the oracle replays
the identical rounds, so exactness never depends on convergence.

Reference parity anchor: the reference engine (a log/index store) has
no linear-algebra operators — this module is part of the
beyond-reference LLM-pipeline surface the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.vectors import infer_dim


def covariance_matrix(
    df: DataFrame,
    vec_col: str = "embedding",
    comp_digits: int = 9,
    sum_scale: int = 12,
    n: int | None = None,
    dim: int | None = None,
    method: str = "arrow",
) -> DataFrame:
    """(i, j, c): the d×d covariance of the (mean-centered) vector
    column — ``c[i][j] = pround(Σ_rows pround(cen_i·cen_j) / n)``
    with the centered components ``pround(x - mean)`` and the mean
    itself derived through the same pround/DECIMAL chain. ``n`` (row
    count) is a bounded driver scalar — pass it to skip the count
    when calling repeatedly.

    Two executions of the SAME arithmetic (bit-identical results,
    pytest-pinned equal):

    - ``method='arrow'`` (default): per-Arrow-batch numpy grammian of
      the pround'd centered products, accumulated as EXACT scaled
      int64 partial sums (each pround'd product is a multiple of
      10^-comp_digits, so ``Σ floor(a·b·10^c + 0.5)`` over the batch
      is an integer the kernel computes exactly); Spark then
      DECIMAL-sums the bounded (i, j, psum) partials — ≤ d² rows per
      batch cross the shuffle, never the d²-per-ROW explosion. The
      final ``Σk / 10^c`` division happens in DECIMAL (exact at any
      corpus size) before the house double cast.
    - ``method='relational'``: the pure-SQL posexplode-of-products
      form — d² rows per input row. Kept as the oracle-shaped
      reference and for engines without Arrow; at 100 TB the arrow
      path is the one to run (measured 6x faster at sf0.1, and the
      gap grows with row count).
    """
    if method not in ("arrow", "relational"):
        raise ValueError(f"method must be 'arrow' or 'relational': {method!r}")
    if dim is None:
        dim = infer_dim(df, vec_col)
    if dim is None:
        raise ValueError("cannot compute covariance of an empty corpus")
    if n is None:
        n = df.count()
    if n < 1:
        raise ValueError("cannot compute covariance of an empty corpus")
    comp = df.select(
        F.posexplode(F.col(vec_col)).alias("i", "__x")
    ).select("i", F.col("__x").cast("double").alias("x"))
    mean = comp.groupBy("i").agg(
        pround(
            dsum(pround(F.col("x"), comp_digits), scale=sum_scale)
            / F.lit(float(n)),
            comp_digits,
        ).alias("m")
    )
    marr = mean.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("i", "m"))),
            lambda s: s["m"],
        ).alias("__marr")
    )
    if method == "relational":
        cen = F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("__marr"),
            lambda x, m: pround(x - m, comp_digits),
        )
        # bind the centered array ONCE before the d² product terms read
        # it (the winnowing lesson: expressions inside HOF lambdas
        # re-evaluate per element — an unbound form would re-center per
        # product)
        prods = F.get(
            F.transform(
                F.array(cen),
                lambda c: F.flatten(
                    F.transform(
                        c,
                        lambda a: F.transform(
                            c, lambda b: pround(a * b, comp_digits)
                        ),
                    )
                ),
            ),
            0,
        )
        return (
            df.crossJoin(F.broadcast(marr))
            .select(F.posexplode(prods).alias("pos", "p"))
            .select(
                (F.col("pos") / F.lit(dim)).cast("long").alias("i"),
                (F.col("pos") % F.lit(dim)).cast("long").alias("j"),
                "p",
            )
            .groupBy("i", "j")
            .agg(
                pround(
                    dsum("p", scale=sum_scale) / F.lit(float(n)), comp_digits
                ).alias("c")
            )
        )

    # arrow grammian: the means are a bounded table (d rows) — collect
    # them once; the kernel then computes, per Arrow batch, the EXACT
    # integer Σ floor(cen_i·cen_j·10^c + 0.5) for every (i, j). Each
    # per-batch product/centering op is the identical IEEE expression
    # tree to the relational pround chain (numpy ufuncs are plain IEEE,
    # no FMA contraction), so the integer partials — and therefore the
    # final covariance doubles — are bit-identical to the relational
    # path (pytest pins equality; the graded oracle stays the
    # relational SQL).
    from typing import Iterator

    import numpy as np
    import pandas as pd

    means = np.array(
        [r["m"] for r in mean.orderBy("i").collect()], dtype=np.float64
    )
    if len(means) != dim:
        raise ValueError(
            f"covariance_matrix: vectors have {len(means)} distinct "
            f"positions, expected dim={dim}"
        )
    scale = float(10**comp_digits)
    d = dim
    # per-batch int64 exactness bound: each (i, j) partial adds at most
    # |a·b|·10^c <= 64·10^c per row (|centered| <= 8 enforced below),
    # so rows·64·10^c must stay under 2^63−1 — ~1.4e8 rows at the
    # default 9 digits
    max_batch_rows = (2**63 - 1) // (64 * 10**comp_digits)
    ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")

    def grammian(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            try:
                X = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in vecs]
                )
            except ValueError as e:
                raise ValueError(
                    "covariance_matrix: ragged vector widths in batch — "
                    "all vectors must share one dimension"
                ) from e
            if X.shape[1] != d:
                raise ValueError(
                    f"covariance_matrix: vector width {X.shape[1]} != "
                    f"dim {d}"
                )
            if not np.isfinite(X).all():
                raise ValueError(
                    "covariance_matrix: non-finite component in batch — "
                    "clean NaN/Inf embeddings upstream"
                )
            C = np.floor((X - means[None, :]) * scale + 0.5) / scale
            if np.abs(C).max() > 8.0:
                # int64 headroom proof: |k| <= |a·b|·10^c <= 64·10^c;
                # with the batch-row guard below |psum| stays far
                # inside int64. Larger magnitudes must use the
                # DECIMAL relational path.
                raise ValueError(
                    "covariance_matrix(method='arrow'): centered "
                    "component magnitude > 8 — use method='relational' "
                    "(DECIMAL headroom) for unnormalized corpora"
                )
            if len(C) > max_batch_rows:
                # the int64 proof needs a row bound: numpy int64
                # overflow WRAPS silently, and the Arrow batch size is
                # user-configurable (maxRecordsPerBatch=0 delivers a
                # whole partition as one batch) — so the bound is
                # enforced here, not assumed from the default conf
                raise ValueError(
                    f"covariance_matrix(method='arrow'): Arrow batch "
                    f"of {len(C)} rows exceeds the int64-exactness "
                    f"bound {max_batch_rows} — lower spark.sql."
                    f"execution.arrow.maxRecordsPerBatch or use "
                    f"method='relational'"
                )
            total = np.zeros((d, d), dtype=np.int64)
            for s0 in range(0, len(C), 256):
                blk = C[s0 : s0 + 256]
                P = blk[:, :, None] * blk[:, None, :]
                total += np.floor(P * scale + 0.5).astype(np.int64).sum(
                    axis=0
                )
            yield pd.DataFrame(
                {
                    "i": ii.ravel(),
                    "j": jj.ravel(),
                    "psum": total.ravel(),
                }
            )

    part = df.select(vec_col).mapInPandas(
        grammian, "i long, j long, psum long"
    )
    # DECIMAL sum of the integer partials (exact at any corpus size),
    # the exact-rational /10^c shift in DECIMAL, then the same
    # double-cast + pround(·/n) tail as the relational tree — the
    # result double is the correctly-rounded Σk/10^c either way
    tot = part.groupBy("i", "j").agg(
        F.sum(F.col("psum").cast("decimal(38,0)")).alias("__t")
    )
    # Dividend precision 38 − comp_digits is load-bearing: Spark's
    # precision-loss rule then sets the division result scale to
    # exactly comp_digits — the rounding grid — so the decimal
    # quotient is exact (a (38,0) dividend collapses the scale to 6
    # and HALF_UP-rounds the 7th digit: measured as ±1e-9 flips in a
    # quarter of the cells before this). |Σk| < 10^29 holds for any
    # conceivable corpus at the default digits (|k| ≤ 64·10^9 under
    # the magnitude guard above, so 10^29 needs > 10^17 rows).
    sdouble = (
        F.col("__t").cast(f"decimal({38 - comp_digits},0)")
        / F.lit(int(10**comp_digits)).cast(f"decimal({comp_digits + 1},0)")
    ).cast("double")
    return tot.select(
        "i",
        "j",
        pround(sdouble / F.lit(float(n)), comp_digits).alias("c"),
    )


# the transform-over-singleton bind lives in functions.shingling now
# (one definition of the load-bearing pattern); kept as a module alias
# because power_iteration reads better with the short name
from margaret_spark.functions.shingling import bind1 as _bind  # noqa: E402


def power_iteration(
    cov: DataFrame,
    dim: int,
    iters: int = 12,
    comp_digits: int = 9,
    round_digits: int = 6,
) -> DataFrame:
    """(pos, component, eigenvalue): the dominant eigenvector of the
    (i, j, c) covariance table after ``iters`` power rounds, plus its
    Rayleigh-quotient eigenvalue (the same value on every row — the
    graded surface is one flat table).

    Plan shape — this is the part worth reading: the d² covariance
    table collapses into ONE ROW (an ``array_sort``'d d²-array), and
    each round is one chained single-row projection computing
    ``x ← pround(C·x / ‖C·x‖)`` with every matrix-vector entry a
    sequential left fold of pround'ed products (ascending j — the
    ``_DOT`` portability pattern: a fixed fold order is bit-identical
    in any engine). NO per-round shuffles: a relational loop (join +
    groupBy per round) cost ~9 s of pure job-scheduling latency for
    d = 64. The rounds are separate projections with a
    ``localCheckpoint`` barrier each, NOT one nested expression — a
    single all-rounds lambda chain exhausted the analyzer's
    fixed-point budget and then sent resolution into a minutes-long
    spin (recorded in NOTES); one bind level per projection keeps the
    analyzer linear while the bound ``y`` keeps evaluation O(d²) per
    round.

    The start vector is the uniform ``pround(1/√d)``. Sign
    convention: the first nonzero component is made positive
    (eigenvectors are sign-ambiguous; the convention makes the result
    a pure function of the input; an all-zero iterate keeps +1)."""
    if dim < 1:
        raise ValueError(f"dim must be >= 1: {dim}")
    if iters < 0:
        raise ValueError(f"iters must be >= 0: {iters}")
    # the packed array is indexed as ca[i·d + j]: a SPARSE (i, j, c)
    # table (any missing entry) would silently SHIFT every later
    # element and the iteration would compute garbage — fail loudly
    # instead (covariance_matrix is dense by construction; this guards
    # hand-built inputs). One single-row check, no extra job.
    dense = F.when(
        F.size(F.col("__ca")) == F.lit(dim * dim), F.col("__ca")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "power_iteration: covariance table must be dense "
                    f"({dim}x{dim} = {dim * dim} rows, one per (i, j)); got "
                ),
                F.size(F.col("__ca")).cast("string"),
                F.lit(" rows"),
            )
        )
    )
    row = (
        cov.groupBy()
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("i", "j", "c"))),
                lambda s: s["c"],
            ).alias("__ca")
        )
        .select(
            dense.alias("__ca"),
            F.array_repeat(
                pround(F.lit(1.0) / F.sqrt(F.lit(float(dim))), comp_digits),
                dim,
            ).alias("__xa"),
        )
        .localCheckpoint(eager=False)
    )
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def matvec(ca: Column, x: Column) -> Column:
        # y_i = fold_j (… + pround(C[i·d + j] · x[j])) — ascending j,
        # the fixed-order left fold the oracle replays with
        # list_reduce. ca and x are attribute references (O(1) reads).
        return F.transform(
            idx,
            lambda i: F.aggregate(
                idx,
                F.lit(0.0),
                lambda acc, j: acc
                + pround(
                    F.element_at(ca, (i * dim + j + 1).cast("int"))
                    * F.element_at(x, (j + 1).cast("int")),
                    comp_digits,
                ),
            ),
        )

    def fold_sq(v: Column) -> Column:
        return F.aggregate(
            v, F.lit(0.0), lambda acc, e: acc + pround(e * e, comp_digits)
        )

    # one chained projection per round — each select carries ONE bind
    # level (the analyzer's lambda resolution is per-expression, and a
    # single deeply-nested all-rounds expression sent it into a
    # minutes-long spin); the per-round localCheckpoint stops Catalyst
    # from collapsing the chain back into that same monster
    for _ in range(iters):
        xn = _bind(
            matvec(F.col("__ca"), F.col("__xa")),
            lambda y: F.transform(
                y, lambda v: pround(v / F.sqrt(fold_sq(y)), comp_digits)
            ),
        )
        row = row.select("__ca", xn.alias("__xa")).localCheckpoint(
            eager=False
        )

    first_nz = F.element_at(
        F.filter(F.col("__xa"), lambda v: v != 0.0), 1
    )
    sgn = F.when(first_nz < 0.0, F.lit(-1.0)).otherwise(F.lit(1.0))
    lam = _bind(
        matvec(F.col("__ca"), F.col("__xa")),
        lambda yf: pround(
            F.aggregate(
                F.zip_with(
                    F.col("__xa"),
                    yf,
                    lambda a, b: pround(a * b, comp_digits),
                ),
                F.lit(0.0),
                lambda acc, e: acc + e,
            ),
            round_digits,
        ),
    )
    final = row.select(
        "__xa", sgn.alias("__s"), lam.alias("__l")
    )
    return final.select(
        F.posexplode("__xa").alias("pos", "__v"), "__s", "__l"
    ).select(
        F.col("pos").cast("long").alias("pos"),
        pround(F.col("__v") * F.col("__s"), comp_digits).alias("component"),
        F.col("__l").alias("eigenvalue"),
    )


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    iters: int = 12,
    comp_digits: int = 9,
    sum_scale: int = 12,
    round_digits: int = 6,
    method: str = "arrow",
) -> DataFrame:
    """(pos, component, eigenvalue): the corpus's principal direction —
    :func:`covariance_matrix` composed with :func:`power_iteration`.

    NULL/NaN contract: the default ``method='arrow'`` covariance
    REJECTS non-finite embedding components (ValueError) — clean them
    upstream; ``method='relational'`` propagates them silently into
    the covariance as SQL arithmetic does. Pass ``method`` to pick."""
    dim = infer_dim(df, vec_col)
    if dim is None:
        raise ValueError("cannot run PCA on an empty corpus")
    cov = covariance_matrix(
        df, vec_col, comp_digits=comp_digits, sum_scale=sum_scale, dim=dim,
        method=method,
    )
    return power_iteration(
        cov, dim, iters=iters, comp_digits=comp_digits,
        round_digits=round_digits,
    )


def pca_project(
    df: DataFrame,
    component: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    comp_digits: int = 9,
    round_digits: int = 6,
) -> DataFrame:
    """(``id_col``, proj): each vector's coordinate along a fitted
    principal direction — the PCA *transform* half (drift scores,
    1-D corpus layout, whitening decisions). ``component`` is the
    (pos, component) table :func:`power_iteration` returns; it is
    bounded (d rows), assembled into one broadcast array, and the
    projection is the fixed-order left fold of pround'ed products per
    row (the ``_DOT`` portability pattern) — one corpus scan, zero
    shuffles, hash-exact."""
    warr = component.groupBy().agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "component"))),
            lambda s: s["component"],
        ).alias("__wa")
    )
    proj = pround(
        F.aggregate(
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col("__wa"),
                lambda x, w: pround(x * w, comp_digits),
            ),
            F.lit(0.0),
            lambda acc, e: acc + e,
        ),
        round_digits,
    )
    return df.crossJoin(F.broadcast(warr)).select(
        F.col(id_col), proj.alias("proj")
    )
