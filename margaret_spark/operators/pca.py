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

Scale shape: the DISTRIBUTED work is one pass — per row the centered
d-vector expands to its d² pround'ed products (bound once as a lambda
variable), and a (i, j)-keyed map-side-combined aggregation collapses
them to the d²-row covariance table. The iteration then collapses
that bounded table into ONE ROW and runs each round as a chained
single-row projection — no per-round shuffles (see
:func:`power_iteration`). (At d in the thousands you would swap the
explode for per-partition Arrow grammians merged with the same
DECIMAL sums; at d = 64-1024 the relational form is the simpler plan
and Catalyst map-side-combines it.)

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
) -> DataFrame:
    """(i, j, c): the d×d covariance of the (mean-centered) vector
    column — ``c[i][j] = pround(Σ_rows pround(cen_i·cen_j) / n)``
    with the centered components ``pround(x - mean)`` and the mean
    itself derived through the same pround/DECIMAL chain. One corpus
    scan; the only shuffle carries (i, j)-keyed DECIMAL partial sums
    (d² groups, map-side combined). ``n`` (row count) is a bounded
    driver scalar — pass it to skip the count when calling
    repeatedly."""
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
    cen = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.col("__marr"),
        lambda x, m: pround(x - m, comp_digits),
    )
    # bind the centered array ONCE before the d² product terms read it
    # (the winnowing lesson: expressions inside HOF lambdas re-evaluate
    # per element — an unbound form would re-center per product)
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


def _bind(col: Column, fn) -> Column:
    """Evaluate ``col`` ONCE and hand it to ``fn`` as a lambda
    variable (the transform-over-singleton bind — the winnowing
    lesson: expressions referenced inside HOF lambdas re-evaluate per
    reference; a bound variable is O(1) to read)."""
    return F.get(F.transform(F.array(col), fn), 0)


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
) -> DataFrame:
    """(pos, component, eigenvalue): the corpus's principal direction —
    :func:`covariance_matrix` composed with :func:`power_iteration`."""
    dim = infer_dim(df, vec_col)
    if dim is None:
        raise ValueError("cannot run PCA on an empty corpus")
    cov = covariance_matrix(
        df, vec_col, comp_digits=comp_digits, sum_scale=sum_scale, dim=dim
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
