"""Deterministic sampling and dataset splitting — the selection
operators a training-data pipeline runs before anything else touches
the corpus (hold-out split, decontamination samples, per-source
quotas).

Everything here is *hash-deterministic*, never RNG-based: membership
is a pure function of the row's id, so a sample is reproducible
across runs, engines, and cluster sizes, and two tables sampled with
the same key stay aligned (the property ``df.sample()`` cannot give,
since its Bernoulli draw depends on partition layout and seed
plumbing). The hash is the first 8 hex digits of md5(id) compared as
a fixed-width lowercase-hex string — lexicographic order on that
string IS numeric order, and md5 is identical in every engine, so
the driver's DuckDB oracle reproduces each sample bit-for-bit.

Scale notes:

- ``hash_sample`` / ``train_test_split`` / ``hash_split`` are pure
  narrow projections/filters — no shuffle at any scale; they pipeline
  into whatever reads them.
- ``stratified_sample`` shuffles once on the strata key (the window's
  partition); per-group top-k is rank-based, so a hot stratum costs
  one skewed window partition, not a cross join. For heavily skewed
  strata, cap the input first with ``hash_sample``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_WIDTH = 8
_HEX_SPACE = 16**_HEX_WIDTH


def _hash_hex(id_col: Column) -> Column:
    """First 8 hex digits of md5(id) — a uniform draw from [0, 16^8)
    whose fixed-width lowercase-hex encoding sorts numerically."""
    return F.substring(F.md5(id_col.cast("string")), 1, _HEX_WIDTH)


def hex_threshold(fraction: float) -> str:
    """The hex-string cutoff such that P[hash_hex < cutoff] ≈ fraction.
    'g' sorts above every hex string — the +inf sentinel for
    fraction = 1.0."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1]: {fraction}")
    n = int(fraction * _HEX_SPACE)
    return "g" if n >= _HEX_SPACE else format(n, f"0{_HEX_WIDTH}x")


def hash_sample(df: DataFrame, id_col: str, fraction: float) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hashed id
    falls below the threshold. Same id → same verdict, on any engine,
    at any scale, under any partitioning. A narrow filter — no
    shuffle; Catalyst pipelines it into the scan."""
    return df.where(_hash_hex(F.col(id_col)) < hex_threshold(fraction))


def train_test_split(
    df: DataFrame, id_col: str, test_fraction: float = 0.1
) -> DataFrame:
    """Add a ``split`` column ('train' | 'test') by hashed id. The
    assignment is stable under corpus growth: a row keeps its split
    when new rows arrive — the property that prevents test-set
    leakage across dataset versions."""
    return df.withColumn(
        "split",
        F.when(
            _hash_hex(F.col(id_col)) < hex_threshold(test_fraction), F.lit("test")
        ).otherwise(F.lit("train")),
    )


def hash_split(df: DataFrame, id_col: str, weights: dict[str, float]) -> DataFrame:
    """Add a ``split`` column drawn from ``weights`` (name → fraction,
    summing to 1), assigned by consecutive hash ranges — the n-way
    generalization of :func:`train_test_split` (train/val/test/...).
    Dict insertion order fixes the ranges, so the split is
    reproducible."""
    if not weights:
        raise ValueError("weights must name at least one split")
    if any(v < 0 for v in weights.values()):
        raise ValueError(f"weights must be non-negative: {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1: {weights}")
    h = _hash_hex(F.col(id_col))
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        thr = hex_threshold(min(cum, 1.0))
        clause = (
            F.when(h < thr, F.lit(name))
            if expr is None
            else expr.when(h < thr, F.lit(name))
        )
        expr = clause
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def weighted_sample(df: DataFrame, id_col: str, weight_col: str) -> DataFrame:
    """Keep each row with probability = clamp(weight, 0, 1), decided
    deterministically by the hashed id — per-row Bernoulli keyed by
    content (quality-weighted downsampling: high-quality documents
    survive more often), reproducible like every operator here. The
    weight must itself be engine-deterministic (e.g. a pround'ed
    score) for the oracle to reproduce the draw. A NULL weight clamps
    to 0 and the row is dropped (absent score ≠ free pass). Narrow
    filter — no shuffle."""
    w = F.least(F.greatest(F.col(weight_col).cast("double"), F.lit(0.0)), F.lit(1.0))
    thr = F.when(w >= 1.0, F.lit("g")).otherwise(
        F.lower(F.lpad(F.hex(F.floor(w * F.lit(float(_HEX_SPACE))).cast("bigint")), _HEX_WIDTH, "0"))
    )
    return df.where(_hash_hex(F.col(id_col)) < thr)


def token_budget_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Corpus mixing by token budget: within each stratum (source),
    documents are ordered deterministically by (md5(id), id) and the
    prefix whose cumulative token count stays inside ``budget`` is
    kept — a document survives iff the tokens before it total under
    the budget (so the budget may be exceeded by at most one
    document, never undershot while docs remain). This is the "mix
    sources to a target token distribution" step of training-data
    assembly: callers pass per-source budgets by filtering or by
    scaling ``budget`` per stratum upstream.

    Output: (id, stratum, tokens, cum_tokens) for kept rows. Exact
    integer arithmetic end-to-end — the oracle reproduces the row set
    and the cumulative sums bit-for-bit.

    Scale shape: ONE shuffle on the stratum key; the cumulative sum is
    a within-stratum window, so a hot stratum is one skewed window
    partition (a prefix sum needs its stratum's total order — it
    cannot be salted like a top-k quota). For heavily skewed strata,
    pre-cap with :func:`hash_sample` (deterministic, so the budget
    scan's universe stays reproducible)."""
    if budget < 0:
        raise ValueError(f"budget must be non-negative: {budget}")
    w = (
        Window.partitionBy(strata_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w).cast("long")
    return (
        df.withColumn("__cum", cum)
        .where(F.col("__cum") - F.col(tokens_col) < budget)
        .select(
            F.col(id_col),
            F.col(strata_col),
            F.col(tokens_col),
            F.col("__cum").alias("cum_tokens"),
        )
    )


def deterministic_shuffle(
    df: DataFrame, id_col: str, seed: int = 0, pos_col: str = "shuffle_pos"
) -> DataFrame:
    """Add a ``pos_col`` giving each row's position in a deterministic
    pseudo-random permutation of the table — the epoch-shuffle a
    training pipeline runs to fix example order reproducibly (same
    seed → same order on any engine, cluster size, or partitioning;
    different seeds → independent permutations).

    The order is ``(md5(id ∥ '#seed'), id)`` — a total order, so the
    permutation is well-defined even with hash collisions. The naive
    ``row_number() OVER (ORDER BY …)`` collapses onto ONE partition at
    scale; instead the rows are range-partitioned on the shuffle key
    (global order across partitions), sorted within each partition
    (narrow), and positions are assigned with the same two-pass
    partition-offset prefix sum the log's bulk ingest uses
    (``functions/seqassign.py``) — per-partition counts to the driver,
    never the data. One range exchange total.

    Range boundaries come from sampling and may land differently run
    to run — positions don't care: the global order across range
    partitions is boundary-independent, and the prefix-sum stage
    checkpoints the layout it counts."""
    from margaret_spark.functions.seqassign import with_dense_seq

    key = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"#{int(seed)}")))
    n = df.sparkSession.sparkContext.defaultParallelism
    staged = (
        df.withColumn("__shufkey", key)
        .repartitionByRange(n, F.col("__shufkey"), F.col(id_col))
        .sortWithinPartitions("__shufkey", id_col)
    )
    return with_dense_seq(staged, seq_col=pos_col).drop("__shufkey")


def stratified_sample(
    df: DataFrame, strata_col: str, id_col: str, k: int, salt: int | None = None
) -> DataFrame:
    """At most ``k`` rows per stratum, chosen deterministically: rank
    rows inside each stratum by (md5(id), id) and keep the first k.
    The per-source quota operator (balanced corpora, eval subsets).

    With ``salt=None``: one shuffle on the strata key, rank-based —
    fine when no stratum dominates, but a single hot stratum is one
    skewed window partition holding its whole population.

    With ``salt=s`` (the skewed-source mode): the classic salted
    two-phase top-k. Phase 1 ranks within (stratum, salt-of-id) and
    keeps each salted subgroup's top ``k`` — the hot stratum's rows
    spread across ``s`` reducers and at most ``s·k`` candidate rows
    per stratum survive. Phase 2 ranks the candidates within the
    stratum — a window over ≤ ``s·k`` rows, never the population.
    Results are IDENTICAL to the unsalted mode: (md5(id), id) is a
    total order and every true top-k row is in its salt bucket's
    top-k, so the candidate union always contains the answer."""
    if k < 0:
        raise ValueError(f"k must be non-negative: {k}")
    order = [F.md5(F.col(id_col).cast("string")), F.col(id_col)]
    if salt is not None:
        if salt < 1:
            raise ValueError(f"salt must be >= 1: {salt}")
        pre = Window.partitionBy(
            F.col(strata_col),
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(salt)),
        ).orderBy(*order)
        df = (
            df.withColumn("__prn", F.row_number().over(pre))
            .where(F.col("__prn") <= k)
            .drop("__prn")
        )
    w = Window.partitionBy(strata_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def mixture_weights(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    temperature: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Temperature-scaled corpus mixing weights — the standard
    multi-source sampling recipe (multilingual / multi-domain
    pretraining): each group's sampling weight is proportional to
    ``tokens^(1/T)``. ``T=1`` is proportional-to-size, ``T→∞`` is
    uniform; intermediate T up-samples small sources without letting
    them dominate.

    Output: (group, n_docs, n_tokens, tokens_scaled, weight) with
    weight = tokens_scaled / Σ tokens_scaled, both rounded to
    ``round_digits``.

    Scale shape: one algebraic aggregation (|groups| rows move), then
    an unpartitioned window over the aggregated rows — ≤|groups| of
    them, the same post-reduction shape as the top-k finishers. The
    cross-group total is an exact DECIMAL sum of the pre-rounded
    scaled values, so the result is order-independent.

    Determinism: at the default ``temperature=2.0`` the scaling is
    ``sqrt`` — IEEE-exact in every engine, so the whole table is
    hash-reproducible cross-engine. Other temperatures go through
    ``pow``, which can differ in the last ulp between engines; the
    values are still deterministic within Spark.
    """
    from margaret_spark.functions.numeric import pround

    if temperature <= 0:
        raise ValueError(f"temperature must be positive: {temperature}")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
    )
    nt = F.col("n_tokens").cast("double")
    raw = (
        F.sqrt(nt)
        if temperature == 2.0
        else F.pow(nt, F.lit(1.0 / temperature))
    )
    scaled = agg.withColumn("tokens_scaled", pround(raw, round_digits))
    w = Window.partitionBy()
    total = (
        F.sum(F.col("tokens_scaled").cast(f"decimal(38,{int(round_digits)})"))
        .over(w)
        .cast("double")
    )
    return scaled.withColumn(
        "weight", pround(F.col("tokens_scaled") / total, round_digits)
    )


def materialize_mixture(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    total_tokens: int,
    temperature: float = 2.0,
    round_digits: int = 6,
) -> DataFrame:
    """Assemble the training mix: turn :func:`mixture_weights` into an
    ACTUAL kept-document set. Each source's token budget is
    ``floor(weight · total_tokens)`` and its documents are admitted in
    the deterministic (md5(id), id) order until the budget fills —
    the end-to-end "build a T-temperature corpus of N tokens" step
    that composes the two operators every multi-source pretraining
    recipe chains by hand.

    Output: (id, group, tokens, cum_tokens, budget) for kept rows.
    Exact arithmetic end-to-end at ``temperature=2.0`` (sqrt weights,
    one IEEE multiply, integer floor and cumsums) — hash-exact
    cross-engine.

    Scale shape: the budget table is |sources| rows (broadcast); the
    admission rule is the per-source window cumsum of
    :func:`token_budget_sample` — ONE shuffle on the source key. A
    source's budget can exceed its own token mass (small sources
    up-sampled by temperature keep everything; epoch-level repetition
    is a loader concern, not a selection concern)."""
    if total_tokens < 0:
        raise ValueError(f"total_tokens must be non-negative: {total_tokens}")
    weights = mixture_weights(
        df, group_col, tokens_col, temperature, round_digits
    )
    budgets = weights.select(
        group_col,
        F.floor(F.col("weight") * F.lit(float(total_tokens)))
        .cast("long")
        .alias("budget"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w).cast("long")
    return (
        df.join(F.broadcast(budgets), group_col)
        .withColumn("__cum", cum)
        .where(F.col("__cum") - F.col(tokens_col) < F.col("budget"))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(tokens_col),
            F.col("__cum").alias("cum_tokens"),
            F.col("budget"),
        )
    )


def unimax_allocation(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    budget: int,
    max_epochs: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """UniMax corpus mixing (Chung et al. 2023, public algorithm): the
    FAIR alternative to temperature scaling — distribute a total token
    ``budget`` as uniformly as possible across groups (languages /
    sources), capping each group at ``max_epochs`` passes over its own
    data, and redistribute what a capped group cannot absorb among the
    rest. Temperature mixing (:func:`mixture_weights`) up-samples
    small sources *proportionally*; UniMax gives every source an equal
    share until its epoch cap binds — no head-language domination, no
    tiny-language over-repetition.

    Closed form (the published greedy, restated as waterfilling): sort
    groups by cap ascending; group ``i`` (1-based, ``L`` groups) takes
    ``min(cap_i, (budget − Σ_{j<i} alloc_j) / (L − i + 1))``. Because
    caps ascend, allocations are cap_i exactly up to the first rank
    where the equal share falls below the cap; every group from that
    rank on takes the SAME share θ. So one window pass computes it:
    prefix sums of caps (exact DECIMAL), per-rank share, the first
    rank whose cap exceeds its share, θ at that rank.

    Output: (group, n_docs, n_tokens, cap, alloc) — ``cap`` =
    pround(n_tokens·max_epochs), ``alloc`` the UniMax token
    allocation. If ``budget ≥ Σ cap`` every group is fully capped and
    the leftover budget is intentionally unallocated (UniMax never
    exceeds the epoch cap — that is its point).

    Exactness: caps and shares are pround'd IEEE doubles of exact
    integers, prefix sums are DECIMAL (order-independent), and the
    transition rank is a comparison of pround'd values — hash-exact
    cross-engine. Token-mass bound: the pround grid is exact only
    while ``n_tokens·max_epochs·10^round_digits ≤ 2^53`` (~9e9 tokens
    per group at the default 6 digits); past that the cap/share
    doubles still replay identically in any engine (hash-exactness
    holds) but the allocation can drift from the true waterfill by
    grid quanta — drop ``round_digits`` for trillion-token groups. Scale shape: one aggregation (|groups| rows move),
    then unpartitioned windows over ≤ |groups| rows (groups are
    sources/languages — bounded by design, like
    :func:`mixture_weights`)."""
    from margaret_spark.functions.numeric import pround

    if budget < 0:
        raise ValueError(f"budget must be non-negative: {budget}")
    if max_epochs <= 0:
        raise ValueError(f"max_epochs must be positive: {max_epochs}")
    agg = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
    )
    capped = agg.withColumn(
        "cap",
        pround(
            F.col("n_tokens").cast("double") * F.lit(float(max_epochs)),
            round_digits,
        ),
    )
    order = [F.col("cap").asc(), F.col(group_col).asc()]
    w_rank = Window.orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = f"decimal(38,{int(round_digits)})"
    ranked = capped.select(
        "*",
        F.row_number().over(w_rank).cast("long").alias("__rk"),
        F.count(F.lit(1)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).cast("long").alias("__L"),
        (
            F.sum(F.col("cap").cast(dec)).over(w_cum)
            - F.col("cap").cast(dec)
        ).cast("double").alias("__prefix"),
    )
    share = pround(
        (F.lit(float(budget)) - F.col("__prefix"))
        / (F.col("__L") - F.col("__rk") + F.lit(1)).cast("double"),
        round_digits,
    )
    flagged = ranked.select("*", share.alias("__share"))
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    star = F.min(
        F.when(F.col("cap") > F.col("__share"), F.col("__rk"))
    ).over(w_all)
    final = flagged.select("*", star.alias("__star"))
    # θ is the share AT the transition rank; max(share | rank = star)
    # picks exactly it because shares are non-increasing past star
    theta = F.max(
        F.when(F.col("__rk") == F.col("__star"), F.col("__share"))
    ).over(w_all)
    alloc = F.when(
        F.col("__star").isNull() | (F.col("__rk") < F.col("__star")),
        F.col("cap"),
    ).otherwise(theta)
    return final.select(
        F.col(group_col),
        F.col("n_docs"),
        F.col("n_tokens"),
        F.col("cap"),
        pround(alloc, round_digits).alias("alloc"),
    )


def materialize_unimax(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    max_epochs: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """Assemble the UniMax mix: :func:`unimax_allocation` budgets feed
    the same deterministic (md5(id), id) per-group admission cumsum as
    :func:`materialize_mixture` — each group keeps its document prefix
    until ``floor(alloc)`` tokens fill. Output: (id, group, tokens,
    cum_tokens, budget). One shuffle on the group key; the budget
    table is |groups| rows, broadcast. Note ``max_epochs > 1`` means a
    group's budget may exceed its own token mass — the group then
    keeps everything and the loader repeats it (epoch-level
    repetition is a loader concern, as with temperature mixing)."""
    allocs = unimax_allocation(
        df, group_col, tokens_col, budget, max_epochs, round_digits
    )
    budgets = allocs.select(
        group_col,
        F.floor(F.col("alloc")).cast("long").alias("budget"),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col(tokens_col)).over(w).cast("long")
    return (
        df.join(F.broadcast(budgets), group_col)
        .withColumn("__cum", cum)
        .where(F.col("__cum") - F.col(tokens_col) < F.col("budget"))
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col(tokens_col),
            F.col("__cum").alias("cum_tokens"),
            F.col("budget"),
        )
    )
