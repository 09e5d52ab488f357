"""SemDeDup-style semantic deduplication (Abbas et al. 2023,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication") — cluster-scoped embedding near-dup pruning,
implemented Spark-first on public knowledge only.

The construction (the paper's, re-expressed relationally):

1. **Cluster** the embedding corpus with k-means — here the
   deterministic, engine-reproducible Lloyd refinement the repo
   already grades hash-exact (:func:`similarity.kmeans_assign_deterministic`:
   lowest-id init, rounded-cosine assignment with centroid-id
   tiebreak, pround/DECIMAL means).
2. **Pair** only WITHIN a cluster: an equality self-join keyed on
   ``cent_id`` — O(Σ |cell|²) cosines instead of the all-pairs O(N²).
   At 100 TB k grows with N (SemDeDup used 50k clusters for LAION) so
   the per-cell quadratic stays bounded; the join is a plain
   shuffle-on-cent_id sort-merge join, never a cartesian product.
3. **Prune** by the deterministic dominance rule used across this
   repo's dedup families: a row is dropped iff some SAME-CLUSTER row
   with a SMALLER id is within ``threshold`` cosine — i.e. every
   ``id_b`` of the pair set. Keeps are a pure function of the input.

Differences from ``dedup.embedding_dedup_pairs_ivf`` (the candidate
near-dup JOIN): that operator blocks by UNREFINED seeded cells purely
as a candidate generator; this one is the SemDeDup *curation* op —
Lloyd-refined clusters (tighter cells → better recall at equal cost)
plus the keep/drop decision itself.

Reference parity anchor: the reference engine has no embedding
operators (`margaret` is a log/index store) — this module is part of
the beyond-reference LLM-pipeline surface the build brief mandates.

Cross-engine exactness: assignment and pair cosines use the proven
pround/pair_dot/DECIMAL recipe, so the DuckDB oracle in
``__spark_entry__`` re-derives every kept row bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import pround
from margaret_spark.functions.vectors import l2_norm, pair_dot
from margaret_spark.operators.similarity import kmeans_assign_deterministic


def scaled_k(n: int, floor: int = 8) -> int:
    """The SemDeDup cluster-count rule: ``k = max(floor, ceil(√n))``.

    Fixed k is superlinear in corpus size — cells grow linearly with
    N, so the within-cell pair stage grows as N²/k (the r9 10× probe
    measured 17× wall for 10× docs at k=32). k = ceil(√N) balances
    the two stages: assignment O(N·k) and pairs O(N²/k) both become
    O(N^1.5), the classic flat-clustering compromise (truly linear
    needs a hierarchical coarse quantizer — that is the IVF/PQ path).
    The floor keeps tiny corpora at a sane minimum cell count, and
    exact integer isqrt keeps the value bit-agreed with the oracle's
    ``greatest(floor, ceil(sqrt(count(*))))``."""
    import math

    n = max(int(n), 0)
    r = math.isqrt(n)
    if r * r < n:
        r += 1
    return max(int(floor), r)


def _assigned_with_vectors(
    corpus: DataFrame,
    k: int,
    iters: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
    comp_digits: int,
    sum_scale: int,
) -> DataFrame:
    """(id, cent_id, cent_cosine, __v): the final k-means assignment
    with its vector carried through the assignment projection
    (``keep_vec`` — the former join-back re-scanned the corpus to
    re-fetch a column the kernel path already had on the row).
    localCheckpoint'ed so the self-join below neither recomputes the
    Lloyd rounds per side nor loses the exchange to alias ambiguity
    (house rule)."""
    assigned = kmeans_assign_deterministic(
        corpus,
        k=k,
        iters=iters,
        id_col=id_col,
        vec_col=vec_col,
        round_digits=round_digits,
        comp_digits=comp_digits,
        sum_scale=sum_scale,
        keep_vec="__v",
    )
    return (
        assigned.select(
            F.col(id_col).alias("id"),
            "cent_id",
            F.col("cosine").alias("cent_cosine"),
            "__v",
        )
        .localCheckpoint(eager=False)
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Within-cluster near-dup pairs: (id_a, id_b, cent_id, cosine)
    with id_a < id_b and rounded cosine ≥ ``threshold``.

    Plan shape: one sort-merge self-join keyed on cent_id (the ONLY
    shuffle beyond the k-means rounds), Arrow pair_dot scoring on the
    surviving same-cell candidates. Pass ``assigned`` (from
    :func:`_assigned_with_vectors`) to share the clustering with
    :func:`semantic_prune`."""
    if assigned is None:
        assigned = _assigned_with_vectors(
            corpus, k, iters, id_col, vec_col,
            round_digits, comp_digits, sum_scale,
        )
    # norm per ROW before the pair join (the vectors.py rule): an
    # in-join norm re-folds the d-element HOF once per PAIR per side —
    # the dominant within-cell-pass cost. Same expression, same input,
    # bit-identical cosine.
    a = assigned.select(
        F.col("id").alias("id_a"),
        "cent_id",
        F.col("__v").alias("__va"),
        l2_norm(F.col("__v")).alias("__na"),
    )
    b = assigned.select(
        F.col("id").alias("id_b"),
        F.col("cent_id").alias("__cb"),
        F.col("__v").alias("__vb"),
        l2_norm(F.col("__v")).alias("__nb"),
    )
    sim = pround(
        pair_dot(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb")),
        round_digits,
    )
    return (
        a.join(
            b,
            (F.col("cent_id") == F.col("__cb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("cosine", sim)
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cent_id", "cosine")
    )


def semantic_prune(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> DataFrame:
    """SemDeDup keeps: (``id_col``, cent_id, cent_cosine) for every
    row NOT dominated by a smaller-id same-cluster row within
    ``threshold`` cosine — drop set = the distinct ``id_b`` of
    :func:`semantic_dedup_pairs`, removed with one broadcast-able
    left-anti join. Deterministic: keeps are a pure function of the
    input (no sampling, no float-sum ordering)."""
    assigned = _assigned_with_vectors(
        corpus, k, iters, id_col, vec_col,
        round_digits, comp_digits, sum_scale,
    )
    pairs = semantic_dedup_pairs(
        corpus, k, iters, threshold, id_col, vec_col,
        round_digits, comp_digits, sum_scale, assigned=assigned,
    )
    dropped = pairs.select(F.col("id_b").alias("__drop")).distinct()
    return (
        assigned.join(
            dropped, assigned["id"] == dropped["__drop"], "left_anti"
        )
        .select(
            F.col("id").alias(id_col), "cent_id", "cent_cosine"
        )
    )


def contrastive_triplets(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 2,
    pos_threshold: float = 0.4,
    neg_threshold: float = 0.3,
    n_neg: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> DataFrame:
    """(anchor, positive, negative, pos_cos, neg_cos): contrastive
    training triplets mined from the clustered corpus — the data-prep
    step for training/fine-tuning embedding models (anchor-positive =
    semantic near-dups; hard negatives = same-cluster rows that are
    close in topic but NOT duplicates, the negatives that actually
    teach a margin — Schroff et al. 2015 "FaceNet" semi-hard mining,
    public literature).

    Construction: ONE within-cluster pair-cosine pass (the SemDeDup
    join), split at the two thresholds — positives at
    ``cosine ≥ pos_threshold``, negative CANDIDATES at
    ``cosine < neg_threshold`` — and per anchor the ``n_neg`` HARDEST
    negatives (highest cosine below the bar, id tiebreak) attach to
    every positive of that anchor. Anchors are the ``id_a`` (smaller
    id) side of each pair — deterministic, no sampling.

    Scale shape: the pair pass is the cluster-scoped equality join
    (never all-pairs); the negative ranking is one (id_a)-keyed
    window over same-cell candidate rows; the final attach is an
    equality join on the anchor id. Hash-exact end-to-end."""
    if not pos_threshold >= neg_threshold:
        raise ValueError(
            f"pos_threshold must be >= neg_threshold: {pos_threshold} < {neg_threshold}"
        )
    if n_neg < 1:
        raise ValueError(f"n_neg must be >= 1: {n_neg}")
    # checkpoint: BOTH threshold splits consume this pair pass — an
    # unpinned plan recomputes the whole k-means + self-join chain
    # per branch (measured 9 s -> ~half on the graded query)
    allp = semantic_dedup_pairs(
        corpus, k, iters, threshold=-1.0, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits, comp_digits=comp_digits,
        sum_scale=sum_scale,
    ).localCheckpoint(eager=False)
    pos = allp.where(F.col("cosine") >= F.lit(pos_threshold)).select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.col("cosine").alias("pos_cos"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(
        F.col("cosine").desc(), F.col("id_b").asc()
    )
    neg = (
        allp.where(F.col("cosine") < F.lit(neg_threshold))
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= n_neg)
        .select(
            F.col("id_a").alias("anchor"),
            F.col("id_b").alias("negative"),
            F.col("cosine").alias("neg_cos"),
        )
    )
    return pos.join(neg, "anchor").select(
        "anchor", "positive", "negative", "pos_cos", "neg_cos"
    )


def _cell_threshold_hits(
    vs: DataFrame,
    e_side: DataFrame,
    threshold: float,
    round_digits: int,
) -> DataFrame | None:
    """(id, cent_id, __hit): for every ``vs`` row (id, cent_id, __v,
    __n), whether SOME same-cell vector of the bounded existing side
    sits within ``threshold`` rounded cosine — the matrix-kernel form
    of the cell-keyed existing-vs-new pair join (``group_dots``: each
    row vector crosses the Arrow pipe once; the cosine is the
    identical ``pround(dot/(n·no))`` tree on bit-equal dots, with the
    existing norms collected from the same JVM ``l2_norm`` fold the
    join read). ``e_side`` must carry (__ce, __vo, __no). Returns
    None when the existing side exceeds the closure budget — callers
    keep the pair join for that (the general big-corpus case)."""
    e_rows = _collect_cell_side(e_side)
    if e_rows is None:
        return None
    return _cell_threshold_hits_from_rows(vs, e_rows, threshold, round_digits)


def _collect_cell_side(e_side: DataFrame) -> list | None:
    """The bounded collect half of :func:`_cell_threshold_hits` —
    split out so streaming callers can pay it ONCE per query instead
    of once per micro-batch. None past the closure budget."""
    from margaret_spark.operators.similarity import _MATRIX_KERNEL_MAX_K

    e_rows = e_side.select("__ce", "__vo", "__no").limit(
        _MATRIX_KERNEL_MAX_K + 1
    ).collect()
    if not 0 < len(e_rows) <= _MATRIX_KERNEL_MAX_K:
        return None
    return e_rows


def _cell_threshold_hits_from_rows(
    vs: DataFrame,
    e_rows: list,
    threshold: float,
    round_digits: int,
) -> DataFrame:
    """The scoring half of :func:`_cell_threshold_hits` over
    pre-collected existing-side rows."""
    from margaret_spark.functions.vectors import group_dots

    by_cell: dict[int, list] = {}
    for r in e_rows:
        by_cell.setdefault(int(r["__ce"]), []).append(r)
    nos_map = F.create_map(
        *[
            x
            for cell, mem in by_cell.items()
            for x in (
                F.lit(cell).cast("long"),
                F.array(*[F.lit(float(m["__no"])) for m in mem]),
            )
        ]
    )
    known = sorted(by_cell)
    # rows in cells with NO existing member cannot match — routed
    # around the kernel (group_dots treats an absent cell as a
    # contract violation, and they would only cost)
    in_known = F.col("cent_id").isin(known)
    dots = group_dots(
        F.col("__v"),
        F.col("cent_id").cast("long"),
        {cell: [m["__vo"] for m in mem] for cell, mem in by_cell.items()},
    )
    hit = F.exists(
        F.zip_with(
            dots,
            F.element_at(nos_map, F.col("cent_id").cast("long")),
            lambda d, no: pround(d / (F.col("__n") * no), round_digits)
            >= F.lit(float(threshold)),
        ),
        lambda x: x,
    )
    scored = vs.where(in_known).select("id", "cent_id", hit.alias("__hit"))
    rest = vs.where(~in_known).select(
        "id", "cent_id", F.lit(False).alias("__hit")
    )
    return scored.unionByName(rest)


def semantic_dedup_incremental(
    new_rows: DataFrame,
    existing: DataFrame,
    k: int = 8,
    iters: int = 1,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
    batch_dups: bool = True,
) -> DataFrame:
    """Incremental SemDeDup — the daily-ingest form: label every NEW
    vector ``'dup_of_existing'`` (a same-cluster existing row within
    ``threshold`` cosine), ``'dup_in_batch'`` (no existing match, but
    an earlier — smaller-id — new row matches), or ``'new'``.

    ``batch_dups=False`` skips the new×new in-batch pass entirely —
    statuses are then only 'dup_of_existing'/'new'. Consumers that
    only ask "is this near the EXISTING set" (semantic
    decontamination: is this train doc near the test set) must pass
    False: the in-batch self-join is the dominant cost (O(|new|²/k)
    pair cosines) and cannot change their answer. The
    semantic member of the ingest-dedup matrix
    (``dedup.incremental_exact_dedup`` is the exact-content version;
    ``ngram_jaccard_join`` the near-dup text version).

    Clusters are fitted on the EXISTING corpus and FROZEN
    (:func:`similarity.kmeans_centroids_deterministic` — the
    at-ingest-model house rule: arrivals never move the cells), then
    both sides assign under the same deterministic rule. Pair checks
    are equality joins keyed on the cell — O(|new|·|cell|) cosines,
    never |new|·|existing|.

    Output: (``id_col``, cent_id, status) for every new row."""
    from margaret_spark.operators.similarity import (
        assign_to_centroids,
        kmeans_centroids_deterministic,
    )

    cents = kmeans_centroids_deterministic(
        existing, k=k, iters=iters, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits, comp_digits=comp_digits,
        sum_scale=sum_scale,
    )

    def _with_vec(df: DataFrame) -> DataFrame:
        # vector carried through the assignment projection (keep_vec)
        # — the former join re-scanned df to re-fetch it
        a = assign_to_centroids(
            df, cents, id_col, vec_col, round_digits, keep_vec="__v"
        )
        return (
            a.select(F.col(id_col).alias("id"), "cent_id", "__v")
            .localCheckpoint(eager=False)
        )

    anew = _with_vec(new_rows)
    aex = _with_vec(existing)
    # norms per row, before the pair joins (see semantic_dedup_pairs)
    sim = pround(
        pair_dot(F.col("__vn"), F.col("__vo"))
        / (F.col("__nn") * F.col("__no")),
        round_digits,
    )
    n_side = anew.select(
        F.col("id").alias("__idn"),
        "cent_id",
        F.col("__v").alias("__vn"),
        l2_norm(F.col("__v")).alias("__nn"),
    )
    e_side = aex.select(
        F.col("id").alias("__ido"),
        F.col("cent_id").alias("__ce"),
        F.col("__v").alias("__vo"),
        l2_norm(F.col("__v")).alias("__no"),
    )
    # r11: when the EXISTING side is bounded (semantic decontamination:
    # the eval split), score each new row against its cell's existing
    # vectors through the cell-keyed matrix kernel instead of the pair
    # join — O(|new|·d) Arrow bytes instead of O(pairs·2d); the cosine
    # is the identical pround tree on bit-equal dots. Past the closure
    # budget (the general big-existing dedup case) the pair join is
    # unchanged.
    hits = _cell_threshold_hits(
        n_side.select(
            F.col("__idn").alias("id"),
            "cent_id",
            F.col("__vn").alias("__v"),
            F.col("__nn").alias("__n"),
        ),
        e_side,
        threshold,
        round_digits,
    )
    if hits is not None:
        dup_ex = hits.where(F.col("__hit")).select(
            F.col("id").alias("__dup")
        )
    else:
        dup_ex = (
            n_side.join(e_side, F.col("cent_id") == F.col("__ce"))
            .where(sim >= F.lit(threshold))
            .select(F.col("__idn").alias("__dup"))
            .distinct()
        )
    out = anew.join(
        dup_ex.select(F.col("__dup").alias("id"), F.lit(1).alias("__in_ex")),
        "id",
        "left",
    )
    if not batch_dups:
        status = F.when(
            F.col("__in_ex").isNotNull(), F.lit("dup_of_existing")
        ).otherwise(F.lit("new"))
        return out.select(
            F.col("id").alias(id_col), "cent_id", status.alias("status")
        )
    b_side = anew.select(
        F.col("id").alias("__ido"),
        F.col("cent_id").alias("__ce"),
        F.col("__v").alias("__vo"),
        l2_norm(F.col("__v")).alias("__no"),
    )
    dup_batch = (
        n_side.join(
            b_side,
            (F.col("cent_id") == F.col("__ce"))
            & (F.col("__ido") < F.col("__idn")),
        )
        .where(sim >= F.lit(threshold))
        .select(F.col("__idn").alias("__dup"))
        .distinct()
    )
    status = (
        F.when(F.col("__in_ex").isNotNull(), F.lit("dup_of_existing"))
        .when(F.col("__in_b").isNotNull(), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return (
        out.join(
            dup_batch.select(
                F.col("__dup").alias("id"), F.lit(1).alias("__in_b")
            ),
            "id",
            "left",
        )
        .select(F.col("id").alias(id_col), "cent_id", status.alias("status"))
    )


def icbrt_ceil(n: int, floor: int = 4) -> int:
    """``max(floor, ceil(∛n))`` with an EXACT integer cube root — the
    per-level branching factor of the hierarchical quantizer. Two
    levels of b = ∛N give k1·k2 = N^(2/3) cells of expected size
    N^(1/3): assignment O(N·∛N) per level and within-cell pairs
    O(N·∛N) balance at N^(4/3) — strictly below the flat √N
    compromise's N^1.5 (see :func:`scaled_k`). The oracle derives the
    same value with a float-cbrt-plus-integer-correction subquery, so
    both engines agree on every n."""
    n = max(int(n), 0)
    if n == 0:
        return max(int(floor), 1)
    r = round(n ** (1.0 / 3.0))
    while r * r * r < n:
        r += 1
    while r > 1 and (r - 1) * (r - 1) * (r - 1) >= n:
        r -= 1
    return max(int(floor), r)


def hier_centroids(
    corpus: DataFrame,
    k1: int,
    k2: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """(cents, subc): the FIT half of the two-level hierarchical
    quantizer — coarse Lloyd centroids
    (:func:`similarity.kmeans_centroids_deterministic`, k1) plus a
    PER-CELL deterministic Lloyd over k2 sub-centroids, run for every
    cell at once as one DataFrame program (the sub-centroid table is
    keyed by (cent_id, sub_id); every stage joins on cent_id — no
    per-cell driver loop, never a k1·k2 cross join).

    Determinism contract matches the flat path exactly: sub-centroid
    init is the k2 lowest-id vectors per cell (sub_id = rank),
    assignment ranks by (pround'ed cosine desc, sub_id asc), means go
    through the pround/DECIMAL recipe, empty sub-cells keep their
    previous centroid. Freeze the returned tables for incremental /
    at-ingest assignment (:func:`assign_to_hier_centroids`) — the
    at-ingest-model house rule: arrivals never move the cells."""
    return _hier_fit_av(
        corpus, k1, k2, iters, id_col, vec_col,
        round_digits, comp_digits, sum_scale,
    )[:2]


def _hier_fit_av(
    corpus: DataFrame,
    k1: int,
    k2: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """:func:`hier_centroids` plus the checkpointed coarse-assigned
    vector table ``av`` (id, cent_id, __v, __vn) the fit already
    built — fit-then-self-assign callers reuse it instead of paying
    the coarse assignment pass and the vector join a second time
    (r11 optimization round: the recompute was a full corpus
    assignment + join per fit-and-assign query)."""
    from margaret_spark.operators.similarity import (
        kmeans_centroids_deterministic,
    )

    cents = kmeans_centroids_deterministic(
        corpus, k=k1, iters=iters, id_col=id_col, vec_col=vec_col,
        round_digits=round_digits, comp_digits=comp_digits,
        sum_scale=sum_scale,
    )
    av = _with_cell_vectors(corpus, cents, id_col, vec_col, round_digits)
    w0 = Window.partitionBy("cent_id").orderBy(F.col("id").asc())
    subc = (
        av.withColumn("__r", F.row_number().over(w0))
        .where(F.col("__r") <= k2)
        .select(
            "cent_id",
            F.col("__r").cast("int").alias("sub_id"),
            F.col("__v").alias("cent"),
        )
    )
    # Seed COARSE CELLS EMPTY AT FIT TIME (Lloyd keeps stale centroids
    # for cells no vector chose) with sub_id=1 = the coarse centroid
    # itself: every cent_id is guaranteed ≥1 sub-centroid, so
    # assign_to_hier_centroids keeps its per-row output contract for
    # new arrivals that land nearest to such a cell (the _sub_assign
    # equi-join would otherwise silently drop them). No fit-corpus row
    # belongs to an empty cell, so the fit iterations and every
    # non-empty cell's sub-centroids are unchanged.
    seed = cents.join(
        F.broadcast(subc.select("cent_id").distinct()), "cent_id", "left_anti"
    ).select(
        "cent_id", F.lit(1).cast("int").alias("sub_id"), F.col("cent")
    )
    subc = subc.unionByName(seed).localCheckpoint(eager=False)
    from margaret_spark.functions.numeric import dsum

    for _ in range(iters):
        # __v carried through the assignment projection — the former
        # join-back re-fetched a column already on the av row
        assigned = _sub_assign(av, subc, round_digits, keep=("__v",))
        dims = assigned.select(
            "cent_id",
            "sub_id",
            F.posexplode(F.col("__v")).alias("pos", "x"),
        ).withColumn("__c", pround(F.col("x"), comp_digits))
        means = (
            dims.groupBy("cent_id", "sub_id", "pos")
            .agg(
                pround(
                    dsum("__c", scale=sum_scale) / F.count("*"), comp_digits
                ).alias("m")
            )
            .groupBy("cent_id", "sub_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias(
                    "__pm"
                )
            )
            .select(
                "cent_id",
                "sub_id",
                F.transform(F.col("__pm"), lambda s: s["m"]).alias("cent"),
            )
        )
        subc = (
            subc.select("cent_id", "sub_id", F.col("cent").alias("__prev"))
            .join(means, ["cent_id", "sub_id"], "left")
            .select(
                "cent_id",
                "sub_id",
                F.coalesce(F.col("cent"), F.col("__prev")).alias("cent"),
            )
            .localCheckpoint(eager=False)
        )
    return cents, subc, av


def _with_cell_vectors(
    corpus: DataFrame,
    cents: DataFrame,
    id_col: str,
    vec_col: str,
    round_digits: int,
) -> DataFrame:
    """(id, cent_id, __v, __vn): coarse assignment under ``cents``
    with the row's cast vector and hoisted norm (the vectors.py rule)
    carried through the assignment projection — the former shape
    joined the assignment back onto a second corpus pass to re-fetch
    the vector (r11 optimization round). localCheckpoint'ed (house
    rule: iterated plans / self-join inputs)."""
    from margaret_spark.operators.similarity import assign_to_centroids

    coarse = assign_to_centroids(
        corpus, cents, id_col, vec_col, round_digits, keep_vec="__rawv"
    )
    cv = F.col("__rawv").cast("array<double>")
    return (
        coarse.select(
            F.col(id_col).alias("id"),
            "cent_id",
            cv.alias("__v"),
            l2_norm(cv).alias("__vn"),
        )
        .localCheckpoint(eager=False)
    )


def _sub_assign(
    av: DataFrame,
    subc: DataFrame,
    round_digits: int,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, cent_id, sub_id, __sim, *keep): nearest sub-centroid
    WITHIN each row's coarse cell — each row meets only ITS cell's
    ≤k2 sub-centroids, rank by (rounded cosine desc, sub_id asc).

    ``keep``: extra ``av`` columns carried through. On the kernel
    path the assignment is a NARROW projection over ``av``, so the
    vector (and its hoisted norm) ride along for free — callers that
    joined the output back onto ``av`` to re-fetch ``__v`` paid two
    exchanges per call for columns already on the row (r11
    optimization round, guide §2.4). The over-budget pair-scoring
    fallback keeps the join-back INTERNALLY (carrying the vector
    through its N·k2-row window shuffle would cost more than the
    N-row join), so both paths return the same columns.

    r11: scoring goes through the cell-keyed ranking kernel
    (``functions.vectors.group_best``) when the sub-centroid table
    fits the closure budget. The equi-join + ``pair_dot`` shape
    shipped BOTH vectors per (row × sub) pair through the Arrow pipe
    (O(N·k2·d) bytes) and then paid a ``row_number`` window — a full
    shuffle+sort of N·k2 rows — per call; the kernel ships each row
    vector once (O(N·d)), scores its cell's members with the
    identical per-dimension left fold + pround IEEE tree, and returns
    ONLY the winner (ties → lowest sub_id, Spark's window order), so
    the output rows are bit-equal with no explode and no exchange.
    Norms still come from the same JVM ``l2_norm`` fold, collected
    once. Past the budget the original pair-scoring join is used
    unchanged."""
    from margaret_spark.functions.vectors import group_best
    from margaret_spark.operators.similarity import _MATRIX_KERNEL_MAX_K

    w = Window.partitionBy("id").orderBy(
        F.col("__sim").desc(), F.col("sub_id").asc()
    )
    rows = subc.select(
        "cent_id", "sub_id", "cent", l2_norm(F.col("cent")).alias("__cn")
    ).collect()
    if 0 < len(rows) <= _MATRIX_KERNEL_MAX_K:
        by_cell: dict[int, list] = {}
        # members sorted by sub_id asc per cell — the kernel's
        # ties→lowest-index rule IS the (sub_id asc) tiebreak then
        for r in sorted(rows, key=lambda r: (r["cent_id"], int(r["sub_id"]))):
            by_cell.setdefault(int(r["cent_id"]), []).append(r)
        best = group_best(
            F.col("__v"),
            F.col("cent_id").cast("long"),
            F.col("__vn"),
            {cell: [m["cent"] for m in mem] for cell, mem in by_cell.items()},
            {cell: [int(m["sub_id"]) for m in mem] for cell, mem in by_cell.items()},
            {cell: [float(m["__cn"]) for m in mem] for cell, mem in by_cell.items()},
            mode="cosine",
            round_digits=round_digits,
        )
        return av.select("id", "cent_id", *keep, best.alias("__b")).select(
            "id",
            "cent_id",
            F.col("__b.i").cast("int").alias("sub_id"),
            F.col("__b.s").alias("__sim"),
            *keep,
        )
    scored = av.join(
        subc.withColumn("__cn", l2_norm(F.col("cent"))), "cent_id"
    ).withColumn(
        "__sim",
        pround(
            pair_dot(F.col("__v"), F.col("cent"))
            / (F.col("__vn") * F.col("__cn")),
            round_digits,
        ),
    )
    out = (
        scored.select("id", "cent_id", "sub_id", "__sim")
        .withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") == 1)
        .select("id", "cent_id", "sub_id", "__sim")
    )
    if keep:
        out = out.join(av.select("id", *keep), "id").select(
            "id", "cent_id", "sub_id", "__sim", *keep
        )
    return out


def assign_to_hier_centroids(
    df: DataFrame,
    cents: DataFrame,
    subc: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    keep_vec: str | None = None,
) -> DataFrame:
    """(id_col, cent_id, sub_id, cosine): nearest (coarse, sub) cell
    per row under FROZEN :func:`hier_centroids` tables — the
    assignment half, usable for incremental / at-ingest arrivals.
    ``cosine`` is to the winning SUB-centroid.

    ``keep_vec``: also return the row's cast ``array<double>`` vector
    under this name — carried through the assignment projection, so
    callers that need (assignment, vector) stop joining the output
    back onto a second pass over ``df`` (r11 optimization round)."""
    av = _with_cell_vectors(df, cents, id_col, vec_col, round_digits)
    keep = ("__v",) if keep_vec is not None else ()
    sel = [
        F.col("id").alias(id_col),
        "cent_id",
        "sub_id",
        F.col("__sim").alias("cosine"),
    ]
    if keep_vec is not None:
        sel.append(F.col("__v").alias(keep_vec))
    return _sub_assign(av, subc, round_digits, keep=keep).select(*sel)


def _hier_assigned_with_vectors(
    corpus: DataFrame,
    k1: int,
    k2: int,
    iters: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
    comp_digits: int,
    sum_scale: int,
) -> DataFrame:
    """(id, cent_id, sub_id, cosine, __v, __vn): fit + self-assign —
    :func:`hier_centroids` composed with the final
    :func:`_sub_assign` pass over the fitted tables. The fit's own
    coarse-assigned vector table is REUSED (``_hier_fit_av``) and the
    vectors ride the assignment projection (``keep``) — the former
    shape recomputed the coarse assignment + vector join and then
    joined the vectors back a second time. Values identical (same
    expression trees over the same rows; oracle parity pinned by the
    graded dedup_semantic_hier* queries)."""
    cents, subc, av = _hier_fit_av(
        corpus, k1, k2, iters, id_col, vec_col,
        round_digits, comp_digits, sum_scale,
    )
    final = _sub_assign(av, subc, round_digits, keep=("__v", "__vn"))
    return (
        final.select(
            "id", "cent_id", "sub_id",
            F.col("__sim").alias("cosine"), "__v", "__vn",
        )
        .localCheckpoint(eager=False)
    )


def semantic_dedup_pairs_hier(
    corpus: DataFrame,
    k1: int = 4,
    k2: int = 4,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """Hierarchical SemDeDup pair stage: near-dup pairs within the
    (cent_id, sub_id) cells of the two-level quantizer — the LINEAR-
    PATH variant of :func:`semantic_dedup_pairs` (flat √N clustering
    balances at N^1.5; two ∛N levels balance at N^(4/3), and each
    further level multiplies another N^ε off — the IVF-tree argument,
    Jégou et al. 2011 §IVF). Same output contract as the flat pairs
    plus the sub_id column; same determinism recipe end-to-end.

    Pass ``assigned`` (from :func:`_hier_assigned_with_vectors`) to
    share the quantizer with :func:`semantic_prune_hier`."""
    if assigned is None:
        assigned = _hier_assigned_with_vectors(
            corpus, k1, k2, iters, id_col, vec_col,
            round_digits, comp_digits, sum_scale,
        )
    a = assigned.select(
        F.col("id").alias("id_a"), "cent_id", "sub_id",
        F.col("__v").alias("__va"), F.col("__vn").alias("__na"),
    )
    b = assigned.select(
        F.col("id").alias("id_b"),
        F.col("cent_id").alias("__cb"),
        F.col("sub_id").alias("__sb"),
        F.col("__v").alias("__vb"),
        F.col("__vn").alias("__nb"),
    )
    sim = pround(
        pair_dot(F.col("__va"), F.col("__vb"))
        / (F.col("__na") * F.col("__nb")),
        round_digits,
    )
    return (
        a.join(
            b,
            (F.col("cent_id") == F.col("__cb"))
            & (F.col("sub_id") == F.col("__sb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("cosine", sim)
        .where(F.col("cosine") >= F.lit(threshold))
        .select("id_a", "id_b", "cent_id", "sub_id", "cosine")
    )


def semantic_prune_hier(
    corpus: DataFrame,
    k1: int = 4,
    k2: int = 4,
    iters: int = 2,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> DataFrame:
    """Hierarchical SemDeDup keeps: drop every row dominated by a
    smaller-id row in the same (cent_id, sub_id) cell within
    ``threshold`` cosine — :func:`semantic_prune` over the two-level
    quantizer. Output (id_col, cent_id, sub_id, cent_cosine)."""
    assigned = _hier_assigned_with_vectors(
        corpus, k1, k2, iters, id_col, vec_col,
        round_digits, comp_digits, sum_scale,
    )
    pairs = semantic_dedup_pairs_hier(
        corpus, k1, k2, iters, threshold, id_col, vec_col,
        round_digits, comp_digits, sum_scale, assigned=assigned,
    )
    doomed = pairs.select(F.col("id_b").alias("id")).distinct()
    return (
        assigned.join(doomed, "id", "left_anti")
        .select(
            F.col("id").alias(id_col),
            "cent_id",
            "sub_id",
            F.col("cosine").alias("cent_cosine"),
        )
    )


def semantic_dedup_incremental_hier(
    new_rows: DataFrame,
    existing: DataFrame,
    k1: int = 4,
    k2: int = 4,
    iters: int = 1,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
    batch_dups: bool = True,
) -> DataFrame:
    """Incremental SemDeDup over the TWO-LEVEL quantizer: the
    hierarchical twin of :func:`semantic_dedup_incremental` — the
    quantizer is fitted on the EXISTING corpus and FROZEN
    (:func:`hier_centroids`), both sides assign under the same
    deterministic rule, and pair checks are equality joins keyed on
    the (cent_id, sub_id) cell — O(|new|·|sub-cell|) cosines, the
    N^(4/3) family's ingest form. Statuses and the ``batch_dups``
    contract match the flat twin exactly. Output:
    (``id_col``, cent_id, sub_id, status) for every new row."""
    cents, subc = hier_centroids(
        existing, k1, k2, iters, id_col, vec_col,
        round_digits, comp_digits, sum_scale,
    )

    def _with_vec(df: DataFrame) -> DataFrame:
        # the vector rides the assignment projection (keep_vec) —
        # the former join re-scanned df to re-fetch it
        a = assign_to_hier_centroids(
            df, cents, subc, id_col, vec_col, round_digits,
            keep_vec="__v",
        )
        return (
            a.select(F.col(id_col).alias("id"), "cent_id", "sub_id", "__v")
            .localCheckpoint(eager=False)
        )

    anew = _with_vec(new_rows)
    aex = _with_vec(existing)
    sim = pround(
        pair_dot(F.col("__vn"), F.col("__vo"))
        / (F.col("__nn") * F.col("__no")),
        round_digits,
    )
    n_side = anew.select(
        F.col("id").alias("__idn"),
        "cent_id",
        "sub_id",
        F.col("__v").alias("__vn"),
        l2_norm(F.col("__v")).alias("__nn"),
    )
    e_side = aex.select(
        F.col("id").alias("__ido"),
        F.col("cent_id").alias("__ce"),
        F.col("sub_id").alias("__se"),
        F.col("__v").alias("__vo"),
        l2_norm(F.col("__v")).alias("__no"),
    )
    cell_eq = (F.col("cent_id") == F.col("__ce")) & (
        F.col("sub_id") == F.col("__se")
    )
    dup_ex = (
        n_side.join(e_side, cell_eq)
        .where(sim >= F.lit(threshold))
        .select(F.col("__idn").alias("__dup"))
        .distinct()
    )
    out = anew.join(
        dup_ex.select(F.col("__dup").alias("id"), F.lit(1).alias("__in_ex")),
        "id",
        "left",
    )
    if not batch_dups:
        status = F.when(
            F.col("__in_ex").isNotNull(), F.lit("dup_of_existing")
        ).otherwise(F.lit("new"))
        return out.select(
            F.col("id").alias(id_col), "cent_id", "sub_id",
            status.alias("status"),
        )
    b_side = anew.select(
        F.col("id").alias("__ido"),
        F.col("cent_id").alias("__ce"),
        F.col("sub_id").alias("__se"),
        F.col("__v").alias("__vo"),
        l2_norm(F.col("__v")).alias("__no"),
    )
    dup_batch = (
        n_side.join(b_side, cell_eq & (F.col("__ido") < F.col("__idn")))
        .where(sim >= F.lit(threshold))
        .select(F.col("__idn").alias("__dup"))
        .distinct()
    )
    status = (
        F.when(F.col("__in_ex").isNotNull(), F.lit("dup_of_existing"))
        .when(F.col("__in_b").isNotNull(), F.lit("dup_in_batch"))
        .otherwise(F.lit("new"))
    )
    return (
        out.join(
            dup_batch.select(
                F.col("__dup").alias("id"), F.lit(1).alias("__in_b")
            ),
            "id",
            "left",
        )
        .select(
            F.col("id").alias(id_col), "cent_id", "sub_id",
            status.alias("status"),
        )
    )


def hier_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: int = 4,
    k2: int = 4,
    iters: int = 2,
    nprobe1: int = 2,
    nprobe2: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    cents: DataFrame | None = None,
    subc: DataFrame | None = None,
    broadcast_model: bool = True,
) -> DataFrame:
    """Two-level IVF ANN over the hierarchical quantizer: a query
    first picks its ``nprobe1`` nearest COARSE cells (broadcast k1
    table), then the ``nprobe2`` nearest SUB-cells among those cells'
    sub-centroids, and scores only those sub-cells' members — the
    probe fan-in is nprobe1·k2 sub-centroid scorings instead of a
    flat index's k1·k2, and the candidate mass is sub-cell-sized
    (≈N/(k1·k2) per probe) instead of coarse-cell-sized. The serving
    twin of the N^(4/3) SemDeDup family: one quantizer fit serves
    both dedup and search. Pass frozen ``cents``/``subc``
    (:func:`hier_centroids`) to skip the fit.

    Deterministic end-to-end: every ranking is (rounded cosine desc,
    id asc); sub-probes break ties (cent_id asc, sub_id asc).
    Output (query_id, neighbor_id, cosine, rank). Recall < 1 by
    design (ANN trade) — measure with ``similarity.topk_recall``."""
    if cents is None or subc is None:
        cents, subc = hier_centroids(
            corpus, k1, k2, iters, id_col, vec_col, round_digits
        )
    ca = assign_to_hier_centroids(
        corpus, cents, subc, id_col, vec_col, round_digits,
        keep_vec="__cv",
    )
    cells = ca.select(
        F.col(id_col).alias("neighbor_id"),
        "cent_id",
        "sub_id",
        "__cv",
        l2_norm(F.col("__cv")).alias("__cn"),
    )
    probes = _hier_probes(
        queries, cents, subc, nprobe1, nprobe2, id_col, vec_col,
        round_digits, broadcast_model,
    )
    return _hier_topk_over_members(probes, cells, k, round_digits)


def _hier_probes(
    queries: DataFrame,
    cents: DataFrame,
    subc: DataFrame,
    nprobe1: int,
    nprobe2: int,
    id_col: str,
    vec_col: str,
    round_digits: int,
    broadcast_model: bool = True,
) -> DataFrame:
    """(query_id, cent_id, sub_id, __qv, __qn): each query's
    ``nprobe2`` probed sub-cells among its ``nprobe1`` nearest coarse
    cells — coarse rank (rounded cosine desc, cent_id asc), sub rank
    (rounded cosine desc, cent_id asc, sub_id asc). The probe half of
    :func:`hier_ivf_topk`, shared with the persisted-index serving
    path (:func:`hier_index_search`) so both rank identically."""
    from margaret_spark.operators.similarity import _nearest_cells

    bc = F.broadcast(
        cents.select(
            "cent_id",
            F.col("cent").alias("__cent"),
            l2_norm(F.col("cent")).alias("__centn"),
        )
    )
    probes1 = _nearest_cells(
        queries, bc, id_col, vec_col, "query_id", nprobe1, round_digits
    )
    # k1·k2·d model values broadcast by default (serving: the probe
    # side is tiny); at extreme quantizer sizes pass
    # broadcast_model=False and let the planner pick the build side
    sub_tbl = subc.withColumn("__sn", l2_norm(F.col("cent")))
    if broadcast_model:
        sub_tbl = F.broadcast(sub_tbl)
    sub_scored = probes1.join(sub_tbl, "cent_id").withColumn(
        "__ssim",
        pround(
            pair_dot(F.col("__v"), F.col("cent"))
            / (F.col("__n") * F.col("__sn")),
            round_digits,
        ),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("__ssim").desc(), F.col("cent_id").asc(), F.col("sub_id").asc()
    )
    return (
        sub_scored.select(
            "query_id", "cent_id", "sub_id", "__ssim", "__v", "__n"
        )
        .withColumn("__pr", F.row_number().over(w2))
        .where(F.col("__pr") <= nprobe2)
        .select(
            "query_id", "cent_id", "sub_id",
            F.col("__v").alias("__qv"), F.col("__n").alias("__qn"),
        )
    )


def _hier_topk_over_members(
    probes: DataFrame, cells: DataFrame, k: int, round_digits: int
) -> DataFrame:
    """(query_id, neighbor_id, cosine, rank): exact cosine top-k of
    each query over its probed sub-cells' members (self excluded) —
    the scoring tail shared by :func:`hier_ivf_topk` and
    :func:`hier_index_search`. ``cells`` carries (neighbor_id,
    cent_id, sub_id, __cv, __cn)."""
    cos = pair_dot(F.col("__qv"), F.col("__cv")) / (
        F.col("__qn") * F.col("__cn")
    )
    scored = (
        probes.join(cells, ["cent_id", "sub_id"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", pround(cos, round_digits))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def build_hier_index(
    corpus: DataFrame,
    path: str,
    k1: int | None = None,
    k2: int | None = None,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> None:
    """Persist the two-level hierarchical index (VERDICT r9 ask #2 —
    the ``build_ivfpq_index`` treatment for the hier family):
    ``<path>/cents`` (k1 coarse centroids), ``<path>/subc`` (the
    per-cell sub-centroids incl. the empty-cell seed), and
    ``<path>/vectors`` — each corpus vector + its precomputed norm
    written Hive-partitioned by (cell, sub), so serving reads only
    the probed sub-cells under dynamic partition pruning. The fit is
    paid ONCE at build; :func:`hier_index_search` then costs only the
    probe stages. ``k1``/``k2`` default to the icbrt branching rule
    (:func:`icbrt_ceil`) from the corpus count."""
    if k1 is None or k2 is None:
        n = corpus.count()
        b = icbrt_ceil(n, 4)
        k1 = b if k1 is None else k1
        k2 = b if k2 is None else k2
    cents, subc = hier_centroids(
        corpus, k1, k2, iters, id_col, vec_col,
        round_digits, comp_digits, sum_scale,
    )
    cents.write.mode("overwrite").parquet(f"{path}/cents")
    subc.write.mode("overwrite").parquet(f"{path}/subc")
    spark = corpus.sparkSession
    # assign under the PERSISTED model (re-read), so build == append
    # == serve all use the same frozen tables
    fc = spark.read.parquet(f"{path}/cents")
    fs = spark.read.parquet(f"{path}/subc")
    ca = assign_to_hier_centroids(
        corpus, fc, fs, id_col, vec_col, round_digits, keep_vec="vec"
    )
    (
        ca.select(
            F.col("cent_id").alias("cell"),
            F.col("sub_id").alias("sub"),
            F.col(id_col).alias("id"),
            "vec",
            l2_norm(F.col("vec")).alias("vn"),
        )
        .write.mode("overwrite")
        .partitionBy("cell", "sub")
        .parquet(f"{path}/vectors")
    )


def hier_index_append(
    spark,
    path: str,
    arrivals: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> None:
    """Append new vectors to a persisted :func:`build_hier_index`
    under the FROZEN quantizer (arrivals never move the cells — the
    at-ingest-model house rule): assign each arrival its (cell, sub)
    and append to the partitioned vector table; only the touched
    sub-cell partitions gain files. The empty-cell seed guarantees
    every arrival lands somewhere."""
    cents = spark.read.parquet(f"{path}/cents")
    subc = spark.read.parquet(f"{path}/subc")
    ca = assign_to_hier_centroids(
        arrivals, cents, subc, id_col, vec_col, round_digits,
        keep_vec="vec",
    )
    (
        ca.select(
            F.col("cent_id").alias("cell"),
            F.col("sub_id").alias("sub"),
            F.col(id_col).alias("id"),
            "vec",
            l2_norm(F.col("vec")).alias("vn"),
        )
        .write.mode("append")
        .partitionBy("cell", "sub")
        .parquet(f"{path}/vectors")
    )


def hier_index_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe1: int = 2,
    nprobe2: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> DataFrame:
    """Top-k against a persisted :func:`build_hier_index` —
    (query_id, neighbor_id, cosine, rank), identical results to the
    in-flight :func:`hier_ivf_topk` under the same frozen model
    (pinned in tests). The probe set is broadcast and joined on the
    raw (cell, sub) partition columns, so dynamic partition pruning
    cuts the vector scan to O(probed sub-cells) ≈ nprobe2·N/(k1·k2)
    rows — the serving shape that turns the 15 s cold fit into a
    probe-stage-only query."""
    cents = spark.read.parquet(f"{path}/cents")
    subc = spark.read.parquet(f"{path}/subc")
    probes = _hier_probes(
        queries, cents, subc, nprobe1, nprobe2, id_col, vec_col,
        round_digits,
    )
    members = spark.read.parquet(f"{path}/vectors")
    mt = dict(members.dtypes)
    # cast the BUILD side to the inferred partition-column types (the
    # scan side must stay a bare column reference or partition
    # pruning can't fire)
    p2 = probes.select(
        "query_id",
        F.col("cent_id").cast(mt["cell"]).alias("cell"),
        F.col("sub_id").cast(mt["sub"]).alias("sub"),
        "__qv",
        "__qn",
    )
    joined = members.join(F.broadcast(p2), ["cell", "sub"]).select(
        F.col("cell").alias("cent_id"),
        F.col("sub").alias("sub_id"),
        F.col("id").alias("neighbor_id"),
        F.col("vec").alias("__cv"),
        F.col("vn").alias("__cn"),
        "query_id",
        "__qv",
        "__qn",
    )
    cos = pair_dot(F.col("__qv"), F.col("__cv")) / (
        F.col("__qn") * F.col("__cn")
    )
    scored = joined.where(
        F.col("query_id") != F.col("neighbor_id")
    ).withColumn("cosine", pround(cos, round_digits))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
