"""Product quantization (PQ) ANN — Jégou, Douze, Schmid 2011,
"Product Quantization for Nearest Neighbor Search" — implemented
Spark-first on public knowledge only.

PQ is *the* memory answer for embedding search at 100 TB: a D-dim
float32 vector (256 bytes at D=64) compresses to ``m`` one-byte codes
(4 bytes at m=4) — 64× — while distance evaluation against a query
needs only a per-query lookup table (ADC, asymmetric distance
computation) instead of the original vectors. The repo's int8 path
(:mod:`quantize`) compresses 4×; PQ completes the quantization
ladder (float → int8 → PQ codes).

Construction, re-expressed relationally:

- **Subvectors**: each vector splits into ``m`` contiguous slices of
  width D/m → rows ``(id, sub, sv)``. One narrow projection, no
  shuffle.
- **Codebooks** (:func:`pq_train`): an independent k-means per
  subspace, trained for ALL subspaces in one DataFrame program keyed
  on ``sub`` — the same deterministic Lloyd recipe the repo's graded
  k-means uses (init = the ``codes`` lowest-id rows' slices;
  assignment by pround'ed squared L2 with code-id tiebreak; means via
  the pround/DECIMAL order-independent recipe), so a fixed iteration
  count is hash-exact cross-engine. Squared L2 is evaluated through
  the dot identity ``‖a−c‖² = a·a + c·c − 2·a·c`` so every distance
  reuses the proven-portable left-fold dot product.
- **Encode** (:func:`pq_encode`): nearest code per (id, sub) — a
  broadcast join against the m·k-row codebook plus one (id, sub)
  window; the corpus never shuffles on its vectors.
- **ADC search** (:func:`pq_topk`): per query, a lookup table
  ``LUT[sub][code] = ‖q_sub − cent‖²`` (q·m·k rows — always
  broadcastable); the approximate distance of a corpus row is the
  DECIMAL-exact sum of its m looked-up entries; top-k by
  (distance asc, id asc). The scan side touches only the code
  table — at scale the original vectors stay cold on disk.

Scale shape: train shuffles (id, sub)-keyed assignment rows and
(sub, code, dim)-keyed mean contributions — never the corpus
vectors; encode is broadcast-join + window; search is
broadcast-LUT join + one (query, id) aggregation. Nothing is
driver-bottlenecked; the codebook (m·k·D/m doubles) is KB-sized at
any corpus scale.

Reference parity anchor: the reference engine (a log/index store)
has no vector operators — this module is part of the
beyond-reference LLM-pipeline surface the build brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.vectors import infer_dim, pair_dot


def _subvectors(
    df: DataFrame, m: int, id_col: str, vec_col: str, width: int
) -> DataFrame:
    """(id, sub, sv, nsq): the m contiguous slices of every vector,
    with the slice's raw self-dot (the ``a·a`` term of the distance
    identity) computed once per row.

    The self-dot stays on the Arrow ``pair_dot`` kernel deliberately:
    an r11 A/B (4 alternating best-of-3 runs per query, sf0.1)
    measured the JVM unrolled fold (``vectors.dot(sv, sv, width)`` —
    the documented bit-equal twin) consistently SLOWER on every PQ
    query (ann_pq_topk 2.14→2.78 s, distortion 1.86→2.09,
    recall 3.48→4.15): 2·width array reads per exploded row in the
    generated consume method cost more than one batched Arrow
    round-trip of the slices."""
    slices = F.array(
        *[F.slice(F.col(vec_col), s * width + 1, width) for s in range(m)]
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(slices).alias("sub", "sv"),
    ).withColumn("nsq", pair_dot(F.col("sv"), F.col("sv")))


def _dist2(nsq_v, nsq_c, dot, round_digits: int):
    """pround'ed squared L2 via the dot identity — the identical
    IEEE expression tree the SQL oracle evaluates."""
    return pround((nsq_v + nsq_c) - (F.lit(2.0) * dot), round_digits)


def _with_nsq(cb: DataFrame) -> DataFrame:
    return cb.withColumn("cnsq", pair_dot(F.col("cent"), F.col("cent")))


def _assign(sv: DataFrame, cb: DataFrame, round_digits: int) -> DataFrame:
    """Nearest code per (id, sub): pround'ed squared-L2 rank with
    code-id tiebreak. Keeps sv for the means.

    r11: scoring goes through the subspace-keyed ranking kernel
    (``functions.vectors.group_best``) when the codebook fits the
    closure budget (m·codes rows — KB-sized by construction). The
    broadcast join + ``pair_dot`` shape shipped BOTH slices per
    (row-slice × code) pair through the Arrow pipe (O(N·m·codes·w)
    bytes) and then paid a ``row_number`` window — a full
    shuffle+sort of N·m·codes rows — per call; the kernel ships each
    slice once, scores its subspace's codes with the identical
    per-dimension left fold + the same ``_dist2`` IEEE tree, and
    returns ONLY the winner (ties → lowest code_id, Spark's window
    order), so the output rows are bit-equal with no explode and no
    exchange (``cnsq`` is collected from the same ``pair_dot`` column
    it joined before). Past the budget the original join is
    unchanged."""
    from margaret_spark.functions.vectors import group_best
    from margaret_spark.operators.similarity import _MATRIX_KERNEL_MAX_K

    w = Window.partitionBy("id", "sub").orderBy(
        F.col("__d2").asc(), F.col("code_id").asc()
    )
    rows = cb.select("sub", "code_id", "cent", "cnsq").collect()
    if 0 < len(rows) <= _MATRIX_KERNEL_MAX_K:
        by_sub: dict[int, list] = {}
        # members sorted by code_id asc per subspace — the kernel's
        # ties→lowest-index rule IS the (code_id asc) tiebreak then
        for r in sorted(rows, key=lambda r: (int(r["sub"]), r["code_id"])):
            by_sub.setdefault(int(r["sub"]), []).append(r)
        best = group_best(
            F.col("sv"),
            F.col("sub").cast("long"),
            F.col("nsq"),
            {sub: [m["cent"] for m in mem] for sub, mem in by_sub.items()},
            {sub: [int(m["code_id"]) for m in mem] for sub, mem in by_sub.items()},
            {sub: [float(m["cnsq"]) for m in mem] for sub, mem in by_sub.items()},
            mode="dist2",
            round_digits=round_digits,
        )
        return sv.select("id", "sub", "sv", best.alias("__b")).select(
            "id",
            "sub",
            F.col("__b.i").alias("code_id"),
            "sv",
            F.col("__b.s").alias("dist2"),
        )
    scored = sv.join(F.broadcast(cb), "sub").withColumn(
        "__d2",
        _dist2(
            F.col("nsq"),
            F.col("cnsq"),
            pair_dot(F.col("sv"), F.col("cent")),
            round_digits,
        ),
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("id", "sub", "code_id", "sv", F.col("__d2").alias("dist2"))
    )


def pq_train(
    corpus: DataFrame,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Train per-subspace codebooks: (sub, code_id, cent
    array<double>, cnsq). Deterministic: init = the ``codes``
    lowest-id rows' slices (code_id = that row's id, mirroring the
    k-means cent_id convention); ``iters`` Lloyd rounds with the
    pround/DECIMAL mean recipe; empty codes keep their previous
    centroid so k never silently shrinks."""
    if m < 1 or codes < 1 or iters < 0:
        raise ValueError(f"bad PQ params: m={m} codes={codes} iters={iters}")
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    if dim is None:
        raise ValueError("cannot train PQ codebooks on an empty corpus")
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    width = dim // m
    sv = _subvectors(corpus, m, id_col, vec_col, width)
    cb = _with_nsq(
        _subvectors(
            corpus.orderBy(F.col(id_col).asc()).limit(codes),
            m,
            id_col,
            vec_col,
            width,
        ).select("sub", F.col("id").alias("code_id"), F.col("sv").alias("cent"))
    ).localCheckpoint(eager=False)
    for _ in range(iters):
        assigned = _assign(sv, cb, round_digits)
        dims = assigned.select(
            "sub",
            "code_id",
            F.posexplode(F.col("sv").cast("array<double>")).alias("pos", "x"),
        ).withColumn("__c", pround(F.col("x"), comp_digits))
        means = (
            dims.groupBy("sub", "code_id", "pos")
            .agg(
                pround(
                    dsum("__c", scale=sum_scale) / F.count("*"), comp_digits
                ).alias("mval")
            )
            .groupBy("sub", "code_id")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("__pm")
            )
            .select(
                "sub",
                "code_id",
                F.transform(F.col("__pm"), lambda s: s["mval"]).alias("cent"),
            )
        )
        # empty codes keep their previous centroid (see kmeans_centroids)
        cb = _with_nsq(
            cb.select("sub", "code_id", F.col("cent").alias("__prev"))
            .join(means, ["sub", "code_id"], "left")
            .select(
                "sub",
                "code_id",
                F.coalesce(F.col("cent"), F.col("__prev")).alias("cent"),
            )
        ).localCheckpoint(eager=False)
    return cb


def pq_encode(
    corpus: DataFrame,
    codebooks: DataFrame,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    dim: int | None = None,
) -> DataFrame:
    """(``id_col``, sub, code_id, dist2): each vector's nearest code
    per subspace under the trained codebooks — the 1-byte-per-
    subspace compressed representation, plus the pround'ed quantization
    error term. Broadcast join + one (id, sub) window; no vector
    shuffle."""
    if dim is None:
        dim = infer_dim(corpus, vec_col)
    if dim is None:
        raise ValueError("cannot encode an empty corpus")
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    sv = _subvectors(corpus, m, id_col, vec_col, dim // m)
    return _assign(sv, codebooks, round_digits).select(
        F.col("id").alias(id_col), "sub", "code_id", "dist2"
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> DataFrame:
    """IVFADC — the composed IVF + residual-PQ search (Jégou et al.
    2011 §V): (query_id, ``id_col``, adist, rank).

    1. The corpus buckets into ``nlist`` seeded cells (the lowest-id
       vectors as centroids — the same deterministic convention as
       ``ann_ivf``, so cell membership is oracle-expressible).
    2. PQ codebooks train on the RESIDUALS ``v − cent(cell)`` —
       residuals concentrate near 0 so a small codebook spends its
       precision where the data is; one global codebook (the classic
       IVFADC layout).
    3. A query probes its ``nprobe`` nearest cells; per probed cell
       its own residual ``q − cent`` builds a broadcast ADC lookup
       table, and only that cell's code rows are scored — the
       per-query work is |probed cells| · codes LUT entries plus a
       code-table join, never a corpus scan.

    This is the 100 TB serving shape: the index is (cell, m codes)
    per vector — bytes, not the float vectors — partition-prunable by
    cell and scored by a broadcast LUT join. Self-matches are
    excluded (``ann_ivf`` convention). Hash-exact: every distance is
    the pround'ed dot-identity tree over DECIMAL-exact sums."""
    dim = infer_dim(corpus, vec_col)
    if dim is None:
        raise ValueError("cannot build an IVFPQ index on an empty corpus")
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    from margaret_spark.operators.similarity import _nearest_cells

    from margaret_spark.functions.vectors import l2_norm

    cents = F.broadcast(
        corpus.orderBy(F.col(id_col).asc())
        .limit(nlist)
        .select(
            F.col(id_col).alias("cent_id"),
            F.col(vec_col).alias("__cent"),
            l2_norm(F.col(vec_col)).alias("__centn"),
        )
        .localCheckpoint(eager=False)
    )
    residual = F.zip_with(
        F.col("__v"),
        F.col("__cent"),
        lambda x, y: x.cast("double") - y.cast("double"),
    )
    res = (
        _nearest_cells(corpus, cents, id_col, vec_col, "id", 1, round_digits)
        .join(F.broadcast(cents.select("cent_id", "__cent")), "cent_id")
        .select(
            "id",
            F.col("cent_id").alias("cell"),
            residual.alias("res"),
        )
        .localCheckpoint(eager=False)
    )
    cb = pq_train(
        res, m, codes, iters, id_col="id", vec_col="res",
        round_digits=round_digits, comp_digits=comp_digits,
        sum_scale=sum_scale, dim=dim,
    )
    enc = pq_encode(res, cb, m, id_col="id", vec_col="res",
                    round_digits=round_digits, dim=dim)
    enc = enc.join(res.select("id", "cell"), "id")
    probes = (
        _nearest_cells(queries, cents, id_col, vec_col, "query_id",
                       nprobe, round_digits)
        .join(F.broadcast(cents.select("cent_id", "__cent")), "cent_id")
        .select(
            "query_id",
            F.col("cent_id").alias("cell"),
            residual.alias("qres"),
        )
    )
    width = dim // m
    qslices = F.array(
        *[F.slice(F.col("qres"), s * width + 1, width) for s in range(m)]
    )
    qsv = probes.select(
        "query_id", "cell", F.posexplode(qslices).alias("sub", "sv")
    ).withColumn("nsq", pair_dot(F.col("sv"), F.col("sv")))
    lut = (
        qsv.join(F.broadcast(cb), "sub")
        .withColumn(
            "__ld2",
            _dist2(
                F.col("nsq"),
                F.col("cnsq"),
                pair_dot(F.col("sv"), F.col("cent")),
                round_digits,
            ),
        )
        .select("query_id", "cell", "sub", "code_id",
                F.col("__ld2").alias("__qd2"))
    )
    scored = (
        enc.join(F.broadcast(lut), ["cell", "sub", "code_id"])
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", "id")
        .agg(dsum("__qd2", scale=sum_scale).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "adist", "rank")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
    codebooks: DataFrame | None = None,
    encoded: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k: (query_id, ``id_col``, adist, rank) — for each
    query, the ``k`` corpus rows with the smallest approximate
    squared L2 distance ``Σ_sub ‖q_sub − cent(code_sub)‖²``.

    The LUT (one pround'ed subspace distance per (query, sub, code) —
    q·m·codes rows) is broadcast; the probe side is the CODE table,
    not the vectors; the per-row distance is a DECIMAL-exact sum of
    its m looked-up entries (order-independent, hash-exact). Ties
    break on id. Pass ``codebooks``/``encoded`` to reuse a trained
    index; otherwise both are derived from the corpus."""
    if codebooks is None:
        codebooks = pq_train(
            corpus, m, codes, iters, id_col, vec_col,
            round_digits, comp_digits, sum_scale,
        )
    if encoded is None:
        encoded = pq_encode(
            corpus, codebooks, m, id_col, vec_col, round_digits
        )
    dim = infer_dim(queries, vec_col)
    if dim is None:
        raise ValueError("empty query set")
    qsv = _subvectors(queries, m, id_col, vec_col, dim // m)
    lut = (
        qsv.join(F.broadcast(codebooks), "sub")
        .withColumn(
            "__ld2",
            _dist2(
                F.col("nsq"),
                F.col("cnsq"),
                pair_dot(F.col("sv"), F.col("cent")),
                round_digits,
            ),
        )
        .select(
            F.col("id").alias("query_id"),
            "sub",
            "code_id",
            F.col("__ld2").alias("__qd2"),
        )
    )
    scored = (
        encoded.join(F.broadcast(lut), ["sub", "code_id"])
        .groupBy("query_id", id_col)
        .agg(dsum("__qd2", scale=sum_scale).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "adist", "rank")
    )


def build_ivfpq_index(
    corpus: DataFrame,
    path: str,
    nlist: int = 16,
    m: int = 4,
    codes: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    comp_digits: int = 9,
    sum_scale: int = 12,
) -> None:
    """Persist an IVFADC index: ``<path>/centroids`` (the nlist seeded
    cell centroids), ``<path>/codebooks`` (the residual PQ codebook,
    m·codes rows), and ``<path>/codes`` — each vector's m residual
    code ids written Hive-partitioned by cell. This is what a 100 TB
    deployment actually stores: BYTES per vector, partition-prunable
    by cell; the float vectors never land in the index. Build cost is
    one assignment pass, the bounded codebook training, one encode
    pass, one partitioned write."""
    from margaret_spark.functions.vectors import l2_norm
    from margaret_spark.operators.similarity import _nearest_cells

    dim = infer_dim(corpus, vec_col)
    if dim is None:
        raise ValueError("cannot build an IVFPQ index on an empty corpus")
    if dim % m != 0:
        raise ValueError(f"vector dim {dim} not divisible by m={m}")
    spark = corpus.sparkSession
    corpus.orderBy(F.col(id_col).asc()).limit(nlist).select(
        F.col(id_col).alias("cent_id"),
        F.col(vec_col).cast("array<double>").alias("cent"),
    ).write.mode("overwrite").parquet(f"{path}/centroids")
    cents = F.broadcast(
        spark.read.parquet(f"{path}/centroids").select(
            "cent_id",
            F.col("cent").alias("__cent"),
            l2_norm(F.col("cent")).alias("__centn"),
        )
    )
    residual = F.zip_with(
        F.col("__v"),
        F.col("__cent"),
        lambda x, y: x.cast("double") - y.cast("double"),
    )
    res = (
        _nearest_cells(corpus, cents, id_col, vec_col, "id", 1, round_digits)
        .join(F.broadcast(cents.select("cent_id", "__cent")), "cent_id")
        .select("id", F.col("cent_id").alias("cell"), residual.alias("res"))
        .localCheckpoint(eager=False)
    )
    cb = pq_train(
        res, m, codes, iters, id_col="id", vec_col="res",
        round_digits=round_digits, comp_digits=comp_digits,
        sum_scale=sum_scale, dim=dim,
    )
    cb.select("sub", "code_id", "cent").write.mode("overwrite").parquet(
        f"{path}/codebooks"
    )
    enc = pq_encode(res, cb, m, id_col="id", vec_col="res",
                    round_digits=round_digits, dim=dim)
    (
        enc.join(res.select("id", "cell"), "id")
        .select("cell", "id", "sub", "code_id")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )


def ivfpq_index_search(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
    sum_scale: int = 12,
) -> DataFrame:
    """Top-k against a persisted :func:`build_ivfpq_index` —
    (query_id, ``id_col``, adist, rank), identical results to the
    in-flight :func:`ivfpq_topk` with the same parameters (pinned in
    tests). The broadcast probe set triggers dynamic partition
    pruning on the Hive-partitioned code table, so the scan reads
    O(probed cells) of 1-byte-per-subspace codes — the compounding of
    the IVF read cut with PQ compression that makes this the 100 TB
    serving shape."""
    from margaret_spark.functions.vectors import l2_norm
    from margaret_spark.operators.similarity import _nearest_cells

    cents = F.broadcast(
        spark.read.parquet(f"{path}/centroids").select(
            "cent_id",
            F.col("cent").alias("__cent"),
            l2_norm(F.col("cent")).alias("__centn"),
        )
    )
    cb = _with_nsq(
        spark.read.parquet(f"{path}/codebooks")
    ).localCheckpoint(eager=False)
    first = cb.agg(
        F.min(F.size("cent")).alias("w"), F.max("sub").alias("mx")
    ).first()
    if first["w"] is None:
        raise ValueError(f"empty codebook under {path}/codebooks")
    width, mval = int(first["w"]), int(first["mx"]) + 1
    residual = F.zip_with(
        F.col("__v"),
        F.col("__cent"),
        lambda x, y: x.cast("double") - y.cast("double"),
    )
    probes = (
        _nearest_cells(queries, cents, id_col, vec_col, "query_id",
                       nprobe, round_digits)
        .join(F.broadcast(cents.select("cent_id", "__cent")), "cent_id")
        .select("query_id", F.col("cent_id").alias("cell"),
                residual.alias("qres"))
    )
    qslices = F.array(
        *[F.slice(F.col("qres"), s * width + 1, width) for s in range(mval)]
    )
    qsv = probes.select(
        "query_id", "cell", F.posexplode(qslices).alias("sub", "sv")
    ).withColumn("nsq", pair_dot(F.col("sv"), F.col("sv")))
    lut = (
        qsv.join(F.broadcast(cb), "sub")
        .withColumn(
            "__ld2",
            _dist2(
                F.col("nsq"),
                F.col("cnsq"),
                pair_dot(F.col("sv"), F.col("cent")),
                round_digits,
            ),
        )
        .select("query_id", "cell", "sub", "code_id",
                F.col("__ld2").alias("__qd2"))
    )
    enc = spark.read.parquet(f"{path}/codes")
    scored = (
        enc.join(F.broadcast(lut), ["cell", "sub", "code_id"])
        .where(F.col("query_id") != F.col("id"))
        .groupBy("query_id", "id")
        .agg(dsum("__qd2", scale=sum_scale).alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adist").asc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("id").alias(id_col), "adist", "rank")
    )


def ivfpq_index_append(
    spark,
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 6,
) -> None:
    """Incremental maintenance of a persisted :func:`build_ivfpq_index`:
    encode NEW vectors under the index's FROZEN centroids and
    codebook and append their code rows into the partitioned layout —
    no rebuild, no rewrite of existing cells (the ivf_index_append
    discipline). Appended rows are indistinguishable from build-time
    rows; model drift under sustained ingest is the documented trade
    (rebuild when recall decays). At 100 TB an append touches exactly
    the new rows — a rebuild re-encodes the corpus."""
    from margaret_spark.functions.vectors import l2_norm
    from margaret_spark.operators.similarity import _nearest_cells

    cents = F.broadcast(
        spark.read.parquet(f"{path}/centroids").select(
            "cent_id",
            F.col("cent").alias("__cent"),
            l2_norm(F.col("cent")).alias("__centn"),
        )
    )
    cb = _with_nsq(spark.read.parquet(f"{path}/codebooks")).localCheckpoint(
        eager=False
    )
    first = cb.agg(
        F.min(F.size("cent")).alias("w"), F.max("sub").alias("mx")
    ).first()
    if first["w"] is None:
        raise ValueError(f"empty codebook under {path}/codebooks")
    width, m = int(first["w"]), int(first["mx"]) + 1
    residual = F.zip_with(
        F.col("__v"),
        F.col("__cent"),
        lambda x, y: x.cast("double") - y.cast("double"),
    )
    res = (
        _nearest_cells(
            new_vectors, cents, id_col, vec_col, "id", 1, round_digits
        )
        .join(F.broadcast(cents.select("cent_id", "__cent")), "cent_id")
        .select("id", F.col("cent_id").alias("cell"), residual.alias("res"))
        .localCheckpoint(eager=False)
    )
    enc = pq_encode(
        res, cb, m, id_col="id", vec_col="res",
        round_digits=round_digits, dim=width * m,
    )
    (
        enc.join(res.select("id", "cell"), "id")
        .select("cell", "id", "sub", "code_id")
        .write.mode("append")
        .partitionBy("cell")
        .parquet(f"{path}/codes")
    )


def pq_distortion_report(
    encoded: DataFrame,
    round_digits: int = 6,
    sum_scale: int = 12,
) -> DataFrame:
    """(sub, n, mean_dist2, max_dist2): per-subspace quantization
    error of a :func:`pq_encode` output — THE audit that sizes a PQ
    deployment (too-coarse codebooks show up as a fat mean; one
    misbehaving subspace — a dimension range the splits straddle badly
    — shows up as an outlier row). One bounded aggregation over the
    code table; the mean is the house order-independent DECIMAL sum
    over the already-pround'ed per-row errors, so the report grades
    hash-exact."""
    return (
        encoded.groupBy("sub")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            pround(
                dsum("dist2", scale=sum_scale) / F.count(F.lit(1)),
                round_digits,
            ).alias("mean_dist2"),
            F.max("dist2").alias("max_dist2"),
        )
    )
