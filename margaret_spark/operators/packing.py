"""Sequence packing: assign documents to fixed-length token sequences
— the data-prep step between a curated corpus and a pretraining run
(every doc lands at a deterministic (pack, offset); docs spanning a
boundary are split across consecutive packs, the standard contiguous
packing).

The core is a DISTRIBUTED PREFIX SUM. A naive
``sum() OVER (ORDER BY ...)`` window collapses the whole corpus onto
one partition — a non-starter at 100 TB. ``running_total`` uses the
two-pass partition-offset technique instead (the same shape as
``functions.seqassign``):

1. range-partition by the order column (so partition-major order IS
   global order), per-partition cumulative sum — narrow window, no
   single hot partition;
2. collect only the tiny per-partition TOTALS to the driver;
3. add each partition's cumulative offset back via a broadcast map.

Cost: one range shuffle + one count-sized job; the payload never
funnels through a single task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from margaret_spark.functions.seqassign import _MAP_LITERAL_CAP


def running_total(
    df: DataFrame,
    value_col: str,
    order_col: str,
    out_col: str = "running_total",
) -> DataFrame:
    """Add the inclusive prefix sum of ``value_col`` in ``order_col``
    order (ties broken arbitrarily — use a unique order column for a
    deterministic result)."""
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    staged = (
        df.repartitionByRange(n, F.col(order_col))
        .sortWithinPartitions(order_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Materialize before the totals collect: the totals job and the
    # returned plan must see the SAME partition assignment.
    # repartitionByRange samples its boundaries, so re-executing the
    # upstream for each consumer could bucket rows differently between
    # the two jobs and silently mis-shift the prefix sums — the
    # checkpoint makes job 2 reuse job 1's partitioning (and stops the
    # upstream from being computed twice).
    staged = staged.withColumn(
        "__local", F.sum(value_col).over(w)
    ).localCheckpoint(eager=False)
    totals = staged.groupBy("__pid").agg(F.sum(value_col).alias("__t")).collect()
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["__pid"]):
        offsets[row["__pid"]] = acc
        acc += row["__t"] or 0
    from pyspark.sql import types as T

    integral = isinstance(
        df.schema[value_col].dataType,
        (T.LongType, T.IntegerType, T.ShortType, T.ByteType),
    )
    out_type = "long" if integral else "double"
    if not offsets:  # empty input: keep the plan typed
        return staged.withColumn(out_col, F.lit(None).cast(out_type)).drop(
            "__pid", "__local"
        )
    # cast to long ONLY for integral inputs: an unconditional long cast
    # silently truncated fractional prefix sums
    if len(offsets) <= _MAP_LITERAL_CAP:
        mapping = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
        return (
            staged.withColumn(
                out_col, (mapping[F.col("__pid")] + F.col("__local")).cast(out_type)
            )
            .drop("__pid", "__local")
        )
    # same expression-bomb guard as functions.seqassign: past the cap
    # the offsets ship as a broadcast-joined table, not a literal map
    conv = int if integral else float
    odf = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), conv(o)) for p, o in offsets.items()],
            f"__pid int, __off {out_type}",
        )
    )
    return (
        staged.join(odf, "__pid")
        .withColumn(out_col, (F.col("__off") + F.col("__local")).cast(out_type))
        .drop("__pid", "__local", "__off")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    order_col: str | None = None,
) -> DataFrame:
    """(id, n_tokens, pack_first, pack_last, offset_in_first): the
    contiguous token-stream packing of the corpus in ``order_col``
    order into sequences of ``seq_len`` tokens. A document starts in
    ``pack_first`` at ``offset_in_first`` and (if it crosses
    boundaries) spills through ``pack_last`` — exactly the layout a
    pretraining loader consumes. Zero-token rows are dropped (they
    occupy no stream position)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    order_col = order_col or id_col
    c = running_total(
        df.where(F.col(tokens_col) > 0), tokens_col, order_col, "__cum"
    )
    return _pack_from_cum(c, id_col, tokens_col, seq_len)


def _pack_from_cum(
    c: DataFrame, id_col: str, tokens_col: str, seq_len: int, extra: list | None = None
) -> DataFrame:
    # INTEGER division via SQL `div` over internally-aliased columns
    # (no caller column names interpolated): floor(x / w) promotes to
    # double and loses exactness past 2^53 cumulative tokens — real
    # territory for a 100 TB token stream.
    staged = c.select(
        "*",
        (F.col("__cum") - F.col(tokens_col)).alias("__start"),
        (F.col("__cum") - F.lit(1)).alias("__cum1"),
    )
    return staged.select(
        *(extra or []),
        F.col(id_col),
        F.col(tokens_col).alias("n_tokens"),
        F.expr(f"__start div {int(seq_len)}").cast("long").alias("pack_first"),
        F.expr(f"__cum1 div {int(seq_len)}").cast("long").alias("pack_last"),
        (F.col("__start") % F.lit(seq_len)).cast("long").alias("offset_in_first"),
    )


def pack_sequences_grouped(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    order_col: str | None = None,
) -> DataFrame:
    """Per-group contiguous packing: each group (training domain /
    source) gets its OWN token stream starting at pack 0 — the layout
    for domain-separated or curriculum training where sequences must
    not mix sources. Output adds ``group_col`` to the
    :func:`pack_sequences` schema.

    Scale shape: the prefix sum is a per-group window cumsum (one
    shuffle on the group key). Unlike the global packing, no range
    repartition is needed — the group key IS the partition — but a
    single huge group degenerates to one window partition; for that
    shape use the global :func:`pack_sequences` per group subset
    instead."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    order_col = order_col or id_col
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = df.where(F.col(tokens_col) > 0).withColumn(
        "__cum", F.sum(tokens_col).over(w).cast("long")
    )
    return _pack_from_cum(c, id_col, tokens_col, seq_len, extra=[F.col(group_col)])


def length_bucketed_batches(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    batch_rows: int,
) -> DataFrame:
    """Length-bucketed batch assembly — the padding-aware counterpart
    to the contiguous pretraining packing above: SFT / inference
    pipelines pad every sequence in a batch to the batch maximum, so
    batching similar lengths together is what keeps padding waste low
    (the standard "sort by length, then batch" recipe). Documents are
    globally ordered by (n_tokens, md5(id), id) — deterministic, ties
    broken content-free — and assigned ``batch_id = pos div
    batch_rows``.

    Output: (id, n_tokens, batch_id, pos_in_batch). Zero-token rows
    keep their batch slot (an empty sequence still occupies a row in
    the padded tensor). Compose with :func:`padding_report` for the
    per-batch waste audit.

    Scale shape: the global order uses the same two-pass
    partition-offset position assignment as the epoch shuffle
    (``sampling.deterministic_shuffle``) — range partition on the sort
    key, narrow within-partition sort, per-partition counts to the
    driver; NO corpus-wide single-partition window."""
    from margaret_spark.functions.seqassign import with_dense_seq

    if batch_rows < 1:
        raise ValueError(f"batch_rows must be >= 1: {batch_rows}")
    keys = [
        F.col(tokens_col).cast("long"),
        F.md5(F.col(id_col).cast("string")),
        F.col(id_col),
    ]
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    staged = df.select(id_col, tokens_col).repartitionByRange(
        n, *keys
    ).sortWithinPartitions(*keys)
    pos = with_dense_seq(staged, seq_col="__pos")
    return pos.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        F.expr(f"__pos div {int(batch_rows)}").cast("long").alias("batch_id"),
        (F.col("__pos") % F.lit(batch_rows)).cast("long").alias("pos_in_batch"),
    )


def pack_best_fit(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    seq_len: int,
    chunk_docs: int = 256,
) -> DataFrame:
    """Best-fit-decreasing bin packing: assign whole documents to
    fixed-capacity ``seq_len`` packs WITHOUT splitting any document —
    the published SFT-efficiency recipe (Ding et al. 2024, "Fewer
    Truncations Improve Language Modeling": packing whole sequences
    instead of the contiguous split-at-boundary stream removes
    truncation damage at a small padding cost).

    Output: (``id_col``, n_tokens, pack_id, pack_pos). ``pack_pos`` is
    the arrival order within the pack. Zero-token rows are dropped;
    OVERSIZE documents (n_tokens > seq_len) cannot fit any bin and are
    each assigned a dedicated NEGATIVE pack_id (``-1, -2, ...`` in
    (md5(id), id) order) — the consumer truncates or splits those at
    its own policy, and the sign makes them impossible to confuse with
    packed bins.

    Algorithm (deterministic, engine-portable): documents are globally
    ordered by (n_tokens DESC, md5(id), id) and cut into consecutive
    chunks of ``chunk_docs``; within each chunk, classic best-fit
    places every doc into the open bin with the SMALLEST remaining
    capacity that still fits (tie → lowest bin id), else opens a new
    bin. ``pack_id = chunk·chunk_docs + local_bin`` (a chunk of k docs
    opens ≤ k bins, so ids never collide across chunks; they are
    unique, not dense).

    Scale shape: pure best-fit-decreasing is a sequential scan — a
    non-starter at 100 TB. Chunk-local BFD is the standard
    parallelization: the global DECREASING sort (the same two-pass
    range-partition position assignment as
    :func:`length_bucketed_batches` — no single-partition window)
    keeps each chunk length-homogeneous, which is where BFD's packing
    quality comes from, and every chunk packs independently in one
    Arrow-batched ``applyInPandas`` pass (O(chunk²) integer work per
    chunk, chunks run in parallel). Quality loss vs the sequential
    algorithm is confined to at most one under-filled bin per chunk
    tail."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    if not 1 <= chunk_docs <= 100_000:
        raise ValueError(f"chunk_docs must be in [1, 100000]: {chunk_docs}")
    from margaret_spark.functions.seqassign import with_dense_seq

    base = df.select(id_col, tokens_col).where(F.col(tokens_col) > 0)
    fits = base.where(F.col(tokens_col) <= seq_len)
    n = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    staged = (
        fits.select(
            "*",
            (-F.col(tokens_col).cast("long")).alias("__negn"),
            F.md5(F.col(id_col).cast("string")).alias("__h"),
        )
        .repartitionByRange(n, "__negn", "__h", id_col)
        .sortWithinPartitions("__negn", "__h", id_col)
        .drop("__negn", "__h")
    )
    pos = with_dense_seq(staged, seq_col="__pos").withColumn(
        "__chunk", F.expr(f"__pos div {int(chunk_docs)}").cast("long")
    )

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"`{id_col}` {id_type}, n_tokens long, pack_id long, pack_pos long"
    )

    def _bfd(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__pos")
        chunk = int(pdf["__chunk"].iloc[0])
        bins: list[int] = []  # remaining capacity per local bin
        fill: list[int] = []  # docs placed per local bin (-> pack_pos)
        out_bin, out_pos = [], []
        for tok in pdf[tokens_col].astype("int64"):
            tok = int(tok)
            best = -1
            for i, rem in enumerate(bins):
                if rem >= tok and (best < 0 or rem < bins[best]):
                    best = i
            if best < 0:
                best = len(bins)
                bins.append(seq_len)
                fill.append(0)
            bins[best] -= tok
            out_bin.append(chunk * chunk_docs + best)
            out_pos.append(fill[best])
            fill[best] += 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                "n_tokens": pdf[tokens_col].astype("int64").values,
                "pack_id": pd.Series(out_bin, dtype="int64"),
                "pack_pos": pd.Series(out_pos, dtype="int64"),
            }
        )

    packed = pos.groupBy("__chunk").applyInPandas(_bfd, out_schema)

    over = df.select(id_col, tokens_col).where(F.col(tokens_col) > seq_len)
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    # oversize rows are RARE by construction (longer than the training
    # sequence); the single-partition row_number window over them is a
    # deliberate small-side simplification, not a corpus-wide one
    over_packed = over.select(
        F.col(id_col),
        F.col(tokens_col).cast("long").alias("n_tokens"),
        (-F.row_number().over(w).cast("long")).alias("pack_id"),
        F.lit(0).cast("long").alias("pack_pos"),
    )
    return packed.unionByName(over_packed)


def pack_best_fit_arrival(
    df: DataFrame,
    seq_col: str,
    tokens_col: str,
    seq_len: int,
    chunk_docs: int = 256,
) -> DataFrame:
    """ONLINE best-fit packing in arrival order — the at-ingest twin
    of :func:`pack_best_fit` (classic online bin packing, Johnson
    1974: place each arriving doc into the tightest open bin, no
    sorting — the price of not seeing the future is bounded, online
    best-fit is ~1.7-competitive).

    ``seq_col`` must be a DENSE arrival sequence (a log seq): chunk
    membership is the pure function ``seq div chunk_docs`` — computed
    BEFORE dropping unpackable rows — so any seq-contiguous slice of
    the corpus packs identically on its own. That property is what
    makes the streaming twin exact: per-micro-batch packing of
    chunk-aligned batches EQUALS batch packing of the whole log.
    Open bins reset at every chunk boundary (bounded state by
    construction; the tail bin per chunk is the quality cost).

    Output (``seq_col``, n_tokens, pack_id, pack_pos): fitting docs
    get ``pack_id = chunk·chunk_docs + local_bin``; zero-token rows
    drop; oversize rows get the dedicated ``pack_id = −(seq+1)``
    (window-free, so the streaming path needs no global state)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    if not 1 <= chunk_docs <= 100_000:
        raise ValueError(f"chunk_docs must be in [1, 100000]: {chunk_docs}")

    base = df.select(
        F.col(seq_col).cast("long").alias("__seq"),
        F.col(tokens_col).cast("long").alias("__n"),
    ).withColumn("__chunk", F.expr(f"__seq div {int(chunk_docs)}"))
    fits = base.where((F.col("__n") > 0) & (F.col("__n") <= seq_len))

    out_schema = f"`{seq_col}` long, n_tokens long, pack_id long, pack_pos long"

    def _bfd(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__seq")
        chunk = int(pdf["__chunk"].iloc[0])
        bins: list[int] = []
        fill: list[int] = []
        out_bin, out_pos = [], []
        for tok in pdf["__n"]:
            tok = int(tok)
            best = -1
            for i, rem in enumerate(bins):
                if rem >= tok and (best < 0 or rem < bins[best]):
                    best = i
            if best < 0:
                best = len(bins)
                bins.append(seq_len)
                fill.append(0)
            bins[best] -= tok
            out_bin.append(chunk * chunk_docs + best)
            out_pos.append(fill[best])
            fill[best] += 1
        return pd.DataFrame(
            {
                seq_col: pdf["__seq"].values,
                "n_tokens": pdf["__n"].values,
                "pack_id": pd.Series(out_bin, dtype="int64"),
                "pack_pos": pd.Series(out_pos, dtype="int64"),
            }
        )

    packed = fits.groupBy("__chunk").applyInPandas(_bfd, out_schema)
    over = base.where(F.col("__n") > seq_len).select(
        F.col("__seq").alias(seq_col),
        F.col("__n").alias("n_tokens"),
        (-(F.col("__seq") + 1)).cast("long").alias("pack_id"),
        F.lit(0).cast("long").alias("pack_pos"),
    )
    return packed.unionByName(over)


def capacity_report(
    packs: DataFrame,
    seq_len: int,
    round_digits: int = 6,
) -> DataFrame:
    """(pack_id, n_docs, sum_tokens, padding_waste): the per-pack
    audit over :func:`pack_best_fit` output. Every pack is a
    fixed-length ``seq_len`` training sequence, so ``padding_waste =
    pround(1 − least(sum_tokens, seq_len)/seq_len)`` — the ``least``
    clamps oversize single-doc packs (consumer truncates; utilization
    is the full sequence) to waste 0. One map-side-combined
    aggregation; exact integers under one IEEE division."""
    from margaret_spark.functions.numeric import pround

    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive: {seq_len}")
    agg = packs.groupBy("pack_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
    used = F.least(F.col("sum_tokens"), F.lit(seq_len)).cast("double")
    return agg.select(
        "pack_id",
        "n_docs",
        "sum_tokens",
        pround(F.lit(1.0) - used / F.lit(float(seq_len)), round_digits).alias(
            "padding_waste"
        ),
    )


def padding_report(
    batches: DataFrame,
    round_digits: int = 6,
) -> DataFrame:
    """(batch_id, n_docs, max_tokens, sum_tokens, padded_tokens,
    padding_waste): the per-batch padding audit over
    :func:`length_bucketed_batches` output — ``padded_tokens =
    n_docs·max_tokens`` is what the accelerator actually computes,
    ``padding_waste = pround(1 − sum/padded)`` the wasted fraction
    (0.0 for an all-equal-length or empty-capacity batch). One
    map-side-combined aggregation on batch_id; exact integer
    arithmetic under one IEEE division — hash-exact."""
    from margaret_spark.functions.numeric import pround

    agg = batches.groupBy("batch_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )
    padded = (F.col("n_docs") * F.col("max_tokens")).cast("long")
    waste = F.when(padded == 0, F.lit(0.0)).otherwise(
        pround(
            F.lit(1.0)
            - F.col("sum_tokens").cast("double") / padded.cast("double"),
            round_digits,
        )
    )
    return agg.select(
        "batch_id",
        "n_docs",
        "max_tokens",
        "sum_tokens",
        padded.alias("padded_tokens"),
        waste.alias("padding_waste"),
    )
