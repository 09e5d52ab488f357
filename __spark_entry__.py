"""Driver contract for the spark-graft builder (PySpark target).

Every entry in ``queries()`` is one operator from SURVEY.md §2 (the
margaret operator inventory re-expressed Spark-first over the driver
testdata) or one beyond-reference pipeline operator, and — unless
genuinely non-SQL-expressible — has a matching DuckDB oracle in
``oracle_sql()`` producing identical column names and values.

Determinism contract shared by both sides:
- float aggregates go through exact DECIMAL sums cast back to DOUBLE
  (order-independent; see margaret_spark/functions/numeric.py);
- ratios/cosines are computed with an identical expression tree on
  both engines (sequential folds), then rounded;
- every top-k orders by (rounded measure, id) so ties are stable.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pyspark.sql import types as T

from margaret_spark.functions.numeric import dsum, pround
from margaret_spark.functions.vectors import cosine_sim
from margaret_spark.operators.dedup import (
    embedding_dedup_pairs,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dedup_pairs,
)
from margaret_spark.operators.similarity import brute_force_topk, lsh_bucketed_topk
from margaret_spark.operators.temporal import asof_join, range_join
from margaret_spark.operators.text import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_score,
    token_stats,
)
from margaret_spark.qry import Gt, Gte, Limit, Lte, Reverse, build_plan, apply_plan
from margaret_spark.indexes import latest_by_key, fanout

DEFAULT_SF = "/root/testdata/sf0.001"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_DEFERRED_TMPDIRS: list[str] = []


def _defer_cleanup(base: str) -> None:
    """Remove a graded stream's tempdir at PROCESS EXIT, not in the
    query body: the returned DataFrame lazily reads the stream's sink,
    and the driver collects AFTER the query function returns — an
    eager ``finally: rmtree`` forced every ``q_stream_*`` to
    materialize its keeper set through the driver
    (collect + createDataFrame), putting N×dim rows through the
    driver on every graded run. Deferral keeps the read executor-side
    and the run hermetic (dirs are swept when the session ends)."""
    import atexit
    import shutil

    if not _DEFERRED_TMPDIRS:
        atexit.register(
            lambda: [
                shutil.rmtree(d, ignore_errors=True)
                for d in _DEFERRED_TMPDIRS
            ]
        )
    _DEFERRED_TMPDIRS.append(base)


# events.ts is TIMESTAMP(µs) in the parquet; the explicit schema is
# kept because the streaming file source requires one. The session
# timezone is UTC (session.py), so to_date/unix_micros below match
# DuckDB's CAST(ts AS DATE)/epoch_us on the same naive timestamps.
_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.schema(_EVENTS_SCHEMA).parquet(
        os.path.join(sf_dir, "events.parquet")
    )


def _events_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table viewed as a margaret log: event_id is a dense,
    gap-free seq (arrival order), the rest is payload."""
    return _events(spark, sf_dir).withColumnRenamed("event_id", "seq")


# ---------------------------------------------------------------------------
# §2.1/2.2 — core log + query algebra (SURVEY.md §2.2 ops 9-16, 19)
# ---------------------------------------------------------------------------


def q_log_scan(spark, sf_dir):
    """Full seq-ordered scan, SeqWrap'd (op 16/19)."""
    return _events_log(spark, sf_dir).select("seq", "event_type", "value")


def q_log_get(spark, sf_dir):
    """Point lookup by seq (op 2): Parquet row-group pruning does the
    positional-index work."""
    df = _events_log(spark, sf_dir)
    return apply_plan(df, build_plan([Gte(999), Lte(999)])).select(
        "seq", "user_id", "event_type", "value"
    )


def q_log_seq(spark, sf_dir):
    """Current max seq (op 3), SEQ_EMPTY=-1 convention on empty."""
    return _events_log(spark, sf_dir).agg(
        F.coalesce(F.max("seq"), F.lit(-1)).cast("long").alias("seq")
    )


def q_log_range(spark, sf_dir):
    """Gt(99) ∧ Lte(299) (ops 9+12): bounds land in PushedFilters."""
    df = _events_log(spark, sf_dir)
    return apply_plan(df, build_plan([Gt(99), Lte(299)])).select("seq", "value")


def q_log_limit(spark, sf_dir):
    """Limit(100) in seq order (op 13): TakeOrderedAndProject."""
    df = _events_log(spark, sf_dir)
    return apply_plan(df, build_plan([Limit(100)])).select("seq", "event_type")


def q_log_reverse(spark, sf_dir):
    """Reverse + Limit (op 14): newest-100, a tail read."""
    df = _events_log(spark, sf_dir)
    return apply_plan(df, build_plan([Reverse(True), Limit(100)])).select(
        "seq", "event_type", "value"
    )


def q_log_append_seq(spark, sf_dir):
    """Dense gap-free seq assignment (op 1, Append): the distributed
    two-pass partition-offset technique over a range-sorted corpus —
    after a global sort, partition-major order IS global order, so the
    assigned seq equals the rank without any single-partition window."""
    from margaret_spark.functions.seqassign import with_dense_seq

    docs = _t(spark, sf_dir, "documents").orderBy("doc_id")
    return with_dense_seq(docs, order_within=F.col("doc_id")).select("seq", "doc_id")


def q_log_nulled_overlay(spark, sf_dir):
    """Null-redaction overlay view (ops 6/7): a patch table LEFT-JOINed
    over the log; here 'error' events play the nulled set."""
    ev = _events_log(spark, sf_dir).select("seq", "value", "event_type")
    patch = ev.where(F.col("event_type") == "error").select(
        "seq", F.lit("null").alias("op")
    )
    # patch overlays are usually tiny, but this demo's patch set scales
    # with the log — no hint, the join strategy follows the stats
    return ev.join(patch, "seq", "left").select(
        "seq",
        F.when(F.col("op") == "null", F.lit(None)).otherwise(F.col("value")).alias("value"),
        F.coalesce(F.col("op") == "null", F.lit(False)).alias("nulled"),
    )


def q_log_replace_overlay(spark, sf_dir):
    """Replace (in-place update) overlay view (op 7): a patch table
    coalesced over the log — here 'purchase' events get their value
    doubled, standing in for Replace(seq, payload)."""
    ev = _events_log(spark, sf_dir).select("seq", "value", "event_type")
    patch = ev.where(F.col("event_type") == "purchase").select(
        "seq", (F.col("value") * 2).alias("__pv")
    )
    return ev.join(patch, "seq", "left").select(
        "seq",
        F.coalesce(F.col("__pv"), F.col("value")).alias("value"),
        F.col("__pv").isNotNull().alias("replaced"),
    )


def q_log_snapshot_read(spark, sf_dir):
    """TIME TRAVEL on the graded surface (sources/snapshot.py): build
    a real OffsetLog from the first 500 events, pin a snapshot, then
    append 100 more AND null seq 3 — the as-of read must show the
    pinned state exactly: later appends invisible, the post-snapshot
    null invisible (seq 3 still carries its value). A manifest is
    O(#logs) metadata; the as-of bound is a pushed ``seq <=`` filter,
    so Parquet row-group pruning keeps snapshot reads as cheap as
    head reads."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.sources.snapshot import SnapshotCatalog

    ev = _events(spark, sf_dir).orderBy("event_id").limit(600).collect()
    d = tempfile.mkdtemp(prefix="snap_log_")
    log = OffsetLog(
        spark, d, value_type=T.StructType([T.StructField("v", T.DoubleType())])
    )
    log.append_many([{"v": float(r["value"])} for r in ev[:500]])
    cat = SnapshotCatalog(tempfile.mkdtemp(prefix="snap_cat_"))
    sid = cat.snapshot({"events": log})
    # post-snapshot mutations that the as-of read must NOT see
    log.append_many([{"v": float(r["value"])} for r in ev[500:]])
    log.null(3)
    asof = cat.read(sid, "events", log)
    return asof.select("seq", F.col("value.v").alias("v"), "nulled")


def q_log_check_consistency(spark, sf_dir):
    """fsck invariants as one aggregation row (op 8)."""
    return _events_log(spark, sf_dir).agg(
        F.count("*").alias("n"),
        F.countDistinct("seq").alias("n_distinct"),
        F.min("seq").alias("min_seq"),
        F.max("seq").alias("max_seq"),
        (
            (F.count("*") == F.countDistinct("seq"))
            & (F.min("seq") == 0)
            & (F.max("seq") == F.count("*") - 1)
        ).alias("dense"),
    )


# ---------------------------------------------------------------------------
# §2.3 — multilog / sublogs over orders (addr=o_custkey, main_seq=o_orderkey)
# ---------------------------------------------------------------------------


def _mlog(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("addr"), F.col("o_orderkey").alias("main_seq")
    )


def _ranked(spark, sf_dir):
    w = Window.partitionBy("addr").orderBy("main_seq")
    return _mlog(spark, sf_dir).withColumn(
        "rank", (F.row_number().over(w) - F.lit(1)).cast("long")
    )


def q_mlog_list(spark, sf_dir):
    """MultiLog.List (op 22): keys with non-empty sublogs."""
    return _mlog(spark, sf_dir).select("addr").distinct()


def q_mlog_ranks(spark, sf_dir):
    """Sublog rank view (op 26): bitmap Select(n) as a window rank."""
    return _ranked(spark, sf_dir).where(F.col("addr") <= 20)


def q_mlog_sublog_get(spark, sf_dir):
    """sublog.Get(2) for addr 7 (op 26): positional rank lookup."""
    return _ranked(spark, sf_dir).where(
        (F.col("addr") == 7) & (F.col("rank") == 2)
    ).select("addr", "rank", "main_seq")


def q_mlog_sublog_query(spark, sf_dir):
    """Query algebra over the rank domain (op 27): Gte(1) ∧ Lte(4)."""
    sub = _ranked(spark, sf_dir).where(F.col("addr") == 7)
    return apply_plan(sub, build_plan([Gte(1), Lte(4)]), seq_col="rank").select(
        "rank", "main_seq"
    )


def q_mlog_cardinalities(spark, sf_dir):
    """sublog.Seq per addr (op 27): cardinality − 1."""
    return _mlog(spark, sf_dir).groupBy("addr").agg(
        (F.count("*") - 1).alias("sublog_seq")
    )


def q_mlog_has(spark, sf_dir):
    """multilog.Has (op 24) for a probe list of addrs."""
    probes = spark.createDataFrame([(7,), (999999999,)], "addr long")
    m = _mlog(spark, sf_dir)
    return (
        probes.join(m, "addr", "left")
        .groupBy("addr")
        .agg((F.count("main_seq") > 0).alias("has"))
    )


def q_mlog_delete(spark, sf_dir):
    """MultiLog.Delete (op 23) as tombstone anti-join: live addrs
    excluding deleted keys {1,2,3}."""
    tombs = spark.createDataFrame([(1,), (2,), (3,)], "addr long")
    return (
        _mlog(spark, sf_dir)
        .join(F.broadcast(tombs), "addr", "left_anti")
        .select("addr")
        .distinct()
    )


# ---------------------------------------------------------------------------
# §2.4/2.6 — KV index + fan-out sink over events
# ---------------------------------------------------------------------------


def q_mlog_set_ops(spark, sf_dir):
    """Set algebra over sublog address sets (margaret's List() per
    multilog composed relationally): customers that have orders
    INTERSECT customers above an account-balance bar, minus a deleted
    set — intersect/except as first-class plan nodes."""
    with_orders = _mlog(spark, sf_dir).select("addr").distinct()
    rich = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("addr"))
    )
    deleted = spark.createDataFrame([(7,), (11,)], "addr long")
    return with_orders.intersect(rich).exceptAll(deleted).select("addr")


def q_kvidx_latest(spark, sf_dir):
    """SetterIndex materialization (ops 31/32/34): latest value per key
    (key=user_id) by seq — max_by semantics."""
    ev = _events_log(spark, sf_dir).select(
        F.col("user_id").alias("addr"), "seq", "value", "event_type"
    )
    out = latest_by_key(ev, "addr", "seq", ["seq", "value", "event_type"])
    return out.withColumnRenamed("seq", "upd_seq")


def q_kvidx_point(spark, sf_dir):
    """Index.Get on one key (op 31)."""
    return q_kvidx_latest(spark, sf_dir).where(F.col("addr") == 7)


def q_sink_fanout(spark, sf_dir):
    """multilog.Sink routing (op 28): one sublog per event_type;
    per-sublog cardinality and seq bounds."""
    ev = _events_log(spark, sf_dir)
    routed = fanout(ev.withColumn("addrs", F.array(F.col("event_type"))), F.col("addrs"))
    return routed.groupBy("addr").agg(
        F.count("*").alias("card"),
        F.min("main_seq").alias("min_seq"),
        F.max("main_seq").alias("max_seq"),
    )


def q_sink_fanout_multi(spark, sf_dir):
    """Multi-address routing (op 28/§2.6): each entry goes to its
    event_type sublog AND a user-shard sublog."""
    ev = _events_log(spark, sf_dir)
    addrs = F.array(
        F.col("event_type"),
        F.concat(F.lit("u"), (F.col("user_id") % 10).cast("string")),
    )
    routed = fanout(ev.withColumn("addrs", addrs), F.col("addrs"))
    return routed.groupBy("addr").agg(F.count("*").alias("card"))


# ---------------------------------------------------------------------------
# Relational/analytic queries (Spark-first surface; also the bench set)
# ---------------------------------------------------------------------------


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1-style pricing summary (exact decimal sums)."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price, scale=6).alias("sum_disc_price"),
            dsum(charge, scale=6).alias("sum_charge"),
            pround(dsum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            pround(dsum("l_extendedprice") / F.count("*"), 6).alias("avg_price"),
            pround(dsum("l_discount", scale=6) / F.count("*"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3-style shipping priority: top-10 open orders by revenue.
    customer is broadcast (small dim); ties broken by orderkey."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") < F.lit("1998-01-01").cast("date")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1998-01-01").cast("date")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # no explicit broadcast hint: customer SCALES with the data, so
        # the right strategy is size-dependent — stats/AQE broadcast it
        # at small SF and shuffle-join it at 100 TB
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"), "o_orderpriority")
        .agg(dsum(rev, scale=6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5-style local-supplier volume for ASIA, 1996: the
    dimension chain (region→nation→supplier/customer) is broadcast."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        supplier.join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with the data — no explicit hints;
        # only the fixed-size region/nation chain inside `dims` stays
        # broadcast-worthy by stats at any SF
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(
            dims,
            (li.l_suppkey == dims.s_suppkey)
            & (customer.c_nationkey == dims.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(rev, scale=6).alias("revenue"))
    )


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6-style forecasting revenue change: pure filter +
    aggregate — every predicate must reach the parquet scan
    (PushedFilters), no shuffle beyond the single-row agg."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), scale=6).alias("revenue"),
        F.count("*").alias("n"),
    )


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14-style promo revenue share: lineitem joins a broadcast
    part dim; conditional aggregation over the join."""
    part = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-03-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(F.lit(0.0))
    return (
        li.join(part, li.l_partkey == part.p_partkey)  # part scales; let stats pick
        .agg(
            dsum(promo, scale=6).alias("promo_revenue"),
            dsum(rev, scale=6).alias("total_revenue"),
        )
    )


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4-style order-priority check: orders in 1996-Q1 having
    at least one late lineitem — a LEFT SEMI join (the EXISTS shape;
    no fan-out, lineitem only contributes existence)."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    # the synthetic lineitem carries only l_shipdate; "late" = shipped
    # more than a year after the order window opened
    late = _t(spark, sf_dir, "lineitem").where(
        F.to_date("l_shipdate") > F.lit("1997-01-01").cast("date")
    )
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


def q_customers_without_orders(spark, sf_dir):
    """Anti-join (NOT EXISTS): customers with no orders in 1997H2+,
    counted per market segment."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        F.to_date("o_orderdate") >= F.lit("1997-07-01").cast("date")
    ).select("o_custkey")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10-style returned-item report: revenue lost to returns
    per customer over one quarter, top 20. Fact-side filters (return
    flag, date window) cut before the join; nation stays broadcast-able
    (fixed size), customer/orders shuffle on their keys."""
    cust = _t(spark, sf_dir, "customer")
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    orders = _t(spark, sf_dir, "orders").where(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("o_orderdate") < F.lit("1996-04-01").cast("date"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev, scale=6).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18-style large-volume customers: orders whose total
    quantity exceeds 200 (the IN + GROUP BY/HAVING subquery as a
    semi-join against a pre-aggregate), top 100 by order value."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", scale=6).alias("total_qty"))
        .where(F.col("total_qty") > 200)
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22-style global sales opportunity: customers with
    above-average positive balance and no recent orders (since
    1999-01-01), summarized per nation — a decorrelated scalar
    subquery (broadcast one-row average) composed with an anti-join."""
    cust = _t(spark, sf_dir, "customer")
    avg_bal = cust.where(F.col("c_acctbal") > 0).agg(
        (dsum("c_acctbal", scale=6) / F.count("*")).alias("__avg_bal")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.to_date("o_orderdate") >= F.lit("1999-01-01").cast("date"))
        .select("o_custkey")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").cast("long").alias("nationkey"))
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", scale=6).alias("totacctbal"),
        )
    )


def q_events_window_funcs(spark, sf_dir):
    """Ordered analytics over the event stream (lag delta, 3-row moving
    average, running total) — per-user windows ordered by event_id
    (pure int64 ordering: engine-portable, unlike the nanos timestamp
    DuckDB reads at µs precision). All sums are exact decimal; the
    moving average divides the decimal frame-sum (as double) by the
    frame count, the same expression tree as the oracle."""
    ev = _events(spark, sf_dir).where(F.col("user_id") % 53 == 7)
    w = Window.partitionBy("user_id").orderBy("event_id")
    frame3 = w.rowsBetween(-2, Window.currentRow)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dec = F.col("value").cast("decimal(38,6)")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        (F.col("value") - F.lag("value").over(w)).alias("delta_prev"),
        pround(
            F.sum(dec).over(frame3).cast("double") / F.count("*").over(frame3), 6
        ).alias("move_avg3"),
        F.sum(dec).over(run).cast("double").alias("running_sum"),
    )


def q_events_anomaly(spark, sf_dir):
    """Trailing-window anomaly detection: per (event_type, day) count
    vs the mean/σ of the 7 PRECEDING days (a rows-frame that excludes
    the current row — the standard leak-free baseline), flagging days
    above 2σ. Exact integer sums; σ via sqrt (IEEE-correctly-rounded,
    so cross-engine bit-exact, unlike ln); variance as E[x²]−E[x]²
    with the identical expression tree in the oracle. Two exchanges:
    the daily count aggregates on (event_type, day), then the trailing
    window repartitions on event_type alone."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count("*").alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    cnt = F.count("*").over(w)
    mean = F.sum("n").over(w).cast("double") / cnt
    var = (
        F.sum(F.col("n") * F.col("n")).over(w).cast("double") / cnt
        - mean * mean
    )
    sigma = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        daily.select(
            "event_type",
            "day",
            "n",
            F.when(cnt >= 3, pround(mean, 6)).alias("trail_mean"),
            F.when(cnt >= 3, pround(sigma, 6)).alias("trail_sigma"),
            (
                F.when(
                    cnt >= 3, F.col("n").cast("double") > mean + 2.0 * sigma
                ).otherwise(F.lit(False))
            ).alias("is_anomaly"),
        )
    )


def q_orders_constraints(spark, sf_dir):
    """Declarative data-quality report (operators.constraints): every
    row-local rule + uniqueness compile into ONE aggregation over one
    scan (map-side-combinable conditional sums); the referential-
    integrity rule adds one broadcast anti-join against the customer
    keys. Output is a handful of rows regardless of input size —
    the Deequ-style gate a pipeline runs before trusting a table."""
    from margaret_spark.operators import constraints as C

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    return C.constraint_report(
        orders,
        [
            C.not_null("o_custkey"),
            C.unique("o_orderkey"),
            C.in_range("o_totalprice", 0.0, 1e9),
            C.in_set("o_orderstatus", ["O", "F", "P"]),
            C.foreign_key("o_custkey", customer, "c_custkey"),
        ],
    )


def q_customers_rfm(spark, sf_dir):
    """RFM segmentation (recency / frequency / monetary) per customer
    from orders: days since last order relative to the corpus max
    date, order count, exact-decimal total spend, and a fixed-
    threshold segment label. The max date is a broadcast 1-row
    aggregate (tiny dim — the cost is one extra stage, acceptable for
    a once-per-run scalar); everything else is one shuffle on the
    customer key."""
    orders = _t(spark, sf_dir, "orders")
    maxd = F.broadcast(
        orders.agg(F.to_date(F.max("o_orderdate")).alias("__maxd"))
    )
    per_cust = (
        orders.crossJoin(maxd)
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("__maxd"), F.to_date("o_orderdate")))
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(38,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    seg = (
        F.when(
            (F.col("recency_days") <= 30) & (F.col("frequency") >= 10),
            F.lit("champion"),
        )
        .when(F.col("recency_days") <= 30, F.lit("recent"))
        .when(F.col("frequency") >= 10, F.lit("loyal"))
        .otherwise(F.lit("at_risk"))
    )
    return per_cust.select(
        F.col("o_custkey").alias("custkey"),
        "recency_days",
        "frequency",
        "monetary",
        seg.alias("segment"),
    )


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17-style small-quantity revenue: lineitems below 20% of
    their part's average quantity — the correlated scalar subquery
    decorrelated into an aggregate + equi-join on partkey."""
    li = _t(spark, sf_dir, "lineitem")
    avg_qty = li.groupBy("l_partkey").agg(
        pround(
            (dsum("l_quantity") / F.count("*")) * F.lit(0.2), 6
        ).alias("__thresh")
    )
    return (
        li.join(avg_qty, "l_partkey")
        .where(F.col("l_quantity") < F.col("__thresh"))
        .agg(
            dsum("l_extendedprice").alias("sum_price"),
            F.count("*").alias("n"),
        )
    )


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7-style two-nation volume: revenue shipped between
    NATION_1 and NATION_2 (both directions) by year. The fixed-size
    nation dim joins twice under different roles; the fact chain
    shuffles on its join keys."""
    nation = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    supp_n = F.broadcast(nation.select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
    ))
    cust_n = F.broadcast(nation.select(
        F.col("n_nationkey").alias("__cnk"), F.col("n_name").alias("cust_nation")
    ))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(supp_n, supplier.s_nationkey == F.col("__snk"))
        .join(cust_n, customer.c_nationkey == F.col("__cnk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.to_date("l_shipdate")).alias("l_year"),
        )
        .agg(dsum(rev, scale=6).alias("revenue"))
    )


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19-style disjunctive-predicate revenue: OR of
    brand/size/quantity conjunctions across the part join — the shape
    that exercises predicate normalization and join-condition
    filtering."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 30)
        & F.col("l_quantity").between(10, 25)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(dsum(rev, scale=6).alias("revenue"), F.count("*").alias("n"))
    )


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2-style minimum-cost supplier: for each EUROPE-shippable
    part of one size/type, the supplier(s) with minimum account balance
    among those that actually ship it. The synthetic schema has no
    partsupp, so part↔supplier pairs derive from lineitem; the
    correlated MIN subquery is decorrelated into a partition-window
    minimum (one shuffle on p_partkey serves both the min and the
    filter)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    # nation/region are fixed-size at any SF — broadcast; supplier
    # scales, so its join strategy is left to stats
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    w = Window.partitionBy("p_partkey")
    return (
        part.join(ps, part.p_partkey == ps.l_partkey)
        .join(supp, ps.l_suppkey == supp.s_suppkey)
        .withColumn("__min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("__min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey")
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8-style national market share: of all PROMO-part revenue
    sold to ASIA customers, the share supplied by NATION_2, by order
    year. The nation dim joins twice under different roles (customer
    region membership, supplier nation name)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_n = F.broadcast(
        nation.join(region, nation.n_regionkey == region.r_regionkey).select(
            F.col("n_nationkey").alias("__cnk")
        )
    )
    supp_n = F.broadcast(
        nation.select(F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    nat_rev = F.when(F.col("supp_nation") == "NATION_2", rev).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(cust_n, customer.c_nationkey == F.col("__cnk"))
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(supp_n, supplier.s_nationkey == F.col("__snk"))
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year(F.to_date("o_orderdate")).alias("o_year"))
        .agg(
            pround(dsum(nat_rev, scale=6) / dsum(rev, scale=6), 6).alias("mkt_share")
        )
    )


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9-style product-type profit: per supplier nation and
    order year, profit on 'gear' parts. Without ps_supplycost the cost
    side is p_retailprice·quantity — the plan shape (fact chain joined
    to part + supplier-nation, signed decimal aggregation) is Q9's."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").contains("gear"))
    nation = F.broadcast(_t(spark, sf_dir, "nation"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year(F.to_date("o_orderdate")).alias("o_year"),
        )
        .agg(dsum(amount, scale=6).alias("sum_profit"))
    )


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11-style important stock: parts whose shipped value from
    NATION_3 suppliers exceeds a fraction of the national total — the
    GROUP BY + HAVING-over-scalar-subquery shape. The one-row total is
    broadcast; both sides aggregate through the same exact decimal
    path, so the threshold compare is engine-portable."""
    li = _t(spark, sf_dir, "lineitem")
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    val = F.col("l_extendedprice") * F.col("l_quantity")
    base = li.join(supp, li.l_suppkey == supp.s_suppkey)
    grouped = base.groupBy("l_partkey").agg(dsum(val, scale=6).alias("value"))
    total = base.agg((dsum(val, scale=6) * F.lit(0.001)).alias("__thresh"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .where(F.col("value") > F.col("__thresh"))
        .select("l_partkey", "value")
    )


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12-style shipping-priority check: 1996 lineitems by line
    status (the synthetic schema's stand-in for ship mode), counting
    critical- vs low-priority orders — join + conditional aggregation."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13-style customer order-count distribution: LEFT OUTER
    join so zero-order customers survive, then a histogram of
    per-customer counts (two cascaded aggregations)."""
    customer = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15-style top supplier: supplier(s) hitting the maximum
    half-year revenue — the revenue view + scalar-max subquery, with
    the one-row max broadcast back over the view."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1996-07-01").cast("date"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = li.groupBy("l_suppkey").agg(dsum(rev, scale=6).alias("total_revenue"))
    mx = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    supplier = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__max_rev"))
        .join(supplier, F.col("l_suppkey") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16-style parts/supplier relationship: distinct supplier
    count per (brand, type, size) over shippable pairs, excluding one
    brand, a size set, and low-balance suppliers (the complaints
    anti-join)."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1") & F.col("p_size").isin(1, 5, 10, 15, 20, 25)
    )
    bad_supp = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 1000).select(
        F.col("s_suppkey").alias("__bad")
    )
    return (
        ps.join(part, ps.l_partkey == part.p_partkey)
        .join(bad_supp, ps.l_suppkey == F.col("__bad"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20-style part promotion: NATION_2 suppliers who shipped
    more than 30% of some 'small' part's 1996 volume — nested aggregate
    threshold + semi-join chain, decorrelated into two aggregations
    sharing one shuffle key (l_partkey)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01").cast("date"))
    )
    part = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("small")).select(
        "p_partkey"
    )
    li96 = li.join(part, li.l_partkey == part.p_partkey, "left_semi")
    per_ps = li96.groupBy("l_partkey", "l_suppkey").agg(
        dsum("l_quantity").alias("qty")
    )
    per_part = li96.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (dsum("l_quantity") * F.lit(0.3)).alias("__thresh")
    )
    qualified = (
        per_ps.join(per_part, per_ps.l_partkey == F.col("__pk"))
        .where(F.col("qty") > F.col("__thresh"))
        .select("l_suppkey")
        .distinct()
    )
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(qualified, F.col("s_suppkey") == qualified.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21-style suppliers who kept orders waiting: NATION_1
    suppliers with a returned line in a finished multi-supplier order
    where no OTHER supplier had a return — the EXISTS + NOT-EXISTS
    pair as a semi-join then anti-join, both on (orderkey, suppkey≠)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    nation = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name")
    )
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .join(orders, li.l_orderkey == orders.o_orderkey, "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select("l_orderkey", "l_suppkey", "s_name")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    ).distinct()
    l3 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3"))
        .distinct()
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == F.col("__ok2")) & (l1.l_suppkey != F.col("__sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("__ok3"))
            & (F.col("l_suppkey") != F.col("__sk3")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


def q_orders_topn_per_cust(spark, sf_dir):
    """Top-3 orders per customer by price (rank window, id tiebreak)
    for the first 50 customers — the grouped-top-k pattern."""
    o = _t(spark, sf_dir, "orders").where(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


def q_events_daily(spark, sf_dir):
    """Tumbling daily window per event_type — the batch twin of the
    streaming windowed aggregation (SURVEY §2.2 op 15 / streaming).
    Session timezone is UTC, so to_date matches the oracle's
    CAST(ts AS DATE) on the naive µs timestamps."""
    ev = _events(spark, sf_dir)
    day = F.to_date("ts")
    return (
        ev.groupBy(day.alias("day"), "event_type")
        .agg(
            F.count("*").alias("n"),
            dsum("value", scale=6).alias("sum_value"),
            pround(dsum("value", scale=6) / F.count("*"), 6).alias("avg_value"),
        )
    )


_SESSION_GAP_US = 30 * 60 * 1_000_000


def q_events_sessions(spark, sf_dir):
    """Gap-based sessionization (30-min inactivity): per-user session
    windows with event counts and value totals — the batch twin of a
    streaming session-window aggregation. One shuffle on user_id
    shared by both windows and the final grouping."""
    # integer microseconds on both engines: unix_micros here,
    # epoch_us() in the DuckDB oracle
    ev = _events(spark, sf_dir).withColumn("tsu", F.unix_micros("ts"))
    w = Window.partitionBy("user_id").orderBy("tsu", "event_id")
    new_sess = F.when(
        F.lag("tsu").over(w).isNull()
        | ((F.col("tsu") - F.lag("tsu").over(w)) > F.lit(_SESSION_GAP_US)),
        F.lit(1),
    ).otherwise(F.lit(0))
    run = Window.partitionBy("user_id").orderBy("tsu", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("__new", new_sess)
        .withColumn("session_idx", F.sum("__new").over(run).cast("long"))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            F.min("tsu").alias("start_ts"),
            F.max("tsu").alias("end_ts"),
            dsum("value", scale=6).alias("sum_value"),
        )
    )


def q_events_asof(spark, sf_dir):
    """As-of join (purchase → most recent at-or-before click per
    user), aggregated per user. The union+window formulation shuffles
    once on user_id with zero row explosion, and the per-user rollup
    reuses that partitioning (operators/temporal.py; DuckDB oracle is
    a native ASOF LEFT JOIN). Gap arithmetic is integer microseconds
    on both engines (tie-proof: output uses only matched timestamps,
    never matched payloads)."""
    ev = _events(spark, sf_dir).withColumn("tsu", F.unix_micros("ts"))
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "tsu", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "tsu")
    joined = asof_join(
        purchases, clicks, on="tsu", by="user_id", direction="backward"
    )
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_purchases"),
        F.count("tsu_matched").alias("n_matched"),
        F.sum(F.col("tsu") - F.col("tsu_matched")).alias("sum_gap_us"),
    )


_RANGE_JOIN_WINDOW_US = 24 * 3600 * 1_000_000


def q_events_range_join(spark, sf_dir):
    """Bounded range join (clicks within 24 hours strictly after
    each error, same user), aggregated per user. The interval
    predicate becomes an equi-join on (user_id, time-bucket) with each
    error row covering ≤ 2 buckets — bounded pair counts per task
    regardless of key heat (operators/temporal.py)."""
    ev = _events(spark, sf_dir).withColumn("tsu", F.unix_micros("ts"))
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id", "tsu", "event_id"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("tsu").alias("ctsu"),
        F.col("value").alias("cvalue"),
    )
    pairs = range_join(
        errors,
        clicks,
        on="tsu",
        right_on="ctsu",
        lower=0,
        upper=_RANGE_JOIN_WINDOW_US,
        by="user_id",
        include_lower=False,
    )
    return pairs.groupBy("user_id").agg(
        F.count("*").alias("n_pairs"),
        F.countDistinct("event_id").alias("n_errors"),
        dsum("cvalue", scale=4).alias("click_value"),
    )


def q_events_cube(spark, sf_dir):
    """CUBE (event_type, user_id % 10): all four grouping-set levels
    in one pass."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("user_shard", (F.col("user_id") % 10).cast("long"))
        .cube("event_type", "user_shard")
        .agg(F.count("*").alias("n"))
    )


def q_events_rollup(spark, sf_dir):
    """ROLLUP (event_type, day): grouping-set totals at three levels in
    one pass (partial aggregation handles all levels map-side)."""
    ev = _events(spark, sf_dir)
    day = F.to_date("ts")
    return (
        ev.withColumn("day", day)
        .rollup("event_type", "day")
        .agg(F.count("*").alias("n"), dsum("value", scale=6).alias("sum_value"))
    )


def q_events_quantiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile``
    == DuckDB ``quantile_cont``: both compute the same linear
    interpolation over the sorted group)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        pround(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        pround(F.percentile("value", F.lit(0.95)), 6).alias("p95"),
    )


def q_events_distinct_users(spark, sf_dir):
    """Exact COUNT(DISTINCT user) per event_type via the salted
    two-phase plan (functions.skew): the hot event_type's user set is
    partitioned across salt buckets by value hash — no single reducer
    holds a whole hot key's state."""
    from margaret_spark.functions.skew import salted_distinct_count

    ev = _events(spark, sf_dir)
    return salted_distinct_count(ev, ["event_type"], "user_id", salt=16)


def q_events_funnel(spark, sf_dir):
    """view→click→purchase funnel per user
    (operators.temporal.funnel): deepest ordered stage reached, with
    each stage's binding (earliest qualifying) event time. One
    shuffle on user_id; stages are stacked unbounded-min windows, not
    self-joins."""
    from margaret_spark.operators.temporal import funnel

    ev = _events(spark, sf_dir).select(
        "user_id", F.unix_micros("ts").alias("tsu"), "event_type"
    )
    return funnel(ev, "user_id", "tsu", "event_type", ["view", "click", "purchase"])


def q_events_approx_distinct(spark, sf_dir):
    """HLL++ approximate COUNT(DISTINCT user) per event_type — the
    sketch path for cardinality at 100 TB: fixed-size mergeable state
    per group (vs. the exact salted plan's full key set), partial
    aggregation map-side, one narrow shuffle of sketches. No SQL
    oracle (HLL layouts are engine-specific); tests bound the relative
    error against the exact twin (q_events_distinct_users)."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


def q_events_approx_quantiles(spark, sf_dir):
    """Approximate p50/p95/p99 of value per event_type
    (Greenwald-Khanna sketch): bounded-memory mergeable summaries —
    the quantile path that scales where exact interpolation
    (q_events_quantiles) needs a per-group sort. No SQL oracle
    (sketch semantics are engine-specific); tests bound the rank
    error against the exact twin."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("approx_pcts")
    )


def q_stream_events_daily(spark, sf_dir):
    """events consumed as a STREAM: file-source + watermarked 1-day
    tumbling window, drained with availableNow and materialized — the
    result must equal the batch/SQL daily counts exactly. Puts the
    Structured Streaming path itself on the oracle-checked surface."""
    import tempfile

    from margaret_spark.streaming import windowed_agg

    # the file source wants a directory: stream the sf dir, filtered
    # down to the events table's file
    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = sdf.select(F.col("ts").alias("ets"), "event_type")
    agg = windowed_agg(ev, "ets", keys=["event_type"], window="1 day", watermark="0 seconds")

    from margaret_spark.streaming.sinks import read_batch_sink, write_batch

    base = tempfile.mkdtemp(prefix="stream_daily_")
    try:
        sink = os.path.join(base, "sink")

        # update-mode emits each key's CURRENT count when it changes;
        # stamping the batch id lets the read take latest-per-key —
        # all executor-side (no driver dict)
        def on_batch(bdf, bid):
            write_batch(bdf.withColumn("__b", F.lit(bid)), bid, sink)

        q = (
            agg.writeStream.foreachBatch(on_batch)
            .outputMode("update")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = read_batch_sink(
            spark, sink,
            "window_start timestamp, event_type string, n long, __b long",
        )
        return out.groupBy(
            F.to_date("window_start").alias("day"), "event_type"
        ).agg(F.max_by("n", "__b").cast("long").alias("n"))
    finally:
        _defer_cleanup(base)


def q_events_pivot(spark, sf_dir):
    """Pivoted daily event matrix: one row per day, one column per
    event type (explicit category list — an open-ended pivot would
    need a driver-side distinct pass before planning). Spark compiles
    pivot-with-count to TWO aggregates: a count keyed on (day,
    event_type), then the pivotfirst aggregate keyed on day — two
    exchanges, both map-side combined."""
    ev = _events(spark, sf_dir)
    cats = ["click", "error", "purchase", "signup", "view"]
    out = (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", cats)
        .count()
    )
    # pivot leaves NULL for absent (day, type) cells; the count is 0
    return out.select(
        "day", *[F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c) for c in cats]
    )


def q_stream_events_enriched(spark, sf_dir):
    """STREAM-STATIC join on the graded surface: events consumed as a
    stream (availableNow) joined per micro-batch against the static
    customer dimension (broadcast — the stream side never shuffles),
    aggregated to per-nation event counts. The oracle is the plain
    batch join, so the streaming join path itself is oracle-checked."""
    import tempfile

    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    cust = F.broadcast(
        _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    )
    joined = sdf.join(cust, sdf.user_id == cust.c_custkey)

    from margaret_spark.streaming.sinks import read_batch_sink, write_batch

    base = tempfile.mkdtemp(prefix="stream_enrich_")
    try:
        sink = os.path.join(base, "sink")

        # per-batch aggregate PARTIALS written executor-side; the read
        # sums them — append semantics, replay-idempotent via the
        # overwrite-per-batch partition rule
        def on_batch(bdf, bid):
            write_batch(
                bdf.groupBy("c_nationkey").agg(F.count("*").alias("n")),
                bid, sink,
            )

        q = (
            joined.writeStream.foreachBatch(on_batch)
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = read_batch_sink(spark, sink, "c_nationkey long, n long")
        return out.groupBy("c_nationkey").agg(
            F.sum("n").cast("long").alias("n_events")
        )
    finally:
        _defer_cleanup(base)


def q_stream_events_asof(spark, sf_dir):
    """The AS-OF join AS A STATEFUL STREAMING OPERATOR
    (streaming/stateful.stream_asof_join, applyInPandasWithState):
    purchases and clicks tagged into one keyed stream, the state
    store holding each user's click-timestamp history, one match row
    per purchase — semantics Spark's built-in stream-stream joins
    cannot express. Per-user partial aggregates (not match rows) are
    merged additively across micro-batches on the driver — the same
    accumulate-partials pattern as the other stream harnesses — then
    aggregated identically to the batch events_asof,
    and checked against the SAME DuckDB native ASOF JOIN oracle: the
    custom streaming operator itself is on the hash-exact surface."""
    import shutil
    import tempfile

    from margaret_spark.streaming.stateful import stream_asof_join

    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    tagged = sdf.where(F.col("event_type").isin("purchase", "click")).select(
        F.col("user_id").alias("k"),
        F.when(F.col("event_type") == "purchase", F.lit("L"))
        .otherwise(F.lit("R"))
        .alias("side"),
        F.unix_micros("ts").alias("tsu"),
    )
    # only per-user PARTIALS cross the driver (count / matched-count /
    # gap-sum merge additively across micro-batches) — never the
    # per-event match rows
    acc: dict = {}

    def on_rows(pdf):
        for r in pdf.itertuples(index=False):
            k = int(r.k)
            n, m, g = acc.get(k, (0, 0, 0))
            if pd.isna(r.tsu_matched):
                acc[k] = (n + 1, m, g)
            else:
                acc[k] = (n + 1, m + 1, g + int(r.tsu) - int(r.tsu_matched))

    ckpt = tempfile.mkdtemp(prefix="stream_asof_")
    try:
        stream_asof_join(tagged, ckpt, on_rows)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    rows = [
        (k, n, m, g if m else None) for k, (n, m, g) in acc.items()
    ]
    return spark.createDataFrame(
        rows, "user_id long, n_purchases long, n_matched long, sum_gap_us long"
    )


def q_stream_topk_windowed(spark, sf_dir):
    """WINDOWED streaming top-k: the same stateful bounded-heap
    operator, keyed on a (day-bucket | event_type) composite — the
    per-time-window leaderboard (top 3 events per type per day). The
    state key IS the window, so closed windows cost exactly k entries
    forever and no window ever rescans history; the composite-string
    key shows the operator composes to any keying without code
    changes. Hash-exact against the batch ranking window partitioned
    by (day, type)."""
    import tempfile

    from pyspark.sql import Window

    from margaret_spark.streaming.stateful import stream_topk

    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    tagged = sdf.where(F.col("value").isNotNull()).select(
        F.concat(
            F.date_format("ts", "yyyy-MM-dd"), F.lit("|"), F.col("event_type")
        ).alias("k"),
        F.col("event_id").alias("item"),
        F.col("value").alias("score"),
    )
    base = tempfile.mkdtemp(prefix="stream_topk_w_")
    out = os.path.join(base, "out")

    def on_batch(bdf, bid):
        bdf.withColumn("__bid", F.lit(bid)).write.mode("append").parquet(out)

    try:
        stream_topk(tagged, 3, os.path.join(base, "ckpt"), on_batch)
        res = spark.read.parquet(out)
        final = (
            res.withColumn("__mx", F.max("__bid").over(Window.partitionBy("k")))
            .where(F.col("__bid") == F.col("__mx"))
            .select(
                F.split_part(F.col("k"), F.lit("|"), F.lit(1)).alias("day"),
                F.split_part(F.col("k"), F.lit("|"), F.lit(2)).alias("event_type"),
                F.col("item").alias("event_id"),
                "score",
                "rank",
            )
        )
    finally:
        _defer_cleanup(base)
    return final


def q_stream_topk(spark, sf_dir):
    """Streaming per-key top-k retrieval
    (streaming/stateful.stream_topk, applyInPandasWithState): per
    event_type, the 5 highest-value events, maintained as a BOUNDED
    per-key heap in the state store (O(keys·k) state forever) and
    re-emitted on change. Micro-batch outputs are sunk to parquet
    with their batch id — no driver collect — and the latest emission
    per key is read back for grading. Hash-exact against the batch
    window row_number() OVER (PARTITION BY event_type ORDER BY value
    DESC, event_id): incremental top-k merge under a total order is
    exact regardless of micro-batching. NULL scores are excluded on
    both sides (no rank under a total order)."""
    import tempfile

    from pyspark.sql import Window

    from margaret_spark.streaming.stateful import stream_topk

    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    tagged = sdf.where(F.col("value").isNotNull()).select(
        F.col("event_type").alias("k"),
        F.col("event_id").alias("item"),
        F.col("value").alias("score"),
    )
    base = tempfile.mkdtemp(prefix="stream_topk_")
    out = os.path.join(base, "out")

    def on_batch(bdf, bid):
        bdf.withColumn("__bid", F.lit(bid)).write.mode("append").parquet(out)

    try:
        stream_topk(tagged, 5, os.path.join(base, "ckpt"), on_batch)
        res = spark.read.parquet(out)
        final = (
            res.withColumn(
                "__mx", F.max("__bid").over(Window.partitionBy("k"))
            )
            .where(F.col("__bid") == F.col("__mx"))
            .select(
                F.col("k").alias("event_type"),
                F.col("item").alias("event_id"),
                "score",
                "rank",
            )
        )
    finally:
        _defer_cleanup(base)
    return final


def q_events_resample(spark, sf_dir):
    """Time-series resampling with gap filling
    (operators.timeseries.resample): the high-value event stream
    bucketed onto a dense 6-hour grid per event_type — empty buckets
    MATERIALIZED (n=0, NULL sum) and forward-filled (last_value
    IGNORE NULLS), the step between raw events and anything assuming
    a dense time axis. The value filter keeps the stream sparse so
    gaps actually occur. All epoch-µs integer arithmetic + exact
    DECIMAL sums — hash-exact."""
    from margaret_spark.operators.timeseries import resample

    ev = _events(spark, sf_dir).where(F.col("value") >= 150.0)
    return resample(
        ev, "event_type", "ts", "value", interval_s=21_600
    )


def q_events_skew_report(spark, sf_dir):
    """Key-distribution diagnostic (functions.skew.key_skew_report):
    the top-20 heaviest user_ids with their share of the event table —
    the pre-flight a 100 TB pipeline runs before choosing a join/agg
    strategy (a key above ~1/salt of the table wants the salted
    two-phase operators this module provides). Map-side-combined
    count per key, TakeOrdered top-k, window over the 20 survivors;
    shares are IEEE double of exact integers — hash-exact."""
    from margaret_spark.functions.skew import key_skew_report

    return key_skew_report(_events(spark, sf_dir), "user_id", k=20)


def q_events_cms(spark, sf_dir):
    """Count-Min sketch (functions.cms): depth-4 × width-64 frequency
    sketch of user_id, probed back over the distinct users and joined
    to the exact counts — est_n ≥ exact_n always (the CMS guarantee),
    with visible overcounts at width 64. Unlike HLL/GK, the sketch is
    deterministic given the md5 hash family, so sketch AND estimates
    are hash-exact cross-engine. The sketch aggregation's shuffle is
    bounded by depth·width rows regardless of input size."""
    from margaret_spark.functions.cms import cms_estimate, cms_sketch

    ev = _events(spark, sf_dir).select("user_id").where(
        F.col("user_id").isNotNull()
    )
    sk = cms_sketch(ev, "user_id", depth=4, width=64)
    est = cms_estimate(sk, ev.distinct(), "user_id", depth=4, width=64)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("exact_n"))
    return est.join(exact, "user_id").select(
        "user_id",
        F.col("est").cast("long").alias("est_n"),
        F.col("exact_n").cast("long").alias("exact_n"),
        (F.col("est") - F.col("exact_n")).cast("long").alias("overcount"),
    )


def q_events_hist_quantiles(spark, sf_dir):
    """Quantiles off the additive equi-width histogram
    (operators.profiling.histogram_quantiles): per event_type, the
    p10/p50/p90/p99 of value by cumulative-count interpolation — the
    deterministic, MERGEABLE quantile summary beside the
    engine-internal GK (approx_quantiles, graded rows-only). Integer
    cumsums + ceil(q·N) ranks + one interpolation tree: hash-exact.
    One bounded aggregation; everything after is ≤ groups×bins rows."""
    from margaret_spark.operators.profiling import histogram_quantiles

    ev = _events(spark, sf_dir)
    return histogram_quantiles(
        ev, "value", [0.1, 0.5, 0.9, 0.99], bins=64, group_col="event_type"
    )


def q_events_hll(spark, sf_dir):
    """HyperLogLog register table (functions.hll): 256 registers over
    user_id on the deterministic md5 hash family — unlike the engine-
    internal approx_count_distinct, the sketch TABLE reproduces
    bit-for-bit in any engine (60-bit hex hash, bucket = h mod 256,
    rank = first-1-bit position of the 52-bit value field via exact
    string ops). One aggregation, shuffle bounded by 256 rows."""
    from margaret_spark.functions.hll import hll_sketch

    ev = _events(spark, sf_dir).select("user_id").where(
        F.col("user_id").isNotNull()
    )
    return hll_sketch(ev, "user_id", p=8)


def q_events_hll_estimate(spark, sf_dir):
    """The RAW HLL estimator beside the exact count: α·m²·2^K over an
    integer harmonic sum (each summand an exact power of two
    accumulated as a long — order-independent), one IEEE division,
    pround — hash-exact, which log-based sketch estimators never are.
    The production small-range correction (ln — not cross-engine
    bit-identical) is pinned in pytest instead."""
    from margaret_spark.functions.hll import hll_estimate, hll_sketch

    ev = _events(spark, sf_dir).select("user_id").where(
        F.col("user_id").isNotNull()
    )
    est = hll_estimate(hll_sketch(ev, "user_id", p=8), p=8, corrected=False)
    exact = ev.agg(F.countDistinct("user_id").cast("long").alias("exact_n"))
    return est.crossJoin(exact)


def q_events_zorder_key(spark, sf_dir):
    """Z-order/Morton layout key (operators.layout, the Delta/Iceberg
    OPTIMIZE ZORDER construction): events keyed by the bit-interleave
    of (user_id mod 256, hour-of-day) — 8 bits each, bit j of column
    i at position j·2+i. write_zordered clusters files by contiguous
    z-ranges so row-group min/max stats bound BOTH dimensions (the
    pruning payoff is pinned on real parquet footers in
    tests/test_layout.py); this graded surface is the key arithmetic
    itself, hash-exact (pure integer shifts summed over disjoint
    bits)."""
    from margaret_spark.operators.layout import zorder_key

    ev = _t(spark, sf_dir, "events")
    ub = F.pmod(F.col("user_id"), F.lit(256)).cast("long")
    hb = F.hour(F.col("ts")).cast("long")
    return ev.select(
        "event_id",
        ub.alias("ub"),
        hb.alias("hb"),
        zorder_key([ub, hb], bits=8).alias("zkey"),
    )


def q_events_kmv(spark, sf_dir):
    """KMV distinct sketch (functions.kmv, Beyer et al. 2007): the 64
    smallest distinct md5-derived 48-bit user hashes — the one sketch
    in the family that supports set operations (intersection
    estimates, which HLL registers cannot express). One distinct
    aggregate + TakeOrdered(64); hash-exact."""
    from margaret_spark.functions.kmv import kmv_sketch

    ev = _t(spark, sf_dir, "events")
    return kmv_sketch(ev, "user_id", k=64)


def q_events_kmv_estimate(spark, sf_dir):
    """The kth-minimum distinct estimator over the KMV sketch:
    (n_sketch, kth, estimate) with estimate = (k−1)·2^48/h_(k) when
    the sketch is full, exact count otherwise. At sf0.01 (150 distinct
    users > k=64) the estimator path engages. Hash-exact: integer
    inputs under one IEEE multiply/divide + pround."""
    from margaret_spark.functions.kmv import kmv_estimate, kmv_sketch

    ev = _t(spark, sf_dir, "events")
    return kmv_estimate(kmv_sketch(ev, "user_id", k=64), k=64)


def q_events_kmv_intersect(spark, sf_dir):
    """KMV multiset intersection — "how many users do two corpora
    SHARE" without an exact join: sketch A = purchasers with
    user_id%3≠0, sketch B = even users; X = the union's KMV, K∩ = X
    members present in both sides, est_intersection = (K∩/|X|)·
    est(|A∪B|). The set-operation capability that justifies KMV next
    to HLL. Hash-exact."""
    from margaret_spark.functions.kmv import kmv_intersect, kmv_sketch

    ev = _t(spark, sf_dir, "events")
    a = kmv_sketch(
        ev.where(
            (F.col("event_type") == "purchase") & (F.col("user_id") % 3 != 0)
        ),
        "user_id",
        k=64,
    )
    b = kmv_sketch(ev.where(F.col("user_id") % 2 == 0), "user_id", k=64)
    return kmv_intersect(a, b, k=64)


def q_events_hll_groups(spark, sf_dir):
    """Per-group HLL (functions.hll with group_col): one independent
    256-register sketch per event_type, raw estimates beside exact
    distinct counts — the per-segment cardinality tracker. Same
    hash-exact arithmetic as events_hll_estimate, shuffle bounded by
    groups × 256 rows."""
    from margaret_spark.functions.hll import hll_estimate, hll_sketch

    ev = _events(spark, sf_dir).select("event_type", "user_id").where(
        F.col("user_id").isNotNull()
    )
    sk = hll_sketch(ev, "user_id", p=8, group_col="event_type")
    est = hll_estimate(sk, p=8, corrected=False, group_col="event_type")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("long").alias("exact_n")
    )
    return est.join(exact, "event_type")


def q_stream_histogram(spark, sf_dir):
    """Streaming equi-width histogram (streaming/cms.py
    stream_histogram): the distribution member of the
    additive-partial family — a FIXED grid (32 bins over [0, 4096])
    so per-micro-batch partials merge by re-sum; the global histogram
    equals the batch histogram of the whole corpus, which is exactly
    what the oracle states."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_histogram, stream_histogram

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("string").alias("v")
    )
    base = tempfile.mkdtemp(prefix="stream_hist_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="v", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_histogram(
            log,
            F.col("value").cast("double"),
            sink,
            os.path.join(base, "ckpt"),
            bins=32,
            lo=0.0,
            hi=4096.0,
            available_now=True,
        )
        out = read_histogram(spark, sink).select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("n").cast("long").alias("n"),
        )
        return out
    finally:
        _defer_cleanup(base)


def q_events_bloom(spark, sf_dir):
    """Bloom filter (functions.bloom): m=512/k=4 membership filter
    built over the EVEN user ids, probed back over every distinct
    user and compared to ground truth — member is TRUE for every
    inserted key (no false negatives, the Bloom guarantee), and the
    visible false positives at this fill rate are themselves
    deterministic: the bit table uses the same md5 hash family as the
    CMS, so filter AND verdicts are hash-exact cross-engine. Build is
    one distinct aggregation bounded by m rows; the probe broadcasts
    the bit table."""
    from margaret_spark.functions.bloom import bloom_build, bloom_probe

    ev = _events(spark, sf_dir).select("user_id").where(
        F.col("user_id").isNotNull()
    )
    ins = ev.where(F.col("user_id") % 2 == 0)
    bits = bloom_build(ins, "user_id", m_bits=512, k_hashes=4)
    probed = bloom_probe(
        bits, ev.distinct(), "user_id", m_bits=512, k_hashes=4
    )
    return probed.select(
        "user_id",
        F.col("member"),
        (F.col("user_id") % 2 == 0).alias("actual"),
    )


def q_stream_bloom(spark, sf_dir):
    """Streaming Bloom filter (streaming/cms.py stream_bloom): the
    membership twin of stream_cms — each micro-batch writes its own
    partial bit table (overwrite per batch=<id>, replay-idempotent),
    and the global filter is the union-distinct of the partials (bits
    OR). The merged filter equals the batch filter of the whole
    corpus, which is exactly what the oracle states."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_bloom, stream_bloom

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = tempfile.mkdtemp(prefix="stream_bloom_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="source", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_bloom(
            log,
            F.col("value"),
            sink,
            os.path.join(base, "ckpt"),
            m_bits=256,
            k_hashes=4,
            available_now=True,
        )
        out = read_bloom(spark, sink).select(
            F.col("bit").cast("long").alias("bit")
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_kmv(spark, sf_dir):
    """Streaming KMV (streaming/cms.stream_kmv): the set-operations
    member of the mergeable-partial family — each micro-batch writes
    its own <= k smallest distinct user hashes (replay-idempotent
    batch=<id> overwrite), and the global sketch is the k smallest of
    their union, equal to the batch sketch of the whole stream
    (min-k is a lossless union fold) — exactly what the oracle
    states. Completes the streaming twins: CMS sum, Bloom OR, HLL
    max, histogram add, KMV union-cut."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_kmv, stream_kmv

    ev = _t(spark, sf_dir, "events").select("event_id", "user_id")
    base = tempfile.mkdtemp(prefix="stream_kmv_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.LongType())
        log.append_df(ev, value_col="user_id", order_by="event_id")
        sink = os.path.join(base, "sink")
        stream_kmv(
            log, F.col("value"), sink, os.path.join(base, "ckpt"), k=64
        )
        out = read_kmv(spark, sink, k=64)
        return out
    finally:
        _defer_cleanup(base)


def q_stream_hll(spark, sf_dir):
    """Streaming HyperLogLog (streaming/cms.py stream_hll): the
    cardinality member of the additive-partial trio — each micro-batch
    writes its own partial register table (replay-idempotent
    batch=<id> overwrite), and the global sketch is the per-bucket MAX
    of the partials, equal to the batch sketch of the whole corpus —
    which is exactly what the oracle states."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_hll, stream_hll

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = tempfile.mkdtemp(prefix="stream_hll_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="source", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_hll(
            log,
            F.col("value"),
            sink,
            os.path.join(base, "ckpt"),
            p=8,
            available_now=True,
        )
        out = read_hll(spark, sink).select(
            F.col("bucket").cast("int").alias("bucket"),
            F.col("maxrank").cast("int").alias("maxrank"),
        )
        return out
    finally:
        _defer_cleanup(base)


def q_events_json(spark, sf_dir):
    """JSON codec surface (§2.5 op 37): extract props.k, aggregate."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count("k").alias("n_with_k"),
        )
    )


# ---------------------------------------------------------------------------
# Beyond-reference: dedup / similarity / text / multimodal
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "doc_id", "text")


def q_dedup_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard pairs with the deterministic df-cap
    (max_df='auto' = max(100, n_docs/2)): shingles in over half the
    corpus are dropped by a broadcast stop-list anti-join BEFORE the
    posting lists form, so no O(df²) in-array pair blow-up survives at
    any corpus size. The oracle mirrors the cap with the same
    HAVING-count stop CTE, so results stay hash-exact on the capped
    universe."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )


def q_dedup_minhash(spark, sf_dir):
    """MinHash-LSH verified pairs (no SQL oracle: hash-permutation
    banding isn't expressible; the exact twin is q_dedup_jaccard)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.2)


def q_dedup_simhash(spark, sf_dir):
    """SimHash hamming pairs (no SQL oracle: bit-sig banding).
    max_hamming=3 on 64-bit signatures is the classic near-dup
    setting; with 4 pigeonhole blocks of 16 bits, block buckets stay
    small and the candidate join cheap."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=3)


def q_dedup_embedding(spark, sf_dir):
    """Candidate-based embedding near-dup (the 100 TB path): vectors
    are assigned to their nearest IVF cell (same deterministic seeded
    centroids as ann_ivf) and pairs are cosine-verified WITHIN a cell
    only — an equi-join keyed on cell id, O(N²/nlist) cosines, never
    the all-pairs O(N²) stage. The oracle mirrors the cell CTE, so the
    candidates+verify result is hash-exact. The exact all-pairs mode
    remains available as ``embedding_dedup_pairs`` (blocked-matrix
    scoring) for corpora small enough to afford it."""
    from margaret_spark.operators.dedup import embedding_dedup_pairs_ivf

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_dedup_pairs_ivf(
        emb, "vec_id", "embedding", threshold=0.45, nlist=16
    )


def q_dedup_cross_corpus(spark, sf_dir):
    """Cross-corpus near-dup JOIN (dedup.ngram_jaccard_join): the
    even-id half of the corpus (existing) against the odd-id half
    (new crawl) at exact n-gram Jaccard ≥ 0.2 — the near-dup version
    of dedup_incremental, completing the ingest-dedup matrix (exact /
    containment / near-dup). Same group-then-combine shape and
    max_df='auto' cap (resolved over the COMBINED corpora) as the
    self-join; the oracle mirrors both."""
    from margaret_spark.operators.dedup import ngram_jaccard_join

    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_join(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "doc_id",
        "text",
        threshold=0.2,
        mode="word",
        n=3,
        max_df="auto",
    )


def q_dedup_spans(spark, sf_dir):
    """Exact-substring duplicate SPANS (dedup.duplicate_spans): the
    maximal cross-document repeated word-8-gram runs of every
    document, as 1-based inclusive token intervals — span-level dedup
    (Lee et al. 2022), the repeated-passage detector document-level
    jaccard can't express. Min/max-only gram aggregation (no posting
    lists, no O(df²)), equi-join back on the 32-byte gram hash,
    gaps-and-islands merge per document."""
    from margaret_spark.operators.dedup import duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return duplicate_spans(docs, "doc_id", "text", n=8, scope="cross_doc")


def q_dedup_span_stats(spark, sf_dir):
    """Per-document duplicated-token mass (dedup.duplicate_span_stats):
    the share of each document covered by cross-document duplicate
    spans — the cut-threshold signal built on q_dedup_spans (spans are
    maximal and disjoint, so their lengths sum exactly)."""
    from margaret_spark.operators.dedup import duplicate_span_stats

    docs = _t(spark, sf_dir, "documents")
    return duplicate_span_stats(docs, "doc_id", "text", n=8, scope="cross_doc")


def q_dedup_span_cut(spark, sf_dir):
    """Keep-first span removal (dedup.cut_duplicate_spans): every
    cross-document duplicated word-8-gram passage is cut from all but
    its first-occurrence (min doc_id) document and the surviving
    tokens rejoined — the transformation half of span-level dedup
    (q_dedup_spans reports, this rewrites). Same min-only gram
    aggregation + islands merge, plus one codegen array filter to
    rebuild the text."""
    from margaret_spark.operators.dedup import cut_duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return cut_duplicate_spans(docs, "doc_id", "text", n=8)


def q_dedup_span_cut_all(spark, sf_dir):
    """Strict keep-ONE-occurrence span removal
    (dedup.cut_duplicate_spans(keep='first_occurrence')): exactly one
    copy of every duplicated word-8-gram passage survives corpus-wide
    — the first in (doc_id, position) order — so repeats WITHIN the
    owner document are cut too (the strict Lee-et-al semantic;
    q_dedup_span_cut is the cross-document-only variant)."""
    from margaret_spark.operators.dedup import cut_duplicate_spans

    docs = _t(spark, sf_dir, "documents")
    return cut_duplicate_spans(
        docs, "doc_id", "text", n=8, keep="first_occurrence"
    )


def q_dedup_clusters(spark, sf_dir):
    """Connected components over the jaccard near-dup pairs: every doc
    labeled with the min doc_id of its duplicate component (iterative
    min-label propagation — the one algorithm here that is a driver
    LOOP of DataFrame jobs, converging in O(diameter) rounds)."""
    from margaret_spark.operators.dedup import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return dedup_clusters(docs, pairs, "doc_id")


def q_docs_kcore(spark, sf_dir):
    """k-core of the near-dup graph (graph.k_core, Seidman 1983): the
    maximal subgraph where every document keeps ≥ 2 near-dup
    neighbors — separates REAL template families (mutually similar
    cliques) from incidental pairwise matches before cluster
    collapse. Fixed 4 peel rounds (converges in 1 on this corpus;
    extra rounds are no-ops — pytest pins the fixpoint), so the
    unrolled-CTE oracle is hash-exact."""
    from margaret_spark.operators.graph import k_core

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return k_core(pairs, "id_a", "id_b", k=2, rounds=4)


def q_ann_recall(spark, sf_dir):
    """Recall@5 of the IVF index against brute force
    (operators.similarity.ann_recall_at_k) — the eval that justifies
    the nlist/nprobe settings of every other ANN query here. Both
    arms are the library operators at the SAME parameterization as
    ann_topk / ann_ivf; the oracle composes those two queries' SQL as
    CTEs and counts the per-query neighbor-id overlap, so the metric
    (exact integer counts + one IEEE division) is hash-exact."""
    from margaret_spark.operators.similarity import ann_recall_at_k

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ann_recall_at_k(
        emb, queries, "vec_id", "embedding", k=5, nlist=16, nprobe=4
    )


def q_embeddings_pca(spark, sf_dir):
    """PCA by power iteration (operators.pca.pca_top_component): the
    corpus's principal direction + Rayleigh eigenvalue after 12 fixed
    rounds — covariance as ONE distributed grammian pass (per-row d²
    pround'ed products, (i,j)-keyed DECIMAL partial sums), iteration
    on the bounded d²-row table. The oracle replays the identical
    mean/center/product/round chain as unrolled MATERIALIZED CTEs —
    hash-exact (exactness never depends on convergence; this
    synthetic corpus is near-isotropic, the power-iteration worst
    case, which the operator docstring documents)."""
    from margaret_spark.operators.pca import pca_top_component

    emb = _t(spark, sf_dir, "embeddings")
    return pca_top_component(emb, iters=12)


def q_embeddings_pca_project(spark, sf_dir):
    """The PCA transform half (operators.pca.pca_project): every
    corpus vector's coordinate along the fitted principal direction
    (4 power rounds here — the projection is the thing under test;
    exactness never depends on convergence). The component table is
    bounded (d rows), broadcast as one array; the projection is the
    fixed-order left fold of pround'd products per row — one scan,
    zero shuffles. Hash-exact."""
    from margaret_spark.operators.pca import pca_project, pca_top_component

    emb = _t(spark, sf_dir, "embeddings")
    comp = pca_top_component(emb, iters=4)
    return pca_project(emb, comp)


def q_ann_matryoshka(spark, sf_dir):
    """Matryoshka-truncation ANN (operators.similarity
    .truncate_embeddings + brute_force_topk): exact top-5 by cosine
    over the FIRST 16 of 64 dimensions — the MRL serving trade (search
    the 4×-smaller prefix, re-rank survivors at full width if needed).
    The oracle slices the same prefix (DuckDB 1-based inclusive
    ``embedding[1:16]``) through the identical cosine tree, so ranks
    and rounded cosines are hash-exact."""
    from margaret_spark.operators.similarity import truncate_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    tr = truncate_embeddings(emb, 16)
    return brute_force_topk(tr, tr.where(F.col("vec_id") < 5), k=5)


def q_ann_matryoshka_recall(spark, sf_dir):
    """Recall@5 of the 16-dim Matryoshka prefix against the full
    64-dim exact top-5 (operators.similarity.topk_recall — the shared
    metric tail every approximate-search variant evaluates through).
    THE number that decides whether the 4× prefix cut is safe for a
    given corpus. Exact integer counts + one IEEE division —
    hash-exact."""
    from margaret_spark.operators.similarity import (
        topk_recall,
        truncate_embeddings,
    )

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    tr = truncate_embeddings(emb, 16)
    exact = brute_force_topk(emb, queries, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = brute_force_topk(
        tr, tr.where(F.col("vec_id") < 5), k=5
    ).select("query_id", "neighbor_id")
    qids = queries.select(F.col("vec_id").alias("query_id")).distinct()
    return topk_recall(exact, approx, qids)


def q_ann_ivf(spark, sf_dir):
    """IVF-cell ANN: seeded centroids, corpus bucketed by nearest cell,
    queries probe their 4 nearest cells only."""
    from margaret_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_topk(emb, queries, k=5, nlist=16, nprobe=4)


def q_ann_ivf_indexed(spark, sf_dir):
    """The persisted-IVF serving path: build once (corpus written
    Hive-partitioned by cell, norms precomputed), then search — the
    broadcast probe set triggers dynamic partition pruning, so the
    scan reads only probed cells. Same centroids as ann_ivf, so the
    same oracle checks bit-identical results."""
    import tempfile

    from margaret_spark.operators.similarity import (
        build_ivf_index,
        ivf_index_search,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="margaret_ivf_idx_")
    build_ivf_index(emb, path, nlist=16)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_index_search(spark, path, queries, k=5, nprobe=4)


def q_ann_ivf_pq_indexed(spark, sf_dir):
    """The persisted IVFADC serving path (pq.build_ivfpq_index /
    ivfpq_index_search): centroids + residual codebook + per-vector
    codes written Hive-partitioned by cell — bytes per vector,
    partition-pruned probes, broadcast residual LUTs. Same
    construction as ann_ivf_pq, so the same composed oracle checks
    bit-identical results (index == in-flight pinned in pytest)."""
    import tempfile

    from margaret_spark.operators.pq import build_ivfpq_index, ivfpq_index_search

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="margaret_ivfpq_idx_")
    build_ivfpq_index(emb, path, nlist=16, m=4, codes=8, iters=1)
    queries = emb.where(F.col("vec_id") < 5)
    return ivfpq_index_search(spark, path, queries, k=5, nprobe=4)


def q_ann_ivf_int8(spark, sf_dir):
    """The int8-quantized persisted IVF index
    (operators.quantize.build_ivf_index_int8 / ivf_index_search_int8):
    cells store codes + scales + precomputed integer norms (the 4×
    storage cut compounding with partition-pruned reads — the actual
    100 TB ANN deployment shape). Cell assignment/probing use float
    cosine against the same seeded centroids as ann_ivf; candidate
    ranking is the quantized cosine (scales cancel — pure integer
    dots under one sqrt/division tree), so the whole pipeline is
    hash-exact like ann_topk_int8."""
    import tempfile

    from margaret_spark.operators.quantize import (
        build_ivf_index_int8,
        ivf_index_search_int8,
    )

    emb = _t(spark, sf_dir, "embeddings")
    path = tempfile.mkdtemp(prefix="margaret_ivf_int8_")
    build_ivf_index_int8(emb, path, nlist=16)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_index_search_int8(spark, path, queries, k=5, nprobe=4)


def q_text_simpson(spark, sf_dir):
    """Per-document token concentration (operators.text.simpson_index):
    the Simpson index (sum of n_t^2) / N^2 — the log-free entropy
    cousin of the quality battery (keyword stuffing / degenerate
    generations concentrate toward 1). Exact integer counts + one IEEE
    division; zero-token documents report NULL. Hash-exact."""
    from margaret_spark.operators.text import simpson_index

    docs = _t(spark, sf_dir, "documents")
    return simpson_index(docs, "doc_id", "text")


def q_text_vocab_oov(spark, sf_dir):
    """Per-source vocabulary coverage (operators.text
    .vocab_oov_report): OOV token mass against the corpus's own
    deterministic top-16 vocabulary (the synthetic corpus carries 31
    distinct tokens, so the cut BINDS — real OOV mass at every SF) — the tokenizer-planning audit
    next to text_bpe_fertility (a high-OOV source fragments under a
    vocabulary fitted on the corpus mix). Exact integer counts + one
    IEEE division; the oracle re-derives the vocabulary cut and the
    per-source masses in SQL — hash-exact."""
    from margaret_spark.operators.text import vocab_oov_report

    docs = _t(spark, sf_dir, "documents")
    return vocab_oov_report(docs, "text", "source", top_v=16)


def q_text_topterms(spark, sf_dir):
    from margaret_spark.operators.text import top_terms

    return top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text", k=50)


def q_dedup_incremental(spark, sf_dir):
    """Incremental ingest dedup (operators.dedup.incremental_exact_dedup):
    even doc_ids play the existing corpus, odd ones the incoming
    batch; each new doc is labeled dup_of_existing / dup_in_batch /
    new. The only shuffled payload is a 32-byte content hash; corpus
    membership is a hash semi-join. Oracle mirrors the semantics over
    text equality directly."""
    from margaret_spark.operators.dedup import incremental_exact_dedup

    docs = _t(spark, sf_dir, "documents")
    existing = docs.where(F.col("doc_id") % 2 == 0)
    new = docs.where(F.col("doc_id") % 2 == 1)
    return incremental_exact_dedup(new, existing, "doc_id", "text")


def q_orders_diff(spark, sf_dir):
    """Keyed table diff (functions.diff.table_diff): a synthetic new
    version of orders (every 97th key dropped, every 89th surviving
    key repriced, every 101st key re-added under a fresh key) diffed
    against the original — added/removed/changed, nothing wider than
    (key, 32-byte row hash) crossing the shuffle, unchanged mass
    filtered before materialization."""
    from margaret_spark.functions.diff import table_diff

    orders = _t(spark, sf_dir, "orders")
    base = orders.where(F.col("o_orderkey") % 97 != 0)
    changed = base.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 89 == 0, F.col("o_totalprice") + F.lit(1.0)
        ).otherwise(F.col("o_totalprice")),
    )
    added = orders.where(F.col("o_orderkey") % 101 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(10_000_000)
    )
    new = changed.unionByName(added)
    return table_diff(orders, new, "o_orderkey")


def q_text_quality_rules(spark, sf_dir):
    """Gopher/C4-style rule battery (operators.text.quality_rule_flags):
    per-rule booleans + the conjunction, all pround'ed rational
    arithmetic in one narrow codegen projection — the standard
    web-corpus filter set, oracle-exact per rule."""
    from margaret_spark.operators.text import quality_rule_flags

    return quality_rule_flags(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_events_cohorts(spark, sf_dir):
    """Weekly cohort retention triangle (operators.temporal.
    cohort_retention): cohort = ISO week of first activity; cells
    count active users per (cohort, week offset). Distinct + min ride
    one user-keyed exchange; nothing is keyed on time alone."""
    from margaret_spark.operators.temporal import cohort_retention

    ev = _events(spark, sf_dir)
    return cohort_retention(ev, "user_id", "ts")


def q_pack_sequences_grouped(spark, sf_dir):
    """Per-source sequence packing (operators.packing.
    pack_sequences_grouped): every source gets its own token stream —
    the domain-separated pretraining layout. Window cumsum per source,
    identical pack arithmetic to the global packing; oracle mirrors
    the partitioned cumsum."""
    from margaret_spark.operators.packing import pack_sequences_grouped
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return pack_sequences_grouped(
        base, "source", "doc_id", "n_tokens", seq_len=256
    )


def q_sample_token_budget(spark, sf_dir):
    """Corpus mixing by token budget (operators.sampling.
    token_budget_sample): within each source, the deterministic
    (md5-ordered) prefix of documents whose cumulative token count
    stays inside a 1500-token budget. Exact integer window arithmetic
    — the oracle reproduces the kept rows and the running totals
    bit-for-bit. One shuffle on the source key."""
    from margaret_spark.operators.sampling import token_budget_sample
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return token_budget_sample(base, "source", "doc_id", "n_tokens", budget=1500)


def q_fuzzy_part_names(spark, sf_dir):
    """Blocked edit-distance record linkage (operators.dedup.
    fuzzy_pairs) over part names: candidates share (first char,
    length//4), verified with levenshtein ≤ 2 inside the join
    condition. The oracle mirrors the blocking exactly (the
    candidates+verify contract, like MinHash banding)."""
    from margaret_spark.operators.dedup import fuzzy_pairs

    part = _t(spark, sf_dir, "part")
    return fuzzy_pairs(part, "p_partkey", "p_name", max_dist=2, len_bucket=4)


def q_edit_pairs_part_names(spark, sf_dir):
    """LOSSLESS edit-distance self-join (operators.dedup.
    edit_distance_pairs, PassJoin-style segment pigeonhole): every
    pair of part names within levenshtein 1, found via the
    (segment, index, length) equi-join — no cross join — and REQUIRED
    to equal the naive quadratic truth: the oracle IS the brute-force
    all-pairs filter, so a single false negative from the blocking
    hash-mismatches."""
    from margaret_spark.operators.dedup import edit_distance_pairs

    part = _t(spark, sf_dir, "part")
    return edit_distance_pairs(part, "p_partkey", "p_name", max_dist=1)


def q_search_bm25(spark, sf_dir):
    """Inverted-index BM25 keyword retrieval (operators.search): one
    tokenize pass, tf and doc-length on the same id-keyed exchange,
    broadcast per-term idf weights, TakeOrdered top-k (no corpus-wide
    window). Rational idf mode — every score is integer-derived
    rational arithmetic with DECIMAL-summed terms, so the oracle
    reproduces scores bit-for-bit (the classic ln idf is in the
    library; cross-engine ln differs in the last ulp so it is not on
    the hash-exact surface)."""
    from margaret_spark.operators.search import bm25_search

    docs = _t(spark, sf_dir, "documents")
    return bm25_search(docs, "doc_id", "text", "spark table hash scan", k=10)


def q_search_tfidf(spark, sf_dir):
    """Sparse TF-IDF vectors over the corpus top-50 vocabulary
    (operators.search.tf_idf_vectors): (doc_id, token, weight) with
    ln-free idf — oracle-exact."""
    from margaret_spark.operators.search import tf_idf_vectors

    docs = _t(spark, sf_dir, "documents")
    return tf_idf_vectors(docs, "doc_id", "text", vocab_size=50)


#: One checkpointed near-dup pair subtree per (session, sf_dir):
#: corpus_curation and training_data consume the IDENTICAL
#: ngram_jaccard_pairs frame (threshold=0.2, word 3-grams,
#: max_df='auto'), so the most expensive stage of both pipelines is
#: materialized once per curation session and reused — the
#: materialized-intermediate pattern any production curation run uses
#: (r2 verdict #1a). Results are bit-identical with or without the
#: cache; dedup_jaccard / dedup_clusters deliberately do NOT use it so
#: the operator itself stays honestly measured.
_CURATION_PAIRS_CACHE: dict = {}


def _curation_pairs(spark, sf_dir):
    hit = _CURATION_PAIRS_CACHE.get(sf_dir)
    if hit is not None and hit[0] is spark:
        return hit[1]
    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    ).localCheckpoint(eager=False)
    _CURATION_PAIRS_CACHE[sf_dir] = (spark, pairs)
    return pairs


def q_corpus_curation(spark, sf_dir):
    """The end-to-end curation pipeline: quality bar + canonical
    near-dup representative per cluster (operators.pipeline), riding
    the shared checkpointed pair subtree (see _curation_pairs)."""
    from margaret_spark.operators.pipeline import curate_corpus

    docs = _t(spark, sf_dir, "documents")
    return curate_corpus(
        docs, "doc_id", "text", min_quality=0.5, jaccard_threshold=0.2,
        pairs=_curation_pairs(spark, sf_dir),
    )


def q_ann_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return brute_force_topk(emb, queries, k=5)


def q_ann_range(spark, sf_dir):
    """Radius search (operators.similarity.range_search): every
    neighbor with cosine ≥ 0.25 for each of 5 query vectors. Queries
    broadcast; the corpus streams through the scoring filter once —
    no ranking window, zero shuffles."""
    from margaret_spark.operators.similarity import range_search

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return range_search(emb, queries, radius=0.25)


def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed ANN (no SQL oracle: seeded-hyperplane buckets;
    exactness of returned cosines is covered by tests against the
    brute-force twin)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_bucketed_topk(emb, queries, k=5, nbits=4)


def q_embeddings_quantize_int8(spark, sf_dir):
    """Symmetric int8 scalar quantization of the embedding corpus
    (operators.quantize) — the 4× storage/bandwidth scale path for
    similarity search. scale = max|x|/127, code = floor(x/scale+0.5):
    every step (float32→double cast, max, abs, IEEE division, the
    house half-up floor) is engine-portable, so the oracle reproduces
    each vector's codes bit-for-bit; the graded surface summarizes
    them as exact integer stats. Map-only codegen array expressions,
    zero shuffles, no Python."""
    from margaret_spark.operators.quantize import quantize_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    qz = quantize_embeddings(emb, "vec_id", "embedding")
    c = F.col("codes")
    int_sum = lambda col: F.aggregate(  # noqa: E731
        col, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
    )
    return qz.select(
        "vec_id",
        pround(F.col("scale"), 9).alias("scale"),
        int_sum(c).alias("code_sum"),
        int_sum(F.transform(c, F.abs)).alias("code_abs_sum"),
        F.array_min(c).cast("int").alias("code_min"),
        F.array_max(c).cast("int").alias("code_max"),
        F.size(c).cast("int").alias("n_codes"),
    )


def q_ann_topk_int8(spark, sf_dir):
    """Exhaustive top-k over the int8-quantized corpus
    (operators.quantize.int8_topk): the same broadcast-queries scan
    shape as ann_topk, but each pair is an integer dot over codes and
    the scales cancel out of the cosine — pure integer arithmetic
    under one sqrt/division tree, hash-exact cross-engine (the float
    path needs rounding; this one is exact by construction)."""
    from margaret_spark.operators.quantize import int8_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return int8_topk(emb, queries, k=5)


def q_text_stats(spark, sf_dir):
    return token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_quality(spark, sf_dir):
    return quality_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_langid(spark, sf_dir):
    return lang_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_langid_eval(spark, sf_dir):
    """Per-true-language accuracy of the widened (10 stopword
    languages + 9 script ranges) heuristic against the labeled `lang`
    column — the precision check that keeps the table honest as it
    grows. Oracle is generated from the SAME language tables."""
    from margaret_spark.operators.text import lang_id_eval

    return lang_id_eval(
        _t(spark, sf_dir, "documents"), "doc_id", "text", "lang"
    )


def q_text_bpe_count(spark, sf_dir):
    return bpe_ish_token_count(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_text_bpe_fertility(spark, sf_dir):
    """Tokenizer fertility audit per source (the budgeting number a
    training pipeline needs before it can convert corpus bytes to
    token budgets): chars-per-BPE-token and BPE-tokens-per-word by
    source, over the REAL byte-level tokenizer (operators.bpe). All
    ratios are exact-integer division under pround — hash-exact; the
    oracle re-tokenizes with the recursive-CTE BPE encoder."""
    from margaret_spark.functions.numeric import pround as _pround
    from margaret_spark.functions.shingling import words
    from margaret_spark.operators.bpe import bpe_token_count_col

    docs = _t(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.coalesce(F.length("text"), F.lit(0)).cast("long").alias("__ch"),
        F.coalesce(bpe_token_count_col(F.col("text")), F.lit(0))
        .cast("long")
        .alias("__nt"),
        # size(NULL) is -1 (not NULL) in Spark — coalesce the ARRAY
        F.size(
            F.coalesce(words(F.col("text")), F.array().cast("array<string>"))
        )
        .cast("long")
        .alias("__nw"),
    )
    agg = per.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__ch").cast("long").alias("total_chars"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.sum("__nw").cast("long").alias("total_words"),
    )
    return agg.select(
        "source",
        "n_docs",
        "total_chars",
        "total_tokens",
        "total_words",
        _pround(
            F.when(
                F.col("total_tokens") > 0,
                F.col("total_chars").cast("double") / F.col("total_tokens"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("chars_per_token"),
        _pround(
            F.when(
                F.col("total_words") > 0,
                F.col("total_tokens").cast("double") / F.col("total_words"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("tokens_per_word"),
    )


def q_text_winnow(spark, sf_dir):
    """Winnowing fingerprints (operators.text.winnow_fingerprints —
    Schleimer et al. 2003, the MOSS local fingerprinting): per-window
    minimum of md5 word-4-gram hashes, ties to the rightmost position,
    packed argmin under one integer array_min. Pure per-row codegen
    array math, zero shuffles; the oracle re-derives every selected
    (pos, fp) in SQL from the same md5 family — hash-exact."""
    from margaret_spark.operators.text import winnow_fingerprints

    return winnow_fingerprints(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=4, w=4
    )


def q_text_lm_surprise(spark, sf_dir):
    """Perplexity-style LM quality scoring (operators.lm): mean
    inverse add-one conditional probability under a PRUNED bigram LM
    (top-512 unigrams/bigrams by (count desc, gram asc) — the cap
    binds at sf0.01, so the pruning cut itself is graded). Every term
    is a ratio of exact integers under one IEEE division and the mean
    is the house DECIMAL sum, so the whole score is hash-exact —
    unlike log-based perplexity (cross-engine ln differs). Scoring is
    one explode + two broadcast joins + one keyed aggregation."""
    from margaret_spark.operators.lm import lm_surprise

    return lm_surprise(
        _t(spark, sf_dir, "documents"), "doc_id", "text", max_ngrams=512
    )


def _nb_model(spark, sf_dir):
    """The shared text_nb_* fit: train on the doc_id % 3 == 0 slice,
    labeled by a real text property (token count ≥ 40 → 'long'), with
    max_vocab=16 < the corpus's 31 distinct tokens so the pruning cut
    itself is graded (OOV tokens exercise the add-one fallback)."""
    from margaret_spark.functions.shingling import words
    from margaret_spark.operators.nbayes import fit_nb

    docs = _t(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        "text",
        F.when(F.size(words(F.col("text"))) >= 40, F.lit("long"))
        .otherwise(F.lit("short"))
        .alias("label"),
    )
    return docs, fit_nb(train, "label", "text", max_vocab=16)


def q_text_nb_quality(spark, sf_dir):
    """Trainable quality classifier (operators.nbayes): multinomial
    Naive Bayes fitted on a labeled slice, scoring EVERY document
    against every class — the GPT-3/LLaMA-style curation leg next to
    the fixed rules and the LM gate. The decision statistic is the
    prior-weighted mean INVERSE conditional probability (the log-free
    lm_surprise construction: integer ratios under IEEE division +
    DECIMAL mean), so fit, pruning cut, smoothing and scores are all
    hash-exact — the oracle re-derives counts, the top-16 vocab cut,
    V, priors and every per-token term in SQL."""
    from margaret_spark.operators.nbayes import nb_scores

    docs, model = _nb_model(spark, sf_dir)
    return nb_scores(docs, "doc_id", "text", model)


def q_text_nb_classify(spark, sf_dir):
    """The argmin-score classification over q_text_nb_quality's
    scores (ties → label ascending; zero-token documents surface as
    pred NULL). Graded hash-exact — the oracle takes the same
    row_number window over its re-derived scores."""
    from margaret_spark.operators.nbayes import nb_classify

    docs, model = _nb_model(spark, sf_dir)
    return nb_classify(docs, "doc_id", "text", model)


def _dsir_model(spark, sf_dir):
    """The shared corpus_dsir_* fit: even docs play the TARGET corpus
    (curated reference), odd docs the RAW crawl; hashed word-bigram
    features into 64 buckets (B << the ~1k distinct bigrams, so the
    hashing itself — collisions included — is graded)."""
    from margaret_spark.operators.dsir import fit_dsir

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    model = fit_dsir(
        docs.where(F.col("doc_id") % 2 == 0),
        docs.where(F.col("doc_id") % 2 == 1),
        "text",
        n=2,
        n_buckets=64,
    )
    return docs, model


def q_corpus_dsir_weights(spark, sf_dir):
    """DSIR-style data selection (operators.dsir): hashed word-bigram
    bag models fitted on a target corpus and on the raw crawl, every
    document weighted by its mean per-occurrence target/raw
    probability ratio — the distribution-matching leg of the curation
    chain (rules → LM gate → trained classifier → DSIR), made log-free
    so it grades hash-exact. The oracle re-derives the bucket counts,
    totals, add-one ratios and DECIMAL mean in SQL."""
    from margaret_spark.operators.dsir import dsir_weights

    docs, model = _dsir_model(spark, sf_dir)
    return dsir_weights(docs, "doc_id", "text", model, n=2, n_buckets=64)


def q_corpus_dsir_select(spark, sf_dir):
    """The selection half of DSIR: top-50 most target-like documents
    by (weight desc, doc_id asc) — the deterministic twin of the
    paper's Gumbel resampling, compiled to TakeOrderedAndProject
    (per-partition top-k + one 50-row merge, never a global sort).
    Graded hash-exact against the oracle's ORDER BY ... LIMIT."""
    from margaret_spark.operators.dsir import dsir_select

    docs, model = _dsir_model(spark, sf_dir)
    return dsir_select(docs, "doc_id", "text", model, k=50, n=2, n_buckets=64)


def q_text_fingerprint(spark, sf_dir):
    return doc_fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_multimodal_meta(spark, sf_dir):
    """Binary-column plumbing: text re-encoded as an opaque blob, with
    typed metadata extracted engine-side (byte length, first code
    point). The decode stage itself is the stubbed mapInPandas pass in
    margaret_spark.operators.multimodal."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
        F.ascii(F.col("text")).cast("long").alias("first_cp"),
    )


def q_training_data(spark, sf_dir):
    """The FULL corpus→training-data composition
    (operators.pipeline.training_pipeline): quality bar + canonical
    dedup keep, deterministic train/test split, and 512-token
    sequence packing of the train split — every stage
    hash-deterministic, the whole pipeline oracle-checked as one
    query."""
    from margaret_spark.operators.pipeline import training_pipeline

    docs = _t(spark, sf_dir, "documents")
    return training_pipeline(
        docs,
        "doc_id",
        "text",
        min_quality=0.5,
        jaccard_threshold=0.2,
        test_fraction=0.1,
        seq_len=512,
        pairs=_curation_pairs(spark, sf_dir),
    )


def q_chunk_documents(spark, sf_dir):
    """Long-document chunking (operators.chunking): each document's
    token stream split into 64-token windows overlapping by 16 — the
    preprocessing step every context-bounded training / retrieval
    pipeline runs. Pure codegen fan-out (sequence + explode + array
    slice), zero shuffles; boundaries are a closed form of n_tokens,
    so the oracle reproduces every field including the chunk text."""
    from margaret_spark.operators.chunking import chunk_documents

    docs = _t(spark, sf_dir, "documents")
    return chunk_documents(
        docs, "doc_id", "text", chunk_tokens=64, overlap=16
    )


def _pii_salted_docs(spark, sf_dir):
    """Documents with deterministic PII appended (both engines build
    the IDENTICAL string, so detection runs over nontrivial matches
    on every row — the synthetic corpus itself carries few)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 192.168."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            ((F.col("doc_id") * 7) % 256).cast("string"),
            F.lit(" call +1 555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
        ).alias("text"),
    )


_PII_SALT_SQL = (
    "SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@example.com or 192.168.' || CAST(doc_id % 256 AS VARCHAR) "
    "|| '.' || CAST((doc_id * 7) % 256 AS VARCHAR) "
    "|| ' call +1 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') "
    "AS text FROM documents"
)

# one redaction oracle, two graded surfaces (batch pii_redact and the
# streaming at-ingest scrub — same expression chain by construction)
_PII_REDACT_SQL = (
    "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text, "
    "'[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z]{2,})+', '[EMAIL]', 'g'), "
    "'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b', '[IP]', 'g'), "
    "'\\+?[0-9][0-9()\\-\\s]{6,}[0-9]', '[PHONE]', 'g') AS redacted "
    f"FROM ({_PII_SALT_SQL})"
)


def q_pii_scan(spark, sf_dir):
    """PII detection (operators.pii): per-document email / IPv4 /
    phone match counts as pure codegen regexp expressions — the scrub
    gate a corpus runs before anything ships. Patterns stick to the
    Java-regex ∩ RE2 dialect (ASCII classes, non-capturing groups, no
    lookaround), so counts are engine-identical and the query is
    hash-exact. Zero shuffles."""
    from margaret_spark.operators.pii import pii_scan

    return pii_scan(_pii_salted_docs(spark, sf_dir), "doc_id", "text")


def q_pii_redact(spark, sf_dir):
    """PII redaction (operators.pii): every match replaced by its
    placeholder in a fixed order (emails before phones, so an email's
    digits never leak as a partial phone match). The FULL redacted
    text is on the graded surface — any engine divergence in match
    boundaries or replacement semantics hash-mismatches."""
    from margaret_spark.operators.pii import pii_redact

    return pii_redact(_pii_salted_docs(spark, sf_dir), "doc_id", "text")


def _pagerank_edges(docs, nn):
    """The deterministic synthetic citation graph shared by
    docs_pagerank and corpus_prior (one place, no drift)."""
    d = F.col("doc_id")
    return (
        docs.select(d.alias("src"), ((d * 7 + 1) % nn).alias("dst"))
        .unionByName(docs.select(d.alias("src"), ((d * 13 + 3) % nn).alias("dst")))
        .unionByName(docs.select(d.alias("src"), ((d * 31 + 5) % nn).alias("dst")))
    )


def q_corpus_prior(spark, sf_dir):
    """Curation prior composition: content quality × link importance —
    the two signals a web-corpus selection policy actually combines
    (C4-style content scores and a crawl-graph importance prior).
    rank_norm = pround(rank·N) recenters PageRank at mean 1;
    prior = pround((quality + rank_norm)/2). Every stage reuses the
    already-graded subtrees (quality_score, pagerank), so the whole
    composition stays hash-exact."""
    from margaret_spark.operators.graph import pagerank
    from margaret_spark.operators.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    nn = docs.count()
    ranks = pagerank(
        _pagerank_edges(docs.select("doc_id"), nn), "src", "dst",
        iterations=6, damping=0.85,
    ).select(F.col("node").alias("doc_id"), "rank")
    q = quality_score(docs, "doc_id", "text")
    rank_norm = pround(F.col("rank") * F.lit(float(nn)), 6)
    return (
        q.join(ranks, "doc_id")
        .select(
            "doc_id",
            "quality",
            rank_norm.alias("rank_norm"),
            pround((F.col("quality") + rank_norm) / F.lit(2.0), 6).alias("prior"),
        )
    )


def q_docs_pagerank(spark, sf_dir):
    """Link-graph importance (operators.graph.pagerank): 6 damped
    power-iteration rounds over a deterministic synthetic citation
    graph (each doc links to (id·7+1)%N, (id·13+3)%N, (id·31+5)%N —
    parallel edges and self-loops included, no dangling nodes) — the
    corpus-importance prior a web-scale pipeline computes over its
    crawl's link graph. Per-edge contributions are pround'ed and
    DECIMAL-summed (shuffle-order-independent), each rank pround'ed
    again, so the fixed-K iteration is hash-exact against a generated
    6-level CTE chain that evaluates the identical IEEE trees."""
    from margaret_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    nn = docs.count()
    ranks = pagerank(
        _pagerank_edges(docs, nn), "src", "dst", iterations=6, damping=0.85
    )
    return ranks.select(F.col("node").alias("doc_id"), "rank")


def q_events_histogram(spark, sf_dir):
    """Exact equi-width histogram (profiling.histogram): the value
    distribution per event_type on one shared 20-bucket grid over the
    column's exact [min, max] — the distribution fingerprint taken
    before writing filters/clamps; unlike the approx_quantile
    sketches this is integer-exact counting over IEEE bucket math,
    so it grades hash-exact."""
    from margaret_spark.operators.profiling import histogram

    ev = _t(spark, sf_dir, "events")
    return histogram(ev, "value", bins=20, group_col="event_type")


def q_embeddings_kmeans(spark, sf_dir):
    """Deterministic embedding clustering
    (similarity.kmeans_assign_deterministic): 2 Lloyd refinements from
    the 8 lowest-id seeds, pround/DECIMAL-exact means — the corpus
    clustering step (topic bucketing, diversity sampling, IVF cell
    refinement) as a graded, hash-exact surface; the float-avg
    production variant stays in kmeans_centroids."""
    from margaret_spark.operators.similarity import kmeans_assign_deterministic

    emb = _t(spark, sf_dir, "embeddings")
    return kmeans_assign_deterministic(emb, k=8, iters=2)


def q_dedup_semantic_pairs(spark, sf_dir):
    """SemDeDup pair stage (operators.semdedup.semantic_dedup_pairs,
    after Abbas et al. 2023): within-cluster embedding near-dup pairs
    over the Lloyd-refined cells — an equality self-join keyed on
    cent_id (O(Σ|cell|²) cosines, never all-pairs; k grows with N at
    scale), Arrow pair_dot scoring, pround'ed cosine ≥ 0.4. Graded
    hash-exact: the oracle re-derives the k-means CTEs and the pair
    join bit-for-bit."""
    from margaret_spark.operators.semdedup import semantic_dedup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_pairs(emb, k=8, iters=2, threshold=0.4)


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup keeps (operators.semdedup.semantic_prune): drop every
    row dominated by a smaller-id same-cluster row within 0.4 cosine
    (the pair set's id_b side, removed with one left-anti join) —
    the curation decision itself, not just the candidate pairs.
    Graded hash-exact against the same generated oracle chain."""
    from margaret_spark.operators.semdedup import semantic_prune

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_prune(emb, k=8, iters=2, threshold=0.4)


def q_dedup_semantic_incremental(spark, sf_dir):
    """Incremental SemDeDup (semdedup.semantic_dedup_incremental):
    the odd-id half of the embedding corpus (new crawl) deduped
    against the even-id half (existing corpus) at the SEMANTIC level
    — clusters fitted on existing and FROZEN (the at-ingest-model
    house rule), every new vector labeled dup_of_existing /
    dup_in_batch / new. Completes the ingest-dedup matrix (exact /
    containment / text near-dup / semantic). Hash-exact."""
    from margaret_spark.operators.semdedup import semantic_dedup_incremental

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup_incremental(
        emb.where(F.col("vec_id") % 2 == 1),
        emb.where(F.col("vec_id") % 2 == 0),
        k=8, iters=1, threshold=0.4,
    )


def q_decontaminate_semantic(spark, sf_dir):
    """SEMANTIC decontamination — the modern complement of the exact
    n-gram stage (`decontaminate`/`decontaminate_spans`): flag every
    TRAIN document whose hashed embedding is near-duplicate to a
    TEST-set document (paraphrases and re-crawls that exact n-gram
    matching misses). Composed from the library's own parts: the
    vocabulary-free hashing-trick embedding (hashembed) feeds the
    frozen-model incremental semantic matcher (clusters fitted on the
    TEST set and frozen — arrivals never move the cells; checks are
    cell-scoped equality joins, O(|train|·|cell|), never
    |train|·|test|). Output: (doc_id, cent_id, contaminated) for
    every train document. Hash-exact."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings
    from margaret_spark.operators.semdedup import semantic_dedup_incremental

    docs = _t(spark, sf_dir, "documents")
    # pin the hashing-trick embedding once: four consumers (two
    # assignment passes + two vector joins) would otherwise recompute
    # the md5-per-token map build per branch
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    test = emb.where(F.col("doc_id") % 10 == 0)
    train = emb.where(F.col("doc_id") % 10 != 0)
    # batch_dups=False: decontamination asks only "is this train doc
    # near the TEST set" — the train x train in-batch pass is the
    # dominant cost (O(|train|^2/k) pair cosines) and cannot change
    # the answer
    out = semantic_dedup_incremental(
        train, test, k=8, iters=1, threshold=0.88,
        id_col="doc_id", vec_col="embedding", batch_dups=False,
    )
    return out.select(
        "doc_id",
        "cent_id",
        (F.col("status") == "dup_of_existing").alias("contaminated"),
    )


def q_ann_pq_codes(spark, sf_dir):
    """Product-quantization encoding (operators.pq, after Jégou et
    al. 2011): 4 subspaces × 8 codes, 1 Lloyd round per subspace (all
    subspaces trained in ONE DataFrame program keyed on sub), each
    vector's nearest code per subspace with its pround'ed
    quantization error — the 64×-compression stage of the ANN ladder
    (float → int8 → PQ). Graded hash-exact: squared L2 goes through
    the dot identity so the oracle evaluates the identical tree."""
    from margaret_spark.operators.pq import pq_encode, pq_train

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=4, codes=8, iters=1)
    return pq_encode(emb, cb, m=4)


def q_ann_pq_distortion(spark, sf_dir):
    """Per-subspace PQ quantization-error audit
    (operators.pq.pq_distortion_report): the number that sizes a PQ
    deployment (m, codes) before anyone trusts ADC distances — a
    fat mean_dist2 means the codebook is too coarse for that
    dimension range. One bounded aggregation over the code table;
    hash-exact (the oracle aggregates the identical pround'd dist2
    values under DECIMAL sums)."""
    from margaret_spark.operators.pq import (
        pq_distortion_report,
        pq_encode,
        pq_train,
    )

    emb = _t(spark, sf_dir, "embeddings")
    cb = pq_train(emb, m=4, codes=8, iters=1)
    return pq_distortion_report(pq_encode(emb, cb, m=4))


def q_ann_pq_topk(spark, sf_dir):
    """ADC top-k over PQ codes (operators.pq.pq_topk): per query a
    broadcast m×k lookup table of pround'ed subspace distances; a
    corpus row's approximate distance is the DECIMAL-exact sum of its
    m looked-up entries (order-independent); top-5 by (distance asc,
    id asc). The probe side reads only the CODE table — at 100 TB the
    original vectors stay cold. Graded hash-exact."""
    from margaret_spark.operators.pq import pq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return pq_topk(emb, emb.where(F.col("vec_id") < 5), k=5, m=4, codes=8, iters=1)


def q_ann_ivf_pq(spark, sf_dir):
    """IVFADC (operators.pq.ivfpq_topk, Jégou et al. 2011 §V): the
    composed IVF + residual-PQ search — 16 seeded cells, PQ codebooks
    trained on the residuals v − cent(cell), queries probe their 4
    nearest cells and score ONLY those cells' code rows through a
    broadcast per-(query, cell) residual lookup table. The index the
    cluster stores is (cell, 4 codes) per vector — bytes — and the
    probe never scans the corpus: the true 100 TB ANN serving shape.
    Graded hash-exact against the composed ann_ivf + PQ oracle."""
    from margaret_spark.operators.pq import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings")
    return ivfpq_topk(
        emb, emb.where(F.col("vec_id") < 5),
        k=5, nlist=16, nprobe=4, m=4, codes=8, iters=1,
    )


def q_embeddings_contrastive(spark, sf_dir):
    """Contrastive triplet mining (semdedup.contrastive_triplets,
    FaceNet-style hard-negative selection): anchor-positive =
    within-cluster pairs at cosine >= 0.4; per anchor the hardest
    same-cluster negative below 0.3 (highest cosine under the bar, id
    tiebreak) attaches to each positive — the training-pair prep step
    for embedding models, mined deterministically from the corpus
    itself. One cluster-scoped pair pass split two ways; hash-exact."""
    from margaret_spark.operators.semdedup import contrastive_triplets

    emb = _t(spark, sf_dir, "embeddings")
    return contrastive_triplets(
        emb, k=8, iters=2, pos_threshold=0.4, neg_threshold=0.3, n_neg=1
    )


def q_docs_hash_embed(spark, sf_dir):
    """Hashing-trick document embeddings (operators.hashembed, after
    Weinberger et al. 2009): every document's 64-dim signed
    bucket-count vector, L2-normalized — vocabulary-free text
    vectorization that feeds the whole vector stack (semantic dedup,
    k-means, ANN, PQ) on corpora without a neural embedding column.
    Emitted exploded as (doc_id, pos, val); graded hash-exact — one
    md5 per token drives bucket and sign, counts are exact integers,
    and the normalization tree is IEEE-identical in the oracle."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings

    docs = _t(spark, sf_dir, "documents")
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64)
    return emb.select(
        "doc_id", F.posexplode(F.col("embedding")).alias("pos", "val")
    )


def q_docs_semantic_dedup(spark, sf_dir):
    """The full text → vector → SemDeDup composition: hashed doc
    embeddings (q_docs_hash_embed's operator) pruned by
    semdedup.semantic_prune over k=8 Lloyd-refined cells at 0.88
    cosine — semantic near-dup curation for corpora with NO model
    embeddings at all. Keeps ~434/500 at sf0.01. Graded hash-exact:
    the oracle chains the hashed-embedding CTEs into the re-sourced
    k-means + pair-join chain."""
    from margaret_spark.operators.hashembed import hash_doc_embeddings
    from margaret_spark.operators.semdedup import semantic_prune

    docs = _t(spark, sf_dir, "documents")
    # pin the hashing-trick embedding once: the Lloyd rounds, the
    # assignment, and the vector join all consume it — unpinned, the
    # md5-per-token map build recomputes per consumer (the
    # decontaminate_semantic lesson)
    emb = hash_doc_embeddings(docs, "doc_id", "text", dim=64).localCheckpoint(
        eager=False
    )
    # k = 32 (vs the embeddings table's 8): documents GROW with SF, and
    # the SemDeDup knob is exactly "grow k with N" — cells stay small
    # enough that the within-cell pair pass never dominates (the r8
    # bench caught k=8 at 28 s on sf0.1; k=32 cuts the pair count 4x)
    return semantic_prune(
        emb, k=32, iters=1, threshold=0.88,
        id_col="doc_id", vec_col="embedding",
    )


def q_docs_triangles(spark, sf_dir):
    """Triangle census of the near-dup graph (graph.triangle_stats
    over the capped-jaccard pairs): per-document degree, triangle
    count, and local clustering coefficient — the cohesion diagnostic
    that tells template families (cliques, coeff→1) from boilerplate
    shingle-collision hubs (high degree, no closure) before
    cluster-collapse. Ordered node-iterator join: each {a<b<c}
    triangle found exactly once via two equi-joins."""
    from margaret_spark.operators.dedup import ngram_jaccard_pairs
    from margaret_spark.operators.graph import triangle_stats

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", threshold=0.2, mode="word", n=3, max_df="auto"
    )
    return triangle_stats(pairs, "id_a", "id_b").withColumnRenamed(
        "node", "doc_id"
    )


def q_text_collocations(spark, sf_dir):
    """Collocation mining (operators.text.collocations): the top-50
    adjacent-token pairs by rational PMI (c_pair·T / (c_w1·c_w2), the
    log-free association ratio — identical ranking, engine-exact
    arithmetic) with a min-count noise floor — the phrase-mining pass
    behind tokenizer vocab decisions. Map-side-combined bigram and
    unigram counts, two token-keyed joins, TakeOrdered top-k."""
    from margaret_spark.operators.text import collocations

    docs = _t(spark, sf_dir, "documents")
    return collocations(docs, "doc_id", "text", k=50, min_count=5)


def q_quality_pctile(spark, sf_dir):
    """Per-source quality calibration (operators.text.
    quality_percentile): each document's quality score re-expressed as
    its percent rank WITHIN its source — the normalization that makes
    one quality bar meaningful across sources with different score
    distributions. percent_rank is SQL-standard (ties share a rank,
    (rank-1)/(n-1)), so the surface is hash-exact; the quality score
    itself is the same pround'ed rational arithmetic both engines
    already agree on."""
    from margaret_spark.operators.text import quality_percentile

    docs = _t(spark, sf_dir, "documents")
    return quality_percentile(docs, "doc_id", "text", "source")


def q_source_quality_report(spark, sf_dir):
    """The curation dashboard: per source, doc counts, exact-decimal
    average quality and repetition, and how many docs fall below the
    quality bar. Two narrow scoring passes joined on doc_id, one
    shuffle on source; averages go through exact decimal sums of the
    per-row rounded scores, so the report reproduces bit-for-bit."""
    from margaret_spark.operators.text import quality_score, repetition_score

    docs = _t(spark, sf_dir, "documents")
    q = quality_score(docs, "doc_id", "text")
    r = repetition_score(docs, "doc_id", "text")
    joined = docs.select("doc_id", "source").join(q, "doc_id").join(r, "doc_id")
    return joined.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        pround(dsum("quality", scale=6) / F.count("*"), 6).alias("avg_quality"),
        pround(dsum("repetition", scale=6) / F.count("*"), 6).alias(
            "avg_repetition"
        ),
        F.sum(F.when(F.col("quality") < 0.5, 1).otherwise(0))
        .cast("long")
        .alias("n_below_bar"),
    )


def q_docs_length_histogram(spark, sf_dir):
    """Corpus EDA: document-length histogram per language (fixed
    100-char buckets). Map-side partial aggregation; shuffle bytes =
    |languages × buckets|, independent of corpus size."""
    docs = _t(spark, sf_dir, "documents")
    bucket = F.floor(F.col("n_chars") / F.lit(100)).cast("long")
    return (
        docs.groupBy("lang", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def q_text_repetition(spark, sf_dir):
    """Duplicate-trigram fraction per doc (operators.text
    .repetition_score) — the boilerplate/repetition quality rule."""
    from margaret_spark.operators.text import repetition_score

    return repetition_score(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_decontaminate(spark, sf_dir):
    """Eval-set decontamination (operators.dedup.ngram_contamination):
    the eval set is the deterministic 5% hash sample of the corpus;
    every remaining document is scored by how many of its distinct
    trigrams appear anywhere in the eval set (broadcast containment
    join — the corpus never shuffles on shingles)."""
    from margaret_spark.operators.dedup import ngram_contamination
    from margaret_spark.operators.sampling import hash_sample, hex_threshold

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    )
    return ngram_contamination(rest, eval_df, "doc_id", "text", mode="word", n=3)


def q_decontaminate_spans(spark, sf_dir):
    """Span-level decontamination (dedup.cut_contaminated_spans): the
    same 5% hash-sample eval split as q_decontaminate, but instead of
    flagging documents by overlap fraction, every trigram run that
    appears in the eval set is CUT from the remaining corpus — the
    salvage path that keeps a mostly-clean document's clean mass. The
    eval gram universe broadcasts; the corpus never shuffles on
    grams."""
    from margaret_spark.operators.dedup import cut_contaminated_spans
    from margaret_spark.operators.sampling import hash_sample, hex_threshold

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    )
    return cut_contaminated_spans(rest, eval_df, "doc_id", "text", n=3)


def q_docs_scd2(spark, sf_dir):
    """SCD2 history merge (functions.diff.scd2_merge): a v2 crawl
    batch applied to the v1 document table — every 13th key absent
    from the batch (stays open untouched), every present 7th key
    re-measured (old row closed at v2, new open row), every 11th key
    re-added under a fresh id (inserted open). The oracle states the
    expected history in closed form from the same arithmetic — the
    merge's full-outer hash comparison must reproduce it exactly."""
    from margaret_spark.functions.diff import scd2_merge

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    current = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    present = docs.where(F.col("doc_id") % 13 != 0).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.col("n_chars") + F.lit(1)
        ).otherwise(F.col("n_chars")),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    changes = present.unionByName(added)
    return scd2_merge(current, changes, "doc_id", version=2)


def q_docs_scd2_lookup(spark, sf_dir):
    """Point-in-time lookup against the SCD2 history
    (functions.diff.scd2_lookup): every key probed at versions 1 AND 2
    — v1 probes see pre-change attributes (and NULL for keys that
    didn't exist yet), v2 probes see the post-merge state. Key-equi
    join with the interval check as a residual predicate, so the plan
    partitions on the key like any equi-join."""
    from margaret_spark.functions.diff import scd2_lookup

    history = q_docs_scd2(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents").select("doc_id")
    added = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + F.lit(1_000_000)).alias("doc_id")
    )
    all_keys = docs.unionByName(added)
    probes = all_keys.select("doc_id", F.lit(1).alias("probe_v")).unionByName(
        all_keys.select("doc_id", F.lit(2).alias("probe_v"))
    )
    return scd2_lookup(probes, history, "doc_id", "probe_v")


def q_stream_docs_scd2(spark, sf_dir):
    """Streaming SCD2 ingest (streaming/scd.py): the v2 change batch
    arrives as JSON payloads on a real log; the stream merges it into
    a crash-safe versioned history directory (publish-first manifest,
    re-run-idempotent batches). Same change construction as the batch
    docs_scd2, so the published history is graded against the SAME
    closed-form oracle."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_history, stream_scd2

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    current = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    present = docs.where(F.col("doc_id") % 13 != 0).withColumn(
        "n_chars",
        F.when(
            F.col("doc_id") % 7 == 0, F.col("n_chars") + F.lit(1)
        ).otherwise(F.col("n_chars")),
    )
    added = docs.where(F.col("doc_id") % 11 == 0).withColumn(
        "doc_id", F.col("doc_id") + F.lit(1_000_000)
    )
    changes = present.unionByName(added)
    payload = changes.select(
        "doc_id",
        F.to_json(F.struct("doc_id", "source", "n_chars")).alias("j"),
    )
    schema = "doc_id long, source string, n_chars int"
    base = tempfile.mkdtemp(prefix="stream_scd2_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(payload, value_col="j", order_by="doc_id")
        stream_scd2(
            log,
            lambda b: b.select(
                F.from_json(F.col("value"), schema).alias("c"), "seq"
            ).select("c.*", "seq"),
            "doc_id",
            current,
            os.path.join(base, "hist"),
            os.path.join(base, "ckpt"),
            version_of=lambda _b: 2,
            available_now=True,
        )
        out = read_history(spark, os.path.join(base, "hist"))
        return out
    finally:
        _defer_cleanup(base)


def q_pack_sequences(spark, sf_dir):
    """Sequence packing for a pretraining loader
    (operators.packing.pack_sequences): documents in doc_id order are
    laid out as one contiguous token stream and cut into 2048-token
    packs; each doc gets (pack_first, offset_in_first, pack_last).
    The prefix sum is the two-pass partition-offset technique — no
    global window, no single hot partition. Token counts are the
    engine-portable whitespace tokenization (text_stats)."""
    from margaret_spark.operators.packing import pack_sequences
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    return pack_sequences(toks, "doc_id", "n_tokens", seq_len=2048)


def q_stream_dedup_exact(spark, sf_dir):
    """The stateful streaming ingest-dedup path END-TO-END on the
    graded surface: documents are appended to a real OffsetLog (one
    batched file write, dense seqs in doc_id order), then the
    streaming exact dedup (streaming/stateful.py,
    applyInPandasWithState keyed by sha2-256 content hash) drains the
    log's append stream and emits first-seen keepers. Delivery is the
    SCALE path: each micro-batch's keepers land executor-side as a
    batch=<id> parquet partition (streaming/sinks.py — no driver
    toPandas; the keeper stream is one row per unique document ever
    ingested), the sink is then COMPACTED (batch partials folded into
    a compacted=<hw> segment with a high-water manifest — the
    long-running-stream small-file answer), and the graded result is
    the compacted sink read back. Oracle-checked: keepers must be
    exactly min(seq) per distinct content, and the state key (sha2
    hex) is engine-identical to DuckDB's sha256."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import (
        compact_sink,
        read_keeper_sink,
        stream_dedup_exact,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        # distributed ingest: the corpus never transits the driver —
        # append_df range-partitions on doc_id so seqs follow doc_id
        # order exactly (the oracle's seq == doc_id assumption)
        log.append_df(docs, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_dedup_exact(
            log,
            F.col("value"),
            checkpoint_dir=os.path.join(base, "ckpt"),
            sink_dir=sink,
            available_now=True,
        )
        compact_sink(spark, sink)
        out = read_keeper_sink(
            spark, sink, "content_hash string, keep_seq long"
        )
        # the sink dir is deleted on return: materialize rows first
        return out
    finally:
        _defer_cleanup(base)


def q_stream_dedup_minhash(spark, sf_dir):
    """Streaming MinHash-LSH near-dup detection on the graded surface
    (streaming/stateful.py): documents stream out of a real log; each
    row's band buckets are matched against every bucket ever claimed
    (state keyed by (band, bucket), one long each); collisions emit
    (dup_seq → earliest keep_seq). Rows-only check (banding is not
    SQL-expressible — same status as the batch dedup_minhash, whose
    buckets this pipeline reproduces exactly; see
    tests/test_streaming.py)."""
    import shutil
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import stream_dedup_minhash

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="stream_mh_")
    cands: list = []
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        # distributed ingest (append_df): no driver-side materialization
        log.append_df(docs, value_col="text", order_by="doc_id")
        stream_dedup_minhash(
            log,
            F.col("value"),
            cands.append,
            os.path.join(base, "ckpt"),
            num_hashes=32,
            bands=8,
            available_now=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    best: dict[int, int] = {}
    for pdf in cands:
        for _, r in pdf.iterrows():
            d, k = int(r["dup_seq"]), int(r["keep_seq"])
            if d not in best or k < best[d]:
                best[d] = k
    rows = sorted(best.items())
    return spark.createDataFrame(rows, "dup_seq long, keep_seq long")


def q_stream_dedup_window(spark, sf_dir):
    """Bounded-horizon streaming dedup (streaming/stateful.py,
    stream_dedup_window): a re-arrival is suppressed only while the
    same content was last seen within the trailing 40 log entries —
    the BOUNDED-STATE variant of stream_dedup_exact (one long per
    content, horizon rule instead of remember-forever). Content is a
    synthetic quadratic-residue stream ((doc_id² ) % 53 — irregular
    per-content gaps, 140 keepers / 360 suppressions at sf0.01), so
    both branches of the rule are exercised; the oracle states the
    same rule as ONE lag window. Hash-exact."""
    import shutil
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import stream_dedup_window

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        ((F.col("doc_id") * F.col("doc_id")) % 53).cast("string").alias("content"),
    )
    base = tempfile.mkdtemp(prefix="stream_win_")
    keepers: list = []
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="content", order_by="doc_id")
        stream_dedup_window(
            log,
            F.col("value"),
            keepers.append,
            os.path.join(base, "ckpt"),
            ttl_seqs=40,
            available_now=True,
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    rows = [
        (str(r["content_hash"]), int(r["keep_seq"]))
        for pdf in keepers
        for _, r in pdf.iterrows()
    ]
    return spark.createDataFrame(rows, "content_hash string, keep_seq long")


def q_stream_pii_redact(spark, sf_dir):
    """Streaming at-ingest PII scrub (streaming/scrub.py): the salted
    documents are appended to a real OffsetLog (distributed append_df,
    seq == doc_id), the scrub drains the log's append stream and
    writes (seq, redacted) to an append-mode parquet sink — scrubbed
    executor-side, no driver materialization, exactly-once via the
    checkpoint. The graded result is the SINK read back; the oracle
    is the batch redaction SQL, so ingest-time and batch scrubbing
    are pinned byte-identical."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import stream_scrub_pii

    docs = _pii_salted_docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="stream_pii_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_scrub_pii(
            log,
            F.col("value"),
            sink,
            os.path.join(base, "ckpt"),
            available_now=True,
        )
        out = spark.read.parquet(sink).select(
            F.col("seq").alias("doc_id"), "redacted"
        )
        # the sink dir is deleted on return: materialize rows first
        return out
    finally:
        _defer_cleanup(base)


def q_sample_weighted(spark, sf_dir):
    """Quality-weighted deterministic downsampling
    (operators.sampling.weighted_sample): each document survives with
    probability equal to its pround'ed quality score, decided by
    md5(doc_id) — the curation-grade sampler (high-quality docs kept
    more often) that still reproduces bit-for-bit on any engine."""
    from margaret_spark.operators.sampling import weighted_sample
    from margaret_spark.operators.text import quality_score

    docs = _t(spark, sf_dir, "documents")
    scored = quality_score(docs, "doc_id", "text")
    return weighted_sample(scored, "doc_id", "quality")


def q_multimodal_image_meta(spark, sf_dir):
    """The multimodal binary plumbing END-TO-END on the graded
    surface: synthesize a fake image blob per document (dimensions
    derived from doc_id/n_chars), then parse it back with the
    Arrow-batched mapInPandas header reader
    (operators.multimodal.attach_fake_image_blobs →
    extract_image_meta). Both passes are partition-preserving — zero
    shuffles. Oracle-checkable because the fake wire format is
    arithmetic-deterministic: the SQL recomputes
    width/height/channels/n_bytes that the binary round-trip must
    reproduce."""
    from margaret_spark.operators.multimodal import (
        attach_fake_image_blobs,
        extract_image_meta,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("n_chars") % 512 + 16).cast("int").alias("w"),
        (F.col("doc_id") % 256 + 16).cast("int").alias("h"),
    )
    blobs = attach_fake_image_blobs(docs, "doc_id", "w", "h", channels=3)
    return extract_image_meta(blobs, "doc_id", "blob")


def q_multimodal_decode_png(spark, sf_dir):
    """REAL image decode on the graded surface: each document gets an
    actual 8-bit greyscale PNG (stdlib zlib/struct encoder) whose
    pixel stream is the closed form (doc_id*31 + i) mod 256; the real
    PNG decoder (operators.media_codecs.decode_png — chunk walk,
    inflate, scanline unfilter) then recovers the pixels and the
    statistics are aggregated JVM-side from the decoded array. The
    oracle recomputes every statistic arithmetically from the closed
    form — any bug in either codec direction (CRC, filtering, stride,
    zlib framing) hash-mismatches. Both mapInPandas passes are
    partition-preserving; the aggregation is per-row array math in
    codegen — zero shuffles."""
    from margaret_spark.operators.multimodal import (
        attach_synthetic_png_blobs,
        decode_image,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("n_chars") % 24 + 4).cast("int").alias("w"),
        (F.col("doc_id") % 16 + 4).cast("int").alias("h"),
    )
    blobs = attach_synthetic_png_blobs(docs, "doc_id", "w", "h")
    decoded = decode_image(blobs, "doc_id", "blob")
    px = F.col("pixels")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.size(px).cast("long").alias("n_pixels"),
        F.aggregate(
            px, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("px_sum"),
        # position-weighted checksum: catches right-values-wrong-order
        F.aggregate(
            F.zip_with(
                px,
                F.sequence(F.lit(1), F.size(px)),
                lambda x, i: x.cast("long") * i.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("px_checksum"),
    )


def q_multimodal_decode_jpeg(spark, sf_dir):
    """REAL baseline-JPEG decode on the graded surface: a from-scratch
    stdlib+numpy JPEG codec (operators.jpeg — marker walk, canonical
    Huffman from DHT, dequantize, IDCT) round-trips a deterministic
    gradient per document. JPEG is lossy so decoded pixels are not
    closed-form; the oracle checks the structural surface (dims,
    decoded pixel count) while pixel fidelity is pinned in pytest
    (PSNR floor + bit-exact recovery of the encoder's quantized
    coefficient blocks — the lossless entropy layer). Zero shuffles."""
    from margaret_spark.operators.multimodal import (
        attach_synthetic_jpeg_blobs,
        decode_image,
    )

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.col("n_chars") % 24 + 8).cast("int").alias("w"),
        (F.col("doc_id") % 16 + 8).cast("int").alias("h"),
    )
    # single-file table → 1-2 scan tasks; spread the CPU-heavy
    # per-row JPEG encode/decode across the executor pool
    base = base.repartition(spark.sparkContext.defaultParallelism)
    blobs = attach_synthetic_jpeg_blobs(base, "doc_id", "w", "h")
    decoded = decode_image(blobs, "doc_id", "blob")
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.size(F.col("pixels")).cast("long").alias("n_pixels"),
    )


def q_multimodal_decode_wav(spark, sf_dir):
    """REAL audio decode on the graded surface: a PCM16 WAV per
    document (stdlib RIFF encoder), samples s[i] = ((doc_id*7 +
    i*13) mod 4096) - 2048, decoded by the real RIFF/PCM parser and
    aggregated JVM-side. Oracle recomputes the closed form. Zero
    shuffles."""
    from margaret_spark.operators.multimodal import (
        attach_synthetic_wav_blobs,
        decode_audio,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.lit(8000) + (F.col("doc_id") % 8) * 1000).cast("int").alias("rate"),
        (F.col("n_chars") % 128 + 16).cast("int").alias("n"),
    )
    blobs = attach_synthetic_wav_blobs(docs, "doc_id", "rate", "n")
    decoded = decode_audio(blobs, "doc_id", "blob")
    s = F.col("samples")
    return decoded.select(
        "doc_id",
        "sample_rate",
        "channels",
        F.size(s).cast("long").alias("n_samples"),
        F.aggregate(
            s, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
        ).alias("sample_sum"),
        F.aggregate(
            s, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x.cast("long"))
        ).alias("sample_abs_sum"),
    )


def q_multimodal_video_meta(spark, sf_dir):
    """REAL video CONTAINER parsing on the graded surface
    (operators.video_containers): each document gets a deterministic
    MP4 (ISO BMFF box walk: mvhd timescale/duration, tkhd 16.16
    dimensions, hdlr track types), AVI (RIFF hdrl/avih MainAVIHeader),
    or garbage blob; extract_video_meta parses them back with the
    stdlib-only, fuzz-hardened parsers. The oracle recomputes every
    field arithmetically from the id closed form — duration division
    is IEEE-exact both engines, so the surface is hash-exact. Frame
    DECODE stays a documented stub (needs native codecs); container
    metadata covers the curation-filtering need. mapInPandas both
    directions, zero shuffles."""
    from margaret_spark.operators.video_containers import (
        attach_synthetic_video_blobs,
        extract_video_meta,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    blobs = attach_synthetic_video_blobs(docs, "doc_id")
    meta = extract_video_meta(blobs, "doc_id", "blob")
    return meta.select(
        "doc_id", "container", "duration_s", "n_tracks", "width", "height"
    )


def q_multimodal_decode_video(spark, sf_dir):
    """REAL video FRAME decode on the graded surface: each document
    gets an MJPEG-in-AVI (video_containers.encode_avi_mjpeg — avih +
    vids/MJPG strl + movi of 00dc chunks, each a REAL baseline JPEG
    of a deterministic gradient), sample_video_frames walks the RIFF
    container and emits every 2nd frame, and decode_image decodes the
    sampled JPEGs with the from-scratch stdlib+numpy codec. JPEG is
    lossy so pixel VALUES are pinned by PSNR in pytest
    (tests/test_video_containers.py); the oracle checks the full
    structural surface — the stride fan-out (which (doc, frame_idx)
    rows exist) and per-frame dims/pixel counts — arithmetically from
    the id closed form. mapInPandas end-to-end, zero shuffles."""
    from margaret_spark.operators.multimodal import (
        attach_synthetic_mjpeg_avi_blobs,
        decode_image,
        sample_video_frames,
    )

    docs = _t(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.col("n_chars") % 24 + 8).cast("int").alias("w"),
        (F.col("doc_id") % 16 + 8).cast("int").alias("h"),
        (F.col("doc_id") % 5 + 2).cast("int").alias("nf"),
    )
    # the documents table is a single file (1-2 scan tasks); spread the
    # CPU-heavy per-row JPEG encode/decode across the executor pool
    base = base.repartition(spark.sparkContext.defaultParallelism)
    blobs = attach_synthetic_mjpeg_avi_blobs(base, "doc_id", "w", "h", "nf")
    frames = sample_video_frames(blobs, "doc_id", "blob", every_n=2)
    # fold (doc_id, frame_idx) into one key for decode_image, then
    # recover both (nf <= 6 so frame_idx < 16)
    keyed = frames.select(
        (F.col("doc_id") * 16 + F.col("frame_idx")).alias("fid"), "frame"
    )
    decoded = decode_image(keyed, "fid", "frame")
    return decoded.select(
        F.expr("fid div 16").cast("long").alias("doc_id"),
        (F.col("fid") % 16).cast("int").alias("frame_idx"),
        "width",
        "height",
        F.size(F.col("pixels")).cast("long").alias("n_pixels"),
    )


def _image_dedup_base(spark, sf_dir):
    """The shared fixture for the perceptual image-hash queries: 25
    image groups (seed = doc_id % 25) of REAL greyscale PNGs with the
    quadratic closed-form pixel stream (id*31 + j²) mod 256 — equal
    seeds are exact duplicate images, different seeds are perceptually
    distinct (cross-seed dHash Hamming ≥ 8 on this parameter grid).
    The 25 distinct (seed, w, h) images are encoded ONCE and broadcast
    back onto the corpus; decode then runs per document."""
    from margaret_spark.operators.multimodal import (
        attach_synthetic_png_blobs_quad,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 25).alias("seed"),
        ((F.col("doc_id") % 25) % 5 + 16).cast("int").alias("w"),
        ((F.col("doc_id") % 25) % 3 + 12).cast("int").alias("h"),
    )
    groups = docs.select("seed", "w", "h").distinct()
    blobs = attach_synthetic_png_blobs_quad(groups, "seed", "w", "h")
    # single-file table → 1-2 scan tasks; spread the per-row PNG
    # decode across the pool before the Arrow stage
    return docs.join(F.broadcast(blobs), "seed").repartition(
        spark.sparkContext.defaultParallelism
    )


def q_multimodal_image_dhash(spark, sf_dir):
    """Perceptual image hashing (dHash) on the graded surface
    (operators.imagehash): REAL PNG decode (stdlib zlib/struct), then
    a 9×8 nearest-neighbor grey grid and 64 gradient-direction bits —
    pure integer math after decode, zero shuffles, zero extra UDFs.
    The oracle recomputes every bit arithmetically from the closed
    form (grid sampling floor-divs, quadratic pixel stream, two's-
    complement bit packing) — any bug in decode, sampling, luma, or
    packing hash-mismatches."""
    from margaret_spark.operators.imagehash import image_dhash

    base = _image_dedup_base(spark, sf_dir)
    return image_dhash(base, "doc_id", "blob")


def q_multimodal_image_dedup(spark, sf_dir):
    """Image-level near-dup detection (the LAION-style multimodal
    dedup stage): dHash each document's image, then all pairs within
    Hamming ≤ 6 via the LOSSLESS pigeonhole block join (7 blocks of 9
    bits; a pair within distance 6 agrees on ≥ 1 whole block — an
    equality-join bucket, never a cross join; the exact Hamming check
    rides inside the join condition). On this fixture the pairs are
    exactly the 25 planted duplicate groups (cross-group Hamming ≥ 8).
    The oracle re-derives the hashes arithmetically and takes the
    brute-force Hamming self-join — banding must find exactly those
    pairs (the pigeonhole guarantee, graded hash-exact, not
    rows-only)."""
    from margaret_spark.operators.imagehash import image_dedup_pairs

    base = _image_dedup_base(spark, sf_dir)
    return image_dedup_pairs(base, "doc_id", "blob", max_hamming=6)


def q_multimodal_image_phash(spark, sf_dir):
    """DCT perceptual hash (pHash) on the graded surface
    (operators.imagehash.image_phash): REAL PNG decode, 16×16 box
    floor-mean downsample + separable INTEGER DCT in one Arrow stage
    (hardcoded round(cos·4096) basis — protocol constants shared
    verbatim with this oracle), then the 64 low-frequency AC
    coefficients (DC excluded — brightness invariance) thresholded
    against their exact integer median pair (2·C > m32+m33) in
    codegen. The oracle re-derives every box mean, coefficient, and
    bit arithmetically from the closed-form pixel stream — any bug in
    decode, luma, the box means, the DCT passes, the median rule, or
    packing hash-mismatches. Robust where dHash is not: brightness
    shifts move only the excluded DC, and pixel jitter cancels in the
    box means (pinned in pytest on a JPEG re-encode)."""
    from margaret_spark.operators.imagehash import image_phash

    base = _image_dedup_base(spark, sf_dir)
    return image_phash(base, "doc_id", "blob")


def q_multimodal_image_phash_dedup(spark, sf_dir):
    """Image near-dup pairs under pHash: hash + the lossless
    pigeonhole Hamming join at max_hamming=10 (11 blocks; pHash's
    frequency bits degrade more gracefully than dHash's spatial
    gradients, so the band is wider). On this fixture the pairs are
    exactly the 25 planted duplicate groups — cross-seed pHash
    Hamming is ≥ 16 on this parameter grid. The oracle is the
    brute-force Hamming self-join over the arithmetically re-derived
    hashes: banding must find exactly those pairs."""
    from margaret_spark.operators.imagehash import phash_dedup_pairs

    base = _image_dedup_base(spark, sf_dir)
    return phash_dedup_pairs(base, "doc_id", "blob", max_hamming=10)


def _audio_dedup_base(spark, sf_dir):
    """The shared fixture for the perceptual audio-fingerprint
    queries: 25 audio groups (seed = doc_id % 25) × 3 noise variants
    (v = doc_id div 25 mod 3) of REAL PCM16 WAVs with the closed-form
    waveform s[j] = ((seed·997 + j²·29 + j·17) mod 4096) − 2048 +
    (32·v iff j mod 5 = 0) — same seed + same noise are exact
    duplicates, same
    seed + different noise are planted NEAR-duplicates (the additive
    perturbation flips only gradient bits near energy ties), and
    different seeds are perceptually distinct. The 75 distinct
    (seed, v) clips are encoded ONCE and broadcast back onto the
    corpus; decode then runs per document."""
    from margaret_spark.operators.multimodal import (
        attach_synthetic_wav_blobs_noisy,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % 25).alias("seed"),
        (F.expr("doc_id DIV 25") % 3).alias("v"),
    ).withColumn("gid", F.col("seed") * 3 + F.col("v"))
    groups = (
        docs.select("gid", "seed", "v")
        .distinct()
        .select(
            "gid",
            "seed",
            "v",
            (F.lit(8000) + (F.col("seed") % 8) * 1000).cast("int").alias("rate"),
            ((F.col("seed") % 5) * 16 + 64).cast("int").alias("n"),
        )
    )
    blobs = attach_synthetic_wav_blobs_noisy(
        groups.withColumn("noise", F.col("v") * 32),
        "gid", "seed", "rate", "n", "noise",
    )
    # single-file table → 1-2 scan tasks; spread the per-row WAV
    # decode across the pool before the Arrow stage
    return docs.join(F.broadcast(blobs), "gid").repartition(
        spark.sparkContext.defaultParallelism
    )


def q_multimodal_audio_fp(spark, sf_dir):
    """Perceptual audio fingerprinting on the graded surface
    (operators.audiohash): REAL PCM16 WAV decode (stdlib RIFF walk),
    then 65 floor-div time frames, absolute-amplitude frame energies,
    and 64 energy-gradient bits — pure integer math after decode,
    zero shuffles, zero extra UDFs. The oracle recomputes every bit
    arithmetically from the closed form (per-sample frame assignment
    via the exact bucket inverse (65·(j+1)−1) div n, energy sums,
    two's-complement bit packing) — any bug in decode, framing,
    energy, or packing hash-mismatches."""
    from margaret_spark.operators.audiohash import audio_fingerprint

    base = _audio_dedup_base(spark, sf_dir)
    return audio_fingerprint(base, "doc_id", "blob")


def q_multimodal_audio_dedup(spark, sf_dir):
    """Audio-level near-dup detection (the audio leg of multimodal
    corpus dedup): energy-gradient fingerprint per document, then all
    pairs within Hamming ≤ 6 via the LOSSLESS pigeonhole block join
    (imagehash.hamming_pairs — the construction is modality-
    agnostic). On this fixture the pairs are exactly the 25 planted
    same-seed groups (exact dups at distance 0, noise variants within
    ≤ 4 bits; cross-seed Hamming ≥ 9 on this parameter grid); the
    oracle re-derives the fingerprints arithmetically and takes the
    brute-force Hamming self-join — banding must find exactly those
    pairs (the pigeonhole guarantee, graded hash-exact, not
    rows-only)."""
    from margaret_spark.operators.audiohash import audio_dedup_pairs

    base = _audio_dedup_base(spark, sf_dir)
    return audio_dedup_pairs(base, "doc_id", "blob", max_hamming=6)


def q_multimodal_dedup_clusters(spark, sf_dir):
    """The decision stage of multimodal dedup, composed from the
    library's own parts: audio energy-gradient fingerprints → lossless
    pigeonhole Hamming pairs → connected components (dedup_clusters —
    the SAME min-label-propagation operator the text jaccard family
    uses; pair generators and the cluster step compose across
    modalities). Every document gets cluster_id = min doc_id of its
    near-dup component; keep-one-per-group is then a doc_id ==
    cluster_id filter. The oracle re-derives the fingerprints
    arithmetically, takes the brute-force Hamming self-join, and runs
    a recursive reachability CTE — graded hash-exact."""
    from margaret_spark.operators.audiohash import audio_dedup_pairs
    from margaret_spark.operators.dedup import dedup_clusters

    base = _audio_dedup_base(spark, sf_dir)
    pairs = audio_dedup_pairs(base, "doc_id", "blob", max_hamming=6)
    return dedup_clusters(base.select("doc_id"), pairs, "doc_id")


def q_multimodal_dedup_clusters_all(spark, sf_dir):
    """CROSS-MODAL dedup clusters: the union of the image pHash pair
    set (Hamming ≤ 10) and the audio fingerprint pair set (≤ 6) feeds
    ONE connected-components pass — the composition a multimodal
    pipeline actually runs (a document is a duplicate if ANY of its
    modalities says so). Pair generators are modality-agnostic
    (id_a, id_b) tables, so the union is free; the oracle re-derives
    both hash families arithmetically, takes both brute-force Hamming
    joins, unions, and runs the recursive reachability CTE — graded
    hash-exact."""
    from margaret_spark.operators.audiohash import audio_dedup_pairs
    from margaret_spark.operators.dedup import dedup_clusters
    from margaret_spark.operators.imagehash import phash_dedup_pairs

    img = _image_dedup_base(spark, sf_dir)
    aud = _audio_dedup_base(spark, sf_dir)
    pairs = (
        phash_dedup_pairs(img, "doc_id", "blob", max_hamming=10)
        .select("id_a", "id_b")
        .unionByName(
            audio_dedup_pairs(aud, "doc_id", "blob", max_hamming=6)
            .select("id_a", "id_b")
        )
    )
    return dedup_clusters(img.select("doc_id"), pairs, "doc_id")


def q_text_bpe_tokens(spark, sf_dir):
    """REAL byte-level BPE tokenization on the graded surface
    (operators.bpe): a GPT-2-style pre-tokenizer (Python∩Java∩RE2
    dialect, no lookahead), byte-level base vocabulary (ids 0-255 =
    UTF-8 bytes, merge r → 256+r), and the deterministic DEFAULT
    merge table derived from the embedded seed corpus (a pytest
    retrains it from the seed and asserts equality — the table is a
    pure function of public algorithm + seed, not a magic constant).
    The oracle re-runs the ENTIRE encoder independently in SQL: a
    recursive CTE applies one (lowest-rank, leftmost) merge per step
    over the distinct pre-token vocabulary — equivalent to the
    sweep implementation because pairs created by a merge always
    involve the new, strictly-later-ranked token. Hash-exact on
    count, checksum, and the first 8 token ids per document.
    Arrow-batched pandas UDF, map-only; the merge loop is memoized
    per distinct pre-token."""
    from margaret_spark.operators.bpe import bpe_tokenize

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # single-file table → spread the CPU-heavy merge loop
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    t = bpe_tokenize(docs, "doc_id", "text")
    a = F.col("token_ids")
    return t.select(
        "doc_id",
        F.coalesce(F.size(a), F.lit(0)).cast("long").alias("n_tokens"),
        F.coalesce(
            F.aggregate(
                a, F.lit(0).cast("long"), lambda acc, x: acc + x.cast("long")
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("token_sum"),
        *[
            F.element_at(a, i).cast("int").alias(f"t{i}")
            for i in range(1, 9)
        ],
    )


def q_text_bpe_wordcounts(spark, sf_dir):
    """The distributed half of BPE TRAINING, graded: the top-50
    pre-token frequency table (count desc, token asc — the exact
    bounded word-frequency input train_bpe's driver merge loop
    consumes). JVM-side regexp_extract_all + explode + map-side-
    combined groupBy; TakeOrdered top-k, no full sort. Hash-exact —
    the oracle re-runs the same pre-tokenizer in RE2."""
    from margaret_spark.operators.bpe import PRETOKEN_RE

    docs = _t(spark, sf_dir, "documents")
    wc = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit(PRETOKEN_RE), 0)
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(50)
    )
    return wc


def q_pack_sequences_bpe(spark, sf_dir):
    """Sequence packing driven by REAL BPE token counts — the
    production shape of the pretraining-loader layout query
    (pack_sequences is tokens_col-agnostic; here the column comes
    from operators.bpe rather than the regex proxy). The oracle
    recomputes the ENTIRE pipeline in SQL: the recursive-CTE BPE
    encoder supplies per-doc token counts, then the same integer
    window cumsum / div arithmetic lays out the packs. Hash-exact."""
    from margaret_spark.operators.bpe import bpe_token_count
    from margaret_spark.operators.packing import pack_sequences

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.repartition(spark.sparkContext.defaultParallelism)
    counted = bpe_token_count(docs, "doc_id", "text")
    return pack_sequences(
        counted, "doc_id", "n_tokens", seq_len=512, order_col="doc_id"
    )


def q_stream_token_budget(spark, sf_dir):
    """At-ingest token-budget gating BY THE STREAMING ENGINE
    (streaming/stateful.stream_token_budget, applyInPandasWithState
    keyed by source): documents stream in seq order and each source
    admits documents until 500 cumulative tokens, then closes — per
    source the state is ONE long forever. The admitted set (the whole
    training corpus's key set at scale) is delivered executor-side
    into a batch=<id> parquet sink and read back — no driver pandas
    funnel. The oracle states the kept set as a per-source window
    cumsum over doc_id order (keep iff tokens-before-it < budget) —
    hash-exact including the cumulative sums."""
    import tempfile

    from margaret_spark.functions.shingling import words
    from margaret_spark.streaming import read_keeper_sink, stream_token_budget

    sdf = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tagged = sdf.select(
        F.col("source").alias("stratum"),
        F.col("doc_id").alias("seq"),
        F.size(words(F.col("text"))).cast("long").alias("n_tokens"),
    )
    base = tempfile.mkdtemp(prefix="stream_budget_")
    try:
        sink = os.path.join(base, "sink")
        stream_token_budget(
            tagged, 500, os.path.join(base, "ckpt"), sink_dir=sink
        )
        out = read_keeper_sink(
            spark,
            sink,
            "stratum string, seq long, n_tokens long, cum_tokens long",
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_lm_filter(spark, sf_dir):
    """At-ingest LM quality gating (streaming/quality.py): a pruned
    bigram LM is fitted ONCE on the even-doc reference corpus
    (operators.lm.fit_bigram_lm, top-512 cut), then every document
    streaming out of the log is scored inside foreachBatch (explode +
    broadcast LM joins + per-doc agg — per-batch scoring of disjoint
    seqs equals batch scoring of the whole log, since the model is
    fixed) and kept iff surprise <= 190; keepers land executor-side
    under batch=<id> partitions. The oracle re-fits and re-scores the
    same recipe in SQL — hash-exact including the surprise values."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.operators.lm import fit_bigram_lm
    from margaret_spark.streaming import read_keeper_sink, stream_lm_filter

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lm = fit_bigram_lm(
        docs.where(F.col("doc_id") % 2 == 0), "doc_id", "text", max_ngrams=512
    )
    base = tempfile.mkdtemp(prefix="stream_lmf_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_lm_filter(
            log,
            F.col("value"),
            lm,
            190.0,
            sink,
            os.path.join(base, "ckpt"),
        )
        out = read_keeper_sink(
            spark, sink, "seq long, n_bigrams long, surprise double"
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_nb_filter(spark, sf_dir):
    """At-ingest TRAINED-classifier gating (streaming/quality.py):
    the multinomial NB model is fitted ONCE on the doc_id % 3 labeled
    slice (the q_text_nb_* recipe: length-derived long/short labels,
    top-16 vocab cut), then every document streaming out of the log
    is scored inside foreachBatch (explode + broadcast model joins +
    keyed agg — per-batch scoring of disjoint seqs equals batch
    scoring of the whole log, since the model is fixed) and kept iff
    its score under the 'long' class is <= 3000 (~the corpus median —
    the published GPT-3 recipe: threshold on the quality class's
    classifier score; the gate demonstrably drops, not rubber-stamps);
    zero-token docs (score NULL) drop conservatively. Keepers land
    executor-side under batch=<id> partitions. The oracle re-fits and
    re-scores the same recipe in SQL — hash-exact including the
    scores. Completes the curation chain (rules → LM gate → trained
    classifier) in streaming form."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_nb_filter

    docs, model = _nb_model(spark, sf_dir)
    docs = docs.select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="stream_nbf_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_nb_filter(
            log,
            F.col("value"),
            model,
            sink,
            os.path.join(base, "ckpt"),
            score_label="long",
            max_score=3000.0,
        )
        out = read_keeper_sink(spark, sink, "seq long, pred string, score double")
        return out
    finally:
        _defer_cleanup(base)


def q_stream_dsir_filter(spark, sf_dir):
    """At-ingest DSIR distribution matching (streaming/quality.py):
    the hashed-bigram models are fitted ONCE (even docs = target, odd
    = raw, the corpus_dsir_* recipe), then every document streaming
    out of the log is weighted inside foreachBatch (explode + bucket
    + broadcast count join + keyed agg — per-batch scoring of
    disjoint seqs equals batch scoring of the whole log, since the
    model is fixed) and kept iff weight >= 1.0 (~the corpus median —
    the gate demonstrably drops); no-feature docs (weight NULL) drop
    conservatively. Keepers land executor-side under batch=<id>
    partitions. The oracle re-fits and re-weights the same recipe in
    SQL — hash-exact including the weights. Completes the curation
    chain's fourth leg in streaming form."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_dsir_filter

    docs, model = _dsir_model(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="stream_dsir_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_dsir_filter(
            log,
            F.col("value"),
            model,
            1.0,
            sink,
            os.path.join(base, "ckpt"),
            n=2,
            n_buckets=64,
        )
        out = read_keeper_sink(
            spark, sink, "seq long, n_grams long, weight double"
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_hash_embed(spark, sf_dir):
    """Streaming at-ingest document vectorization
    (streaming/annintake.stream_hash_embed): every text streaming out
    of the log becomes its 64-dim hashed signed-bucket vector on
    arrival — the front stage of the streaming vector chain (text ->
    vector -> IVF cell -> PQ codes, each an at-ingest operator here).
    Stateless per document, so per-batch embedding of disjoint seqs
    equals batch embedding of the corpus — exactly what the oracle
    (the hashembed CTE chain keyed by seq) states. Hash-exact."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_hash_embed

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="stream_hembed_")
    try:
        log = OffsetLog(
            spark, os.path.join(base, "log"), value_type=T.StringType()
        )
        log.append_df(docs, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_hash_embed(
            log, F.col("value"), sink, os.path.join(base, "ckpt"), dim=64
        )
        out = read_keeper_sink(spark, sink, "seq long, pos long, val double")
        return out
    finally:
        _defer_cleanup(base)


def q_stream_image_phash(spark, sf_dir):
    """Streaming at-ingest perceptual image hashing
    (streaming/mediaintake.stream_image_phash): every image blob
    streaming out of the log is pHash'd on arrival — the multimodal
    leg of the at-ingest family (a LAION-style pipeline dedups
    arrivals against the corpus signature table without re-scanning
    it). Stateless per row, so per-batch hashing of disjoint seqs
    equals batch hashing of the corpus — exactly what the oracle (the
    pHash arithmetic chain keyed by the append rank) states.
    Hash-exact."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_image_phash

    blobs = _image_dedup_base(spark, sf_dir).select("doc_id", "blob")
    base = tempfile.mkdtemp(prefix="stream_iphash_")
    try:
        log = OffsetLog(
            spark, os.path.join(base, "log"), value_type=T.BinaryType()
        )
        log.append_df(blobs, value_col="blob", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_image_phash(
            log, F.col("value"), sink, os.path.join(base, "ckpt")
        )
        out = read_keeper_sink(spark, sink, "seq long, phash long")
        return out
    finally:
        _defer_cleanup(base)


def q_stream_pq_assign(spark, sf_dir):
    """Streaming PQ intake (streaming/annintake.stream_pq_assign):
    every embedding streaming out of the log is compressed at ingest
    to its m=4 nearest-code ids under a FROZEN codebook
    (operators.pq.pq_train on the reference corpus — fit once, the
    at-ingest-model house rule). Stateless broadcast ranking, so
    per-batch encoding of disjoint seqs equals batch encoding of the
    whole corpus — which is exactly what the oracle states: the PQ
    CTE chain's enc table keyed by seq. Keepers (seq, sub, code_id,
    dist2) land executor-side as batch=<id> partials; the serving
    code table IVFADC reads is their fold."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.operators.pq import pq_train
    from margaret_spark.streaming import read_keeper_sink, stream_pq_assign

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = pq_train(emb, m=4, codes=8, iters=1)
    base = tempfile.mkdtemp(prefix="stream_pq_")
    try:
        log = OffsetLog(
            spark,
            os.path.join(base, "log"),
            value_type=T.ArrayType(T.FloatType()),
        )
        log.append_df(emb, value_col="embedding", order_by="vec_id")
        sink = os.path.join(base, "sink")
        stream_pq_assign(
            log,
            F.col("value"),
            cb,
            sink,
            os.path.join(base, "ckpt"),
        )
        out = read_keeper_sink(
            spark, sink, "seq long, sub long, code_id long, dist2 double"
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_ivf_assign(spark, sf_dir):
    """Streaming ANN intake (streaming/annintake.py): every embedding
    streaming out of the log is routed to its nearest IVF cell under
    FROZEN centroids (the 16 lowest-id vectors — the same seeding as
    ann_ivf/dedup_embedding, so assignment is oracle-expressible)
    inside foreachBatch — stateless broadcast ranking, per-batch
    assignment of disjoint seqs equals batch assignment of the whole
    log. Keepers (seq, cell, cos) land executor-side under batch=<id>
    partitions; operators.similarity.ivf_index_append is the batch
    fold into the persisted index. The oracle re-derives the ranking
    with the house (rounded cosine desc, cent_id asc) tiebreak —
    hash-exact including the cosines."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_ivf_assign

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = (
        emb.orderBy(F.col("vec_id").asc())
        .limit(16)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cent"))
    )
    base = tempfile.mkdtemp(prefix="stream_ivf_")
    try:
        log = OffsetLog(
            spark,
            os.path.join(base, "log"),
            value_type=T.ArrayType(T.FloatType()),
        )
        log.append_df(emb, value_col="embedding", order_by="vec_id")
        sink = os.path.join(base, "sink")
        stream_ivf_assign(
            log,
            F.col("value"),
            cents,
            sink,
            os.path.join(base, "ckpt"),
        )
        out = read_keeper_sink(spark, sink, "seq long, cell long, cos double")
        return out
    finally:
        _defer_cleanup(base)


def q_stream_token_budget_bpe(spark, sf_dir):
    """The token-budget gate fed by REAL byte-level BPE counts —
    production token accounting end-to-end: the ingest projection tags
    each arriving document with operators.bpe's Arrow-batched
    tokenizer count (no whitespace proxy), the stateful gate admits
    per-source prefixes until 800 cumulative tokens, and the admitted
    set lands executor-side in a batch=<id> parquet sink. The oracle
    re-derives n_tokens with the recursive-CTE SQL BPE encoder (one
    lowest-rank-leftmost merge per step) and restates the gate as a
    per-source window cumsum — hash-exact across tokenizer AND gate."""
    import tempfile

    from margaret_spark.operators.bpe import bpe_token_count_col
    from margaret_spark.streaming import read_keeper_sink, stream_token_budget

    sdf = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    tagged = sdf.select(
        F.col("source").alias("stratum"),
        F.col("doc_id").alias("seq"),
        bpe_token_count_col(F.col("text")).alias("n_tokens"),
    )
    base = tempfile.mkdtemp(prefix="stream_budget_bpe_")
    try:
        sink = os.path.join(base, "sink")
        stream_token_budget(
            tagged, 800, os.path.join(base, "ckpt"), sink_dir=sink
        )
        out = read_keeper_sink(
            spark,
            sink,
            "stratum string, seq long, n_tokens long, cum_tokens long",
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_events_sessions(spark, sf_dir):
    """Gap-based session windows computed BY THE STREAMING ENGINE
    (F.session_window, 30-min gap) and drained with availableNow —
    the streaming twin of q_events_sessions, oracle-checked: session
    bounds and counts must equal the batch gap-sessionization exactly
    (Spark merges an event into a session iff it lands strictly
    before last_event + gap, so the oracle breaks sessions on
    gap >= 30 min). Complete output mode is the DRAIN-GRADING HARNESS
    only (the final micro-batch must hold every closed-and-merged
    session regardless of how the file source batched the input so
    the oracle can compare full snapshots); the library operator
    (streaming/windows.py session_windows) is watermarked and
    append-safe — production sinks should use append mode, not copy
    this."""
    import tempfile

    from margaret_spark.streaming import session_windows

    sdf = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ev = sdf.select(F.col("ts").alias("ets"), "user_id")
    sess = session_windows(ev, "ets", keys=["user_id"], gap="30 minutes")

    base = tempfile.mkdtemp(prefix="stream_sessions_")
    out = os.path.join(base, "out")

    def on_batch(bdf, bid):
        # each complete-mode batch is a full snapshot; OVERWRITE the
        # parquet sink so the last batch leaves the final session set —
        # rows flow executor→disk, never through a driver collect
        # (whose memory would grow with total session count)
        bdf.select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            F.col("n_events").cast("long").alias("n_events"),
        ).write.mode("overwrite").parquet(out)

    try:
        q = (
            sess.writeStream.foreachBatch(on_batch)
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(base, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        final = spark.read.parquet(out)
    finally:
        _defer_cleanup(base)
    return final


def q_codec_roundtrip(spark, sf_dir):
    """The msgpack + CBOR codecs (SURVEY §2.5 ops 38/39) exercised
    DISTRIBUTED, in both the schemaless AND the typed (schema-bound)
    modes: each document's payload is marshalled and unmarshalled by
    all four codecs inside an Arrow-batched pandas UDF — the typed
    mode binds a StructType (the reference's "tipe" binding,
    codec.go:12-31) with nested struct/array fields, CBOR in
    struct-to-array layout. ``ok`` is the per-row equality verdict;
    the oracle expects every row TRUE — any canonicalization, framing,
    field-order, or coercion bug hash-mismatches."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    from margaret_spark.codec import (
        CborCodec,
        MsgpackCodec,
        TypedCborCodec,
        TypedMsgpackCodec,
    )

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("tags", T.ArrayType(T.StringType())),
            T.StructField(
                "meta",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("score", T.DoubleType()),
                        T.StructField("ok", T.BooleanType()),
                    ]
                ),
            ),
        ]
    )
    mp, cb = MsgpackCodec(), CborCodec()
    tmp, tcb = TypedMsgpackCodec(schema), TypedCborCodec(schema)

    @pandas_udf("boolean")
    def rt(ids: pd.Series, texts: pd.Series) -> pd.Series:
        out = []
        for i, t in zip(ids, texts):
            v = {"id": int(i), "text": t}
            tv = {
                "id": int(i),
                "text": t,
                "tags": [t[:3], str(int(i) % 7)],
                "meta": {"n": len(t), "score": float(int(i)) / 8.0, "ok": int(i) % 2 == 0},
            }
            ok = (
                mp.unmarshal(mp.marshal(v)) == v
                and cb.unmarshal(cb.marshal(v)) == v
                and tmp.unmarshal(tmp.marshal(tv)) == tv
                and tcb.unmarshal(tcb.marshal(tv)) == tv
                # struct-to-array really is positional: the CBOR wire
                # value must be a 4-element array, not a map
                and isinstance(cb.unmarshal(tcb.marshal(tv)), list)
            )
            out.append(ok)
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", rt(F.col("doc_id"), F.col("text")).alias("ok"))


def q_embedding_label_stats(spark, sf_dir):
    """Per-class embedding QA (degenerate-class detection): count and
    norm statistics per label. Per-row norms are the same sequential
    fold as the oracle's list_reduce (order-deterministic), rounded,
    then aggregated with exact decimal sums — so even the mean is
    bit-reproducible. One narrow shuffle on label."""
    from margaret_spark.functions.vectors import l2_norm

    emb = _t(spark, sf_dir, "embeddings")
    nr = pround(l2_norm(F.col("embedding")), 6)
    return (
        emb.select("label", nr.alias("nr"))
        .groupBy("label")
        .agg(
            F.count("*").alias("n"),
            F.min("nr").alias("min_norm"),
            F.max("nr").alias("max_norm"),
            pround(dsum("nr", scale=6) / F.count("*"), 6).alias("avg_norm"),
        )
    )


def q_sample_docs(spark, sf_dir):
    """Deterministic hash sample (operators.sampling.hash_sample):
    membership is a pure function of md5(doc_id), so the oracle
    reproduces the exact row set. Narrow filter — no shuffle."""
    from margaret_spark.operators.sampling import hash_sample

    docs = _t(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.2).select("doc_id", "lang", "source", "n_chars")


def q_sample_split(spark, sf_dir):
    """Three-way train/val/test split by hashed id ranges
    (operators.sampling.hash_split) — aggregated per (source, split)
    so the oracle checks every assignment without hauling text."""
    from margaret_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return (
        hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .groupBy("source", "split")
        .agg(F.count("*").alias("n"), F.sum("doc_id").alias("id_sum"))
    )


def q_sample_stratified(spark, sf_dir):
    """Per-source quota (operators.sampling.stratified_sample), run in
    the salted two-phase mode: phase 1 keeps each (source, salt)
    subgroup's top 10 by (md5(doc_id), doc_id) — a hot source spreads
    across 8 reducers and leaks at most 8·10 candidates — phase 2
    ranks the candidates. Salt-stable: the rank key is a total order,
    so results are identical to the unsalted window (the oracle IS the
    unsalted form)."""
    from margaret_spark.operators.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return stratified_sample(docs, "source", "doc_id", 10, salt=8).select(
        "doc_id", "source", "n_chars"
    )


def q_stream_decontaminate(spark, sf_dir):
    """Streaming at-ingest decontamination (streaming/contamination.py):
    the 95% corpus remainder streams out of a real log and is scored
    against the 5% hash-sample eval set's trigram universe as it
    arrives — same split, same shingling expressions, and the same
    pround arithmetic as the batch `decontaminate` query, so the
    append-mode parquet sink is hash-exact against the SAME SQL
    oracle. The eval universe rides a broadcast variable; the
    per-row scoring is an Arrow-batched set intersection (stateless —
    no state store, no watermark)."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.operators.sampling import hash_sample, hex_threshold
    from margaret_spark.streaming import stream_decontaminate

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    ).select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="stream_decon_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        # seq != doc_id here (the 5% sample is removed), so the true
        # id is recovered by rank: seqs follow doc_id order densely
        log.append_df(rest, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_decontaminate(
            log,
            F.col("value"),
            eval_df,
            "text",
            sink,
            os.path.join(base, "ckpt"),
            mode="word",
            n=3,
            available_now=True,
        )
        # seq recovery via the SAME distributed prefix-sum append_df
        # uses (range partition on doc_id + partition offsets) — no
        # single-partition global window anywhere on this surface
        from margaret_spark.functions.seqassign import with_dense_seq

        n_par = spark.sparkContext.defaultParallelism
        ids = with_dense_seq(
            rest.select("doc_id")
            .repartitionByRange(n_par, F.col("doc_id"))
            .sortWithinPartitions("doc_id"),
            seq_col="seq",
        )
        out = (
            spark.read.parquet(sink)
            .join(ids, "seq")
            .select("doc_id", "n_shingles", "n_matched", "contamination")
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_decontaminate_spans(spark, sf_dir):
    """Streaming span-level decontamination
    (streaming/contamination.stream_decontaminate_spans): the 95%
    corpus remainder streams out of a real log and every eval-set
    trigram run is CUT as it arrives — same split, same JVM-side
    tokenization, same islands merge as the batch
    `decontaminate_spans`, so the append-mode sink is hash-exact
    against the SAME SQL oracle. Stateless: the eval gram universe
    rides a broadcast; only position math runs per row."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.operators.sampling import hash_sample, hex_threshold
    from margaret_spark.streaming import stream_decontaminate_spans

    docs = _t(spark, sf_dir, "documents")
    eval_df = hash_sample(docs, "doc_id", 0.05)
    thr = hex_threshold(0.05)
    rest = docs.where(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8) >= thr
    ).select("doc_id", "text")
    base = tempfile.mkdtemp(prefix="stream_decon_spans_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(rest, value_col="text", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_decontaminate_spans(
            log,
            F.col("value"),
            eval_df,
            "text",
            sink,
            os.path.join(base, "ckpt"),
            n=3,
            available_now=True,
        )
        from margaret_spark.functions.seqassign import with_dense_seq

        n_par = spark.sparkContext.defaultParallelism
        ids = with_dense_seq(
            rest.select("doc_id")
            .repartitionByRange(n_par, F.col("doc_id"))
            .sortWithinPartitions("doc_id"),
            seq_col="seq",
        )
        out = (
            spark.read.parquet(sink)
            .join(ids, "seq")
            .select("doc_id", "clean_text", "n_tokens", "removed_tokens")
        )
        return out
    finally:
        _defer_cleanup(base)


def q_sample_shuffle(spark, sf_dir):
    """Deterministic epoch shuffle (operators.sampling.
    deterministic_shuffle): every document's position in the seed-7
    pseudo-random permutation — reproducible training order on any
    engine or cluster size. The position is assigned WITHOUT a
    single-partition window: range-partition on the shuffle key,
    narrow in-partition sort, then the partition-offset prefix sum
    (counts to the driver, never rows). The oracle is the naive
    global row_number, so the distributed assignment must reproduce
    it exactly."""
    from margaret_spark.operators.sampling import deterministic_shuffle

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", seed=7)


# --- web curation (operators.web) ------------------------------------------
# The documents table has no URL column, so each doc gets a synthetic
# messy URL that is a closed-form function of (doc_id, source) — mixed
# case, default and non-default ports, tracking params, fragments —
# and the oracle re-derives both the raw URL and the whole RFC 3986
# canonicalization + registered-domain pipeline in SQL, so every
# string branch of the operator is hash-checked.

_WEB_HOSTS = [
    "Example.COM",
    "news.example.com",
    "Blog.example.co.uk",
    "tracker.ads.net",
    "WWW.Wiki.org",
    "cdn.media.io",
    "shop.example.com",
    "docs.python.org",
]

_WEB_BLOCKLIST = ["ads.net", "media.io"]

#: embedded public-suffix fixture (a faithful subset of the
#: publicsuffix.org format: plain rules, one wildcard, one exception)
_PSL_FIXTURE = [
    "com", "net", "org", "io", "uk", "co.uk", "org.uk", "ac.uk",
    "jp", "co.jp", "br", "com.br", "nom.br", "us", "k12.ca.us",
    "*.ck", "!www.ck", "blogspot.com",
]

#: hosts exercising every PSL branch: plain TLD, multi-label suffix,
#: suffix-is-the-host (NULL), wildcard, wildcard-exception, private
#: suffix (blogspot), unknown TLD (implicit '*'), single label
_PSL_HOSTS = [
    "example.com",
    "www.example.com",
    "blog.example.co.uk",
    "example.co.uk",
    "co.uk",
    "foo.nom.br",
    "a.b.k12.ca.us",
    "www.town.ck",
    "town.ck",
    "www.ck",
    "myblog.blogspot.com",
    "internal",
    "server.internal",
]


def _synth_url() -> "F.Column":
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, F.lit("https")).otherwise(F.lit("HTTP"))
    host = F.element_at(F.array(*[F.lit(h) for h in _WEB_HOSTS]), (did % 8).cast("int") + 1)
    port = (
        F.when(did % 3 == 0, F.when(did % 2 == 0, F.lit(":443")).otherwise(F.lit(":80")))
        .when(did % 5 == 0, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    path = F.concat(F.lit("/"), F.col("source"), F.lit("/item-"), did.cast("string"))
    query = (
        F.when(did % 4 == 0, F.concat(F.lit("?utm_source=feed&id="), (did % 100).cast("string")))
        .when(did % 4 == 1, F.lit("?b=2&a=1&utm_campaign=x"))
        .when(did % 4 == 2, F.lit("?gclid=abc"))
        .otherwise(F.lit(""))
    )
    frag = F.when(did % 2 == 1, F.lit("#section-2")).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port, path, query, frag)


def q_web_canonical_urls(spark, sf_dir):
    """URL canonicalization (operators.web.canonicalize_url +
    registered_domain): per document, the raw synthetic URL and its
    canonical form / host / registered domain. Pure codegen string
    work — zero shuffles; the oracle recomputes every component."""
    from margaret_spark.operators.web import with_url_columns

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url")
    )
    return with_url_columns(docs, "url").select(
        "doc_id", "url", "url_canonical", "url_host_name", "url_domain"
    )


def q_web_domain_stats(spark, sf_dir):
    """Per registered domain: docs, chars, distinct hosts, distinct
    langs (operators.web.domain_stats) — the quota table of a
    domain-level curation pass. One algebraic aggregation."""
    from margaret_spark.operators.web import domain_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars", _synth_url().alias("url")
    )
    return domain_stats(docs, "url", "n_chars", group_col="lang")


def q_web_blocklist(spark, sf_dir):
    """Blocklist filtering (operators.web.filter_blocked_domains):
    drop documents whose registered domain is blocklisted, then
    per-source survivor counts. The domain predicate is a scan-level
    filter (broadcast literal isin)."""
    from margaret_spark.operators.web import filter_blocked_domains

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", _synth_url().alias("url")
    )
    kept = filter_blocked_domains(docs, "url", _WEB_BLOCKLIST)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept_docs"),
        F.sum("n_chars").alias("kept_chars"),
    )


def _synth_dup_url() -> "F.Column":
    """Collision-prone variant: the path keys on doc_id % 50, so
    distinct raw URLs (differing in case, default port, and a
    per-doc tracking param) canonicalize onto shared targets —
    the URL-dedup fixture."""
    did = F.col("doc_id")
    scheme = F.when(did % 2 == 0, F.lit("HTTPS")).otherwise(F.lit("https"))
    host = F.element_at(
        F.array(*[F.lit(h) for h in _WEB_HOSTS]), (did % 8).cast("int") + 1
    )
    port = F.when(did % 3 == 0, F.lit(":443")).otherwise(F.lit(""))
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port,
        F.lit("/item-"),
        (did % 50).cast("string"),
        F.lit("?utm_ref="),
        did.cast("string"),
    )


def q_web_domain_psl(spark, sf_dir):
    """Registered domains resolved against a REAL public-suffix list
    (operators.web.with_registered_domain_psl): the rule set collapses
    to one row per match key, splits by key depth, and each depth is a
    broadcast LEFT join on the host's last-d-labels string — zero
    shuffles, no explode; exceptions beat wildcards beat plain rules
    beat the implicit '*'. The oracle re-derives the per-depth joins
    and the greatest/coalesce resolution in SQL over the same embedded
    fixture — every branch (wildcard *.ck, exception !www.ck,
    private-suffix blogspot.com, unknown TLD) is hash-checked."""
    from margaret_spark.operators.web import with_registered_domain_psl

    hosts = F.array(*[F.lit(h) for h in _PSL_HOSTS])
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.element_at(
            hosts, (F.col("doc_id") % len(_PSL_HOSTS)).cast("int") + 1
        ).alias("host"),
    )
    return with_registered_domain_psl(
        docs, "host", _PSL_FIXTURE, out_col="domain_psl", ps_len_col="psl_len"
    )


def q_web_url_dedup(spark, sf_dir):
    """URL-level dedup keyed on the CANONICAL form
    (operators.web.canonicalize_url): raw URLs differing only in
    scheme/host case, the default :443 port, and tracking params
    collapse to one target; keep the minimum doc_id per canonical
    URL. The oracle states the canonical key as a CLOSED FORM of
    doc_id (not a SQL re-derivation), so any canonicalization branch
    that misfires splits or merges a group and hash-mismatches."""
    from margaret_spark.operators.web import canonicalize_url

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_dup_url().alias("url")
    )
    return (
        docs.select(
            "doc_id", canonicalize_url(F.col("url")).alias("url_canonical")
        )
        .groupBy("url_canonical")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def q_corpus_mixture(spark, sf_dir):
    """Temperature-scaled corpus mixing weights
    (operators.sampling.mixture_weights, T=2): per-source sampling
    weight ∝ sqrt(total tokens) — the standard multi-source recipe
    that up-samples small sources. sqrt and the pround/DECIMAL-sum
    tree are IEEE-portable, so the whole table is hash-exact."""
    from margaret_spark.operators.sampling import mixture_weights
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return mixture_weights(base, "source", "n_tokens", temperature=2.0)


def q_corpus_mixture_materialize(spark, sf_dir):
    """The training mix MATERIALIZED (operators.sampling.
    materialize_mixture): temperature-2 weights turn into per-source
    token budgets (floor(weight · 20000)) and each source admits its
    deterministic (md5(id), id) prefix until the budget fills — the
    end-to-end corpus-assembly step. sqrt weights + one IEEE multiply
    + integer floor/cumsums: hash-exact, including every cumulative
    sum and budget. Budget table broadcast; one shuffle on source."""
    from margaret_spark.operators.sampling import materialize_mixture
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return materialize_mixture(
        base, "source", "doc_id", "n_tokens", total_tokens=20_000
    )


def q_corpus_unimax(spark, sf_dir):
    """UniMax corpus mixing (operators.sampling.unimax_allocation;
    Chung et al. 2023, public algorithm): distribute a 26,000-token
    budget as uniformly as possible across sources with a 1-epoch cap
    per source — the published fairness alternative to temperature
    scaling. At sf0.01 the budget sits between L·min(cap) and Σcap, so
    the waterfill transition BINDS mid-list (small sources capped at
    their epoch limit, the rest sharing θ equally — both branches
    graded). Exactness: pround'd caps/shares, DECIMAL prefix sums, one
    IEEE division per rank — the oracle replays the identical window
    program. Scale shape: one aggregation; windows run over ≤|sources|
    rows."""
    from margaret_spark.operators.sampling import unimax_allocation
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return unimax_allocation(base, "source", "n_tokens", budget=26_000)


def q_corpus_unimax_materialize(spark, sf_dir):
    """The UniMax mix MATERIALIZED (operators.sampling.
    materialize_unimax): floor(alloc) per-source budgets feed the
    same deterministic (md5(id), id) admission cumsum as the
    temperature mix — end-to-end "build a fair N-token corpus".
    Hash-exact: integer floors and cumsums over the unimax_allocation
    tree. Budget table broadcast; one shuffle on source."""
    from margaret_spark.operators.sampling import materialize_unimax
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    base = docs.select("doc_id", "source").join(toks, "doc_id")
    return materialize_unimax(
        base, "source", "doc_id", "n_tokens", budget=26_000
    )


def q_pack_length_batches(spark, sf_dir):
    """Length-bucketed batch assembly (operators.packing.
    length_bucketed_batches): the padding-aware SFT/inference batching
    — global (n_tokens, md5(id), id) order, fixed-rows batches, so
    similar lengths share a batch. The global position uses the
    two-pass partition-offset assignment (NO corpus-wide
    single-partition window); the oracle replays the order with
    row_number. Hash-exact integer arithmetic."""
    from margaret_spark.operators.packing import length_bucketed_batches
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    return length_bucketed_batches(toks, "doc_id", "n_tokens", batch_rows=16)


def q_pack_padding_report(spark, sf_dir):
    """The per-batch padding audit (operators.packing.padding_report)
    over the length-bucketed batches: padded_tokens = n_docs·max,
    padding_waste = pround(1 − sum/padded) — what fraction of the
    accelerator tensor the bucketing saves vs wastes. One keyed
    aggregation; hash-exact."""
    from margaret_spark.operators.packing import (
        length_bucketed_batches,
        padding_report,
    )
    from margaret_spark.operators.text import token_stats

    docs = _t(spark, sf_dir, "documents")
    toks = token_stats(docs, "doc_id", "text").select("doc_id", "n_tokens")
    return padding_report(
        length_bucketed_batches(toks, "doc_id", "n_tokens", batch_rows=16)
    )


def q_stream_web_filter(spark, sf_dir):
    """Streaming at-ingest web curation (streaming/webfilter.py): the
    synthetic messy URLs are appended to a real OffsetLog, the filter
    drains the append stream, drops blocklisted registered domains and
    writes (seq, url_canonical, url_domain) to an append-mode parquet
    sink — the expressions are SHARED with operators.web, so ingest
    and batch canonicalization cannot drift. Stateless map+filter:
    no state store, no shuffle. The graded result is the sink read
    back; the oracle is the batch canonicalization SQL."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import stream_web_filter

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _synth_url().alias("url")
    )
    base = tempfile.mkdtemp(prefix="stream_web_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="url", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_web_filter(
            log,
            F.col("value"),
            _WEB_BLOCKLIST,
            sink,
            os.path.join(base, "ckpt"),
            available_now=True,
        )
        out = spark.read.parquet(sink).select(
            F.col("seq").alias("doc_id"), "url_canonical", "url_domain"
        )
        return out
    finally:
        _defer_cleanup(base)


def q_stream_cms(spark, sf_dir):
    """Streaming Count-Min sketch (streaming/cms.py): sketch the log's
    append stream of document sources — each micro-batch writes its
    own bounded partial sketch (overwrite per batch=<id> partition, so
    a crash-replayed batch lands identically instead of double
    counting), the global sketch is the re-sum. Counters are additive,
    so the merged result equals the batch sketch of the whole corpus —
    which is exactly what the oracle states."""
    import tempfile

    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_cms, stream_cms

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    base = tempfile.mkdtemp(prefix="stream_cms_")
    try:
        log = OffsetLog(spark, os.path.join(base, "log"), value_type=T.StringType())
        log.append_df(docs, value_col="source", order_by="doc_id")
        sink = os.path.join(base, "sink")
        stream_cms(
            log,
            F.col("value"),
            sink,
            os.path.join(base, "ckpt"),
            depth=4,
            width=16,
            available_now=True,
        )
        out = read_cms(spark, sink).select(
            F.col("row").cast("long").alias("row"),
            F.col("bucket").cast("long").alias("bucket"),
            F.col("cnt").cast("long").alias("cnt"),
        )
        return out
    finally:
        _defer_cleanup(base)


def q_export_shards(spark, sf_dir):
    """Deterministic hash-sharded export manifest
    (operators.sharding.shard_manifest): md5-mod-64 shard per doc,
    per-shard row and byte totals — the balance table of the final
    training-data write. Assignment is a narrow projection; the
    aggregation carries 64 rows."""
    from margaret_spark.operators.sharding import shard_manifest

    docs = _t(spark, sf_dir, "documents")
    return shard_manifest(docs, "doc_id", 64, size_col="n_chars")


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the Q1-style pricing summary at sf0.001."""
    return q_tpch_q1(spark, DEFAULT_SF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "log_scan": q_log_scan,
        "log_get": q_log_get,
        "log_seq": q_log_seq,
        "log_range": q_log_range,
        "log_limit": q_log_limit,
        "log_reverse": q_log_reverse,
        "log_append_seq": q_log_append_seq,
        "log_nulled_overlay": q_log_nulled_overlay,
        "log_replace_overlay": q_log_replace_overlay,
        "log_check_consistency": q_log_check_consistency,
        "log_snapshot_read": q_log_snapshot_read,
        "mlog_list": q_mlog_list,
        "mlog_ranks": q_mlog_ranks,
        "mlog_sublog_get": q_mlog_sublog_get,
        "mlog_sublog_query": q_mlog_sublog_query,
        "mlog_cardinalities": q_mlog_cardinalities,
        "mlog_has": q_mlog_has,
        "mlog_delete": q_mlog_delete,
        "mlog_set_ops": q_mlog_set_ops,
        "kvidx_latest": q_kvidx_latest,
        "kvidx_point": q_kvidx_point,
        "sink_fanout": q_sink_fanout,
        "sink_fanout_multi": q_sink_fanout_multi,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q5": q_tpch_q5,
        "tpch_q6": q_tpch_q6,
        "tpch_q14": q_tpch_q14,
        "tpch_q4": q_tpch_q4,
        "tpch_q10": q_tpch_q10,
        "tpch_q18": q_tpch_q18,
        "tpch_q22": q_tpch_q22,
        "tpch_q7": q_tpch_q7,
        "tpch_q17": q_tpch_q17,
        "tpch_q19": q_tpch_q19,
        "tpch_q2": q_tpch_q2,
        "tpch_q8": q_tpch_q8,
        "tpch_q9": q_tpch_q9,
        "tpch_q11": q_tpch_q11,
        "tpch_q12": q_tpch_q12,
        "tpch_q13": q_tpch_q13,
        "tpch_q15": q_tpch_q15,
        "tpch_q16": q_tpch_q16,
        "tpch_q20": q_tpch_q20,
        "tpch_q21": q_tpch_q21,
        "customers_without_orders": q_customers_without_orders,
        "orders_topn_per_cust": q_orders_topn_per_cust,
        "events_daily": q_events_daily,
        "events_sessions": q_events_sessions,
        "events_asof": q_events_asof,
        "events_range_join": q_events_range_join,
        "events_rollup": q_events_rollup,
        "events_cube": q_events_cube,
        "events_window_funcs": q_events_window_funcs,
        "events_quantiles": q_events_quantiles,
        "events_distinct_users": q_events_distinct_users,
        "events_funnel": q_events_funnel,
        "events_approx_distinct": q_events_approx_distinct,
        "events_approx_quantiles": q_events_approx_quantiles,
        "events_json": q_events_json,
        "events_resample": q_events_resample,
        "events_skew_report": q_events_skew_report,
        "events_cms": q_events_cms,
        "events_bloom": q_events_bloom,
        "events_hll": q_events_hll,
        "events_hist_quantiles": q_events_hist_quantiles,
        "events_hll_estimate": q_events_hll_estimate,
        "events_hll_groups": q_events_hll_groups,
        "events_zorder_key": q_events_zorder_key,
        "events_kmv": q_events_kmv,
        "events_kmv_estimate": q_events_kmv_estimate,
        "events_kmv_intersect": q_events_kmv_intersect,
        "stream_histogram": q_stream_histogram,
        "text_collocations": q_text_collocations,
        "docs_pagerank": q_docs_pagerank,
        "docs_triangles": q_docs_triangles,
        "embeddings_kmeans": q_embeddings_kmeans,
        "embeddings_pca": q_embeddings_pca,
        "embeddings_pca_project": q_embeddings_pca_project,
        "dedup_semantic_pairs": q_dedup_semantic_pairs,
        "dedup_semantic": q_dedup_semantic,
        "dedup_semantic_incremental": q_dedup_semantic_incremental,
        "decontaminate_semantic": q_decontaminate_semantic,
        "embeddings_contrastive": q_embeddings_contrastive,
        "ann_pq_codes": q_ann_pq_codes,
        "ann_pq_distortion": q_ann_pq_distortion,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivf_pq": q_ann_ivf_pq,
        "ann_ivf_pq_indexed": q_ann_ivf_pq_indexed,
        "docs_hash_embed": q_docs_hash_embed,
        "docs_semantic_dedup": q_docs_semantic_dedup,
        "events_histogram": q_events_histogram,
        "corpus_prior": q_corpus_prior,
        "events_pivot": q_events_pivot,
        "events_anomaly": q_events_anomaly,
        "customers_rfm": q_customers_rfm,
        "orders_constraints": q_orders_constraints,
        "stream_events_daily": q_stream_events_daily,
        "stream_events_enriched": q_stream_events_enriched,
        "stream_events_asof": q_stream_events_asof,
        "stream_topk": q_stream_topk,
        "stream_topk_windowed": q_stream_topk_windowed,
        "stream_events_sessions": q_stream_events_sessions,
        "stream_dedup_exact": q_stream_dedup_exact,
        "stream_token_budget": q_stream_token_budget,
        "stream_token_budget_bpe": q_stream_token_budget_bpe,
        "stream_lm_filter": q_stream_lm_filter,
        "stream_nb_filter": q_stream_nb_filter,
        "stream_dsir_filter": q_stream_dsir_filter,
        "stream_ivf_assign": q_stream_ivf_assign,
        "stream_hash_embed": q_stream_hash_embed,
        "stream_image_phash": q_stream_image_phash,
        "stream_pq_assign": q_stream_pq_assign,
        "stream_dedup_minhash": q_stream_dedup_minhash,
        "stream_dedup_window": q_stream_dedup_window,
        "stream_pii_redact": q_stream_pii_redact,
        "stream_decontaminate": q_stream_decontaminate,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
        "dedup_clusters": q_dedup_clusters,
        "docs_kcore": q_docs_kcore,
        "dedup_cross_corpus": q_dedup_cross_corpus,
        "dedup_spans": q_dedup_spans,
        "dedup_span_stats": q_dedup_span_stats,
        "dedup_span_cut": q_dedup_span_cut,
        "dedup_span_cut_all": q_dedup_span_cut_all,
        "corpus_curation": q_corpus_curation,
        "ann_topk": q_ann_topk,
        "ann_topk_int8": q_ann_topk_int8,
        "embeddings_quantize_int8": q_embeddings_quantize_int8,
        "ann_range": q_ann_range,
        "ann_lsh": q_ann_lsh,
        "ann_ivf": q_ann_ivf,
        "ann_ivf_indexed": q_ann_ivf_indexed,
        "ann_ivf_int8": q_ann_ivf_int8,
        "ann_recall": q_ann_recall,
        "ann_matryoshka": q_ann_matryoshka,
        "ann_matryoshka_recall": q_ann_matryoshka_recall,
        "text_stats": q_text_stats,
        "text_topterms": q_text_topterms,
        "text_vocab_oov": q_text_vocab_oov,
        "text_simpson": q_text_simpson,
        "search_bm25": q_search_bm25,
        "search_tfidf": q_search_tfidf,
        "sample_token_budget": q_sample_token_budget,
        "pack_sequences_grouped": q_pack_sequences_grouped,
        "fuzzy_part_names": q_fuzzy_part_names,
        "text_quality_rules": q_text_quality_rules,
        "events_cohorts": q_events_cohorts,
        "dedup_incremental": q_dedup_incremental,
        "orders_diff": q_orders_diff,
        "docs_scd2": q_docs_scd2,
        "docs_scd2_lookup": q_docs_scd2_lookup,
        "stream_docs_scd2": q_stream_docs_scd2,
        "edit_pairs_part_names": q_edit_pairs_part_names,
        "text_quality": q_text_quality,
        "quality_pctile": q_quality_pctile,
        "text_langid": q_text_langid,
        "text_langid_eval": q_text_langid_eval,
        "text_bpe_count": q_text_bpe_count,
        "text_bpe_fertility": q_text_bpe_fertility,
        "text_fingerprint": q_text_fingerprint,
        "text_lm_surprise": q_text_lm_surprise,
        "text_nb_quality": q_text_nb_quality,
        "text_nb_classify": q_text_nb_classify,
        "text_winnow": q_text_winnow,
        "text_bpe_tokens": q_text_bpe_tokens,
        "text_bpe_wordcounts": q_text_bpe_wordcounts,
        "pack_sequences_bpe": q_pack_sequences_bpe,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_image_meta": q_multimodal_image_meta,
        "multimodal_decode_png": q_multimodal_decode_png,
        "multimodal_decode_jpeg": q_multimodal_decode_jpeg,
        "multimodal_decode_wav": q_multimodal_decode_wav,
        "multimodal_video_meta": q_multimodal_video_meta,
        "multimodal_decode_video": q_multimodal_decode_video,
        "multimodal_image_dhash": q_multimodal_image_dhash,
        "multimodal_image_dedup": q_multimodal_image_dedup,
        "multimodal_image_phash": q_multimodal_image_phash,
        "multimodal_image_phash_dedup": q_multimodal_image_phash_dedup,
        "multimodal_audio_fp": q_multimodal_audio_fp,
        "multimodal_audio_dedup": q_multimodal_audio_dedup,
        "multimodal_dedup_clusters": q_multimodal_dedup_clusters,
        "multimodal_dedup_clusters_all": q_multimodal_dedup_clusters_all,
        "sample_docs": q_sample_docs,
        "sample_split": q_sample_split,
        "sample_stratified": q_sample_stratified,
        "sample_weighted": q_sample_weighted,
        "sample_shuffle": q_sample_shuffle,
        "pack_sequences": q_pack_sequences,
        "text_repetition": q_text_repetition,
        "docs_length_histogram": q_docs_length_histogram,
        "source_quality_report": q_source_quality_report,
        "chunk_documents": q_chunk_documents,
        "pii_scan": q_pii_scan,
        "pii_redact": q_pii_redact,
        "decontaminate": q_decontaminate,
        "decontaminate_spans": q_decontaminate_spans,
        "stream_decontaminate_spans": q_stream_decontaminate_spans,
        "training_data": q_training_data,
        "embedding_label_stats": q_embedding_label_stats,
        "codec_roundtrip": q_codec_roundtrip,
        "web_canonical_urls": q_web_canonical_urls,
        "web_domain_stats": q_web_domain_stats,
        "web_blocklist": q_web_blocklist,
        "web_url_dedup": q_web_url_dedup,
        "web_domain_psl": q_web_domain_psl,
        "corpus_mixture": q_corpus_mixture,
        "corpus_mixture_materialize": q_corpus_mixture_materialize,
        "corpus_unimax": q_corpus_unimax,
        "corpus_unimax_materialize": q_corpus_unimax_materialize,
        "pack_length_batches": q_pack_length_batches,
        "pack_padding_report": q_pack_padding_report,
        "corpus_dsir_weights": q_corpus_dsir_weights,
        "corpus_dsir_select": q_corpus_dsir_select,
        "export_shards": q_export_shards,
        "stream_web_filter": q_stream_web_filter,
        "stream_cms": q_stream_cms,
        "stream_bloom": q_stream_bloom,
        "stream_hll": q_stream_hll,
        "stream_kmv": q_stream_kmv,
    }


# Shared SQL fragments for the oracles (kept identical to the Spark
# expression trees so double results are bit-identical).
_WORDS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '')"

#: Shared CTE chain for the duplicate-span oracles (word 8-grams,
#: cross-doc scope): positional grams → grams seen in ≥2 documents →
#: duplicated positions → gaps-and-islands span ids. Groups on the
#: gram TEXT where the Spark operator groups on its sha2 — equal iff
#: the hashes are equal. Mirrors dedup.duplicate_spans(n=8).
_DUP_SPAN_CTES = (
    "WITH g AS ("
    "SELECT doc_id, CAST(idx AS INT) AS pos, "
    "array_to_string(toks[idx:idx+7], ' ') AS gr "
    "FROM (SELECT doc_id, toks, "
    "unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS idx "
    f"FROM (SELECT doc_id, {_WORDS} AS toks FROM documents))), "
    "d AS (SELECT gr FROM g GROUP BY gr HAVING min(doc_id) <> max(doc_id)), "
    "h AS (SELECT doc_id, pos FROM g JOIN d USING (gr)), "
    "flg AS (SELECT doc_id, pos, "
    "CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
    "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
    "THEN 1 ELSE 0 END AS flag FROM h), "
    "isl AS (SELECT doc_id, pos, SUM(flag) OVER ("
    "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i FROM flg)"
)

#: CTE chains for the span CUT oracles: same positional-gram build,
#: with the hit rule swapped per keep mode — 'first_doc' cuts
#: positions whose gram has an earlier owner DOCUMENT;
#: 'first_occurrence' cuts every occurrence after the global first in
#: (doc_id, pos) order (also within the owner). Islands merge as in
#: the span report; surviving positions rebuild the text with an
#: ordered string_agg. Mirrors dedup.cut_duplicate_spans(n=8, keep=…).
_CUT_HIT_FIRST_DOC = (
    "own AS (SELECT gr, min(doc_id) AS o FROM g GROUP BY gr), "
    "h AS (SELECT doc_id, pos FROM g JOIN own USING (gr) WHERE doc_id > o)"
)
_CUT_HIT_FIRST_OCCURRENCE = (
    "h AS (SELECT doc_id, pos FROM ("
    "SELECT doc_id, pos, row_number() OVER ("
    "PARTITION BY gr ORDER BY doc_id, pos) AS rn FROM g) WHERE rn > 1)"
)


def _cut_span_ctes(hit: str) -> str:
    return (
    "WITH g AS ("
    "SELECT doc_id, CAST(idx AS INT) AS pos, "
    "array_to_string(toks[idx:idx+7], ' ') AS gr "
    "FROM (SELECT doc_id, toks, "
    "unnest(range(1, greatest(len(toks) - 7, 0) + 1)) AS idx "
    f"FROM (SELECT doc_id, {_WORDS} AS toks FROM documents))), "
    + hit + ", "
    "flg AS (SELECT doc_id, pos, "
    "CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
    "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 8 "
    "THEN 1 ELSE 0 END AS flag FROM h), "
    "isl AS (SELECT doc_id, pos, SUM(flag) OVER ("
    "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i FROM flg), "
    "spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e "
    "FROM isl GROUP BY doc_id, i), "
    f"tk AS (SELECT doc_id, COALESCE({_WORDS}, []) AS ws FROM documents), "
    "pos_tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, ws FROM tk), "
    "kept AS (SELECT t.doc_id, t.p, t.ws[t.p] AS tok FROM pos_tok t "
    "WHERE NOT EXISTS (SELECT 1 FROM spans s "
    "WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e))"
)
#: Final projection shared by both cut oracles.
_CUT_SPAN_SELECT = (
    "SELECT x.doc_id, COALESCE(k.clean_text, '') AS clean_text, "
    "CAST(len(x.ws) AS BIGINT) AS n_tokens, "
    "CAST(len(x.ws) - COALESCE(k.cnt, 0) AS BIGINT) AS removed_tokens "
    "FROM tk x LEFT JOIN ("
    "SELECT doc_id, string_agg(tok, ' ' ORDER BY p) AS clean_text, "
    "count(*) AS cnt FROM kept GROUP BY doc_id) k "
    "ON x.doc_id = k.doc_id"
)

_SHINGLES = f"""
SELECT doc_id, sh FROM (
  SELECT doc_id, toks, unnest(range(1, greatest(len(toks) - 1, 1))) AS i
  FROM (SELECT doc_id, {_WORDS} AS toks FROM documents)
), LATERAL (SELECT array_to_string(toks[i:i+2], ' ') AS sh)
GROUP BY doc_id, sh
"""
_DOT = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(range(1, len({a}) + 1), i -> "
    "CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), (x, y) -> x + y)"
)

# max_df="auto" mirror: cap = max(100, n_docs // 2); shingles whose
# document frequency exceeds the cap are dropped from the universe
# BEFORE posting lists / set sizes form — the same deterministic
# stop-shingle filter the Spark side applies as a broadcast anti-join
# (margaret_spark/operators/dedup.py: _resolve_max_df/_stop_shingles).
_CAPPED_SHINGLE_CTES = (
    f"s0 AS ({_SHINGLES}), "
    "cap AS (SELECT greatest(100, count(*) // 2) AS v FROM documents), "
    "stop AS (SELECT sh FROM s0 GROUP BY sh "
    "HAVING count(*) > (SELECT v FROM cap)), "
    "s AS (SELECT doc_id, sh FROM s0 "
    "WHERE sh NOT IN (SELECT sh FROM stop))"
)


def _cosine_sql(a: str, b: str) -> str:
    dot = _DOT.format(a=a, b=b)
    na = _DOT.format(a=a, b=a)
    nb = _DOT.format(a=b, b=b)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def _pr(expr: str, digits: int = 6) -> str:
    """SQL twin of margaret_spark.functions.numeric.pround — the same
    IEEE expression tree, so results are bit-identical to Spark's."""
    scale = f"{float(10**digits):.1f}"
    return f"(FLOOR(({expr}) * {scale} + 0.5) / {scale})"


# clusters-over-jaccard-pairs CTE chain (shared by dedup_clusters and
# corpus_curation): capped shingle universe, pairs at threshold 0.2,
# undirected edges, min reachable id per node via recursive closure
_CLUSTER_CTES = (
    f"{_CAPPED_SHINGLE_CTES}, "
    "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
    "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "pairs AS (SELECT id_a, id_b FROM inter "
    "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
    "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2), "
    "edges AS (SELECT id_a AS src, id_b AS dst FROM pairs "
    "UNION SELECT id_b, id_a FROM pairs), "
    "reach(node, root) AS ("
    "SELECT doc_id, doc_id FROM documents "
    "UNION "
    "SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node)"
)

# triangle census over the same capped-jaccard pairs: ordered
# node-iterator join (each {a<b<c} found once), per-corner credit,
# rational clustering coefficient — mirrors graph.triangle_stats
_TRIANGLE_CTES = (
    f"{_CAPPED_SHINGLE_CTES}, "
    "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
    "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
    "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id), "
    "pairs AS (SELECT id_a, id_b FROM inter "
    "JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
    "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2), "
    "nodes AS (SELECT id_a AS node FROM pairs UNION SELECT id_b FROM pairs), "
    "deg AS (SELECT node, count(*) AS degree FROM ("
    "SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs) "
    "GROUP BY node), "
    "tri AS (SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z "
    "FROM pairs e1 JOIN pairs e2 ON e2.id_a = e1.id_b "
    "JOIN pairs e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b), "
    "corners AS (SELECT node, count(*) AS triangles FROM ("
    "SELECT x AS node FROM tri UNION ALL SELECT y FROM tri "
    "UNION ALL SELECT z FROM tri) GROUP BY node)"
)


def _repetition_sql() -> str:
    return (
        "SELECT doc_id, "
        + _pr(
            "CASE WHEN len(toks) >= 3 THEN "
            "CAST(len(sh) - len(list_distinct(sh)) AS DOUBLE) / len(sh) "
            "ELSE 0.0 END",
            4,
        )
        + " AS repetition FROM ("
        "SELECT doc_id, toks, "
        "list_transform(range(1, greatest(len(toks) - 1, 1)), "
        "i -> array_to_string(toks[i:i+2], ' ')) AS sh "
        f"FROM (SELECT doc_id, {_WORDS} AS toks FROM documents))"
    )


def _bpe_tokens_sql() -> str:
    """The text_bpe_tokens oracle: an INDEPENDENT SQL re-derivation of
    byte-level BPE. Token state is a list of ids; each recursion step
    applies exactly one merge — the (lowest-rank, leftmost) candidate,
    encoded as min(rank·2²⁰ + pos) — to every still-reducible
    distinct pre-token; a pre-token leaves the recursion when no
    adjacent pair is in the merge table, and the terminal states join
    back to the per-document pre-token sequence. Equivalent to the
    Python sweep encoder because any pair a merge CREATES contains the
    new token, whose own merges were learned later and rank strictly
    higher (operators/bpe.py module docstring). ``ord()`` equals the
    UTF-8 byte for the ASCII corpus the graded tables hold; multibyte
    byte-level behavior is pinned in pytest instead. The merge-table
    literal is generated from operators.bpe.DEFAULT_MERGES (itself
    derived from the embedded seed corpus)."""
    return (
        _bpe_doc_tokens_cte()
        + " SELECT d.doc_id, "
        "CAST(COALESCE(len(dt.toks), 0) AS BIGINT) AS n_tokens, "
        "CAST(COALESCE(list_sum(dt.toks), 0) AS BIGINT) AS token_sum, "
        + ", ".join(
            f"CAST(dt.toks[{i}] AS INT) AS t{i}" for i in range(1, 9)
        )
        + " FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)"
    )


def _bpe_doc_tokens_cte() -> str:
    """The shared WITH-RECURSIVE prefix ending in ``doc_tokens``
    (doc_id, toks list<int>) — composed by the text_bpe_tokens and
    pack_sequences_bpe oracles."""
    from margaret_spark.operators.bpe import DEFAULT_MERGES, PRETOKEN_RE

    rows = ", ".join(
        f"({r}, {a}, {b}, {256 + r})" for r, (a, b) in enumerate(DEFAULT_MERGES)
    )
    pat = PRETOKEN_RE.replace("'", "''")
    return (
        "WITH RECURSIVE "
        f"merges(rnk, l, r, nid) AS (SELECT * FROM (VALUES {rows}) v), "
        "pre AS (SELECT doc_id, unnest(toks) AS tok, "
        "generate_subscripts(toks, 1) AS pno "
        f"FROM (SELECT doc_id, regexp_extract_all(text, '{pat}') AS toks "
        "FROM documents)), "
        "vocab AS (SELECT DISTINCT tok FROM pre), "
        "steps(tok, ids) AS ("
        "SELECT tok, list_transform(range(1, length(tok) + 1), "
        "i -> ord(tok[i])) FROM vocab "
        "UNION ALL "
        # the (rank, pos) argmin packs as rank·2²⁰ + pos: BIGINT
        # arithmetic with a base far above any real pre-token id
        # count (the regex pre-tokenizer caps runs well below 2²⁰
        # bytes; the old 4096 base could alias pos into rank on
        # pathological whitespace/punct runs)
        "SELECT t.tok, t.ids[1:t.pos - 1] || [t.nid] || "
        "t.ids[t.pos + 2:len(t.ids)] "
        "FROM (SELECT c.tok, c.ids, CAST(c.best % 1048576 AS INT) AS pos, "
        "mm.nid FROM ("
        "SELECT s.tok, s.ids, "
        "min(CAST(m.rnk AS BIGINT) * 1048576 + p.i) AS best "
        "FROM steps s "
        "CROSS JOIN LATERAL unnest(range(1, len(s.ids))) AS p(i) "
        "JOIN merges m ON m.l = s.ids[p.i] AND m.r = s.ids[p.i + 1] "
        "GROUP BY s.tok, s.ids) c "
        "JOIN merges mm ON mm.rnk = c.best // 1048576) t), "
        "final AS (SELECT s.tok, s.ids FROM steps s "
        "WHERE NOT EXISTS (SELECT 1 FROM merges m, "
        "LATERAL unnest(range(1, len(s.ids))) AS p(i) "
        "WHERE m.l = s.ids[p.i] AND m.r = s.ids[p.i + 1])), "
        "doc_tokens AS (SELECT p.doc_id, "
        "flatten(list(f.ids ORDER BY p.pno)) AS toks "
        "FROM pre p JOIN final f ON f.tok = p.tok GROUP BY p.doc_id)"
    )


def _quality_sql() -> str:
    pr = _pr(
        "0.4 * least(CAST(n_tokens AS DOUBLE) / 64.0, 1.0) + "
        "0.4 * (CASE WHEN n_tokens > 0 THEN CAST(n_distinct AS DOUBLE) / n_tokens ELSE 0.0 END) + "
        "0.2 * (1.0 - least("
        "(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) + "
        "(CASE WHEN n_chars > 0 THEN CAST(n_digits AS DOUBLE) / n_chars ELSE 0.0 END), 1.0))",
        4,
    )
    return (
        "SELECT doc_id, " + pr + " AS quality "
        "FROM (SELECT doc_id, length(text) AS n_chars, "
        f"len({_WORDS}) AS n_tokens, len(list_distinct({_WORDS})) AS n_distinct, "
        "length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS n_punct, "
        "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits "
        "FROM documents)"
    )


def _bm25_sql(
    query: str = "spark table hash scan",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """BM25 oracle mirroring operators.search.bm25_search in rational
    idf mode — the identical expression tree (same literal constants
    via repr round-trip, same DECIMAL term summation, same tie order),
    with corpus stats computed in-SQL exactly as the Spark side's
    driver collect (CAST(sum AS DOUBLE)/count is the same IEEE
    division as Python float(total)/float(n))."""
    terms = ",".join(f"'{t}'" for t in sorted(set(query.lower().split())))
    k1p1, omb = repr(k1 + 1.0), repr(1.0 - b)
    ts = _pr(
        f"((CAST(s.n AS DOUBLE) + 1.0) / (w.df + 0.5)) * "
        f"((m.tf * {k1p1}) / (m.tf + {k1!r} * ({omb} + {b!r} * (dl.dl / s.avgdl))))"
    )
    return (
        f"WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS token FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token), "
        "dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id), "
        "s AS (SELECT count(*) AS n, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), "
        f"m AS (SELECT * FROM tf WHERE token IN ({terms})), "
        "w AS (SELECT token, count(*) AS df FROM m GROUP BY token), "
        f"scored AS (SELECT m.doc_id, {ts} AS ts "
        "FROM m JOIN w ON m.token = w.token JOIN dl ON m.doc_id = dl.doc_id CROSS JOIN s), "
        "agg AS (SELECT doc_id, CAST(SUM(CAST(ts AS DECIMAL(38,6))) AS DOUBLE) AS score, "
        "count(*) AS n_terms FROM scored GROUP BY doc_id) "
        "SELECT doc_id, score, n_terms, rank FROM ("
        "SELECT doc_id, score, n_terms, CAST(row_number() OVER "
        "(ORDER BY score DESC, doc_id ASC) AS INT) AS rank FROM agg) "
        f"WHERE rank <= {k}"
    )


def _tfidf_sql(vocab_size: int = 50) -> str:
    w = _pr(
        "(tf.tf / dl.dl) * ((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1.0)"
        " / (v.df + 0.5))"
    )
    return (
        f"WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS token FROM documents), "
        "tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY doc_id, token), "
        "dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY doc_id), "
        "v AS (SELECT token, df FROM (SELECT token, count(*) AS df FROM tf "
        f"GROUP BY token ORDER BY df DESC, token ASC LIMIT {vocab_size})) "
        f"SELECT tf.doc_id, tf.token, {w} AS weight "
        "FROM tf JOIN v ON tf.token = v.token JOIN dl ON tf.doc_id = dl.doc_id"
    )


def _pagerank_sql(iters: int = 6, d: float = 0.85, rd: int = 9, cd: int = 12) -> str:
    """Generated fixed-iteration PageRank oracle: one CTE per round,
    each evaluating the IDENTICAL pround/DECIMAL-sum trees as
    operators.graph.pagerank (see its module doc). N comes from the
    engine's own count, so no scale constant is baked in."""
    ni = "(SELECT count(*) FROM documents)"
    nd = f"CAST({ni} AS DOUBLE)"
    ctes = [
        (
            f"e AS (SELECT doc_id AS src, (doc_id*7+1) % {ni} AS dst FROM documents "
            f"UNION ALL SELECT doc_id, (doc_id*13+3) % {ni} FROM documents "
            f"UNION ALL SELECT doc_id, (doc_id*31+5) % {ni} FROM documents)"
        ),
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src)",
        "ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg USING (src))",
        (
            "nodes AS (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e))"
        ),
        f"r0 AS (SELECT node, {_pr(f'1.0 / {nd}', rd)} AS rank FROM nodes)",
    ]
    for i in range(1, iters + 1):
        contrib = _pr("r.rank / CAST(ed.deg AS DOUBLE)", cd)
        s = (
            f"SELECT ed.dst AS node, "
            f"CAST(sum(CAST({contrib} AS DECIMAL(38,{cd}))) AS DOUBLE) AS v "
            f"FROM ed JOIN r{i - 1} r ON ed.src = r.node GROUP BY ed.dst"
        )
        newr = _pr(f"(1.0 - {d}) / {nd} + {d} * coalesce(s.v, 0.0)", rd)
        ctes.append(
            f"r{i} AS (SELECT n.node, {newr} AS rank "
            f"FROM nodes n LEFT JOIN ({s}) s USING (node))"
        )
    return (
        "WITH " + ", ".join(ctes) + f" SELECT node AS doc_id, rank FROM r{iters}"
    )


def _kcore_sql(k: int = 2, rounds: int = 4) -> str:
    """k-core oracle: the jaccard pair CTEs (shared with
    dedup_clusters) + ``rounds`` unrolled peel steps, each
    MATERIALIZED (DuckDB would otherwise re-inline the whole chain
    per reference — exponential), ending in degrees >= k over the
    surviving edge set — the exact fixed-round semantics of
    graph.k_core(rounds=N)."""
    cut = _CLUSTER_CTES.index(", edges AS (")
    chain = _CLUSTER_CTES[:cut] + (
        ", e0 AS MATERIALIZED (SELECT id_a AS a, id_b AS b FROM pairs)"
    )
    prev = "e0"
    for i in range(1, rounds + 1):
        chain += (
            f", d{i} AS MATERIALIZED (SELECT node, count(*) AS c FROM ("
            f"SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) "
            "GROUP BY node)"
            f", e{i} AS MATERIALIZED (SELECT a, b FROM {prev} "
            f"WHERE a IN (SELECT node FROM d{i} WHERE c >= {k}) "
            f"AND b IN (SELECT node FROM d{i} WHERE c >= {k}))"
        )
        prev = f"e{i}"
    return (
        "WITH " + chain + " SELECT node, CAST(c AS BIGINT) AS core_degree "
        "FROM (SELECT node, count(*) AS c FROM ("
        f"SELECT a AS node FROM {prev} UNION ALL SELECT b FROM {prev}) "
        f"GROUP BY node) WHERE c >= {k}"
    )


def _kmeans_ctes(
    k: int = 8, iters: int = 2, rd: int = 6, cd: int = 9, ds: int = 12,
    src: str = "embeddings",
) -> tuple[list[str], str]:
    """The fixed-iteration Lloyd CTE chain mirroring
    similarity.kmeans_assign_deterministic, returned as (ctes,
    final-assignment SELECT body) so callers can either emit the
    assignment directly (_kmeans_sql) or build on it (the SemDeDup
    oracle). Per round one assignment CTE (rounded-cosine rank,
    cent_id tiebreak — the ann_ivf pattern) and one means CTE
    (pround'ed components, exact DECIMAL sum / count, pround again —
    the pagerank recipe), empty cells keeping the previous centroid;
    the final body re-assigns every vector."""

    def cos(a: str, b: str) -> str:
        return _pr(_cosine_sql(a, b), rd)

    ctes = [
        f"cents0 AS (SELECT vec_id AS cent_id, embedding AS cent "
        f"FROM {src} ORDER BY vec_id LIMIT {k})"
    ]
    for i in range(1, iters + 1):
        prev = f"cents{i - 1}"
        ctes.append(
            f"a{i} AS (SELECT vec_id, cent_id, embedding FROM ("
            f"SELECT e.vec_id, c.cent_id, e.embedding, "
            f"row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            + cos("e.embedding", "c.cent")
            + f" DESC, c.cent_id ASC) AS cr "
            f"FROM {src} e CROSS JOIN {prev} c) WHERE cr = 1)"
        )
        contrib = _pr("CAST(embedding[d] AS DOUBLE)", cd)
        ctes.append(
            f"m{i} AS (SELECT cent_id, d, "
            + _pr(
                f"CAST(sum(CAST({contrib} AS DECIMAL(38,{ds}))) AS DOUBLE)"
                f" / count(*)",
                cd,
            )
            + f" AS m FROM (SELECT cent_id, embedding, "
            f"unnest(range(1, len(embedding) + 1)) AS d FROM a{i}) "
            f"GROUP BY cent_id, d)"
        )
        ctes.append(
            f"cents{i} AS (SELECT c.cent_id, COALESCE(g.cent, c.cent) AS cent "
            f"FROM {prev} c LEFT JOIN (SELECT cent_id, list(m ORDER BY d) AS cent "
            f"FROM m{i} GROUP BY cent_id) g ON g.cent_id = c.cent_id)"
        )
    fc = cos("e.embedding", "c.cent")
    fin = (
        "SELECT vec_id, cent_id, cosine FROM ("
        f"SELECT e.vec_id, c.cent_id, {fc} AS cosine, "
        f"row_number() OVER (PARTITION BY e.vec_id ORDER BY {fc} DESC, "
        f"c.cent_id ASC) AS cr FROM {src} e CROSS JOIN cents{iters} c) "
        "WHERE cr = 1"
    )
    return ctes, fin


def _kmeans_sql(k: int = 8, iters: int = 2, rd: int = 6, cd: int = 9, ds: int = 12) -> str:
    """Generated Lloyd-assignment oracle (see _kmeans_ctes)."""
    ctes, fin = _kmeans_ctes(k, iters, rd, cd, ds)
    return "WITH " + ", ".join(ctes) + " " + fin


def _semdedup_sql(
    kind: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.4,
    rd: int = 6,
    src: str = "embeddings",
    id_name: str = "vec_id",
    pre_ctes: list[str] | None = None,
) -> str:
    """SemDeDup oracle (operators.semdedup): the Lloyd assignment CTEs
    (re-sourced onto ``src`` — the raw embeddings table, or a derived
    vector CTE from ``pre_ctes`` such as the hashed-doc-embedding
    chain) plus a within-cluster self-join at the pround'ed pair
    cosine, and for kind='prune' the dominance anti-filter (drop
    every id_b). ``id_name`` renames the output id column."""
    ctes, fin = _kmeans_ctes(k, iters, rd, src=src)
    ctes = (list(pre_ctes) if pre_ctes else []) + list(ctes)
    ctes.append(f"fin AS ({fin})")
    sim = _pr(_cosine_sql("ea.embedding", "eb.embedding"), rd)
    ctes.append(
        "pairs AS (SELECT id_a, id_b, cent_id, cosine FROM ("
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cent_id, "
        f"{sim} AS cosine "
        "FROM fin a JOIN fin b ON a.cent_id = b.cent_id "
        "AND a.vec_id < b.vec_id "
        f"JOIN {src} ea ON ea.vec_id = a.vec_id "
        f"JOIN {src} eb ON eb.vec_id = b.vec_id) "
        f"WHERE cosine >= {threshold})"
    )
    if kind == "pairs":
        return (
            "WITH " + ", ".join(ctes)
            + " SELECT id_a"
            + ("" if id_name == "vec_id" else f" AS {id_name}_a")
            + ", id_b"
            + ("" if id_name == "vec_id" else f" AS {id_name}_b")
            + ", cent_id, cosine FROM pairs"
        )
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT vec_id AS {id_name}, cent_id, cosine AS cent_cosine"
        " FROM fin WHERE vec_id NOT IN (SELECT id_b FROM pairs)"
    )


#: hashed-doc-embedding oracle chain (operators.hashembed): one md5
#: per token feeds both the bucket (first 8 hex digits) and the sign
#: (9th digit's parity); signed integer bucket sums densify against
#: the full bucket range and L2-normalize (integer-valued doubles sum
#: exactly in any order, so the fold needs no DECIMAL)
def _hashembed_ctes(dim: int = 64) -> list[str]:
    b = (
        "CAST(CAST('0x' || substr(md5('e#' || tok), 1, 8) AS BIGINT) "
        f"% {dim} AS INT)"
    )
    s = (
        "(CAST(CAST('0x' || substr(md5('e#' || tok), 9, 1) AS BIGINT) "
        "% 2 AS BIGINT) * 2 - 1)"
    )
    return [
        f"htoks AS (SELECT doc_id, unnest({_WORDS}) AS tok FROM documents)",
        f"hsums AS (SELECT doc_id, {b} AS b, CAST(sum({s}) AS BIGINT) AS v "
        "FROM htoks GROUP BY 1, 2)",
        "hdense AS (SELECT d.doc_id, p.pos, "
        "CAST(COALESCE(s.v, 0) AS DOUBLE) AS rawval "
        "FROM (SELECT doc_id FROM documents) d "
        f"CROSS JOIN (SELECT unnest(range(0, {dim})) AS pos) p "
        "LEFT JOIN hsums s ON s.doc_id = d.doc_id AND s.b = p.pos)",
        "hnorm AS (SELECT doc_id, sqrt(sum(rawval * rawval)) AS nrm "
        "FROM hdense GROUP BY doc_id)",
        "hemb AS (SELECT d.doc_id, d.pos, CASE WHEN n.nrm > 0.0 "
        "THEN d.rawval / n.nrm ELSE d.rawval END AS val "
        "FROM hdense d JOIN hnorm n ON n.doc_id = d.doc_id)",
        "hvec AS (SELECT doc_id AS vec_id, list(val ORDER BY pos) "
        "AS embedding FROM hemb GROUP BY doc_id)",
    ]




def _contrastive_sql(
    k: int = 8,
    iters: int = 2,
    pos_t: float = 0.4,
    neg_t: float = 0.3,
    n_neg: int = 1,
    rd: int = 6,
) -> str:
    """Contrastive-triplet oracle (semdedup.contrastive_triplets):
    the Lloyd CTEs + the UNthresholded within-cluster pair pass,
    split at the two bars, hardest-negative window per anchor."""
    ctes, fin = _kmeans_ctes(k, iters, rd)
    ctes = list(ctes) + [f"fin AS ({fin})"]
    sim = _pr(_cosine_sql("ea.embedding", "eb.embedding"), rd)
    ctes.append(
        "allp AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        f"{sim} AS cosine "
        "FROM fin a JOIN fin b ON a.cent_id = b.cent_id "
        "AND a.vec_id < b.vec_id "
        "JOIN embeddings ea ON ea.vec_id = a.vec_id "
        "JOIN embeddings eb ON eb.vec_id = b.vec_id)"
    )
    ctes.append(
        "pos AS (SELECT id_a AS anchor, id_b AS positive, "
        f"cosine AS pos_cos FROM allp WHERE cosine >= {pos_t})"
    )
    ctes.append(
        "neg AS (SELECT anchor, negative, neg_cos FROM ("
        "SELECT id_a AS anchor, id_b AS negative, cosine AS neg_cos, "
        "row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, "
        f"id_b ASC) AS rn FROM allp WHERE cosine < {neg_t}) "
        f"WHERE rn <= {n_neg})"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT anchor, positive, negative, pos_cos, neg_cos "
        "FROM pos JOIN neg USING (anchor)"
    )


def _decon_sem_sql(
    k: int = 8, iters: int = 1, threshold: float = 0.88, rd: int = 6
) -> str:
    """Semantic-decontamination oracle: the hashembed CTE chain feeds
    the frozen-model incremental matcher (centroids fitted on the
    test split of hvec), contaminated = a same-cell test vector
    within the threshold cosine."""
    pre = list(_hashembed_ctes()) + [
        "exv AS (SELECT vec_id, embedding FROM hvec WHERE vec_id % 10 = 0)"
    ]
    ctes, _fin = _kmeans_ctes(k, iters, rd, src="exv")
    cn = f"cents{iters}"

    def assign(name: str, src: str) -> str:
        c = _pr(_cosine_sql("e.embedding", "c.cent"), rd)
        return (
            f"{name} AS (SELECT vec_id, cent_id FROM ("
            f"SELECT e.vec_id, c.cent_id, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {c} DESC, c.cent_id ASC) AS cr "
            f"FROM ({src}) e CROSS JOIN {cn} c) WHERE cr = 1)"
        )

    sim = _pr(_cosine_sql("en.embedding", "eo.embedding"), rd)
    post = [
        assign("aex", "SELECT vec_id, embedding FROM exv"),
        assign(
            "anew",
            "SELECT vec_id, embedding FROM hvec WHERE vec_id % 10 <> 0",
        ),
        "dupex AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN aex o ON o.cent_id = n.cent_id "
        "JOIN hvec en ON en.vec_id = n.vec_id "
        "JOIN hvec eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})",
    ]
    return (
        "WITH " + ", ".join(pre + list(ctes) + post)
        + " SELECT n.vec_id AS doc_id, n.cent_id, "
        "n.vec_id IN (SELECT vec_id FROM dupex) AS contaminated "
        "FROM anew n"
    )


def _semdedup_incr_sql(
    k: int = 8, iters: int = 1, threshold: float = 0.4, rd: int = 6
) -> str:
    """Incremental SemDeDup oracle (semdedup.semantic_dedup_incremental):
    centroids fitted on the EXISTING (even-id) half and frozen, both
    halves assigned under the house rule, pair checks equality-joined
    on the cell, the three-way status CASE."""
    pre = [
        "exv AS (SELECT vec_id, embedding FROM embeddings "
        "WHERE vec_id % 2 = 0)"
    ]
    ctes, _fin = _kmeans_ctes(k, iters, rd, src="exv")
    cn = f"cents{iters}"

    def assign(name: str, src: str) -> str:
        c = _pr(_cosine_sql("e.embedding", "c.cent"), rd)
        return (
            f"{name} AS (SELECT vec_id, cent_id FROM ("
            f"SELECT e.vec_id, c.cent_id, row_number() OVER ("
            f"PARTITION BY e.vec_id ORDER BY {c} DESC, c.cent_id ASC) AS cr "
            f"FROM ({src}) e CROSS JOIN {cn} c) WHERE cr = 1)"
        )

    sim = _pr(_cosine_sql("en.embedding", "eo.embedding"), rd)
    post = [
        assign("aex", "SELECT vec_id, embedding FROM exv"),
        assign(
            "anew",
            "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 1",
        ),
        "dupex AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN aex o ON o.cent_id = n.cent_id "
        "JOIN embeddings en ON en.vec_id = n.vec_id "
        "JOIN embeddings eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})",
        "dupb AS (SELECT DISTINCT n.vec_id FROM anew n "
        "JOIN anew o ON o.cent_id = n.cent_id AND o.vec_id < n.vec_id "
        "JOIN embeddings en ON en.vec_id = n.vec_id "
        "JOIN embeddings eo ON eo.vec_id = o.vec_id "
        f"WHERE {sim} >= {threshold})",
    ]
    return (
        "WITH " + ", ".join(pre + list(ctes) + post)
        + " SELECT n.vec_id, n.cent_id, CASE "
        "WHEN n.vec_id IN (SELECT vec_id FROM dupex) THEN 'dup_of_existing' "
        "WHEN n.vec_id IN (SELECT vec_id FROM dupb) THEN 'dup_in_batch' "
        "ELSE 'new' END AS status FROM anew n"
    )


def _pq_ctes(
    m: int = 4,
    width: int = 16,
    k: int = 8,
    iters: int = 1,
    rd: int = 6,
    cd: int = 9,
    ds: int = 12,
    src: str = "SELECT vec_id, embedding FROM embeddings",
) -> list[str]:
    """Product-quantization oracle CTEs mirroring operators.pq: the
    subvector table (over ``src``, a SELECT producing (vec_id,
    embedding) — the raw corpus for ann_pq_*, the IVF residual table
    for ann_ivf_pq), per-subspace Lloyd codebooks (squared L2 via the
    dot identity a·a + c·c − 2·a·c, pround'ed, code-id tiebreak;
    pround/DECIMAL means; empty codes keep their centroid), and the
    final per-(vector, subspace) encoding."""

    def d2(a: str, b: str) -> str:
        da = _DOT.format(a=a, b=a)
        db = _DOT.format(a=b, b=b)
        dab = _DOT.format(a=a, b=b)
        return _pr(f"({da} + {db}) - (2.0 * {dab})", rd)

    ctes = [
        f"sv AS (SELECT vec_id, sub, "
        f"list_slice(embedding, sub*{width}+1, sub*{width}+{width}) AS sv "
        f"FROM (SELECT vec_id, embedding, unnest(range(0, {m})) AS sub "
        f"FROM ({src})))",
        f"cb0 AS (SELECT sub, vec_id AS code_id, sv AS cent FROM sv "
        f"WHERE vec_id IN (SELECT vec_id FROM embeddings "
        f"ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, iters + 1):
        prev = f"cb{i - 1}"
        dd = d2("s.sv", "c.cent")
        ctes.append(
            f"a{i} AS (SELECT vec_id, sub, code_id, sv FROM ("
            f"SELECT s.vec_id, s.sub, c.code_id, s.sv, "
            f"row_number() OVER (PARTITION BY s.vec_id, s.sub "
            f"ORDER BY {dd} ASC, c.code_id ASC) AS rn "
            f"FROM sv s JOIN {prev} c ON c.sub = s.sub) WHERE rn = 1)"
        )
        comp = _pr("CAST(sv[d] AS DOUBLE)", cd)
        ctes.append(
            f"m{i} AS (SELECT sub, code_id, d, "
            + _pr(
                f"CAST(sum(CAST({comp} AS DECIMAL(38,{ds}))) AS DOUBLE)"
                " / count(*)",
                cd,
            )
            + f" AS mval FROM (SELECT sub, code_id, sv, "
            f"unnest(range(1, len(sv)+1)) AS d FROM a{i}) "
            "GROUP BY sub, code_id, d)"
        )
        ctes.append(
            f"cb{i} AS (SELECT c.sub, c.code_id, "
            "COALESCE(g.cent, c.cent) AS cent "
            f"FROM {prev} c LEFT JOIN (SELECT sub, code_id, "
            f"list(mval ORDER BY d) AS cent FROM m{i} "
            "GROUP BY sub, code_id) g "
            "ON g.sub = c.sub AND g.code_id = c.code_id)"
        )
    fdd = d2("s.sv", "c.cent")
    ctes.append(
        "enc AS (SELECT vec_id, sub, code_id, dist2 FROM ("
        f"SELECT s.vec_id, s.sub, c.code_id, {fdd} AS dist2, "
        "row_number() OVER (PARTITION BY s.vec_id, s.sub "
        f"ORDER BY {fdd} ASC, c.code_id ASC) AS rn "
        f"FROM sv s JOIN cb{iters} c ON c.sub = s.sub) WHERE rn = 1)"
    )
    return ctes


def _pq_sql(
    kind: str,
    m: int = 4,
    width: int = 16,
    k: int = 8,
    iters: int = 1,
    topk: int = 5,
    rd: int = 6,
    ds: int = 12,
) -> str:
    """PQ oracle: kind='codes' emits the encoding table; kind='topk'
    builds the per-query ADC lookup table and ranks the DECIMAL-exact
    subspace-distance sums (distance asc, id asc)."""
    ctes = _pq_ctes(m, width, k, iters, rd=rd, ds=ds)
    if kind == "codes":
        return (
            "WITH " + ", ".join(ctes)
            + " SELECT vec_id, sub, code_id, dist2 FROM enc"
        )

    def d2(a: str, b: str) -> str:
        da = _DOT.format(a=a, b=a)
        db = _DOT.format(a=b, b=b)
        dab = _DOT.format(a=a, b=b)
        return _pr(f"({da} + {db}) - (2.0 * {dab})", rd)

    qdd = d2("q.sv", "c.cent")
    ctes.append(
        f"lut AS (SELECT q.vec_id AS query_id, q.sub, c.code_id, "
        f"{qdd} AS dist2 FROM sv q JOIN cb{iters} c ON c.sub = q.sub "
        "WHERE q.vec_id < 5)"
    )
    ctes.append(
        "score AS (SELECT l.query_id, e.vec_id, "
        f"CAST(sum(CAST(l.dist2 AS DECIMAL(38,{ds}))) AS DOUBLE) AS adist "
        "FROM enc e JOIN lut l ON l.sub = e.sub AND l.code_id = e.code_id "
        "GROUP BY l.query_id, e.vec_id)"
    )
    return (
        "WITH " + ", ".join(ctes)
        + " SELECT query_id, vec_id, adist, rank FROM ("
        "SELECT query_id, vec_id, adist, row_number() OVER ("
        "PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS rank "
        f"FROM score) WHERE rank <= {topk}"
    )


def _ivfpq_sql(
    nlist: int = 16,
    nprobe: int = 4,
    m: int = 4,
    width: int = 16,
    k: int = 8,
    iters: int = 1,
    topk: int = 5,
    rd: int = 6,
    ds: int = 12,
) -> str:
    """IVFADC oracle (operators.pq.ivfpq_topk): the ann_ivf cell /
    probe CTEs (seeded lowest-id centroids, rounded-cosine rank),
    residuals v − cent(cell) per element, the PQ chain over the
    residual table, per-(query, probed cell) residual lookup tables,
    and the DECIMAL-exact subspace-distance sum ranked (asc, id asc)
    with self-matches excluded."""
    resid = (
        "list_transform(range(1, len({v}) + 1), i -> "
        "CAST({v}[i] AS DOUBLE) - CAST({c}[i] AS DOUBLE))"
    )
    pre = [
        f"cents AS (SELECT vec_id AS cent_id, embedding AS cent "
        f"FROM embeddings ORDER BY vec_id LIMIT {nlist})",
        "cell AS (SELECT neighbor_id, cent_id, cv, cent FROM ("
        "SELECT e.vec_id AS neighbor_id, c.cent_id, e.embedding AS cv, "
        "c.cent, row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1)",
        "res AS (SELECT neighbor_id AS vec_id, cent_id AS cell, "
        + resid.format(v="cv", c="cent")
        + " AS rv FROM cell)",
    ]
    pq = _pq_ctes(
        m, width, k, iters, rd=rd, ds=ds,
        src="SELECT vec_id, rv AS embedding FROM res",
    )

    def d2(a: str, b: str) -> str:
        da = _DOT.format(a=a, b=a)
        db = _DOT.format(a=b, b=b)
        dab = _DOT.format(a=a, b=b)
        return _pr(f"({da} + {db}) - (2.0 * {dab})", rd)

    qdd = d2("q.sv", "c.cent")
    post = [
        "probe AS (SELECT query_id, cent_id, qv, cent FROM ("
        "SELECT q.vec_id AS query_id, c.cent_id, q.embedding AS qv, "
        "c.cent, row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _pr(_cosine_sql("q.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
        f"CROSS JOIN cents c) WHERE cr <= {nprobe})",
        "qres AS (SELECT query_id, cent_id AS cell, "
        + resid.format(v="qv", c="cent")
        + " AS rv FROM probe)",
        f"qsv AS (SELECT query_id, cell, sub, "
        f"list_slice(rv, sub*{width}+1, sub*{width}+{width}) AS sv "
        f"FROM (SELECT query_id, cell, rv, unnest(range(0, {m})) AS sub "
        "FROM qres))",
        f"lut AS (SELECT q.query_id, q.cell, q.sub, c.code_id, "
        f"{qdd} AS dist2 FROM qsv q JOIN cb{iters} c ON c.sub = q.sub)",
        "score AS (SELECT l.query_id, e.vec_id, "
        f"CAST(sum(CAST(l.dist2 AS DECIMAL(38,{ds}))) AS DOUBLE) AS adist "
        "FROM enc e JOIN res r ON r.vec_id = e.vec_id "
        "JOIN lut l ON l.cell = r.cell AND l.sub = e.sub "
        "AND l.code_id = e.code_id "
        "WHERE l.query_id <> e.vec_id "
        "GROUP BY l.query_id, e.vec_id)",
    ]
    return (
        "WITH " + ", ".join(pre + pq + post)
        + " SELECT query_id, vec_id, adist, rank FROM ("
        "SELECT query_id, vec_id, adist, row_number() OVER ("
        "PARTITION BY query_id ORDER BY adist ASC, vec_id ASC) AS rank "
        f"FROM score) WHERE rank <= {topk}"
    )




def _quality_rules_sql() -> str:
    """Mirror of operators.text.quality_rule_flags at its default
    thresholds — same pround'ed ratios, stopword union generated from
    the same STOPWORDS table."""
    from margaret_spark.operators.text import STOPWORDS

    all_stop = ",".join(
        f"'{w}'" for w in sorted({w for sw in STOPWORDS.values() for w in sw})
    )
    mean_tl = _pr(
        "CASE WHEN len(toks) > 0 THEN "
        "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(toks) "
        "ELSE 0.0 END",
        4,
    )
    sym = _pr(
        "CASE WHEN length(text) > 0 THEN CAST("
        "(length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g'))) + "
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))"
        " AS DOUBLE) / length(text) ELSE 0.0 END",
        4,
    )
    dr = _pr(
        "CASE WHEN len(toks) > 0 THEN "
        "CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END",
        4,
    )
    return (
        "SELECT doc_id, n_tokens, mean_token_len, symbol_ratio, distinct_ratio, "
        "stopword_hits, ok_length, ok_token_len, ok_symbols, ok_diversity, "
        "ok_stopwords, (ok_length AND ok_token_len AND ok_symbols AND "
        "ok_diversity AND ok_stopwords) AS keep FROM ("
        "SELECT doc_id, n_tokens, mean_token_len, symbol_ratio, distinct_ratio, "
        "stopword_hits, "
        "(n_tokens >= 8 AND n_tokens <= 100000) AS ok_length, "
        "(mean_token_len >= 2.0 AND mean_token_len <= 12.0) AS ok_token_len, "
        "(symbol_ratio <= 0.3) AS ok_symbols, "
        "(distinct_ratio >= 0.2) AS ok_diversity, "
        "(stopword_hits >= 1) AS ok_stopwords FROM ("
        "SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens, "
        f"{mean_tl} AS mean_token_len, {sym} AS symbol_ratio, "
        f"{dr} AS distinct_ratio, "
        f"CAST(len(list_filter(toks, t -> list_contains([{all_stop}], t))) AS BIGINT) "
        "AS stopword_hits "
        f"FROM (SELECT doc_id, text, {_WORDS} AS toks FROM documents)))"
    )


def _langid_sql() -> str:
    """The lang_id oracle, GENERATED from the same SCRIPTS/STOPWORDS
    tables the Spark operator reads — widening the language table is a
    one-place change that keeps both engines in lockstep."""
    from margaret_spark.operators.text import SCRIPTS, STOPWORDS

    langs = list(STOPWORDS)
    g = "greatest(" + ", ".join(f"s_{l}" for l in langs) + ")"
    case = ["CASE"]
    for lang, pat in SCRIPTS.items():
        case.append(f"WHEN regexp_matches(text, '{pat}') THEN '{lang}'")
    case.append(f"WHEN {g} <= 0 THEN 'und'")
    for lang in langs[:-1]:
        case.append(f"WHEN s_{lang} = {g} THEN '{lang}'")
    case.append(f"ELSE '{langs[-1]}' END")
    scores = ", ".join(
        "len(list_filter(toks, t -> list_contains(["
        + ",".join(f"'{w}'" for w in sw)
        + f"], t))) AS s_{lang}"
        for lang, sw in STOPWORDS.items()
    )
    return (
        "SELECT doc_id, " + " ".join(case) + " AS pred_lang FROM ("
        f"SELECT doc_id, text, {_WORDS} AS toks, {scores} FROM documents)"
    )


def oracle_sql() -> dict[str, str]:
    d = _oracle_sql_base()
    # the persisted IVF index must return bit-identical results to the
    # in-flight IVF plan over the same (lowest-id) centroids
    d["ann_ivf_indexed"] = d["ann_ivf"]
    # int8 IVF: the ann_ivf cell/probe CTEs (float cosine against the
    # seeded centroids) feeding the ann_topk_int8 quantized-cosine
    # scorer — assignment and arithmetic each re-derived independently
    _qz_cte = (
        "qz AS (SELECT vec_id, codes, "
        "sqrt(CAST(list_sum(list_transform(codes, x -> x * x)) AS DOUBLE)) "
        "AS nrm FROM ("
        "SELECT vec_id, CASE WHEN ma > 0 THEN "
        "list_transform(xd, x -> CAST(floor(x / (ma / 127.0) + 0.5) AS INT)) "
        "ELSE list_transform(xd, x -> 0) END AS codes FROM ("
        "SELECT vec_id, xd, "
        "list_max(list_transform(xd, x -> abs(x))) AS ma FROM ("
        "SELECT vec_id, list_transform(embedding, "
        "x -> CAST(x AS DOUBLE)) AS xd FROM embeddings))))"
    )
    _int8_qcos = (
        "CAST(list_sum(list_transform(range(1, len(qq.codes) + 1), "
        "i -> qq.codes[i] * cq.codes[i])) AS DOUBLE) / (qq.nrm * cq.nrm)"
    )
    d["ann_ivf_int8"] = (
        "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
        "FROM embeddings ORDER BY vec_id LIMIT 16), "
        + _qz_cte + ", "
        "cell AS (SELECT neighbor_id, cent_id FROM ("
        "SELECT e.vec_id AS neighbor_id, c.cent_id, "
        "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1), "
        "probe AS (SELECT query_id, cent_id FROM ("
        "SELECT q.vec_id AS query_id, c.cent_id, "
        "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _pr(_cosine_sql("q.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
        "CROSS JOIN cents c) WHERE cr <= 4) "
        "SELECT query_id, neighbor_id, qcosine, rank FROM ("
        "SELECT p.query_id, l.neighbor_id, "
        + _pr(_int8_qcos) + " AS qcosine, "
        "CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY "
        + _pr(_int8_qcos) + " DESC, l.neighbor_id ASC) AS INT) AS rank "
        "FROM probe p JOIN cell l ON p.cent_id = l.cent_id "
        "JOIN qz qq ON qq.vec_id = p.query_id "
        "JOIN qz cq ON cq.vec_id = l.neighbor_id "
        "WHERE p.query_id <> l.neighbor_id "
        "AND qq.nrm > 0 AND cq.nrm > 0) WHERE rank <= 5"
    )
    # the stateful-streaming as-of operator must reproduce the batch
    # as-of join exactly — same DuckDB native ASOF JOIN oracle
    d["stream_events_asof"] = d["events_asof"]
    # the at-ingest decontamination scorer must reproduce the batch
    # containment scoring exactly (same split, shingles, arithmetic)
    d["stream_decontaminate"] = d["decontaminate"]
    d["stream_decontaminate_spans"] = d["decontaminate_spans"]
    # the streaming SCD2 ingest publishes the identical history the
    # batch merge produces — same closed-form oracle
    d["stream_docs_scd2"] = d["docs_scd2"]
    # the point-in-time lookup composes the SCD2 expected history as a
    # CTE and probes every key at both versions
    d["docs_scd2_lookup"] = (
        "WITH h AS (" + d["docs_scd2"] + "), "
        "ks AS (SELECT doc_id FROM documents "
        "UNION ALL SELECT doc_id + 1000000 FROM documents "
        "WHERE doc_id % 11 = 0), "
        "p AS (SELECT doc_id, 1 AS probe_v FROM ks "
        "UNION ALL SELECT doc_id, 2 FROM ks) "
        "SELECT p.doc_id, p.probe_v, h.source, h.n_chars "
        "FROM p LEFT JOIN h ON p.doc_id = h.doc_id "
        "AND p.probe_v >= h.valid_from "
        "AND (h.valid_to IS NULL OR p.probe_v < h.valid_to)"
    )
    # recall@5: compose the brute-force and IVF oracles as CTEs and
    # count the per-query neighbor overlap — same parameterization,
    # so the metric is exact-integer + one IEEE division
    d["ann_recall"] = (
        f"WITH bf AS ({d['ann_topk']}), ivf AS ({d['ann_ivf']}), "
        "ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact "
        "FROM bf GROUP BY query_id), "
        "hits AS (SELECT i.query_id, CAST(count(*) AS BIGINT) AS n_hits "
        "FROM ivf i JOIN bf b ON i.query_id = b.query_id "
        "AND i.neighbor_id = b.neighbor_id GROUP BY i.query_id) "
        "SELECT ex.query_id, ex.n_exact, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "floor((COALESCE(h.n_hits, 0) / ex.n_exact) * 1000000 + 0.5) "
        "/ 1000000 AS recall "
        "FROM ex LEFT JOIN hits h ON ex.query_id = h.query_id"
    )
    d["embeddings_pca"] = _pca_sql(iters=12)
    d["embeddings_pca_project"] = (
        # the transform half: signed component list from the 4-round
        # fit, projection = the same fixed-order left fold per vector
        f"WITH pc AS ({_pca_sql(iters=4)}), "
        "wl AS (SELECT list(component ORDER BY pos) AS wa FROM pc) "
        "SELECT e.vec_id, "
        + _pr(
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            "list_transform(range(1, 65), j -> "
            + _pr("CAST(e.embedding[j] AS DOUBLE) * wa[j]", 9)
            + ")), (acc, x) -> acc + x)"
        )
        + " AS proj FROM embeddings e, wl"
    )
    # Matryoshka: the same brute-force shape over the 16-dim prefix
    # (DuckDB list slicing is 1-based INCLUSIVE: [1:16] = first 16)
    d["ann_matryoshka"] = (
        "SELECT query_id, neighbor_id, cosine, rank FROM ("
        "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
        + _pr(_cosine_sql("q.embedding[1:16]", "c.embedding[1:16]"))
        + " AS cosine, "
        "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
        + _pr(_cosine_sql("q.embedding[1:16]", "c.embedding[1:16]"))
        + " DESC, c.vec_id ASC) AS INT) AS rank "
        "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
        "JOIN embeddings c ON q.vec_id <> c.vec_id"
        ") WHERE rank <= 5"
    )
    # recall of the prefix search vs the full-width exact top-k —
    # the ann_recall composition with the truncated arm swapped in
    d["ann_matryoshka_recall"] = (
        f"WITH bf AS ({d['ann_topk']}), tr AS ({d['ann_matryoshka']}), "
        "ex AS (SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact "
        "FROM bf GROUP BY query_id), "
        "hits AS (SELECT t.query_id, CAST(count(*) AS BIGINT) AS n_hits "
        "FROM tr t JOIN bf b ON t.query_id = b.query_id "
        "AND t.neighbor_id = b.neighbor_id GROUP BY t.query_id) "
        "SELECT ex.query_id, ex.n_exact, "
        "CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits, "
        "floor((COALESCE(h.n_hits, 0) / ex.n_exact) * 1000000 + 0.5) "
        "/ 1000000 AS recall "
        "FROM ex LEFT JOIN hits h ON ex.query_id = h.query_id"
    )
    # the stateful streaming top-k must reproduce the batch ranking
    # window exactly (incremental bounded-heap merge is exact)
    d["stream_topk"] = (
        "SELECT event_type, event_id, score, rank FROM ("
        "SELECT event_type, event_id, value AS score, "
        "CAST(row_number() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) AS INT) AS rank "
        "FROM events WHERE value IS NOT NULL) WHERE rank <= 5"
    )
    # windowed variant: the state key is (day, type) — batch twin is
    # the ranking window partitioned the same way
    d["stream_topk_windowed"] = (
        "SELECT day, event_type, event_id, score, rank FROM ("
        "SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, event_id, "
        "value AS score, "
        "CAST(row_number() OVER (PARTITION BY strftime(ts, '%Y-%m-%d'), "
        "event_type ORDER BY value DESC, event_id) AS INT) AS rank "
        "FROM events WHERE value IS NOT NULL) WHERE rank <= 3"
    )
    # web curation: the oracle re-derives the synthetic URL AND the
    # full canonicalization (scheme/host lowering, default-port strip,
    # tracking-param removal + sort, fragment drop) and the registered-
    # domain heuristic — every string branch hash-checked
    d["web_canonical_urls"] = (
        "WITH " + _web_sql() + " "
        "SELECT doc_id, url, canon AS url_canonical, host AS url_host_name, "
        "dom AS url_domain FROM dws"
    )
    d["web_domain_stats"] = (
        "WITH " + _web_sql() + " "
        "SELECT dom AS domain, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_size, "
        "CAST(count(DISTINCT host) AS BIGINT) AS n_hosts, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_lang "
        "FROM dws GROUP BY dom"
    )
    d["web_blocklist"] = (
        "WITH " + _web_sql() + " "
        "SELECT source, CAST(count(*) AS BIGINT) AS kept_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS kept_chars FROM dws "
        "WHERE dom NOT IN ("
        + ",".join(f"'{b}'" for b in _WEB_BLOCKLIST)
        + ") GROUP BY source"
    )
    # Count-Min sketch: deterministic md5 hash family, so the whole
    # (sketch -> probe -> min) pipeline is restated exactly in SQL
    d["events_cms"] = (
        "WITH k AS (SELECT CAST(user_id AS VARCHAR) AS ks, user_id "
        "FROM events WHERE user_id IS NOT NULL), "
        "b AS (SELECT r, CAST(CAST('0x' || substr(md5(r || '#' || ks), 1, 8) "
        "AS BIGINT) % 64 AS BIGINT) AS bucket FROM k "
        "CROSS JOIN (SELECT unnest(range(4)) AS r)), "
        "s AS (SELECT r, bucket, CAST(count(*) AS BIGINT) AS cnt "
        "FROM b GROUP BY 1, 2), "
        "p AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS ks "
        "FROM events WHERE user_id IS NOT NULL), "
        "pb AS (SELECT user_id, r, "
        "CAST(CAST('0x' || substr(md5(r || '#' || ks), 1, 8) AS BIGINT) % 64 "
        "AS BIGINT) AS bucket FROM p "
        "CROSS JOIN (SELECT unnest(range(4)) AS r)), "
        "est AS (SELECT user_id, CAST(min(COALESCE(s.cnt, 0)) AS BIGINT) "
        "AS est_n FROM pb LEFT JOIN s ON s.r = pb.r AND s.bucket = pb.bucket "
        "GROUP BY user_id), "
        "ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_n "
        "FROM events WHERE user_id IS NOT NULL GROUP BY user_id) "
        "SELECT est.user_id, est_n, exact_n, "
        "CAST(est_n - exact_n AS BIGINT) AS overcount "
        "FROM est JOIN ex USING (user_id)"
    )
    # histogram quantiles: the bucket grid, integer cumsums, ceil(q·N)
    # ranks and the interpolation tree restated term-for-term
    d["events_hist_quantiles"] = (
        "WITH b AS (SELECT min(CAST(value AS DOUBLE)) AS lo, "
        "max(CAST(value AS DOUBLE)) AS hi, "
        "(max(CAST(value AS DOUBLE)) - min(CAST(value AS DOUBLE))) "
        "/ CAST(64 AS DOUBLE) AS w FROM events), "
        "h AS (SELECT event_type, "
        "CAST(CASE WHEN b.w = 0.0 THEN 0 ELSE "
        "least(floor((CAST(value AS DOUBLE) - b.lo) / b.w), 63) END AS INT) "
        "AS bucket, CAST(count(*) AS BIGINT) AS n "
        "FROM events, b WHERE value IS NOT NULL "
        "AND CAST(value AS DOUBLE) >= b.lo AND CAST(value AS DOUBLE) <= b.hi "
        "GROUP BY event_type, bucket), "
        "c AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY event_type "
        "ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum, "
        "CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot "
        "FROM h), "
        "x AS (SELECT c.*, q, CAST(ceil(q * CAST(tot AS DOUBLE)) AS BIGINT) "
        "AS r, cum - n AS prev FROM c "
        "CROSS JOIN (SELECT unnest([0.1, 0.5, 0.9, 0.99]) AS q)) "
        "SELECT event_type, q, "
        + _pr(
            "b.lo + b.w * (CAST(bucket AS DOUBLE) + "
            "CAST(r - prev AS DOUBLE) / CAST(n AS DOUBLE))"
        )
        + " AS est FROM x, b WHERE prev < r AND r <= cum"
    )
    # HLL: the register table and the raw estimator restated exactly —
    # 60-bit hex hash, first-1-bit rank via the same lpad(bin())/strpos
    # string ops, integer harmonic sum, one literal α·m²·2^K
    _hll_regs = (
        "SELECT CAST(b AS INT) AS bucket, CAST(max(CASE WHEN "
        "strpos(s, '1') = 0 THEN 53 ELSE strpos(s, '1') END) AS INT) "
        "AS maxrank FROM ("
        "SELECT h % 256 AS b, lpad(bin(h // 256), 52, '0') AS s FROM ("
        "SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) "
        "AS BIGINT) AS h FROM events WHERE user_id IS NOT NULL)) "
        "GROUP BY b"
    )
    d["events_hll"] = _hll_regs
    _hll_num = repr((0.7213 / (1.0 + 1.079 / 256)) * 256 * 256 * float(1 << 53))
    d["events_hll_estimate"] = (
        f"WITH regs AS ({_hll_regs}), "
        "s AS (SELECT CAST(COALESCE(SUM(CAST(pow(2.0, 53 - maxrank) "
        "AS BIGINT)), 0) AS BIGINT) AS ssum, count(*) AS n FROM regs) "
        "SELECT floor((" + _hll_num + " / "
        "(ssum + (256 - n) * 9007199254740992)) * 10000 + 0.5) / 10000 "
        "AS est, "
        "(SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events "
        "WHERE user_id IS NOT NULL) AS exact_n FROM s"
    )
    # per-group HLL: the register derivation keyed by event_type, the
    # same literal α·m²·2^K numerator, per-group integer harmonic sums
    d["events_zorder_key"] = 'SELECT event_id, ub, hb, CAST(((((ub >> 0) & 1) << 0) + (((hb >> 0) & 1) << 1)) + ((((ub >> 1) & 1) << 2) + (((hb >> 1) & 1) << 3)) + ((((ub >> 2) & 1) << 4) + (((hb >> 2) & 1) << 5)) + ((((ub >> 3) & 1) << 6) + (((hb >> 3) & 1) << 7)) + ((((ub >> 4) & 1) << 8) + (((hb >> 4) & 1) << 9)) + ((((ub >> 5) & 1) << 10) + (((hb >> 5) & 1) << 11)) + ((((ub >> 6) & 1) << 12) + (((hb >> 6) & 1) << 13)) + ((((ub >> 7) & 1) << 14) + (((hb >> 7) & 1) << 15)) AS BIGINT) AS zkey FROM (SELECT event_id, CAST(user_id % 256 AS BIGINT) AS ub, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hb FROM events)'
    d["events_kmv"] = "WITH td AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events) WHERE user_id IS NOT NULL), t AS (SELECT h FROM td ORDER BY h LIMIT 64) SELECT CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rk, h FROM t"
    d["events_kmv_estimate"] = "WITH td AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events) WHERE user_id IS NOT NULL), t AS (SELECT h FROM td ORDER BY h LIMIT 64), agg AS (SELECT CAST(count(*) AS BIGINT) AS n_sketch, max(h) AS kth FROM t) SELECT n_sketch, kth, CASE WHEN n_sketch < 64 THEN CAST(n_sketch AS DOUBLE) ELSE (FLOOR((63e0 * 281474976710656e0 / CAST(kth AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) END AS estimate FROM agg"
    d["events_kmv_intersect"] = "WITH ad AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events WHERE event_type = 'purchase' AND user_id % 3 <> 0) WHERE user_id IS NOT NULL), a AS (SELECT h FROM ad ORDER BY h LIMIT 64), bd AS (SELECT DISTINCT CAST(CAST('0x' || substr(md5('k#' || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT) AS BIGINT) AS h FROM (SELECT user_id FROM events WHERE user_id % 2 = 0) WHERE user_id IS NOT NULL), b AS (SELECT h FROM bd ORDER BY h LIMIT 64), xu AS (SELECT h FROM (SELECT h FROM a UNION SELECT h FROM b) ORDER BY h LIMIT 64), fl AS (SELECT x.h, (a.h IS NOT NULL) AS ina, (b.h IS NOT NULL) AS inb FROM xu x LEFT JOIN a ON a.h = x.h LEFT JOIN b ON b.h = x.h), agg AS (SELECT CAST(count(*) AS BIGINT) AS n_union_sketch, max(h) AS kth, CAST(sum(CASE WHEN ina AND inb THEN 1 ELSE 0 END) AS BIGINT) AS k_common FROM fl) SELECT n_union_sketch, k_common, CASE WHEN n_union_sketch < 64 THEN CAST(n_union_sketch AS DOUBLE) ELSE (FLOOR((63e0 * 281474976710656e0 / CAST(kth AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) END AS est_union, (FLOOR(((CAST(k_common AS DOUBLE) / n_union_sketch) * (CASE WHEN n_union_sketch < 64 THEN CAST(n_union_sketch AS DOUBLE) ELSE (FLOOR((63e0 * 281474976710656e0 / CAST(kth AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0) END)) * 1000000.0 + 0.5) / 1000000.0) AS est_intersection FROM agg"
    d["events_hll_groups"] = (
        "WITH regs AS (SELECT event_type, CAST(b AS INT) AS bucket, "
        "max(CASE WHEN strpos(s, '1') = 0 THEN 53 ELSE strpos(s, '1') END) "
        "AS maxrank FROM ("
        "SELECT event_type, h % 256 AS b, lpad(bin(h // 256), 52, '0') AS s "
        "FROM (SELECT event_type, CAST('0x' || "
        "substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h "
        "FROM events WHERE user_id IS NOT NULL)) GROUP BY event_type, b), "
        "s AS (SELECT event_type, CAST(SUM(CAST(pow(2.0, 53 - maxrank) "
        "AS BIGINT)) AS BIGINT) AS ssum, count(*) AS n FROM regs "
        "GROUP BY event_type), "
        "ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) "
        "AS exact_n FROM events WHERE user_id IS NOT NULL "
        "GROUP BY event_type) "
        "SELECT s.event_type, floor((" + _hll_num + " / "
        "(ssum + (256 - n) * 9007199254740992)) * 10000 + 0.5) / 10000 "
        "AS est, ex.exact_n FROM s JOIN ex USING (event_type)"
    )
    # streaming histogram: additive counts on a fixed [0, 4096]/32
    # grid make the micro-batch merge equal the batch histogram
    d["stream_histogram"] = (
        "SELECT CAST(least(floor(CAST(n_chars AS DOUBLE) / 128.0), 31) "
        "AS INT) AS bucket, CAST(count(*) AS BIGINT) AS n FROM documents "
        "WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) >= 0.0 "
        "AND CAST(n_chars AS DOUBLE) <= 4096.0 GROUP BY 1"
    )
    # Bloom filter: deterministic md5 hash family (same as the CMS),
    # so bit table and every membership verdict restate exactly in SQL
    d["events_bloom"] = (
        "WITH ins AS (SELECT DISTINCT CAST(user_id AS VARCHAR) AS ks "
        "FROM events WHERE user_id IS NOT NULL AND user_id % 2 = 0), "
        "bits AS (SELECT DISTINCT CAST(CAST('0x' || "
        "substr(md5(i || '#' || ks), 1, 8) AS BIGINT) % 512 AS BIGINT) AS bit "
        "FROM ins CROSS JOIN (SELECT unnest(range(4)) AS i)), "
        "probe AS (SELECT DISTINCT user_id, CAST(user_id AS VARCHAR) AS ks "
        "FROM events WHERE user_id IS NOT NULL), "
        "pb AS (SELECT user_id, CAST(CAST('0x' || "
        "substr(md5(i || '#' || ks), 1, 8) AS BIGINT) % 512 AS BIGINT) AS bit "
        "FROM probe CROSS JOIN (SELECT unnest(range(4)) AS i)) "
        "SELECT user_id, CAST(count(b.bit) = 4 AS BOOLEAN) AS member, "
        "CAST(user_id % 2 = 0 AS BOOLEAN) AS actual "
        "FROM pb LEFT JOIN bits b USING (bit) GROUP BY user_id"
    )
    # streaming HLL: max-mergeable registers make the micro-batch
    # merge equal the batch register table of the whole corpus
    d["stream_kmv"] = d["events_kmv"]
    d["stream_hll"] = (
        "SELECT CAST(b AS INT) AS bucket, CAST(max(CASE WHEN "
        "strpos(s, '1') = 0 THEN 53 ELSE strpos(s, '1') END) AS INT) "
        "AS maxrank FROM ("
        "SELECT h % 256 AS b, lpad(bin(h // 256), 52, '0') AS s FROM ("
        "SELECT CAST('0x' || substr(md5(source), 1, 15) AS BIGINT) AS h "
        "FROM documents)) GROUP BY b"
    )
    # streaming Bloom: OR-mergeable bits make the micro-batch merge
    # equal the batch filter of the whole corpus
    d["stream_bloom"] = (
        "SELECT DISTINCT CAST(CAST('0x' || "
        "substr(md5(i || '#' || source), 1, 8) AS BIGINT) % 256 AS BIGINT) "
        "AS bit FROM documents "
        "CROSS JOIN (SELECT unnest(range(4)) AS i)"
    )
    # URL dedup: the oracle states the canonical key as a CLOSED FORM
    # of doc_id (lowered host, no default port, tracking param gone) —
    # an independent statement, not a SQL re-derivation
    _hosts_sql = ",".join(f"'{h}'" for h in _WEB_HOSTS)
    d["web_domain_psl"] = _psl_sql()
    d["text_lm_surprise"] = _lm_surprise_sql()
    # trainable NB quality classifier: scores under every class, then
    # the argmin classification (ties -> label ascending; zero-token
    # docs surface as NULL)
    d["text_nb_quality"] = (
        "WITH " + _nb_sql_core() + ", "
        "ids AS (SELECT d.doc_id, l.label FROM documents d "
        "CROSS JOIN labels l) "
        "SELECT i.doc_id, i.label, "
        "CAST(COALESCE(a.n_toks, 0) AS BIGINT) AS n_tokens, a.score "
        "FROM ids i LEFT JOIN agg a "
        "ON a.doc_id = i.doc_id AND a.label = i.label"
    )
    d["text_nb_classify"] = (
        "WITH " + _nb_sql_core() + ", "
        "rk AS (SELECT doc_id, label, score, row_number() OVER "
        "(PARTITION BY doc_id ORDER BY score ASC, label ASC) AS rnk "
        "FROM agg WHERE score IS NOT NULL) "
        "SELECT d.doc_id, r.label AS pred, r.score FROM documents d "
        "LEFT JOIN (SELECT * FROM rk WHERE rnk = 1) r USING (doc_id)"
    )
    # winnowing: per-window packed argmin re-derived over DuckDB lists
    # (1-based inclusive slicing: window j = grams[j : j+len-1])
    _WB = 1 << 22
    d["text_winnow"] = (
        f"WITH toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        "gr AS (SELECT doc_id, len(t) - 3 AS g, "
        "list_transform(range(1, len(t) - 2), i -> "
        "CAST(CAST('0x' || substr(md5(array_to_string(t[i:i+3], ' ')), "
        f"1, 8) AS BIGINT) * {_WB} + ({_WB} - i) AS BIGINT)) AS grams "
        "FROM toks WHERE len(t) >= 4), "
        "sel AS (SELECT doc_id, unnest(list_distinct(list_transform("
        "range(1, greatest(g - 3, 1) + 1), "
        "j -> list_min(grams[j:j + least(4, g) - 1])))) AS p FROM gr) "
        f"SELECT doc_id, CAST({_WB} - p % {_WB} AS BIGINT) AS pos, "
        f"CAST(p // {_WB} AS BIGINT) AS fp FROM sel"
    )
    # the at-ingest gate: same scorer, LM fitted on the even-doc
    # reference corpus, keep surprise <= 190 (~the corpus median —
    # the gate demonstrably drops, not rubber-stamps)
    d["stream_lm_filter"] = (
        "SELECT doc_id AS seq, n_bigrams, surprise FROM ("
        + _lm_surprise_sql("WHERE doc_id % 2 = 0")
        + ") WHERE surprise IS NOT NULL AND surprise <= 190.0"
    )
    # the at-ingest trained-classifier gate: same NB recipe, keep
    # score under the 'long' class <= 3000 (~the corpus median — the
    # GPT-3 threshold recipe; zero-token docs score NULL and drop)
    d["stream_nb_filter"] = (
        "WITH " + _nb_sql_core() + " "
        "SELECT doc_id AS seq, label AS pred, score FROM agg "
        "WHERE label = 'long' AND score IS NOT NULL AND score <= 3000.0"
    )
    # DSIR distribution matching: per-doc mean hashed-bigram
    # target/raw probability ratio, then the deterministic top-50
    d["corpus_dsir_weights"] = (
        "WITH " + _dsir_sql_core() + " "
        "SELECT d.doc_id, "
        "CAST(COALESCE(a.n_grams, 0) AS BIGINT) AS n_grams, a.weight "
        "FROM documents d LEFT JOIN agg a USING (doc_id)"
    )
    d["corpus_dsir_select"] = (
        "WITH " + _dsir_sql_core() + " "
        "SELECT doc_id, n_grams, weight FROM agg "
        "WHERE weight IS NOT NULL "
        "ORDER BY weight DESC, doc_id ASC LIMIT 50"
    )
    # the at-ingest distribution-matching gate: same DSIR recipe,
    # keep weight >= 1.0 (~median; no-feature docs weigh NULL, drop)
    d["stream_dsir_filter"] = (
        "WITH " + _dsir_sql_core() + " "
        "SELECT doc_id AS seq, n_grams, weight FROM agg "
        "WHERE weight IS NOT NULL AND weight >= 1.0"
    )
    # streaming ANN intake: nearest frozen centroid per embedding,
    # the house (rounded cosine desc, cent_id asc) tiebreak
    d["stream_hash_embed"] = (
        "WITH " + ", ".join(_hashembed_ctes())
        + " SELECT doc_id AS seq, CAST(pos AS BIGINT) AS pos, val FROM hemb"
    )
    d["stream_pq_assign"] = (
        "WITH " + ", ".join(_pq_ctes())
        + " SELECT vec_id AS seq, CAST(sub AS BIGINT) AS sub, "
        "code_id, dist2 FROM enc"
    )
    d["stream_ivf_assign"] = (
        "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
        "FROM embeddings ORDER BY vec_id LIMIT 16), "
        "rk AS (SELECT e.vec_id AS seq, c.cent_id AS cell, "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " AS cos, row_number() OVER (PARTITION BY e.vec_id ORDER BY "
        + _pr(_cosine_sql("e.embedding", "c.cent"))
        + " DESC, c.cent_id ASC) AS cr "
        "FROM embeddings e CROSS JOIN cents c) "
        "SELECT seq, CAST(cell AS BIGINT) AS cell, cos "
        "FROM rk WHERE cr = 1"
    )
    d["web_url_dedup"] = (
        "SELECT 'https://' || lower(([" + _hosts_sql + "])"
        "[CAST(doc_id % 8 AS INT) + 1]) || '/item-' || (doc_id % 50) "
        "AS url_canonical, "
        "CAST(min(doc_id) AS BIGINT) AS keep_doc_id, "
        "CAST(count(*) AS BIGINT) AS n_dups "
        "FROM documents GROUP BY 1"
    )
    # mixing weights: sqrt + pround + DECIMAL window sum — the exact
    # expression tree of operators.sampling.mixture_weights
    d["corpus_mixture"] = (
        "WITH per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM per GROUP BY source), "
        "s AS (SELECT *, " + _pr("sqrt(CAST(n_tokens AS DOUBLE))")
        + " AS tokens_scaled FROM a), "
        "t AS (SELECT *, CAST(SUM(CAST(tokens_scaled AS DECIMAL(38,6))) "
        "OVER () AS DOUBLE) AS tot FROM s) "
        "SELECT source, n_docs, n_tokens, tokens_scaled, "
        + _pr("tokens_scaled / tot") + " AS weight FROM t"
    )
    # UniMax waterfilling: ascending-cap ranks, DECIMAL cap prefix
    # sums, per-rank equal share, transition rank star, θ at star —
    # the exact window program of sampling.unimax_allocation
    _UNIMAX_ORDER = "ORDER BY cap ASC, source ASC"
    d["corpus_unimax"] = (
        "WITH per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_tokens) AS BIGINT) AS n_tokens FROM per GROUP BY source), "
        "c AS (SELECT *, " + _pr("CAST(n_tokens AS DOUBLE) * 1.0")
        + " AS cap FROM a), "
        "r AS (SELECT *, "
        f"CAST(row_number() OVER ({_UNIMAX_ORDER}) AS BIGINT) AS rk, "
        "CAST(count(*) OVER () AS BIGINT) AS L, "
        "CAST(SUM(CAST(cap AS DECIMAL(38,6))) OVER "
        f"({_UNIMAX_ORDER} ROWS UNBOUNDED PRECEDING) "
        "- CAST(cap AS DECIMAL(38,6)) AS DOUBLE) AS pfx FROM c), "
        "s AS (SELECT *, "
        + _pr("(26000.0 - pfx) / CAST(L - rk + 1 AS DOUBLE)")
        + " AS share FROM r), "
        "t AS (SELECT *, min(CASE WHEN cap > share THEN rk END) OVER () "
        "AS star FROM s), "
        "u AS (SELECT *, max(CASE WHEN rk = star THEN share END) OVER () "
        "AS theta FROM t) "
        "SELECT source, n_docs, n_tokens, cap, "
        + _pr("CASE WHEN star IS NULL OR rk < star THEN cap ELSE theta END")
        + " AS alloc FROM u"
    )
    d["corpus_unimax_materialize"] = (
        "WITH um AS (SELECT * FROM (" + d["corpus_unimax"] + ") x), "
        "b AS (SELECT source, CAST(floor(alloc) AS BIGINT) AS budget "
        "FROM um), "
        "per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, source, n_tokens, "
        "CAST(SUM(n_tokens) OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM per) "
        "SELECT c.doc_id, c.source, c.n_tokens, c.cum AS cum_tokens, "
        "b.budget FROM c JOIN b USING (source) "
        "WHERE c.cum - c.n_tokens < b.budget"
    )
    # length-bucketed batching: global (n_tokens, md5, id) order via
    # row_number, fixed-rows batches — the exact order the two-pass
    # position assignment reproduces
    _LB_POS = (
        "WITH per AS (SELECT doc_id, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "p AS (SELECT doc_id, n_tokens, "
        "CAST(row_number() OVER (ORDER BY n_tokens, "
        "md5(CAST(doc_id AS VARCHAR)), doc_id) - 1 AS BIGINT) AS pos "
        "FROM per)"
    )
    d["pack_length_batches"] = (
        _LB_POS + " SELECT doc_id, n_tokens, "
        "CAST(pos // 16 AS BIGINT) AS batch_id, "
        "CAST(pos % 16 AS BIGINT) AS pos_in_batch FROM p"
    )
    d["pack_padding_report"] = (
        _LB_POS + ", b AS (SELECT CAST(pos // 16 AS BIGINT) AS batch_id, "
        "CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(max(n_tokens) AS BIGINT) AS max_tokens, "
        "CAST(sum(n_tokens) AS BIGINT) AS sum_tokens FROM p GROUP BY 1) "
        "SELECT batch_id, n_docs, max_tokens, sum_tokens, "
        "CAST(n_docs * max_tokens AS BIGINT) AS padded_tokens, "
        "CASE WHEN n_docs * max_tokens = 0 THEN 0.0 ELSE "
        + _pr(
            "1.0 - CAST(sum_tokens AS DOUBLE) / "
            "CAST(n_docs * max_tokens AS DOUBLE)"
        )
        + " END AS padding_waste FROM b"
    )
    # materialized mixture: the corpus_mixture oracle (as a subquery
    # CTE) feeds floor(weight·total) budgets into the per-source
    # (md5(id), id) cumsum admission rule
    d["corpus_mixture_materialize"] = (
        "WITH cm AS (SELECT * FROM (" + d["corpus_mixture"] + ") x), "
        "b AS (SELECT source, CAST(floor(weight * 20000.0) AS BIGINT) "
        "AS budget FROM cm), "
        "per AS (SELECT doc_id, source, "
        f"CAST(len({_WORDS}) AS BIGINT) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, source, n_tokens, "
        "CAST(SUM(n_tokens) OVER (PARTITION BY source "
        "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
        "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM per) "
        "SELECT c.doc_id, c.source, c.n_tokens, c.cum AS cum_tokens, "
        "b.budget FROM c JOIN b USING (source) "
        "WHERE c.cum - c.n_tokens < b.budget"
    )
    # streaming web filter: the batch canonicalization restated over
    # the same synthetic URLs, minus the blocklisted domains
    d["stream_web_filter"] = (
        "WITH " + _web_sql() + " "
        "SELECT doc_id, canon AS url_canonical, dom AS url_domain "
        "FROM dws WHERE dom NOT IN ("
        + ",".join(f"'{b}'" for b in _WEB_BLOCKLIST)
        + ")"
    )
    # streaming CMS: additive counters make the micro-batch merge
    # equal the batch sketch of the whole corpus
    d["stream_cms"] = (
        "WITH b AS (SELECT r, CAST(CAST('0x' || "
        "substr(md5(r || '#' || source), 1, 8) AS BIGINT) % 16 AS BIGINT) "
        "AS bucket FROM documents "
        "CROSS JOIN (SELECT unnest(range(4)) AS r)) "
        "SELECT CAST(r AS BIGINT) AS row, bucket, "
        "CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY 1, 2"
    )
    # md5 shard draw: same first-8-hex-digits value, '0x'-cast in
    # DuckDB vs conv(,16,10) in Spark — both exact 32-bit integers
    d["export_shards"] = (
        "SELECT CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) "
        "AS BIGINT) % 64 AS BIGINT) AS shard, "
        "CAST(count(*) AS BIGINT) AS n_rows, "
        "CAST(sum(n_chars) AS BIGINT) AS total_size "
        "FROM documents GROUP BY 1"
    )
    return d


def _web_sql() -> str:
    """The web-curation oracle pipeline as DuckDB CTEs ending in
    ``dws(doc_id, source, n_chars, lang, url, scheme, host, port,
    rawpath, cq, dom, canon)`` — an independent SQL restatement of
    operators.web's canonicalization over the same synthetic URLs."""
    hosts = ",".join(f"'{h}'" for h in _WEB_HOSTS)
    trk = ",".join(
        f"'{k}'" for k in ("fbclid", "gclid", "msclkid", "ref", "mc_cid", "mc_eid")
    )
    sld = ",".join(
        f"'{l}'" for l in ("co", "com", "net", "org", "gov", "ac", "edu", "or", "ne")
    )
    return (
        "u AS (SELECT doc_id, source, n_chars, lang, "
        "(CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END) || '://' || "
        f"([{hosts}])[CAST(doc_id % 8 AS INT) + 1] || "
        "(CASE WHEN doc_id % 3 = 0 THEN "
        "(CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END) "
        "WHEN doc_id % 5 = 0 THEN ':8080' ELSE '' END) || "
        "'/' || source || '/item-' || doc_id || "
        "(CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || (doc_id % 100) "
        "WHEN doc_id % 4 = 1 THEN '?b=2&a=1&utm_campaign=x' "
        "WHEN doc_id % 4 = 2 THEN '?gclid=abc' ELSE '' END) || "
        "(CASE WHEN doc_id % 2 = 1 THEN '#section-2' ELSE '' END) AS url "
        "FROM documents), "
        "pw AS (SELECT *, "
        "lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.\\-]*)://', 1)) AS scheme, "
        "regexp_replace(regexp_extract(url, "
        "'^[a-zA-Z][a-zA-Z0-9+.\\-]*://([^/?#]*)', 1), '^[^@]*@', '') AS hp, "
        "regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.\\-]*://[^/?#]*([^?#]*)', 1) "
        "AS rawpath, "
        "regexp_extract(url, '\\?([^#]*)', 1) AS rawq FROM u), "
        "hw AS (SELECT *, lower(string_split(hp, ':')[1]) AS host, "
        "CASE WHEN len(string_split(hp, ':')) > 1 THEN string_split(hp, ':')[2] "
        "ELSE '' END AS port FROM pw), "
        "cw AS (SELECT *, array_to_string(list_sort(list_filter("
        "string_split(rawq, '&'), "
        "x -> x <> '' AND NOT (substr(string_split(x, '=')[1], 1, 4) = 'utm_' "
        f"OR string_split(x, '=')[1] IN ({trk})))), '&') AS cq, "
        "string_split(host, '.') AS labels FROM hw), "
        "dws AS (SELECT *, "
        f"CASE WHEN len(labels) >= 3 AND labels[len(labels)-1] IN ({sld}) "
        "AND length(labels[len(labels)]) <= 3 "
        "THEN labels[len(labels)-2] || '.' || labels[len(labels)-1] || '.' || "
        "labels[len(labels)] "
        "WHEN len(labels) >= 2 THEN labels[len(labels)-1] || '.' || "
        "labels[len(labels)] "
        "ELSE host END AS dom, "
        "CASE WHEN scheme <> '' THEN scheme || '://' || host || "
        "(CASE WHEN port <> '' AND NOT ((scheme = 'https' AND port = '443') "
        "OR (scheme = 'http' AND port = '80')) THEN ':' || port ELSE '' END) || "
        "(CASE WHEN rawpath = '' THEN '/' ELSE rawpath END) || "
        "(CASE WHEN cq <> '' THEN '?' || cq ELSE '' END) END AS canon FROM cw)"
    )


def _psl_sql() -> str:
    """The web_domain_psl oracle: an independent SQL re-derivation of
    public-suffix resolution over the same embedded fixture — the rule
    table is regenerated from parse_suffix_rules (shared driver-side
    CONFIG, not shared computation), then per-depth LEFT joins on the
    host's last-d-labels string and a greatest/coalesce resolution
    (exception > longest plain/wildcard match > implicit '*'). DuckDB
    list slicing is 1-based inclusive: last d labels = ls[n-d+1:n].
    GREATEST NULL handling differs across engines, so matches are
    folded through COALESCE(-1)/NULLIF — exact integer arithmetic
    either way."""
    from margaret_spark.operators.web import parse_suffix_rules

    parsed = parse_suffix_rules(_PSL_FIXTURE)
    depths = sorted({d for _k, d, _p, _w, _e in parsed})
    hosts = ",".join(f"'{h}'" for h in _PSL_HOSTS)
    ctes = [
        "hosts AS (SELECT doc_id, "
        f"([{hosts}])[CAST(doc_id % {len(_PSL_HOSTS)} AS INT) + 1] AS host "
        "FROM documents)",
        "hl AS (SELECT doc_id, host, string_split(host, '.') AS ls, "
        "len(string_split(host, '.')) AS n FROM hosts)",
    ]
    joins, norm, exc = [], [], []
    for d in depths:
        rows = ", ".join(
            "('{}', {}, {}, {})".format(
                k,
                "CAST(NULL AS INT)" if p is None else p,
                "true" if w else "false",
                "CAST(NULL AS INT)" if e is None else e,
            )
            for k, kd, p, w, e in parsed
            if kd == d
        )
        ctes.append(
            f"r{d}(key{d}, plain{d}, wild{d}, exc{d}) AS "
            f"(SELECT * FROM (VALUES {rows}) v)"
        )
        joins.append(
            f"LEFT JOIN r{d} ON hl.n >= {d} AND "
            f"array_to_string(hl.ls[hl.n-{d}+1:hl.n], '.') = r{d}.key{d}"
        )
        norm.append(f"COALESCE(plain{d}, -1)")
        norm.append(
            f"CASE WHEN COALESCE(wild{d}, false) AND n >= {d + 1} "
            f"THEN {d + 1} ELSE -1 END"
        )
        exc.append(f"COALESCE(exc{d}, -1)")
    sel = ", ".join(
        f"r{d}.plain{d}, r{d}.wild{d}, r{d}.exc{d}" for d in depths
    )
    ctes.append(
        f"j AS (SELECT hl.*, {sel} FROM hl " + " ".join(joins) + ")"
    )
    ctes.append(
        "p AS (SELECT *, COALESCE("
        f"NULLIF(GREATEST({', '.join(exc)}), -1), "
        f"NULLIF(GREATEST({', '.join(norm)}), -1), 1) AS ps FROM j)"
    )
    return (
        "WITH " + ", ".join(ctes) + " "
        "SELECT doc_id, host, "
        "CASE WHEN n > ps THEN array_to_string(ls[n-ps:n], '.') END "
        "AS domain_psl, CAST(ps AS INT) AS psl_len FROM p"
    )


def _lm_surprise_sql(fit_where: str = "") -> str:
    """The text_lm_surprise / stream_lm_filter oracle: the pruned
    bigram LM and the mean-inverse-probability score re-derived in
    SQL — same top-512 (count desc, gram asc) cut, same add-one
    smoothing with V = the unigram table's row count, same
    pround-per-term + DECIMAL-sum mean. All integer ratios under IEEE
    division: hash-exact. ``fit_where`` restricts the FIT corpus (the
    reference-corpus recipe) while every document is scored."""
    return (
        f"WITH toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        f"fit AS (SELECT * FROM toks {fit_where}), "
        "u AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT unnest(t) AS gram FROM fit) GROUP BY gram "
        "ORDER BY n DESC, gram ASC LIMIT 512), "
        "fitbig AS (SELECT doc_id, t FROM fit WHERE len(t) >= 2), "
        "big AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2), "
        "b AS (SELECT gram, CAST(count(*) AS BIGINT) AS n FROM ("
        "SELECT t[i] || ' ' || t[i + 1] AS gram FROM fitbig "
        "CROSS JOIN LATERAL unnest(range(1, len(t))) AS p(i)) "
        "GROUP BY gram ORDER BY n DESC, gram ASC LIMIT 512), "
        "v AS (SELECT count(*) AS v FROM u), "
        "pairs AS (SELECT doc_id, t[i] AS w1, "
        "t[i] || ' ' || t[i + 1] AS w12 FROM big "
        "CROSS JOIN LATERAL unnest(range(1, len(t))) AS p(i)), "
        "terms AS (SELECT doc_id, "
        + _pr(
            "CAST(COALESCE(u.n, 0) + v.v AS DOUBLE) / "
            "(COALESCE(b.n, 0) + 1)"
        )
        + " AS s FROM pairs "
        "LEFT JOIN u ON u.gram = pairs.w1 "
        "LEFT JOIN b ON b.gram = pairs.w12 CROSS JOIN v), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
        + _pr(
            "CAST(SUM(CAST(s AS DECIMAL(38,4))) AS DOUBLE) / count(*)"
        )
        + " AS surprise FROM terms GROUP BY doc_id) "
        "SELECT d.doc_id, "
        "CAST(COALESCE(a.n_bigrams, 0) AS BIGINT) AS n_bigrams, "
        "a.surprise FROM documents d LEFT JOIN agg a USING (doc_id)"
    )


def _dsir_sql_core() -> str:
    """The corpus_dsir_* oracle core (CTE body, no WITH): re-derives
    ``operators.dsir`` end-to-end in SQL — word-bigram occurrences,
    the md5-prefix 64-bucket feature hash (the house CMS convention),
    per-corpus bucket counts and totals, the add-one probability
    ratio ((cnt_t+1)/(N_t+B)) / ((cnt_r+1)/(N_r+B)) with the exact
    Spark expression tree (two exact integer-ratio divisions, one
    more exactly-rounded division), and the pround + DECIMAL mean.
    Hash-exact."""
    term = _pr(
        "(CAST(COALESCE(ct.n_t, 0) + 1 AS DOUBLE) / CAST(tot.ntd AS DOUBLE))"
        " / "
        "(CAST(COALESCE(cr.n_r, 0) + 1 AS DOUBLE) / CAST(tot.nrd AS DOUBLE))"
    )
    mean = _pr("CAST(SUM(CAST(s AS DECIMAL(38,4))) AS DOUBLE) / count(*)")
    return (
        f"toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        "g AS (SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram FROM toks "
        "CROSS JOIN LATERAL unnest(range(1, len(t))) AS p(i) "
        "WHERE len(t) >= 2), "
        "bk AS (SELECT doc_id, CAST(CAST('0x' || substr(md5(gram), 1, 8) "
        "AS BIGINT) % 64 AS BIGINT) AS bucket FROM g), "
        "ct AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_t FROM bk "
        "WHERE doc_id % 2 = 0 GROUP BY bucket), "
        "cr AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_r FROM bk "
        "WHERE doc_id % 2 = 1 GROUP BY bucket), "
        "tot AS (SELECT "
        "(SELECT COALESCE(SUM(n_t), 0) FROM ct) + 64 AS ntd, "
        "(SELECT COALESCE(SUM(n_r), 0) FROM cr) + 64 AS nrd), "
        "terms AS (SELECT bk.doc_id, "
        f"{term} AS s FROM bk "
        "LEFT JOIN ct USING (bucket) LEFT JOIN cr USING (bucket) "
        "CROSS JOIN tot), "
        "agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams, "
        f"{mean} AS weight FROM terms GROUP BY doc_id)"
    )


def _nb_sql_core() -> str:
    """The text_nb_quality / text_nb_classify oracle core (CTE body,
    no WITH): re-derives ``operators.nbayes`` end-to-end in SQL —
    the doc_id % 3 training slice with its length-derived labels, the
    per-(token, label) counts, the top-16 (count desc, token asc)
    vocab cut, V as the cut's distinct-token count, in-vocab class
    token totals + class priors, then every per-token term
    pround((N_c + V) / (cnt + 1)) and the prior-scaled DECIMAL mean.
    Every quantity is a ratio of exact integers under one IEEE
    division (the lm_surprise construction): hash-exact."""
    term = _pr(
        "CAST(l.n_tokens + v.v AS DOUBLE) / "
        "CAST(COALESCE(c.n, 0) + 1 AS DOUBLE)"
    )
    mean = _pr("CAST(SUM(CAST(s AS DECIMAL(38,4))) AS DOUBLE) / count(*)")
    score = _pr(f"{mean} * (CAST(total AS DOUBLE) / CAST(n_docs AS DOUBLE))")
    return (
        f"toks AS (SELECT doc_id, {_WORDS} AS t FROM documents), "
        "train AS (SELECT doc_id, t, CASE WHEN len(t) >= 40 THEN 'long' "
        "ELSE 'short' END AS label FROM toks WHERE doc_id % 3 = 0), "
        "tl AS (SELECT label, unnest(t) AS token FROM train), "
        "per_label AS (SELECT token, label, "
        "CAST(count(*) AS BIGINT) AS n FROM tl GROUP BY token, label), "
        "vocab AS (SELECT token FROM (SELECT token, SUM(n) AS tot "
        "FROM per_label GROUP BY token "
        "ORDER BY tot DESC, token ASC LIMIT 16)), "
        "counts AS (SELECT p.token, p.label, p.n FROM per_label p "
        "JOIN vocab USING (token)), "
        "v AS (SELECT CAST(count(DISTINCT token) AS BIGINT) AS v "
        "FROM counts), "
        "dl AS (SELECT label, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM train GROUP BY label), "
        "tt AS (SELECT label, CAST(SUM(n) AS BIGINT) AS n_tokens "
        "FROM counts GROUP BY label), "
        "labels AS (SELECT dl.label, "
        "CAST(COALESCE(tt.n_tokens, 0) AS BIGINT) AS n_tokens, dl.n_docs, "
        "(SELECT CAST(SUM(n_docs) AS BIGINT) FROM dl) AS total "
        "FROM dl LEFT JOIN tt USING (label)), "
        "dt AS (SELECT doc_id, unnest(t) AS token FROM toks), "
        "terms AS (SELECT dt.doc_id, l.label, l.n_docs, l.total, "
        f"{term} AS s FROM dt CROSS JOIN labels l CROSS JOIN v "
        "LEFT JOIN counts c ON c.token = dt.token AND c.label = l.label), "
        "agg AS (SELECT doc_id, label, "
        "CAST(count(*) AS BIGINT) AS n_toks, "
        f"{score} AS score FROM terms GROUP BY doc_id, label, n_docs, total)"
    )


def _image_dhash_sql() -> str:
    """The multimodal_image_dhash / _image_dedup oracle core: re-derive
    every dHash bit arithmetically — grid cell (gy, gx) samples flat
    pixel index j = (gy·h div 8)·w + (gx·w div 9) of the quadratic
    closed form (seed·31 + j²) mod 256; bit gy·8+gx set iff
    left < right; packed two's-complement (bit 63 = −2⁶³). Pure
    integer arithmetic — hash-exact against the real
    encode→decode→hash pipeline."""
    return (
        "d AS (SELECT doc_id, doc_id % 25 AS seed, "
        "CAST((doc_id % 25) % 5 + 16 AS BIGINT) AS w, "
        "CAST((doc_id % 25) % 3 + 12 AS BIGINT) AS h FROM documents), "
        "g AS (SELECT doc_id, seed, w, h, CAST(t.range AS BIGINT) AS b, "
        "CAST(t.range AS BIGINT) // 8 AS gy, "
        "CAST(t.range AS BIGINT) % 8 AS gx FROM d CROSS JOIN range(64) t), "
        "cells AS (SELECT doc_id, b, "
        "((gy * h) // 8) * w + ((gx * w) // 9) AS j1, "
        "((gy * h) // 8) * w + (((gx + 1) * w) // 9) AS j2, "
        "seed FROM g), "
        "bits AS (SELECT doc_id, b, "
        "(seed * 31 + j1 * j1) % 256 AS g1, "
        "(seed * 31 + j2 * j2) % 256 AS g2 FROM cells), "
        "sig AS (SELECT doc_id, CAST(SUM(CASE WHEN g1 < g2 THEN "
        "(CASE WHEN b = 63 THEN (-9223372036854775807 - 1) "
        "ELSE (CAST(1 AS BIGINT) << b) END) ELSE 0 END) AS BIGINT) "
        "AS dhash FROM bits GROUP BY doc_id)"
    )


def _pca_sql(iters: int = 12, d: int = 64, cd: int = 9, ss: int = 12, rd: int = 6) -> str:
    """PCA power-iteration oracle, one exactness tool per phase (the
    operators.pca split): means and covariance entries are pround'd
    products under order-independent DECIMAL sums; the bounded
    iteration is sequential LEFT FOLDS of pround'd terms in ascending
    index order (list_reduce — the _DOT portability pattern), exactly
    the nested-HOF expression the Spark operator compiles. The
    covariance list and every iterate live in MATERIALIZED one-row
    CTEs (DuckDB re-inlines multiply-referenced CTEs — the k-core
    gotcha); sign convention and Rayleigh eigenvalue replayed
    identically."""

    def ds(expr):
        return f"CAST(SUM(CAST({expr} AS DECIMAL(38,{ss}))) AS DOUBLE)"

    def fold(terms):
        return (
            f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {terms}), "
            "(acc, e) -> acc + e)"
        )

    n = "(SELECT count(*) FROM embeddings)"
    x0v = _pr(f"1.0 / sqrt({d}.0)", cd)
    mean_expr = _pr(ds(_pr("x", cd)) + f" / {n}", cd)
    prod_expr = _pr(ds(_pr("a.v * b.v", cd)) + f" / {n}", cd)
    mv_terms = (
        f"list_transform(range(0, {d}), j -> "
        + _pr(f"ca[i.range * {d} + j + 1] * xa[j + 1]", cd)
        + ")"
    )
    matvec = (
        f"list_transform(range(0, {d}), i -> " + fold(mv_terms) + ")"
    ).replace("i.range", "i")
    sq_terms = "list_transform(ya, v -> " + _pr("v * v", cd) + ")"
    ctes = [
        f"comp AS (SELECT vec_id, CAST(t.range AS BIGINT) AS i, "
        f"CAST(embedding[t.range + 1] AS DOUBLE) AS x "
        f"FROM embeddings CROSS JOIN range({d}) t)",
        f"mean AS (SELECT i, {mean_expr} AS m FROM comp GROUP BY i)",
        "cen AS (SELECT c.vec_id, c.i, " + _pr("c.x - mean.m", cd)
        + " AS v FROM comp c JOIN mean ON mean.i = c.i)",
        f"cov AS MATERIALIZED (SELECT a.i AS i, b.i AS j, {prod_expr} AS c "
        "FROM cen a JOIN cen b ON a.vec_id = b.vec_id GROUP BY a.i, b.i)",
        "covl AS MATERIALIZED (SELECT list(c ORDER BY i, j) AS ca FROM cov)",
        f"x0 AS (SELECT list_transform(range(0, {d}), i -> {x0v}) AS xa)",
    ]
    for t in range(1, iters + 1):
        ctes.append(
            f"y{t} AS MATERIALIZED (SELECT {matvec} AS ya "
            f"FROM covl, x{t - 1})"
        )
        ctes.append(
            f"n{t} AS MATERIALIZED (SELECT ya, sqrt({fold(sq_terms)}) "
            f"AS nrm FROM y{t})"
        )
        ctes.append(
            f"x{t} AS MATERIALIZED (SELECT list_transform(ya, v -> "
            + _pr("v / nrm", cd)
            + f") AS xa FROM n{t})"
        )
    ctes.append(
        f"yf AS MATERIALIZED (SELECT {matvec} AS ya FROM covl, x{iters})"
    )
    lam_terms = (
        f"list_transform(range(1, {d} + 1), j -> "
        + _pr("xa[j] * ya[j]", cd)
        + ")"
    )
    ctes.append(
        "lam AS MATERIALIZED (SELECT "
        + _pr(fold(lam_terms), rd)
        + f" AS l FROM x{iters}, yf)"
    )
    ctes.append(
        f"sgn AS (SELECT CASE WHEN list_filter(xa, v -> v <> 0)[1] < 0 "
        f"THEN -1.0 ELSE 1.0 END AS s FROM x{iters})"
    )
    comp_out = _pr("xa[CAST(t.range AS BIGINT) + 1] * sgn.s", cd)
    return (
        "WITH " + ", ".join(ctes)
        + f" SELECT CAST(t.range AS BIGINT) AS pos, {comp_out} AS component, "
        f"lam.l AS eigenvalue FROM x{iters} CROSS JOIN sgn CROSS JOIN lam "
        f"CROSS JOIN range({d}) t"
    )


def _image_phash_sql() -> str:
    """The multimodal_image_phash / _phash_dedup oracle core:
    re-derive every pHash bit arithmetically from the closed-form
    pixel stream. Per-pixel greys (the quadratic closed form) box-
    floor-mean into the 16×16 grid (pixel (y, x) → cell
    (y·16 div h, x·16 div w); cell grey = sum div count; empty cells —
    h < 16 here — are 0 via the full cell spine); the two separable
    DCT passes join against a VALUES table of the SAME hardcoded
    integer basis the Spark operator uses (imported here, so the two
    sides can never drift); the 64 AC coefficients (row-major
    k = u·8+v in 1..64 — k = 0 is the excluded DC term) threshold
    against the exact middle-pair sum (2·c > m32 + m33, order stats
    via row_number); packed two's-complement (bit 63 = −2⁶³). Pure
    integer arithmetic — hash-exact against the real
    encode→decode→box-mean→DCT pipeline."""
    from margaret_spark.operators.imagehash import _PHASH_B16

    b16_rows = ", ".join(
        f"({u}, {x}, {_PHASH_B16[u][x]})" for u in range(9) for x in range(16)
    )
    return (
        "d AS (SELECT doc_id, doc_id % 25 AS seed, "
        "CAST((doc_id % 25) % 5 + 16 AS BIGINT) AS w, "
        "CAST((doc_id % 25) % 3 + 12 AS BIGINT) AS h FROM documents), "
        "px AS (SELECT doc_id, "
        "((CAST(t.range AS BIGINT) // w) * 16) // h AS gy, "
        "((CAST(t.range AS BIGINT) % w) * 16) // w AS gx, "
        "(seed * 31 + CAST(t.range AS BIGINT) * CAST(t.range AS BIGINT)) "
        "% 256 AS g FROM d CROSS JOIN range(320) t "
        "WHERE t.range < w * h), "
        "cm AS (SELECT doc_id, gy, gx, SUM(g) // COUNT(*) AS g "
        "FROM px GROUP BY doc_id, gy, gx), "
        "spine AS (SELECT doc_id, CAST(t.range AS BIGINT) // 16 AS gy, "
        "CAST(t.range AS BIGINT) % 16 AS gx FROM d CROSS JOIN range(256) t), "
        "grid AS (SELECT spine.doc_id, spine.gy, spine.gx, "
        "COALESCE(cm.g, 0) AS g FROM spine LEFT JOIN cm "
        "ON cm.doc_id = spine.doc_id AND cm.gy = spine.gy "
        "AND cm.gx = spine.gx), "
        f"b16 AS (SELECT * FROM (VALUES {b16_rows}) AS t(u, x, val)), "
        # column pass first (contract over gy — u is the VERTICAL
        # frequency, matching the operator's B·G·B[:8]ᵀ), then the row
        # pass over gx with v < 8
        "tmat AS (SELECT grid.doc_id, b16.u, grid.gx AS xx, "
        "SUM(grid.g * b16.val) AS t FROM grid JOIN b16 ON b16.x = grid.gy "
        "GROUP BY grid.doc_id, b16.u, grid.gx), "
        "co AS (SELECT tmat.doc_id, tmat.u * 8 + bv.u AS k, "
        "SUM(tmat.t * bv.val) AS c FROM tmat JOIN b16 bv ON bv.x = tmat.xx "
        "AND bv.u < 8 GROUP BY tmat.doc_id, tmat.u, bv.u), "
        "ac AS (SELECT doc_id, k - 1 AS j, c FROM co "
        "WHERE k BETWEEN 1 AND 64), "
        "med AS (SELECT doc_id, SUM(CASE WHEN rn IN (32, 33) THEN c "
        "ELSE 0 END) AS msum FROM (SELECT doc_id, c, ROW_NUMBER() OVER "
        "(PARTITION BY doc_id ORDER BY c) AS rn FROM ac) GROUP BY doc_id), "
        "sig AS (SELECT ac.doc_id, CAST(SUM(CASE WHEN 2 * ac.c > med.msum "
        "THEN (CASE WHEN ac.j = 63 THEN (-9223372036854775807 - 1) "
        "ELSE (CAST(1 AS BIGINT) << ac.j) END) ELSE 0 END) AS BIGINT) "
        "AS phash FROM ac JOIN med ON med.doc_id = ac.doc_id "
        "GROUP BY ac.doc_id)"
    )


def _audio_afp_sql() -> str:
    """The multimodal_audio_fp / _audio_dedup oracle core: re-derive
    every energy-gradient bit arithmetically — sample j of doc's clip
    is ((seed·997 + j²·29 + j·17) mod 4096) − 2048 + (32·v iff
    j mod 5 = 0); its
    frame is the exact bucket inverse (65·(j+1) − 1) div n of the
    floor-div boundaries f·n div 65 (identity verified for all
    n ≤ 299); frame energy = Σ|s|; bit f set iff e[f] < e[f+1]
    (empty frames — n < 65 — carry energy 0); packed two's-complement
    (bit 63 = −2⁶³). Pure integer arithmetic — hash-exact against the
    real encode→decode→fingerprint pipeline."""
    return (
        "d AS (SELECT doc_id, doc_id % 25 AS seed, "
        "(doc_id // 25) % 3 AS v, "
        "CAST((doc_id % 25) % 5 * 16 + 64 AS BIGINT) AS n FROM documents), "
        "sm AS (SELECT d.doc_id, "
        "abs(((d.seed * 997 + i.range * i.range * 29 + i.range * 17) "
        "% 4096) - 2048 "
        "+ (CASE WHEN i.range % 5 = 0 THEN d.v * 32 ELSE 0 END)) AS m, "
        "(65 * (i.range + 1) - 1) // d.n AS f "
        "FROM d CROSS JOIN range(128) i WHERE i.range < d.n), "
        "en AS (SELECT doc_id, f, CAST(SUM(m) AS BIGINT) AS e "
        "FROM sm GROUP BY doc_id, f), "
        "fr AS (SELECT doc_id, CAST(t.range AS BIGINT) AS f "
        "FROM d CROSS JOIN range(65) t), "
        "ee AS (SELECT fr.doc_id, fr.f, COALESCE(en.e, 0) AS e FROM fr "
        "LEFT JOIN en ON en.doc_id = fr.doc_id AND en.f = fr.f), "
        "sig AS (SELECT a.doc_id, CAST(SUM(CASE WHEN a.e < c.e THEN "
        "(CASE WHEN a.f = 63 THEN (-9223372036854775807 - 1) "
        "ELSE (CAST(1 AS BIGINT) << a.f) END) ELSE 0 END) AS BIGINT) "
        "AS afp FROM ee a JOIN ee c ON c.doc_id = a.doc_id "
        "AND c.f = a.f + 1 WHERE a.f < 64 GROUP BY a.doc_id)"
    )


def _oracle_sql_base() -> dict[str, str]:
    from margaret_spark.operators.bpe import PRETOKEN_RE as _BPE_PAT

    return {
        "log_scan": (
            "SELECT event_id AS seq, event_type, value FROM events"
        ),
        "log_get": (
            "SELECT event_id AS seq, user_id, event_type, value "
            "FROM events WHERE event_id = 999"
        ),
        "log_seq": "SELECT COALESCE(MAX(event_id), -1) AS seq FROM events",
        "log_range": (
            "SELECT event_id AS seq, value FROM events "
            "WHERE event_id > 99 AND event_id <= 299"
        ),
        "log_limit": (
            "SELECT event_id AS seq, event_type FROM events "
            "ORDER BY event_id LIMIT 100"
        ),
        "log_reverse": (
            "SELECT event_id AS seq, event_type, value FROM events "
            "ORDER BY event_id DESC LIMIT 100"
        ),
        "log_append_seq": (
            "SELECT CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS seq, "
            "doc_id FROM documents"
        ),
        "log_nulled_overlay": (
            "SELECT e.event_id AS seq, "
            "CASE WHEN p.op = 'null' THEN NULL ELSE e.value END AS value, "
            "COALESCE(p.op = 'null', FALSE) AS nulled "
            "FROM events e LEFT JOIN "
            "(SELECT event_id, 'null' AS op FROM events WHERE event_type = 'error') p "
            "ON e.event_id = p.event_id"
        ),
        "log_replace_overlay": (
            "SELECT e.event_id AS seq, "
            "COALESCE(p.pv, e.value) AS value, "
            "p.pv IS NOT NULL AS replaced "
            "FROM events e LEFT JOIN "
            "(SELECT event_id, value * 2 AS pv FROM events "
            "WHERE event_type = 'purchase') p "
            "ON e.event_id = p.event_id"
        ),
        # the as-of view pins the pre-mutation state: first 500 events,
        # nothing nulled (the null landed after the snapshot)
        "log_snapshot_read": (
            "SELECT event_id AS seq, value AS v, FALSE AS nulled "
            "FROM events WHERE event_id < 500"
        ),
        "log_check_consistency": (
            "SELECT count(*) AS n, count(DISTINCT event_id) AS n_distinct, "
            "min(event_id) AS min_seq, max(event_id) AS max_seq, "
            "(count(*) = count(DISTINCT event_id) AND min(event_id) = 0 "
            "AND max(event_id) = count(*) - 1) AS dense FROM events"
        ),
        "mlog_list": "SELECT DISTINCT o_custkey AS addr FROM orders",
        "mlog_ranks": (
            "SELECT o_custkey AS addr, o_orderkey AS main_seq, "
            "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT) AS rank "
            "FROM orders QUALIFY o_custkey <= 20"
        ),
        "mlog_sublog_get": (
            "SELECT addr, rank, main_seq FROM ("
            "SELECT o_custkey AS addr, o_orderkey AS main_seq, "
            "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT) AS rank "
            "FROM orders) WHERE addr = 7 AND rank = 2"
        ),
        "mlog_sublog_query": (
            "SELECT rank, main_seq FROM ("
            "SELECT o_custkey AS addr, o_orderkey AS main_seq, "
            "CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) - 1 AS BIGINT) AS rank "
            "FROM orders) WHERE addr = 7 AND rank >= 1 AND rank <= 4"
        ),
        "mlog_cardinalities": (
            "SELECT o_custkey AS addr, count(*) - 1 AS sublog_seq "
            "FROM orders GROUP BY o_custkey"
        ),
        "mlog_has": (
            "SELECT t.addr, count(o.o_orderkey) > 0 AS has "
            "FROM (VALUES (7), (999999999)) t(addr) "
            "LEFT JOIN orders o ON o.o_custkey = t.addr GROUP BY t.addr"
        ),
        "mlog_delete": (
            "SELECT DISTINCT o_custkey AS addr FROM orders "
            "WHERE o_custkey NOT IN (1, 2, 3)"
        ),
        "mlog_set_ops": (
            "SELECT addr FROM ("
            "SELECT DISTINCT o_custkey AS addr FROM orders "
            "INTERSECT "
            "SELECT c_custkey AS addr FROM customer WHERE c_acctbal > 5000"
            ") EXCEPT ALL (SELECT addr FROM (VALUES (7), (11)) t(addr))"
        ),
        "kvidx_latest": (
            "SELECT user_id AS addr, event_id AS upd_seq, value, event_type "
            "FROM events QUALIFY row_number() OVER "
            "(PARTITION BY user_id ORDER BY event_id DESC) = 1"
        ),
        "kvidx_point": (
            "SELECT user_id AS addr, event_id AS upd_seq, value, event_type "
            "FROM events WHERE user_id = 7 QUALIFY row_number() OVER "
            "(PARTITION BY user_id ORDER BY event_id DESC) = 1"
        ),
        "sink_fanout": (
            "SELECT event_type AS addr, count(*) AS card, "
            "min(event_id) AS min_seq, max(event_id) AS max_seq "
            "FROM events GROUP BY event_type"
        ),
        "sink_fanout_multi": (
            "SELECT addr, count(*) AS card FROM ("
            "SELECT event_type AS addr FROM events "
            "UNION ALL "
            "SELECT 'u' || CAST(user_id % 10 AS VARCHAR) AS addr FROM events"
            ") GROUP BY addr"
        ),
        "tpch_q1": (
            "SELECT l_returnflag, l_linestatus, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sum_qty, "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_base_price, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge, "
            + _pr("CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)") + " AS avg_qty, "
            + _pr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)") + " AS avg_price, "
            + _pr("CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)") + " AS avg_disc, "
            "COUNT(*) AS count_order "
            "FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "tpch_q3": (
            "SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "AND CAST(o_orderdate AS DATE) < DATE '1998-01-01' "
            "AND CAST(l_shipdate AS DATE) > DATE '1998-01-01' "
            "GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority "
            "ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
        ),
        "tpch_q5": (
            "SELECT n_name, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' "
            "AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(o_orderdate AS DATE) < DATE '1997-01-01' "
            "GROUP BY n_name"
        ),
        "tpch_q6": (
            "SELECT "
            "CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue, "
            "COUNT(*) AS n FROM lineitem "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' "
            "AND l_discount >= 0.05 AND l_discount <= 0.07 "
            "AND l_quantity < 24"
        ),
        "tpch_q14": (
            "SELECT "
            "CAST(SUM(CAST(CASE WHEN p_type LIKE 'PROMO%' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END "
            "AS DECIMAL(38,6))) AS DOUBLE) AS promo_revenue, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            "AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-03-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'"
        ),
        "tpch_q4": (
            "SELECT o_orderpriority, count(*) AS order_count FROM orders o "
            "WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(o_orderdate AS DATE) < DATE '1996-04-01' "
            "AND EXISTS (SELECT 1 FROM lineitem l "
            "WHERE l.l_orderkey = o.o_orderkey "
            "AND CAST(l.l_shipdate AS DATE) > DATE '1997-01-01') "
            "GROUP BY o_orderpriority"
        ),
        "tpch_q7": (
            "SELECT supp_nation, cust_nation, l_year, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM (SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
            "year(CAST(l_shipdate AS DATE)) AS l_year, l_extendedprice, l_discount "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "WHERE (sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') "
            "OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1')) "
            "GROUP BY supp_nation, cust_nation, l_year"
        ),
        "tpch_q19": (
            "SELECT "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue, "
            "COUNT(*) AS n "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
            "AND l_quantity BETWEEN 1 AND 11) "
            "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 30 "
            "AND l_quantity BETWEEN 10 AND 25)"
        ),
        "tpch_q17": (
            "WITH avg_qty AS (SELECT l_partkey, "
            + _pr(
                "(CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) / COUNT(*)) * 0.2"
            )
            + " AS thresh FROM lineitem GROUP BY l_partkey) "
            "SELECT "
            "CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sum_price, "
            "COUNT(*) AS n "
            "FROM lineitem JOIN avg_qty USING (l_partkey) "
            "WHERE l_quantity < thresh"
        ),
        "tpch_q2": (
            "SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey FROM ("
            "SELECT s_acctbal, s_name, n_name, p_partkey, s_suppkey, "
            "min(s_acctbal) OVER (PARTITION BY p_partkey) AS mb "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
            "JOIN part ON p_partkey = ps.l_partkey "
            "JOIN supplier ON s_suppkey = ps.l_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'EUROPE' AND p_size = 15 AND p_type = 'LARGE'"
            ") WHERE s_acctbal = mb "
            "ORDER BY s_acctbal DESC, p_partkey, s_suppkey LIMIT 100"
        ),
        "tpch_q8": (
            "SELECT o_year, "
            + _pr(
                "CAST(SUM(CAST(CASE WHEN supp_nation = 'NATION_2' "
                "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END "
                "AS DECIMAL(38,6))) AS DOUBLE) / "
                "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
                "AS DECIMAL(38,6))) AS DOUBLE)"
            )
            + " AS mkt_share FROM ("
            "SELECT year(CAST(o_orderdate AS DATE)) AS o_year, "
            "l_extendedprice, l_discount, sn.n_name AS supp_nation "
            "FROM lineitem "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation cn ON c_nationkey = cn.n_nationkey "
            "JOIN region ON cn.n_regionkey = r_regionkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation sn ON s_nationkey = sn.n_nationkey "
            "JOIN part ON l_partkey = p_partkey "
            "WHERE r_name = 'ASIA' AND p_type = 'PROMO'"
            ") GROUP BY o_year"
        ),
        "tpch_q9": (
            "SELECT n_name AS nation, year(CAST(o_orderdate AS DATE)) AS o_year, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
            "- p_retailprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit "
            "FROM lineitem "
            "JOIN part ON l_partkey = p_partkey "
            "JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE p_name LIKE '%gear%' "
            "GROUP BY n_name, year(CAST(o_orderdate AS DATE))"
        ),
        "tpch_q11": (
            "WITH base AS (SELECT l_partkey, l_extendedprice * l_quantity AS val "
            "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_3') "
            "SELECT l_partkey, "
            "CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) AS value FROM base "
            "GROUP BY l_partkey "
            "HAVING CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) > "
            "(SELECT CAST(SUM(CAST(val AS DECIMAL(38,6))) AS DOUBLE) * 0.001 FROM base)"
        ),
        "tpch_q12": (
            "SELECT l_linestatus, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
            "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
            "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' "
            "GROUP BY l_linestatus"
        ),
        "tpch_q13": (
            "SELECT c_count, count(*) AS custdist FROM ("
            "SELECT c_custkey, count(o_orderkey) AS c_count "
            "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
            "AND o_orderpriority <> '4-NOT SPECIFIED' "
            "GROUP BY c_custkey) GROUP BY c_count"
        ),
        "tpch_q15": (
            "WITH revenue AS (SELECT l_suppkey, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) "
            "AS total_revenue FROM lineitem "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1996-07-01' "
            "GROUP BY l_suppkey) "
            "SELECT s_suppkey, s_name, total_revenue "
            "FROM revenue JOIN supplier ON l_suppkey = s_suppkey "
            "WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)"
        ),
        "tpch_q16": (
            "SELECT p_brand, p_type, p_size, "
            "count(DISTINCT l_suppkey) AS supplier_cnt "
            "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps "
            "JOIN part ON p_partkey = ps.l_partkey "
            "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 5, 10, 15, 20, 25) "
            "AND l_suppkey NOT IN "
            "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000) "
            "GROUP BY p_brand, p_type, p_size"
        ),
        "tpch_q20": (
            "WITH li96 AS (SELECT l_partkey, l_suppkey, l_quantity FROM lineitem "
            "WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(l_shipdate AS DATE) < DATE '1997-01-01' "
            "AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')), "
            "per_ps AS (SELECT l_partkey, l_suppkey, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS qty "
            "FROM li96 GROUP BY l_partkey, l_suppkey), "
            "per_part AS (SELECT l_partkey, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) * 0.3 AS thresh "
            "FROM li96 GROUP BY l_partkey) "
            "SELECT s_suppkey, s_name FROM supplier "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE n_name = 'NATION_2' AND s_suppkey IN ("
            "SELECT DISTINCT per_ps.l_suppkey FROM per_ps "
            "JOIN per_part ON per_ps.l_partkey = per_part.l_partkey "
            "WHERE qty > thresh)"
        ),
        "tpch_q21": (
            "SELECT s_name, count(*) AS numwait "
            "FROM lineitem l1 "
            "JOIN supplier ON l1.l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "WHERE l1.l_returnflag = 'R' AND n_name = 'NATION_1' "
            "AND l1.l_orderkey IN "
            "(SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') "
            "AND EXISTS (SELECT 1 FROM lineitem l2 "
            "WHERE l2.l_orderkey = l1.l_orderkey "
            "AND l2.l_suppkey <> l1.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM lineitem l3 "
            "WHERE l3.l_orderkey = l1.l_orderkey "
            "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') "
            "GROUP BY s_name "
            "ORDER BY numwait DESC, s_name ASC LIMIT 100"
        ),
        "customers_without_orders": (
            "SELECT c_mktsegment, count(*) AS n_customers FROM customer c "
            "WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
            "AND CAST(o.o_orderdate AS DATE) >= DATE '1997-07-01') "
            "GROUP BY c_mktsegment"
        ),
        "orders_topn_per_cust": (
            "SELECT o_custkey, o_orderkey, o_totalprice, rn FROM ("
            "SELECT o_custkey, o_orderkey, o_totalprice, "
            "CAST(row_number() OVER (PARTITION BY o_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn "
            "FROM orders WHERE o_custkey <= 50) WHERE rn <= 3"
        ),
        "events_daily": (
            "SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value, "
            + _pr("CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)") + " AS avg_value "
            "FROM events GROUP BY CAST(ts AS DATE), event_type"
        ),
        "events_sessions": (
            # both sides work on integer microseconds (Spark:
            # unix_micros, DuckDB: epoch_us)
            "SELECT user_id, session_idx, count(*) AS n_events, "
            "min(tsu) AS start_ts, max(tsu) AS end_ts, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
            "FROM ("
            "SELECT user_id, tsu, value, "
            "CAST(SUM(CASE WHEN prev_ts IS NULL "
            "OR tsu - prev_ts > 1800000000 THEN 1 ELSE 0 END) "
            "OVER (PARTITION BY user_id ORDER BY tsu, event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
            "AS session_idx "
            "FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu, value, "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_ts "
            "FROM events)"
            ") GROUP BY user_id, session_idx"
        ),
        "events_asof": (
            # native ASOF LEFT JOIN: for each purchase, the most recent
            # at-or-before click of the same user; gaps in integer µs
            "WITH p AS (SELECT user_id, epoch_us(ts) AS tsu FROM events "
            "WHERE event_type = 'purchase'), "
            "c AS (SELECT user_id, epoch_us(ts) AS tsu FROM events "
            "WHERE event_type = 'click') "
            "SELECT p.user_id AS user_id, count(*) AS n_purchases, "
            "count(c.tsu) AS n_matched, "
            "CAST(sum(p.tsu - c.tsu) AS BIGINT) AS sum_gap_us "
            "FROM p ASOF LEFT JOIN c "
            "ON p.user_id = c.user_id AND p.tsu >= c.tsu "
            "GROUP BY p.user_id"
        ),
        "events_range_join": (
            "SELECT e.user_id AS user_id, count(*) AS n_pairs, "
            "count(DISTINCT e.event_id) AS n_errors, "
            "CAST(SUM(CAST(c.value AS DECIMAL(38,4))) AS DOUBLE) AS click_value "
            "FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu "
            "FROM events WHERE event_type = 'error') e "
            "JOIN (SELECT user_id, epoch_us(ts) AS tsu, value "
            "FROM events WHERE event_type = 'click') c "
            "ON e.user_id = c.user_id AND c.tsu > e.tsu "
            "AND c.tsu <= e.tsu + 86400000000 "
            "GROUP BY e.user_id"
        ),
        "events_rollup": (
            "SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
            "FROM events GROUP BY ROLLUP(event_type, CAST(ts AS DATE))"
        ),
        "tpch_q10": (
            "SELECT c_custkey, c_name, c_acctbal, n_name, "
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "JOIN nation ON c_nationkey = n_nationkey "
            "WHERE l_returnflag = 'R' "
            "AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01' "
            "AND CAST(o_orderdate AS DATE) < DATE '1996-04-01' "
            "GROUP BY c_custkey, c_name, c_acctbal, n_name "
            "ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
        ),
        "tpch_q18": (
            "SELECT c_name, c_custkey, o_orderkey, "
            "CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, total_qty "
            "FROM orders "
            "JOIN (SELECT l_orderkey, "
            "CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty "
            "FROM lineitem GROUP BY l_orderkey "
            "HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) > 200) big "
            "ON o_orderkey = big.l_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100"
        ),
        "tpch_q22": (
            "SELECT CAST(c_nationkey AS BIGINT) AS nationkey, "
            "count(*) AS numcust, "
            "CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal "
            "FROM customer "
            "WHERE c_acctbal > ("
            "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / count(*) "
            "FROM customer WHERE c_acctbal > 0) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01') "
            "GROUP BY CAST(c_nationkey AS BIGINT)"
        ),
        "events_window_funcs": (
            "SELECT user_id, event_id, value, "
            "value - lag(value) OVER w AS delta_prev, "
            + _pr(
                "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w3 AS DOUBLE)"
                " / COUNT(*) OVER w3"
            )
            + " AS move_avg3, "
            "CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER wrun AS DOUBLE) AS running_sum "
            "FROM events WHERE user_id % 53 = 7 "
            "WINDOW w AS (PARTITION BY user_id ORDER BY event_id), "
            "w3 AS (PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), "
            "wrun AS (PARTITION BY user_id ORDER BY event_id "
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
        ),
        "events_cube": (
            "SELECT event_type, CAST(user_id % 10 AS BIGINT) AS user_shard, "
            "count(*) AS n FROM events "
            "GROUP BY CUBE(event_type, CAST(user_id % 10 AS BIGINT))"
        ),
        "events_quantiles": (
            "SELECT event_type, "
            + _pr("quantile_cont(value, 0.5)") + " AS p50, "
            + _pr("quantile_cont(value, 0.95)") + " AS p95 "
            "FROM events GROUP BY event_type"
        ),
        "events_distinct_users": (
            "SELECT event_type, count(DISTINCT user_id) AS distinct_count "
            "FROM events GROUP BY event_type"
        ),
        "stream_events_daily": (
            "SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n "
            "FROM events GROUP BY CAST(ts AS DATE), event_type"
        ),
        # stacked per-user window minima: stage k binds to the
        # earliest qualifying event strictly after stage k-1's
        "events_funnel": (
            "WITH e AS (SELECT user_id, epoch_us(ts) AS tsu, event_type "
            "FROM events), "
            "a AS (SELECT *, min(CASE WHEN event_type = 'view' THEN tsu END) "
            "OVER (PARTITION BY user_id) AS t0 FROM e), "
            "b AS (SELECT *, min(CASE WHEN event_type = 'click' AND tsu > t0 "
            "THEN tsu END) OVER (PARTITION BY user_id) AS t1 FROM a), "
            "c AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND tsu > t1 "
            "THEN tsu END) OVER (PARTITION BY user_id) AS t2 FROM b) "
            "SELECT user_id, CAST(CASE WHEN min(t2) IS NOT NULL THEN 3 "
            "WHEN min(t1) IS NOT NULL THEN 2 "
            "WHEN min(t0) IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage, "
            "min(t0) AS view_ts, min(t1) AS click_ts, min(t2) AS purchase_ts "
            "FROM c GROUP BY user_id"
        ),
        "stream_events_sessions": (
            # gap-based sessionization; >= breaks a session, matching
            # session_window's strict before-last+gap containment;
            # session_end = last event + gap
            "SELECT user_id, min(tsu) AS start_us, "
            "max(tsu) + 1800000000 AS end_us, count(*) AS n_events "
            "FROM ("
            "SELECT user_id, tsu, "
            "SUM(CASE WHEN prev IS NULL OR tsu - prev >= 1800000000 "
            "THEN 1 ELSE 0 END) OVER (PARTITION BY user_id "
            "ORDER BY tsu, event_id ROWS UNBOUNDED PRECEDING) AS sid "
            "FROM (SELECT user_id, event_id, epoch_us(ts) AS tsu, "
            "lag(epoch_us(ts)) OVER (PARTITION BY user_id "
            "ORDER BY epoch_us(ts), event_id) AS prev FROM events)"
            ") GROUP BY user_id, sid"
        ),
        "events_anomaly": (
            "WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day, "
            "count(*) AS n FROM events GROUP BY event_type, CAST(ts AS DATE)), "
            "t AS (SELECT event_type, day, n, "
            "count(*) OVER w AS c, "
            "CAST(sum(n) OVER w AS DOUBLE) / count(*) OVER w AS m, "
            "CAST(sum(n * n) OVER w AS DOUBLE) / count(*) OVER w AS m2 "
            "FROM daily WINDOW w AS (PARTITION BY event_type ORDER BY day "
            "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) "
            "SELECT event_type, day, n, "
            "CASE WHEN c >= 3 THEN " + _pr("m") + " END AS trail_mean, "
            "CASE WHEN c >= 3 THEN "
            + _pr("sqrt(greatest(m2 - m * m, 0.0))")
            + " END AS trail_sigma, "
            "COALESCE(CASE WHEN c >= 3 THEN "
            "CAST(n AS DOUBLE) > m + 2.0 * sqrt(greatest(m2 - m * m, 0.0)) "
            "END, FALSE) AS is_anomaly FROM t"
        ),
        "orders_constraints": (
            "WITH t AS (SELECT count(*) AS total FROM orders) "
            "SELECT rule, col AS \"column\", violations, total, "
            "violations = 0 AS ok FROM ("
            "SELECT 'not_null' AS rule, 'o_custkey' AS col, "
            "CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT) "
            "AS violations, total FROM t "
            "UNION ALL SELECT 'unique', 'o_orderkey', "
            "CAST((SELECT count(o_orderkey) - count(DISTINCT o_orderkey) + "
            "greatest(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) - 1, 0) "
            "FROM orders) AS BIGINT), total FROM t "
            "UNION ALL SELECT 'in_range', 'o_totalprice', "
            "CAST((SELECT count(*) FROM orders WHERE o_totalprice < 0.0 "
            "OR o_totalprice > 1000000000.0) AS BIGINT), total FROM t "
            "UNION ALL SELECT 'in_set', 'o_orderstatus', "
            "CAST((SELECT count(*) FROM orders WHERE o_orderstatus IS NOT NULL "
            "AND o_orderstatus NOT IN ('O','F','P')) AS BIGINT), total FROM t "
            "UNION ALL SELECT 'foreign_key', 'o_custkey', "
            "CAST((SELECT count(*) FROM orders o WHERE o.o_custkey IS NOT NULL "
            "AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT), "
            "total FROM t)"
        ),
        "customers_rfm": (
            "WITH mx AS (SELECT CAST(MAX(o_orderdate) AS DATE) AS maxd FROM orders), "
            "pc AS (SELECT o_custkey, "
            "CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), maxd)) AS BIGINT) AS recency_days, "
            "count(*) AS frequency, "
            "CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS monetary "
            "FROM orders CROSS JOIN mx GROUP BY o_custkey) "
            "SELECT o_custkey AS custkey, recency_days, frequency, monetary, "
            "CASE WHEN recency_days <= 30 AND frequency >= 10 THEN 'champion' "
            "WHEN recency_days <= 30 THEN 'recent' "
            "WHEN frequency >= 10 THEN 'loyal' "
            "ELSE 'at_risk' END AS segment FROM pc"
        ),
        "events_pivot": (
            "SELECT CAST(ts AS DATE) AS day, "
            + ", ".join(
                f"CAST(sum(CASE WHEN event_type = '{c}' THEN 1 ELSE 0 END) "
                f"AS BIGINT) AS {c}"
                for c in ["click", "error", "purchase", "signup", "view"]
            )
            + " FROM events GROUP BY CAST(ts AS DATE)"
        ),
        "stream_events_enriched": (
            "SELECT CAST(c.c_nationkey AS BIGINT) AS c_nationkey, "
            "count(*) AS n_events FROM events e "
            "JOIN customer c ON e.user_id = c.c_custkey "
            "GROUP BY c.c_nationkey"
        ),
        # dense-grid resample: integer µs bucket arithmetic, per-key
        # spine via range(), exact DECIMAL sums, SQL-standard
        # last_value IGNORE NULLS forward fill
        "events_resample": (
            "WITH ev AS (SELECT event_type AS key, epoch_us(ts) AS us, value "
            "FROM events WHERE value >= 150.0), "
            "agg AS (SELECT key, "
            "CAST(floor(us / 21600000000) * 21600000000 AS BIGINT) AS b, "
            "CAST(count(*) AS BIGINT) AS n_events, "
            "CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value "
            "FROM ev GROUP BY 1, 2), "
            "spine AS (SELECT key, unnest(range(lo, hi + 1, 21600000000)) AS b "
            "FROM (SELECT key, min(b) AS lo, max(b) AS hi FROM agg GROUP BY key)), "
            "dense AS (SELECT s.key, s.b, COALESCE(a.n_events, 0) AS n_events, "
            "a.sum_value FROM spine s LEFT JOIN agg a ON s.key = a.key AND s.b = a.b) "
            "SELECT key AS event_type, make_timestamp(b) AS bucket_start, "
            "n_events, sum_value, "
            "last_value(sum_value IGNORE NULLS) OVER (PARTITION BY key "
            "ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) "
            "AS sum_value_ffill FROM dense"
        ),
        # heavy-hitter diagnostic: counts are exact integers, shares
        # are double(n)/double(total) — identical IEEE trees both
        # engines; ties rank by key so top-20 is deterministic
        "events_skew_report": (
            "SELECT user_id, n, "
            + _pr("CAST(n AS DOUBLE) / (SELECT CAST(count(*) AS DOUBLE) FROM events)")
            + " AS share, rank FROM ("
            "SELECT user_id, CAST(count(*) AS BIGINT) AS n, "
            "CAST(row_number() OVER (ORDER BY count(*) DESC, user_id ASC) AS INT) "
            "AS rank FROM events GROUP BY user_id) WHERE rank <= 20"
        ),
        "events_json": (
            "SELECT event_type, "
            "CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
            "COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_with_k "
            "FROM events GROUP BY event_type"
        ),
        "dedup_exact": (
            "SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_count "
            "FROM documents GROUP BY text"
        ),
        "dedup_jaccard": (
            f"WITH {_CAPPED_SHINGLE_CTES}, "
            "sz AS (SELECT doc_id, count(*) AS n FROM s GROUP BY doc_id), "
            "inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c "
            "FROM s a JOIN s b ON a.sh = b.sh AND a.doc_id < b.doc_id "
            "GROUP BY a.doc_id, b.doc_id) "
            "SELECT id_a, id_b, " + _pr("c / (x.n + y.n - c)") + " AS jaccard "
            "FROM inter JOIN sz x ON x.doc_id = id_a JOIN sz y ON y.doc_id = id_b "
            "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2"
        ),
        # cross-corpus near-dup join: SAME capped shingle universe
        # (the cap resolves over the combined corpora = documents),
        # split into the even/odd halves after the stop filter
        "dedup_cross_corpus": (
            f"WITH {_CAPPED_SHINGLE_CTES}, "
            "l AS (SELECT * FROM s WHERE doc_id % 2 = 0), "
            "r AS (SELECT * FROM s WHERE doc_id % 2 = 1), "
            "szl AS (SELECT doc_id, count(*) AS n FROM l GROUP BY doc_id), "
            "szr AS (SELECT doc_id, count(*) AS n FROM r GROUP BY doc_id), "
            "inter AS (SELECT l.doc_id AS left_id, r.doc_id AS right_id, "
            "count(*) AS c FROM l JOIN r ON l.sh = r.sh GROUP BY 1, 2) "
            "SELECT left_id, right_id, " + _pr("c / (x.n + y.n - c)")
            + " AS jaccard FROM inter "
            "JOIN szl x ON x.doc_id = left_id JOIN szr y ON y.doc_id = right_id "
            "WHERE " + _pr("c / (x.n + y.n - c)") + " >= 0.2"
        ),
        "dedup_spans": (_DUP_SPAN_CTES + " "
            "SELECT doc_id, CAST(MIN(pos) AS INT) AS span_start, "
            "CAST(MAX(pos) + 7 AS INT) AS span_end, "
            "CAST(MAX(pos) + 7 - MIN(pos) + 1 AS INT) AS n_tokens "
            "FROM isl GROUP BY doc_id, i"
        ),
        "dedup_span_stats": (_DUP_SPAN_CTES + ", "
            "spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 7 AS e "
            "FROM isl GROUP BY doc_id, i), "
            "per_doc AS (SELECT doc_id, SUM(e - s + 1) AS dup_tokens "
            "FROM spans GROUP BY doc_id), "
            f"totals AS (SELECT doc_id, COALESCE(len({_WORDS}), 0) AS n_tokens "
            "FROM documents) "
            "SELECT t.doc_id, CAST(t.n_tokens AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens, "
            + _pr(
                "CASE WHEN t.n_tokens > 0 THEN "
                "COALESCE(p.dup_tokens, 0) / CAST(t.n_tokens AS DOUBLE) "
                "ELSE 0.0 END"
            )
            + " AS dup_fraction "
            "FROM totals t LEFT JOIN per_doc p ON t.doc_id = p.doc_id"
        ),
        "dedup_span_cut": (_cut_span_ctes(_CUT_HIT_FIRST_DOC) + " "
            + _CUT_SPAN_SELECT
        ),
        "dedup_span_cut_all": (
            _cut_span_ctes(_CUT_HIT_FIRST_OCCURRENCE) + " " + _CUT_SPAN_SELECT
        ),
        # span decontamination: corpus = the >=5% hash-sample rest,
        # hit rule = trigram occurs anywhere in the eval split
        "decontaminate_spans": (
            "WITH tk AS (SELECT doc_id, "
            f"COALESCE({_WORDS}, []) AS ws FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc'), "
            "ev AS (SELECT DISTINCT array_to_string(toks[i:i+2], ' ') AS gr "
            "FROM (SELECT toks, "
            "unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS i "
            f"FROM (SELECT {_WORDS} AS toks FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc')))"
            ", g AS (SELECT doc_id, CAST(i AS INT) AS pos, "
            "array_to_string(ws[i:i+2], ' ') AS gr "
            "FROM (SELECT doc_id, ws, "
            "unnest(range(1, greatest(len(ws) - 2, 0) + 1)) AS i FROM tk)), "
            "h AS (SELECT doc_id, pos FROM g JOIN ev USING (gr)), "
            "flg AS (SELECT doc_id, pos, "
            "CASE WHEN lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) IS NULL "
            "OR pos > lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) + 3 "
            "THEN 1 ELSE 0 END AS flag FROM h), "
            "isl AS (SELECT doc_id, pos, SUM(flag) OVER ("
            "PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS i "
            "FROM flg), "
            "spans AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) + 2 AS e "
            "FROM isl GROUP BY doc_id, i), "
            "pos_tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS p, ws "
            "FROM tk), "
            "kept AS (SELECT t.doc_id, t.p, t.ws[t.p] AS tok FROM pos_tok t "
            "WHERE NOT EXISTS (SELECT 1 FROM spans s "
            "WHERE s.doc_id = t.doc_id AND t.p BETWEEN s.s AND s.e)) "
            + _CUT_SPAN_SELECT
        ),
        "docs_kcore": _kcore_sql(),
        "dedup_clusters": (
            "WITH RECURSIVE " + _CLUSTER_CTES + " "
            "SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node"
        ),
        "corpus_curation": (
            "WITH RECURSIVE " + _CLUSTER_CTES + ", "
            "clusters AS (SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node), "
            "quality AS (" + _quality_sql() + ") "
            "SELECT q.doc_id, q.quality, c.cluster_id, "
            "(q.quality >= 0.5 AND q.doc_id = c.cluster_id) AS keep "
            "FROM quality q JOIN clusters c ON q.doc_id = c.doc_id"
        ),
        "dedup_embedding": (
            # mirrors embedding_dedup_pairs_ivf: nearest-cell assignment
            # (seeded centroids = 16 lowest-id vectors, rounded-cosine
            # rank with cent_id tiebreak — the same CTE as ann_ivf),
            # then within-cell pairs only
            "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
            "FROM embeddings ORDER BY vec_id LIMIT 16), "
            "cell AS (SELECT id, cent_id, v FROM ("
            "SELECT e.vec_id AS id, c.cent_id, e.embedding AS v, "
            "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            + _pr(_cosine_sql("e.embedding", "c.cent"))
            + " DESC, c.cent_id ASC) AS cr "
            "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1) "
            "SELECT a.id AS id_a, b.id AS id_b, "
            + _pr(_cosine_sql("a.v", "b.v")) + " AS cosine "
            "FROM cell a JOIN cell b ON a.cent_id = b.cent_id AND a.id < b.id "
            "WHERE " + _pr(_cosine_sql("a.v", "b.v")) + " >= 0.45"
        ),
        "ann_topk": (
            "SELECT query_id, neighbor_id, cosine, rank FROM ("
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            + _pr(_cosine_sql("q.embedding", "c.embedding")) + " AS cosine, "
            "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            + _pr(_cosine_sql("q.embedding", "c.embedding")) + " DESC, c.vec_id ASC) AS INT) AS rank "
            "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
            "JOIN embeddings c ON q.vec_id <> c.vec_id"
            ") WHERE rank <= 5"
        ),
        # int8 scalar quantization re-derived per vector: the same
        # max|x|/127 scale and half-up-floor codes, summarized as
        # exact integer stats (codes match bit-for-bit or every sum,
        # min, max drifts)
        "embeddings_quantize_int8": (
            "SELECT vec_id, "
            + _pr("ma / 127.0", 9)
            + " AS scale, "
            "CAST(COALESCE(list_sum(codes), 0) AS BIGINT) AS code_sum, "
            "CAST(COALESCE(list_sum(list_transform(codes, x -> abs(x))), 0) "
            "AS BIGINT) AS code_abs_sum, "
            "CAST(list_min(codes) AS INT) AS code_min, "
            "CAST(list_max(codes) AS INT) AS code_max, "
            "CAST(len(codes) AS INT) AS n_codes FROM ("
            "SELECT vec_id, ma, CASE WHEN ma > 0 THEN "
            "list_transform(xd, x -> CAST(floor(x / (ma / 127.0) + 0.5) AS INT)) "
            "ELSE list_transform(xd, x -> 0) END AS codes FROM ("
            "SELECT vec_id, xd, "
            "list_max(list_transform(xd, x -> abs(x))) AS ma FROM ("
            "SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS xd FROM embeddings)))"
        ),
        # quantized-cosine top-k: scales cancel, so the score is the
        # integer code dot over the product of integer code norms —
        # the one similarity surface that is exact by construction
        "ann_topk_int8": (
            "WITH qz AS (SELECT vec_id, codes, "
            "sqrt(CAST(list_sum(list_transform(codes, x -> x * x)) AS DOUBLE)) "
            "AS nrm FROM ("
            "SELECT vec_id, CASE WHEN ma > 0 THEN "
            "list_transform(xd, x -> CAST(floor(x / (ma / 127.0) + 0.5) AS INT)) "
            "ELSE list_transform(xd, x -> 0) END AS codes FROM ("
            "SELECT vec_id, xd, "
            "list_max(list_transform(xd, x -> abs(x))) AS ma FROM ("
            "SELECT vec_id, list_transform(embedding, "
            "x -> CAST(x AS DOUBLE)) AS xd FROM embeddings)))) "
            "SELECT query_id, neighbor_id, qcosine, rank FROM ("
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            + _pr(
                "CAST(list_sum(list_transform(range(1, len(q.codes) + 1), "
                "i -> q.codes[i] * c.codes[i])) AS DOUBLE) / (q.nrm * c.nrm)"
            )
            + " AS qcosine, "
            "CAST(row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            + _pr(
                "CAST(list_sum(list_transform(range(1, len(q.codes) + 1), "
                "i -> q.codes[i] * c.codes[i])) AS DOUBLE) / (q.nrm * c.nrm)"
            )
            + " DESC, c.vec_id ASC) AS INT) AS rank "
            "FROM (SELECT * FROM qz WHERE vec_id < 5 AND nrm > 0) q "
            "JOIN (SELECT * FROM qz WHERE nrm > 0) c "
            "ON q.vec_id <> c.vec_id) WHERE rank <= 5"
        ),
        "ann_range": (
            "SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, "
            + _pr(_cosine_sql("q.embedding", "c.embedding")) + " AS cosine "
            "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
            "JOIN embeddings c ON q.vec_id <> c.vec_id "
            "WHERE " + _pr(_cosine_sql("q.embedding", "c.embedding")) + " >= 0.25"
        ),
        "ann_ivf": (
            "WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent "
            "FROM embeddings ORDER BY vec_id LIMIT 16), "
            "cell AS (SELECT neighbor_id, cent_id, cv FROM ("
            "SELECT e.vec_id AS neighbor_id, c.cent_id, e.embedding AS cv, "
            "row_number() OVER (PARTITION BY e.vec_id ORDER BY "
            + _pr(_cosine_sql("e.embedding", "c.cent"))
            + " DESC, c.cent_id ASC) AS cr "
            "FROM embeddings e CROSS JOIN cents c) WHERE cr = 1), "
            "probe AS (SELECT query_id, cent_id, qv FROM ("
            "SELECT q.vec_id AS query_id, c.cent_id, q.embedding AS qv, "
            "row_number() OVER (PARTITION BY q.vec_id ORDER BY "
            + _pr(_cosine_sql("q.embedding", "c.cent"))
            + " DESC, c.cent_id ASC) AS cr "
            "FROM (SELECT * FROM embeddings WHERE vec_id < 5) q "
            "CROSS JOIN cents c) WHERE cr <= 4) "
            "SELECT query_id, neighbor_id, cosine, rank FROM ("
            "SELECT p.query_id, l.neighbor_id, "
            + _pr(_cosine_sql("p.qv", "l.cv"))
            + " AS cosine, "
            "CAST(row_number() OVER (PARTITION BY p.query_id ORDER BY "
            + _pr(_cosine_sql("p.qv", "l.cv"))
            + " DESC, l.neighbor_id ASC) AS INT) AS rank "
            "FROM probe p JOIN cell l ON p.cent_id = l.cent_id "
            "WHERE p.query_id <> l.neighbor_id) WHERE rank <= 5"
        ),
        # vocabulary cut by (count desc, token asc); per-source OOV
        # mass anchored on the distinct source set; rate = one IEEE
        # division of exact integers (NULL when a source has no
        # tokens), pround'd like the Spark tree
        "text_simpson": (
            f"WITH toks AS (SELECT doc_id, unnest({_WORDS}) AS token "
            "FROM documents), "
            "pt AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n "
            "FROM toks GROUP BY doc_id, token), "
            "pd AS (SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_tokens, "
            "CAST(count(*) AS BIGINT) AS n_distinct, "
            "CAST(SUM(n * n) AS BIGINT) AS sumsq FROM pt GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CAST(COALESCE(pd.n_tokens, 0) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(pd.n_distinct, 0) AS BIGINT) AS n_distinct, "
            "CASE WHEN COALESCE(pd.n_tokens, 0) > 0 THEN "
            + _pr("pd.sumsq / (pd.n_tokens * pd.n_tokens)")
            + " ELSE NULL END AS simpson "
            "FROM documents d LEFT JOIN pd ON pd.doc_id = d.doc_id"
        ),
        "text_vocab_oov": (
            f"WITH toks AS (SELECT source, unnest({_WORDS}) AS token "
            "FROM documents), "
            "vocab AS (SELECT token FROM (SELECT token, count(*) AS tot "
            "FROM toks GROUP BY token ORDER BY tot DESC, token ASC "
            "LIMIT 16)), "
            "flagged AS (SELECT t.source, t.token, "
            "v.token IS NOT NULL AS inv FROM toks t "
            "LEFT JOIN vocab v ON v.token = t.token), "
            "per AS (SELECT source, CAST(count(*) AS BIGINT) AS n_tokens, "
            "CAST(sum(CASE WHEN inv THEN 0 ELSE 1 END) AS BIGINT) AS n_oov, "
            "CAST(count(DISTINCT CASE WHEN inv THEN NULL ELSE token END) "
            "AS BIGINT) AS n_distinct_oov FROM flagged GROUP BY source), "
            "grps AS (SELECT DISTINCT source FROM documents) "
            "SELECT g.source, "
            "CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens, "
            "CAST(COALESCE(p.n_oov, 0) AS BIGINT) AS n_oov, "
            "CAST(COALESCE(p.n_distinct_oov, 0) AS BIGINT) AS n_distinct_oov, "
            "CASE WHEN COALESCE(p.n_tokens, 0) > 0 THEN "
            + _pr("p.n_oov / p.n_tokens")
            + " ELSE NULL END AS oov_rate "
            "FROM grps g LEFT JOIN per p ON p.source = g.source"
        ),
        "text_topterms": (
            "SELECT token, doc_freq, total_count FROM ("
            "SELECT token, count(*) AS doc_freq, "
            "CAST(sum(n) AS BIGINT) AS total_count FROM ("
            f"SELECT doc_id, tok AS token, count(*) AS n FROM "
            f"(SELECT doc_id, unnest({_WORDS}) AS tok FROM documents) "
            "GROUP BY doc_id, tok"
            ") GROUP BY token) ORDER BY doc_freq DESC, token ASC LIMIT 50"
        ),
        "search_bm25": _bm25_sql(),
        "search_tfidf": _tfidf_sql(),
        "dedup_incremental": (
            # NULL-safe joins (IS NOT DISTINCT FROM) mirror
            # incremental_exact_dedup's sentinel hash: a NULL-text doc
            # must still classify, not drop out of the equi-join.
            "WITH newd AS (SELECT doc_id AS id, text FROM documents "
            "WHERE doc_id % 2 = 1), "
            "ex AS (SELECT DISTINCT text FROM documents WHERE doc_id % 2 = 0), "
            "first AS (SELECT text, MIN(id) AS first_id FROM newd GROUP BY text) "
            "SELECT n.id AS doc_id, "
            "CASE WHEN EXISTS (SELECT 1 FROM ex "
            "WHERE ex.text IS NOT DISTINCT FROM n.text) THEN 'dup_of_existing' "
            "WHEN n.id <> f.first_id THEN 'dup_in_batch' "
            "ELSE 'new' END AS status "
            "FROM newd n JOIN first f ON n.text IS NOT DISTINCT FROM f.text"
        ),
        # the SCD2 expected history in closed form: untouched-open /
        # closed-at-v2 / re-opened / inserted, from the same arithmetic
        "docs_scd2": (
            "SELECT doc_id, source, n_chars, 1 AS valid_from, "
            "CAST(NULL AS INTEGER) AS valid_to FROM documents "
            "WHERE doc_id % 13 = 0 OR doc_id % 7 <> 0 "
            "UNION ALL "
            "SELECT doc_id, source, n_chars, 1, 2 FROM documents "
            "WHERE doc_id % 13 <> 0 AND doc_id % 7 = 0 "
            "UNION ALL "
            "SELECT doc_id, source, n_chars + 1, 2, NULL FROM documents "
            "WHERE doc_id % 13 <> 0 AND doc_id % 7 = 0 "
            "UNION ALL "
            "SELECT doc_id + 1000000, source, n_chars, 2, NULL "
            "FROM documents WHERE doc_id % 11 = 0"
        ),
        "orders_diff": (
            "SELECT o_orderkey, 'removed' AS status FROM orders "
            "WHERE o_orderkey % 97 = 0 "
            "UNION ALL "
            "SELECT o_orderkey, 'changed' AS status FROM orders "
            "WHERE o_orderkey % 97 <> 0 AND o_orderkey % 89 = 0 "
            "UNION ALL "
            "SELECT o_orderkey + 10000000 AS o_orderkey, 'added' AS status "
            "FROM orders WHERE o_orderkey % 101 = 0"
        ),
        "text_quality_rules": _quality_rules_sql(),
        "events_cohorts": (
            "WITH weekly AS (SELECT DISTINCT user_id AS u, "
            "CAST(date_trunc('week', ts) AS DATE) AS wk FROM events), "
            "first AS (SELECT u, MIN(wk) AS cohort_week FROM weekly GROUP BY u) "
            "SELECT w.cohort_week, CAST((x.wk - w.cohort_week) / 7 AS INT) "
            "AS week_offset, count(*) AS n_users "
            "FROM weekly x JOIN first w ON x.u = w.u "
            "GROUP BY w.cohort_week, CAST((x.wk - w.cohort_week) / 7 AS INT)"
        ),
        "pack_sequences_grouped": (
            f"WITH toks AS (SELECT doc_id, source, len({_WORDS}) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, source, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM toks WHERE n_tokens > 0) "
            "SELECT source, doc_id, n_tokens, "
            "(cum - n_tokens) // 256 AS pack_first, "
            "(cum - 1) // 256 AS pack_last, "
            "(cum - n_tokens) % 256 AS offset_in_first FROM c"
        ),
        "sample_token_budget": (
            f"WITH toks AS (SELECT doc_id, source, len({_WORDS}) AS n_tokens "
            "FROM documents), "
            "c AS (SELECT doc_id, source, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens FROM toks) "
            "SELECT doc_id, source, n_tokens, cum_tokens FROM c "
            "WHERE cum_tokens - n_tokens < 1500"
        ),
        # the lossless join's oracle is the NAIVE QUADRATIC TRUTH —
        # any blocking false negative hash-mismatches
        "edit_pairs_part_names": (
            "SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, "
            "CAST(levenshtein(a.p_name, b.p_name) AS INT) AS dist "
            "FROM part a JOIN part b ON a.p_partkey < b.p_partkey "
            "AND abs(length(a.p_name) - length(b.p_name)) <= 1 "
            "AND levenshtein(a.p_name, b.p_name) <= 1"
        ),
        "fuzzy_part_names": (
            "WITH p AS (SELECT p_partkey, p_name, "
            "lower(substr(p_name, 1, 1)) AS c, "
            "CAST(length(p_name) // 4 AS BIGINT) AS b FROM part) "
            "SELECT a.p_partkey AS id_a, x.p_partkey AS id_b, "
            "CAST(levenshtein(a.p_name, x.p_name) AS INT) AS dist "
            "FROM p a JOIN p x ON a.c = x.c AND a.b = x.b "
            "AND a.p_partkey < x.p_partkey "
            "AND levenshtein(a.p_name, x.p_name) <= 2"
        ),
        "text_stats": (
            f"SELECT doc_id, length(text) AS n_chars, len({_WORDS}) AS n_tokens, "
            + _pr(
                "CASE WHEN len(" + _WORDS + ") > 0 THEN "
                "CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / len(" + _WORDS + ") "
                "ELSE 0.0 END",
                4,
            ) + " AS avg_token_len, "
            "length(text) - length(regexp_replace(text, '[.,;:!?''\"()\\[\\]{}-]', '', 'g')) AS n_punct, "
            "length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits, "
            f"len(list_distinct({_WORDS})) AS n_distinct_tokens "
            "FROM documents"
        ),
        "text_quality": _quality_sql(),
        "docs_pagerank": _pagerank_sql(),
        "embeddings_kmeans": _kmeans_sql(),
        "decontaminate_semantic": _decon_sem_sql(),
        "dedup_semantic_pairs": _semdedup_sql("pairs"),
        "dedup_semantic": _semdedup_sql("prune"),
        "dedup_semantic_incremental": _semdedup_incr_sql(),
        "embeddings_contrastive": _contrastive_sql(),
        "ann_pq_codes": _pq_sql("codes"),
        "ann_pq_distortion": (
            f'WITH enc AS ({_pq_sql("codes")}) '
            "SELECT sub, CAST(count(*) AS BIGINT) AS n, "
            + _pr("CAST(SUM(CAST(dist2 AS DECIMAL(38,12))) AS DOUBLE) / count(*)")
            + " AS mean_dist2, max(dist2) AS max_dist2 "
            "FROM enc GROUP BY sub"
        ),
        "ann_pq_topk": _pq_sql("topk"),
        "ann_ivf_pq": _ivfpq_sql(),
        "ann_ivf_pq_indexed": _ivfpq_sql(),
        "docs_hash_embed": (
            "WITH " + ", ".join(_hashembed_ctes())
            + " SELECT doc_id, CAST(pos AS INT) AS pos, val FROM hemb"
        ),
        "docs_semantic_dedup": _semdedup_sql(
            "prune", k=32, iters=1, threshold=0.88,
            src="hvec", id_name="doc_id", pre_ctes=_hashembed_ctes(),
        ),
        # bounds/width recomputed in-engine: min/max of doubles are the
        # exact same IEEE values Spark's driver aggregation found, and
        # every downstream tree is single-op IEEE arithmetic
        "events_histogram": (
            "WITH b AS (SELECT min(CAST(value AS DOUBLE)) AS lo, "
            "max(CAST(value AS DOUBLE)) AS hi, "
            "(max(CAST(value AS DOUBLE)) - min(CAST(value AS DOUBLE))) "
            "/ CAST(20 AS DOUBLE) AS w FROM events), "
            "h AS (SELECT event_type, "
            "CAST(CASE WHEN b.w = 0.0 THEN 0 ELSE "
            "least(floor((CAST(value AS DOUBLE) - b.lo) / b.w), 19) END AS INT) "
            "AS bucket, count(*) AS n "
            "FROM events, b WHERE value IS NOT NULL "
            "AND CAST(value AS DOUBLE) >= b.lo AND CAST(value AS DOUBLE) <= b.hi "
            "GROUP BY event_type, bucket) "
            "SELECT event_type, bucket, "
            "b.lo + CAST(bucket AS DOUBLE) * b.w AS lo_edge, "
            "b.lo + (CAST(bucket AS DOUBLE) + 1.0) * b.w AS hi_edge, "
            "CAST(n AS BIGINT) AS n FROM h, b"
        ),
        "docs_triangles": ("WITH " + _TRIANGLE_CTES + " "
            "SELECT n.node AS doc_id, CAST(d.degree AS BIGINT) AS degree, "
            "CAST(COALESCE(c.triangles, 0) AS BIGINT) AS triangles, "
            + _pr(
                "CASE WHEN d.degree >= 2 THEN "
                "2.0 * COALESCE(c.triangles, 0) / "
                "(CAST(d.degree AS DOUBLE) * (CAST(d.degree AS DOUBLE) - 1.0)) "
                "ELSE 0.0 END"
            )
            + " AS clustering_coeff "
            "FROM nodes n JOIN deg d ON d.node = n.node "
            "LEFT JOIN corners c ON c.node = n.node"
        ),
        # the composition reuses the graded quality + pagerank CTEs;
        # prior is computed from the ROUNDED rank_norm in both engines
        "corpus_prior": (
            "WITH q AS (" + _quality_sql() + "), "
            "p AS (" + _pagerank_sql() + ") "
            "SELECT q.doc_id, q.quality, "
            + _pr("p.rank * CAST((SELECT count(*) FROM documents) AS DOUBLE)")
            + " AS rank_norm, "
            + _pr(
                "(q.quality + "
                + _pr("p.rank * CAST((SELECT count(*) FROM documents) AS DOUBLE)")
                + ") / 2.0"
            )
            + " AS prior FROM q JOIN p ON q.doc_id = p.doc_id"
        ),
        # rational PMI over adjacent-token bigrams: exact integer
        # counts into one IEEE ratio — identical tree both engines
        "text_collocations": (
            "WITH t AS (SELECT doc_id, "
            f"{_WORDS} AS toks FROM documents), "
            "u AS (SELECT unnest(toks) AS w FROM t), "
            "uc AS (SELECT w, count(*) AS c FROM u GROUP BY w), "
            "tot AS (SELECT CAST(count(*) AS DOUBLE) AS T FROM u), "
            "b AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM t, "
            "LATERAL (SELECT unnest(range(1, len(toks))) AS i)), "
            "bc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_pair "
            "FROM b GROUP BY w1, w2 HAVING count(*) >= 5), "
            "sc AS (SELECT w1, w2, c_pair, "
            + _pr(
                "(CAST(c_pair AS DOUBLE) * (SELECT T FROM tot)) / "
                "(CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE))"
            )
            + " AS score FROM bc JOIN uc u1 ON bc.w1 = u1.w "
            "JOIN uc u2 ON bc.w2 = u2.w) "
            "SELECT w1, w2, c_pair, score, rank FROM ("
            "SELECT *, CAST(row_number() OVER ("
            "ORDER BY score DESC, w1 ASC, w2 ASC) AS INT) AS rank FROM sc) "
            "WHERE rank <= 50"
        ),
        # percent_rank is SQL-standard in both engines (ties share a
        # rank); the quality input is the shared _quality_sql CTE
        "quality_pctile": (
            "WITH q AS (" + _quality_sql() + ") "
            "SELECT q.doc_id, d.source, q.quality, "
            "floor(percent_rank() OVER (PARTITION BY d.source "
            "ORDER BY q.quality) * 1000000 + 0.5) / 1000000 AS pctile "
            "FROM q JOIN documents d ON q.doc_id = d.doc_id"
        ),
        "text_langid": _langid_sql(),
        "text_langid_eval": (
            "WITH pred AS (" + _langid_sql() + ") "
            "SELECT d.lang, count(*) AS n, "
            "CAST(sum(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct, "
            + _pr(
                "CAST(sum(CASE WHEN p.pred_lang = d.lang THEN 1 ELSE 0 END) AS DOUBLE)"
                " / count(*)",
                4,
            )
            + " AS accuracy "
            "FROM documents d JOIN pred p ON d.doc_id = p.doc_id GROUP BY d.lang"
        ),
        "text_bpe_fertility": (
            _bpe_doc_tokens_cte()
            + ", per AS (SELECT d.source, "
            "CAST(COALESCE(length(d.text), 0) AS BIGINT) AS ch, "
            "CAST(COALESCE(len(t.toks), 0) AS BIGINT) AS nt, "
            "CAST(CASE WHEN d.text IS NULL THEN 0 ELSE "
            "len(list_filter(string_split_regex(trim(lower(d.text)), "
            "'\\s+'), x -> x <> '')) END AS BIGINT) AS nw "
            "FROM documents d LEFT JOIN doc_tokens t ON t.doc_id = d.doc_id) "
            "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
            "CAST(sum(ch) AS BIGINT) AS total_chars, "
            "CAST(sum(nt) AS BIGINT) AS total_tokens, "
            "CAST(sum(nw) AS BIGINT) AS total_words, "
            "CASE WHEN sum(nt) > 0 THEN "
            "(FLOOR((CAST(sum(ch) AS DOUBLE) / sum(nt)) * 1000000.0 + 0.5) "
            "/ 1000000.0) ELSE 0.0 END AS chars_per_token, "
            "CASE WHEN sum(nw) > 0 THEN "
            "(FLOOR((CAST(sum(nt) AS DOUBLE) / sum(nw)) * 1000000.0 + 0.5) "
            "/ 1000000.0) ELSE 0.0 END AS tokens_per_word "
            "FROM per GROUP BY source"
        ),
        "text_bpe_count": (
            "SELECT doc_id, len(regexp_extract_all(text, "
            "'[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens FROM documents"
        ),
        "text_fingerprint": (
            "SELECT doc_id, list_reduce("
            "list_prepend(CAST(0 AS BIGINT), "
            "list_transform(range(1, length(lower(text)) + 1), "
            "i -> CAST(unicode(lower(text)[i:i]) AS BIGINT))), "
            "(a, c) -> (a * 31 + c) % 1000000007) AS fingerprint "
            "FROM documents"
        ),
        "multimodal_meta": (
            "SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes, "
            "CAST(unicode(text[1:1]) AS BIGINT) AS first_cp FROM documents"
        ),
        # the fake blob wire format is arithmetic-deterministic:
        # 16-byte header + min(w*h*c, 4096) payload bytes
        "multimodal_image_meta": (
            "SELECT doc_id, 'fimg' AS format, "
            "CAST(n_chars % 512 + 16 AS INT) AS width, "
            "CAST(doc_id % 256 + 16 AS INT) AS height, "
            "CAST(3 AS INT) AS channels, "
            "CAST(16 + least((n_chars % 512 + 16) * (doc_id % 256 + 16) * 3, "
            "4096) AS BIGINT) AS n_bytes "
            "FROM documents"
        ),
        # REAL codec round-trips: the blob content is the closed form
        # pixel[i] = (doc_id*31+i) mod 256 / s[i] = ((doc_id*7+i*13)
        # mod 4096) - 2048, so the oracle recomputes the decoded
        # statistics arithmetically — Spark must encode AND decode the
        # real PNG/WAV bytes correctly to match.
        "multimodal_decode_png": (
            "SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
            "CAST(w * h AS BIGINT) AS n_pixels, "
            "CAST(list_sum(list_transform(range(0, w * h), "
            "i -> (doc_id * 31 + i) % 256)) AS BIGINT) AS px_sum, "
            "CAST(list_sum(list_transform(range(0, w * h), "
            "i -> ((doc_id * 31 + i) % 256) * (i + 1))) AS BIGINT) AS px_checksum "
            "FROM (SELECT doc_id, n_chars % 24 + 4 AS w, doc_id % 16 + 4 AS h "
            "FROM documents)"
        ),
        "multimodal_decode_jpeg": (
            "SELECT doc_id, CAST(n_chars % 24 + 8 AS INT) AS width, "
            "CAST(doc_id % 16 + 8 AS INT) AS height, "
            "CAST((n_chars % 24 + 8) * (doc_id % 16 + 8) AS BIGINT) AS n_pixels "
            "FROM documents"
        ),
        "multimodal_decode_wav": (
            "SELECT doc_id, CAST(rate AS INT) AS sample_rate, "
            "CAST(1 AS INT) AS channels, CAST(n AS BIGINT) AS n_samples, "
            "CAST(list_sum(list_transform(range(0, n), "
            "i -> ((doc_id * 7 + i * 13) % 4096) - 2048)) AS BIGINT) AS sample_sum, "
            "CAST(list_sum(list_transform(range(0, n), "
            "i -> abs(((doc_id * 7 + i * 13) % 4096) - 2048))) AS BIGINT) AS sample_abs_sum "
            "FROM (SELECT doc_id, 8000 + (doc_id % 8) * 1000 AS rate, "
            "n_chars % 128 + 16 AS n FROM documents)"
        ),
        # the MP4/AVI container encode→parse round trip recomputed
        # arithmetically from the id closed form (see
        # video_containers.attach_synthetic_video_blobs); division by
        # the timescale / 1e6 is IEEE-exact in both engines
        "multimodal_video_meta": (
            "SELECT doc_id, "
            "CASE WHEN doc_id % 3 = 0 THEN 'mp4' "
            "WHEN doc_id % 3 = 1 THEN 'avi' END AS container, "
            "CASE WHEN doc_id % 3 = 0 THEN (doc_id % 9000 + 500) / 1000.0 "
            "WHEN doc_id % 3 = 1 THEN "
            "((doc_id % 1000 + 25) * 40000) / 1000000.0 END AS duration_s, "
            "CASE WHEN doc_id % 3 = 0 THEN "
            "CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) "
            "WHEN doc_id % 3 = 1 THEN CAST(doc_id % 2 + 1 AS INT) "
            "END AS n_tracks, "
            "CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 80) * 8 + 128 AS INT) "
            "WHEN doc_id % 3 = 1 THEN CAST((doc_id % 96) * 4 + 160 AS INT) "
            "END AS width, "
            "CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 45) * 8 + 96 AS INT) "
            "WHEN doc_id % 3 = 1 THEN CAST((doc_id % 54) * 4 + 120 AS INT) "
            "END AS height "
            "FROM documents"
        ),
        # the MJPEG-in-AVI frame pipeline's structural surface: the
        # every-2nd-frame stride fan-out and per-frame dims / pixel
        # counts from the id closed form (nf = doc_id % 5 + 2 <= 6, so
        # sampled frame_idx ∈ {0, 2, 4}); decoded pixel VALUES are
        # lossy-JPEG and pinned by PSNR in pytest instead
        "multimodal_decode_video": (
            "SELECT doc_id, CAST(f AS INT) AS frame_idx, "
            "CAST(w AS INT) AS width, CAST(h AS INT) AS height, "
            "CAST(w * h AS BIGINT) AS n_pixels "
            "FROM (SELECT doc_id, n_chars % 24 + 8 AS w, "
            "doc_id % 16 + 8 AS h, doc_id % 5 + 2 AS nf FROM documents) "
            "CROSS JOIN UNNEST(range(0, 16, 2)) AS t(f) WHERE f < nf"
        ),
        "multimodal_image_dhash": (
            f"WITH {_image_dhash_sql()} SELECT doc_id, dhash FROM sig"
        ),
        "multimodal_image_dedup": (
            f"WITH {_image_dhash_sql()} "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.dhash, b.dhash)) <= 6"
        ),
        "multimodal_image_phash": (
            f"WITH {_image_phash_sql()} SELECT doc_id, phash FROM sig"
        ),
        # the at-ingest twin: seq = the append rank (append_df orders
        # by doc_id), hash = the identical pHash arithmetic
        "stream_image_phash": (
            f"WITH {_image_phash_sql()}, "
            "rk AS (SELECT doc_id, CAST(row_number() OVER "
            "(ORDER BY doc_id) - 1 AS BIGINT) AS seq FROM documents) "
            "SELECT rk.seq, sig.phash FROM sig "
            "JOIN rk ON rk.doc_id = sig.doc_id"
        ),
        "multimodal_image_phash_dedup": (
            f"WITH {_image_phash_sql()} "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.phash, b.phash)) <= 10"
        ),
        "multimodal_audio_fp": (
            f"WITH {_audio_afp_sql()} SELECT doc_id, afp FROM sig"
        ),
        "multimodal_audio_dedup": (
            f"WITH {_audio_afp_sql()} "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.afp, b.afp)) <= 6"
        ),
        # cross-modal: image pHash pairs UNION audio pairs -> one
        # reachability pass (each hash chain wrapped as a derived
        # table so the two generated sig CTEs cannot collide)
        "multimodal_dedup_clusters_all": (
            "WITH RECURSIVE "
            "isig AS (SELECT * FROM ("
            f"WITH {_image_phash_sql()} SELECT doc_id, phash FROM sig)), "
            "asig AS (SELECT * FROM ("
            f"WITH {_audio_afp_sql()} SELECT doc_id, afp FROM sig)), "
            "mpairs AS ("
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM isig a "
            "JOIN isig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.phash, b.phash)) <= 10 "
            "UNION "
            "SELECT a.doc_id, b.doc_id FROM asig a JOIN asig b "
            "ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.afp, b.afp)) <= 6), "
            "medges AS (SELECT id_a AS src, id_b AS dst FROM mpairs "
            "UNION SELECT id_b, id_a FROM mpairs), "
            "mreach(node, root) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT e.dst, r.root FROM mreach r JOIN medges e "
            "ON e.src = r.node) "
            "SELECT node AS doc_id, CAST(min(root) AS BIGINT) "
            "AS cluster_id FROM mreach GROUP BY node"
        ),
        "multimodal_dedup_clusters": (
            f"WITH RECURSIVE {_audio_afp_sql()}, "
            "mpairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
            "FROM sig a JOIN sig b ON a.doc_id < b.doc_id "
            "AND bit_count(xor(a.afp, b.afp)) <= 6), "
            "medges AS (SELECT id_a AS src, id_b AS dst FROM mpairs "
            "UNION SELECT id_b, id_a FROM mpairs), "
            "mreach(node, root) AS ("
            "SELECT doc_id, doc_id FROM documents "
            "UNION "
            "SELECT e.dst, r.root FROM mreach r JOIN medges e "
            "ON e.src = r.node) "
            "SELECT node AS doc_id, CAST(min(root) AS BIGINT) "
            "AS cluster_id FROM mreach GROUP BY node"
        ),
        # sampling: md5 is engine-identical; fixed-width lowercase-hex
        # compares in numeric order, so the row sets match exactly.
        # Thresholds are format(int(f * 16**8), '08x').
        "sample_docs": (
            "SELECT doc_id, lang, source, n_chars FROM documents "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'"
        ),
        "sample_split": (
            "SELECT source, CASE WHEN h < 'cccccccc' THEN 'train' "
            "WHEN h < 'e6666666' THEN 'val' ELSE 'test' END AS split, "
            "count(*) AS n, CAST(sum(doc_id) AS BIGINT) AS id_sum "
            "FROM (SELECT source, doc_id, "
            "substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h FROM documents) "
            "GROUP BY 1, 2"
        ),
        "sample_stratified": (
            "SELECT doc_id, source, n_chars FROM ("
            "SELECT doc_id, source, n_chars, row_number() OVER ("
            "PARTITION BY source "
            "ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn "
            "FROM documents) WHERE rn <= 10"
        ),
        # the epoch shuffle's distributed position assignment must
        # reproduce the naive global row_number over (md5(id#seed), id)
        "sample_shuffle": (
            "SELECT doc_id, CAST(row_number() OVER ("
            "ORDER BY md5(CAST(doc_id AS VARCHAR) || '#7'), doc_id) - 1 "
            "AS BIGINT) AS shuffle_pos FROM documents"
        ),
        # curation keep-set -> md5 train/test split -> 512-token
        # packing of the train stream in doc_id order
        "training_data": (
            "WITH RECURSIVE " + _CLUSTER_CTES + ", "
            "clusters AS (SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_id "
            "FROM reach GROUP BY node), "
            "quality AS (" + _quality_sql() + "), "
            "kept AS (SELECT q.doc_id FROM quality q JOIN clusters c "
            "ON q.doc_id = c.doc_id "
            "WHERE q.quality >= 0.5 AND q.doc_id = c.cluster_id), "
            "toks AS (SELECT d.doc_id, "
            f"CAST(len({_WORDS}) AS INT) AS n_tokens "
            "FROM documents d JOIN kept k ON d.doc_id = k.doc_id), "
            "base AS (SELECT t.doc_id, CASE WHEN "
            "substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) < '19999999' "
            "THEN 'test' ELSE 'train' END AS split, t.n_tokens FROM toks t), "
            "packed AS (SELECT doc_id, "
            "(cum - n_tokens) // 512 AS pack_first, "
            "(cum - 1) // 512 AS pack_last, "
            "(cum - n_tokens) % 512 AS offset_in_first "
            "FROM (SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM base WHERE split = 'train' AND n_tokens > 0)) "
            "SELECT b.doc_id, b.split, b.n_tokens, "
            "p.pack_first, p.pack_last, p.offset_in_first "
            "FROM base b LEFT JOIN packed p ON b.doc_id = p.doc_id"
        ),
        # PII surface: patterns live in the Java-regex ∩ RE2 dialect,
        # both engines scan the identical salted text (see
        # _PII_SALT_SQL); redaction order email → ip → phone
        "pii_scan": (
            "SELECT doc_id, "
            "CAST(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z]{2,})+')) AS INT) "
            "AS n_emails, "
            "CAST(len(regexp_extract_all(text, "
            "'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) AS INT) AS n_ipv4, "
            "CAST(len(regexp_extract_all(text, "
            "'\\+?[0-9][0-9()\\-\\s]{6,}[0-9]')) AS INT) AS n_phones, "
            "(len(regexp_extract_all(text, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(?:\\.[A-Za-z]{2,})+')) > 0 "
            "OR len(regexp_extract_all(text, "
            "'\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b')) > 0 "
            "OR len(regexp_extract_all(text, "
            "'\\+?[0-9][0-9()\\-\\s]{6,}[0-9]')) > 0) AS has_pii "
            f"FROM ({_PII_SALT_SQL})"
        ),
        "pii_redact": _PII_REDACT_SQL,
        # the streaming at-ingest scrub shares the batch redaction
        # chain (operators/pii.redact_expr), so its sink contents must
        # match the batch oracle exactly; seq == doc_id (dense ids
        # appended in doc_id order)
        "stream_pii_redact": _PII_REDACT_SQL,
        # chunk boundaries are a closed form of the token count; the
        # chunk text re-slices the SAME whitespace tokenization
        # (1-based inclusive list slicing on the DuckDB side)
        "chunk_documents": (
            "SELECT doc_id, CAST(i AS INT) AS chunk_idx, "
            "CAST(i * 48 AS INT) AS start_tok, "
            "CAST(least(i * 48 + 64, n) AS INT) AS end_tok, "
            "CAST(least(i * 48 + 64, n) - i * 48 AS INT) AS n_tokens, "
            "array_to_string(toks[i * 48 + 1 : least(i * 48 + 64, n)], ' ') "
            "AS chunk_text FROM ("
            "SELECT doc_id, toks, n, "
            "unnest(range(CAST(1 + ceil(greatest(n - 64, 0) / 48.0) AS BIGINT))) AS i "
            f"FROM (SELECT doc_id, {_WORDS} AS toks, "
            f"len({_WORDS}) AS n FROM documents))"
        ),
        "source_quality_report": (
            "WITH q AS (" + _quality_sql() + "), "
            "r AS (" + _repetition_sql() + ") "
            "SELECT d.source, count(*) AS n_docs, "
            + _pr("CAST(SUM(CAST(q.quality AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)
            + " AS avg_quality, "
            + _pr(
                "CAST(SUM(CAST(r.repetition AS DECIMAL(38,6))) AS DOUBLE) / count(*)",
                6,
            )
            + " AS avg_repetition, "
            "CAST(SUM(CASE WHEN q.quality < 0.5 THEN 1 ELSE 0 END) AS BIGINT) "
            "AS n_below_bar "
            "FROM documents d JOIN q ON d.doc_id = q.doc_id "
            "JOIN r ON d.doc_id = r.doc_id GROUP BY d.source"
        ),
        "docs_length_histogram": (
            "SELECT lang, n_chars // 100 AS bucket, count(*) AS n, "
            "min(n_chars) AS min_chars, max(n_chars) AS max_chars "
            "FROM documents GROUP BY lang, n_chars // 100"
        ),
        "text_repetition": _repetition_sql(),
        "text_bpe_tokens": _bpe_tokens_sql(),
        # train_bpe's distributed word-count stage: the same
        # pre-tokenizer regex in RE2, top-50 by (count desc, token asc)
        "text_bpe_wordcounts": (
            "SELECT w, CAST(count(*) AS BIGINT) AS c FROM ("
            "SELECT unnest(regexp_extract_all(text, '"
            + _BPE_PAT.replace("'", "''")
            + "')) AS w FROM documents) GROUP BY w "
            "ORDER BY c DESC, w LIMIT 50"
        ),
        # packing over REAL BPE counts: the recursive-CTE encoder
        # supplies n_tokens, then the same integer cumsum/div layout
        # arithmetic as the pack_sequences oracle (seq_len 512)
        "pack_sequences_bpe": (
            _bpe_doc_tokens_cte()
            + ", counts AS (SELECT d.doc_id, "
            "CAST(COALESCE(len(dt.toks), 0) AS BIGINT) AS n_tokens "
            "FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)) "
            "SELECT doc_id, n_tokens, "
            "CAST((cum - n_tokens) // 512 AS BIGINT) AS pack_first, "
            "CAST((cum - 1) // 512 AS BIGINT) AS pack_last, "
            "CAST((cum - n_tokens) % 512 AS BIGINT) AS offset_in_first "
            "FROM (SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            "FROM counts WHERE n_tokens > 0)"
        ),
        # eval set = deterministic 5% hash sample (md5 < 0ccccccc);
        # contamination = matched distinct trigrams / doc trigrams
        "decontaminate": (
            "WITH t AS (SELECT doc_id, "
            f"{_WORDS} AS toks FROM documents), "
            "s AS (SELECT doc_id, list_distinct("
            "list_transform(range(1, greatest(len(toks) - 1, 1)), "
            "i -> array_to_string(toks[i:i+2], ' '))) AS shs FROM t), "
            "e AS (SELECT DISTINCT unnest(shs) AS shingle FROM s "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < '0ccccccc'), "
            "c AS (SELECT doc_id, shs FROM s "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) >= '0ccccccc'), "
            "f AS (SELECT doc_id, unnest(shs) AS shingle FROM c), "
            "m AS (SELECT f.doc_id, count(*) AS n_matched FROM f "
            "JOIN e USING (shingle) GROUP BY f.doc_id) "
            "SELECT c.doc_id, CAST(len(c.shs) AS INT) AS n_shingles, "
            "CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched, "
            + _pr(
                "CASE WHEN len(c.shs) > 0 THEN "
                "CAST(coalesce(m.n_matched, 0) AS DOUBLE) / len(c.shs) "
                "ELSE 0.0 END",
                6,
            )
            + " AS contamination FROM c LEFT JOIN m USING (doc_id)"
        ),
        # the Spark side round-trips every payload through msgpack AND
        # cbor; a corrupt round-trip yields ok=false and a hash mismatch
        "codec_roundtrip": "SELECT doc_id, TRUE AS ok FROM documents",
        # per-row norm = the same sequential fold as Spark's aggregate
        # HOF; rounded per row, then exact decimal aggregation
        "embedding_label_stats": (
            "SELECT label, count(*) AS n, "
            "min(nr) AS min_norm, max(nr) AS max_norm, "
            + _pr("CAST(SUM(CAST(nr AS DECIMAL(38,6))) AS DOUBLE) / count(*)", 6)
            + " AS avg_norm FROM (SELECT label, "
            + _pr("sqrt(" + _DOT.format(a="embedding", b="embedding") + ")", 6)
            + " AS nr FROM embeddings) GROUP BY label"
        ),
        # contiguous token-stream packing: inclusive cumsum in doc_id
        # order, integer div/mod into 2048-token packs
        "pack_sequences": (
            "SELECT doc_id, n_tokens, "
            "(cum - n_tokens) // 2048 AS pack_first, "
            "(cum - 1) // 2048 AS pack_last, "
            "(cum - n_tokens) % 2048 AS offset_in_first "
            "FROM (SELECT doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            f"FROM (SELECT doc_id, len({_WORDS}) AS n_tokens FROM documents) "
            "WHERE n_tokens > 0)"
        ),
        # per-row Bernoulli keyed by the pround'ed quality score:
        # threshold = floor(quality * 16^8) as fixed-width hex
        # seq == doc_id (dense ids appended in order); the state key
        # sha2-256 is engine-identical to DuckDB's sha256
        "stream_dedup_exact": (
            "SELECT sha256(text) AS content_hash, "
            "CAST(min(doc_id) AS BIGINT) AS keep_seq "
            "FROM documents GROUP BY text"
        ),
        # at-ingest budget gate: kept set = the maximal per-source
        # prefix (doc_id order) whose tokens-before-it stay under 500
        "stream_token_budget": (
            "SELECT source AS stratum, doc_id AS seq, n_tokens, "
            "cum AS cum_tokens FROM ("
            "SELECT source, doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
            f"FROM (SELECT source, doc_id, CAST(len({_WORDS}) AS BIGINT) "
            "AS n_tokens FROM documents)) "
            "WHERE cum - n_tokens < 500"
        ),
        # the BPE-fed gate: n_tokens re-derived by the recursive-CTE
        # SQL BPE encoder, then the same per-source cumsum rule
        "stream_token_budget_bpe": (
            _bpe_doc_tokens_cte()
            + ", nt AS (SELECT d.source, d.doc_id, "
            "CAST(COALESCE(len(dt.toks), 0) AS BIGINT) AS n_tokens "
            "FROM documents d LEFT JOIN doc_tokens dt USING (doc_id)) "
            "SELECT source AS stratum, doc_id AS seq, n_tokens, "
            "cum AS cum_tokens FROM ("
            "SELECT source, doc_id, n_tokens, "
            "CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            "ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM nt) "
            "WHERE cum - n_tokens < 800"
        ),
        # the bounded-horizon rule as one lag window: keep iff no
        # prior occurrence of the content within the trailing 40 seqs
        "stream_dedup_window": (
            "SELECT sha256(content) AS content_hash, "
            "CAST(doc_id AS BIGINT) AS keep_seq FROM ("
            "SELECT doc_id, content, "
            "lag(doc_id) OVER (PARTITION BY content ORDER BY doc_id) AS prev "
            "FROM (SELECT doc_id, CAST((doc_id * doc_id) % 53 AS VARCHAR) "
            "AS content FROM documents)) "
            "WHERE prev IS NULL OR doc_id - prev > 40"
        ),
        "sample_weighted": (
            "SELECT doc_id, quality FROM (" + _quality_sql() + ") "
            "WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) < "
            "CASE WHEN quality >= 1 THEN 'g' ELSE "
            "lower(lpad(to_hex(CAST(floor(quality * 4294967296) AS BIGINT)), 8, '0')) "
            "END"
        ),
    }
