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