"""Executor-side delivery for the stateful streaming keeper streams.

The six custom stateful operators (``streaming.stateful``) emit a
KEEPER stream — first-seen documents, admitted budget rows, changed
index entries, as-of matches. At 100 TB that stream is itself big
data (``stream_dedup_exact`` emits one row per unique document ever
ingested), so its default delivery path must be executor-side: each
micro-batch's output is written as a parquet partition
``<sink_dir>/batch=<id>`` directly from the executors — the driver
only coordinates the write, no ``collect()``, no pandas
materialization. The per-batch OVERWRITE makes crash-replay
idempotent: a restarted query re-runs the failed epoch against the
checkpointed pre-batch state, reproduces the same rows under the same
batch id, and the partition is replaced byte-identically instead of
duplicated (the same contract ``streaming/cms.py`` established).

Reading the keeper set back is an ordinary batch scan over the batch
partitions (:func:`read_batch_sink`); operators with append-per-key
semantics (dedup keepers, budget admissions, as-of matches, LSH
candidates) need nothing more — each logical row is emitted exactly
once. The latest-index stream has UPDATE semantics (a key re-emits
when its value changes), so its reader reduces to the newest emission
per key (:func:`~margaret_spark.streaming.stateful.
read_latest_index_sink`).

The in-process callback delivery (one pandas DataFrame per
micro-batch through the driver) remains available on every operator —
it is the right tool for tests and small results — but it is the
opt-in path, not the scale default.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def has_batches(sink_dir: str) -> bool:
    """True iff ``sink_dir`` holds at least one ``batch=*`` partial."""
    try:
        return any(e.startswith("batch=") for e in os.listdir(sink_dir))
    except FileNotFoundError:
        return False


def write_batch(batch_df: DataFrame, batch_id: int, sink_dir: str) -> None:
    """Write one micro-batch's output as ``<sink_dir>/batch=<id>`` —
    executor-side parquet, overwrite-per-batch (replay-idempotent)."""
    batch_df.write.mode("overwrite").parquet(
        os.path.join(sink_dir, f"batch={batch_id}")
    )


def delivery(
    sink_dir: Optional[str],
    callback: Optional[Callable[[pd.DataFrame], None]],
) -> Callable[[DataFrame, int], None]:
    """The shared ``foreachBatch`` body: executor-side parquet into
    ``sink_dir`` and/or the driver-side pandas ``callback``. At least
    one must be given. When both are active the batch output is
    persisted across the two actions so the stateful plan is not
    re-executed against the state store within the epoch."""
    if sink_dir is None and callback is None:
        raise ValueError(
            "no delivery path: pass sink_dir (executor-side parquet — the "
            "scale path) and/or a callback (driver-side pandas — the "
            "small-result/test path)"
        )

    def on_batch(batch_df: DataFrame, batch_id: int) -> None:
        both = sink_dir is not None and callback is not None
        if both:
            batch_df.persist()
        try:
            if sink_dir is not None:
                write_batch(batch_df, batch_id, sink_dir)
            if callback is not None:
                pdf = batch_df.toPandas()
                if len(pdf):
                    callback(pdf)
        finally:
            if both:
                batch_df.unpersist()

    return on_batch


def read_batch_sink(
    spark: SparkSession, sink_dir: str, schema: str
) -> DataFrame:
    """The keeper set: union of every ``batch=*`` partial, data
    columns only (the synthetic ``batch`` partition column is
    dropped). A sink that never produced a batch is a valid EMPTY
    result with the declared ``schema``, not a parquet
    schema-inference error."""
    if not has_batches(sink_dir):
        return spark.createDataFrame([], schema)
    df = spark.read.parquet(sink_dir)
    return df.drop("batch")
