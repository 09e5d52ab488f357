"""SparkSession factory with scale-oriented defaults.

Defaults are chosen for the local[CPUS] harness but written for a real
cluster: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow on (vectorized Python interchange), UTC session
timezone (deterministic timestamp semantics vs external oracles).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "margaret-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    # Python workers are separate processes that do NOT inherit the
    # driver's sys.path mutations: any pickled function referencing
    # this package (stateful streaming, pandas UDFs) would fail to
    # unpickle when the session is launched from another cwd. Export
    # the repo root on PYTHONPATH before the JVM spawns workers.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_root + (os.pathsep + pp if pp else "")
        )
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(int(cpus), 4)
        except (TypeError, ValueError):
            shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # pair-scoring pandas UDFs (functions.vectors.pair_dot) amortize
        # per-batch overhead better with larger Arrow batches
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "50000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.streaming.schemaInference", "false")
        # InferFiltersFromGenerate duplicates the generator expression
        # into a filter that predicate-pushdown then moves below our
        # deliberate repartition-before-compute exchanges — so an
        # expensive array expression (shingling, banding) is evaluated
        # a second time at the scan's (possibly single-file)
        # parallelism. Our exploded arrays are never empty-heavy, so
        # the inferred filter only costs.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
