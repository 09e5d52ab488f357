"""Sinks and physical-layout writers.

At 100 TB the physical layout *is* the query plan: a table partitioned
by its filter key gets partition pruning for free; two tables bucketed
the same way join with zero shuffle; a log compacted into large
seq-sorted files keeps row-group stats selective. These writers encode
those layouts.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned parquet: filters on ``partition_cols``
    become directory pruning (no file even opened)."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: equal-bucketed tables co-locate join
    keys, so joins between them skip the shuffle entirely (Spark
    requires saveAsTable for bucket metadata)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table_name)


def compact_log(log, target_files: int = 1) -> int:
    """Compact an OffsetLog's data directory into ``target_files``
    large seq-sorted files — the answer to small-append amplification
    (SURVEY §7). Replace-patches are folded into the data; null-patches
    are preserved (squashed to one latest-per-seq patch file) so
    ``ErrNulled`` semantics survive compaction.

    Keeps every invariant: dense seq, range-encoded file names,
    readers before/after see identical contents. Returns the new data
    file count.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pyspark.sql import Window

    with log._lock:
        # data with replace-overlay applied (null-overlay NOT applied:
        # the payload stays, the patch carries the redaction)
        nulled_seqs: list[int] = []
        if log._has_patches():
            view = log.df()
            nulled_seqs = [
                r["seq"] for r in view.where(F.col("nulled")).select("seq").collect()
            ]
            # replace folded in; nulled payloads zeroed (reference
            # zero-fills the frame, offset2/log.go:91-128) — the
            # squashed patch file below preserves the ErrNulled marker
            data = view.select("seq", "value")
        else:
            data = log._base_df().select("seq", "value")
        staging = os.path.join(log.path, "_compact_staging")
        (
            data.repartitionByRange(max(target_files, 1), F.col("seq"))
            .sortWithinPartitions("seq")
            .write.mode("overwrite")
            .parquet(staging)
        )
        parts = sorted(glob.glob(os.path.join(staging, "part-*.parquet")))
        ranges = []
        for p in parts:
            seqs = pq.read_table(p, columns=["seq"])["seq"].to_pylist()
            if seqs:
                ranges.append((p, min(seqs), max(seqs)))
        for old in glob.glob(os.path.join(log._data_dir, "*.parquet")):
            os.remove(old)
        for old in glob.glob(os.path.join(log._patch_dir, "*.parquet")):
            os.remove(old)
        for p, lo, hi in ranges:
            os.rename(
                p, os.path.join(log._data_dir, f"part-{lo:020d}-{hi:020d}.parquet")
            )
        shutil.rmtree(staging, ignore_errors=True)
        log._patch_id = 0
        if nulled_seqs:
            arrow_value = log._arrow().field("value").type
            schema = pa.schema(
                [
                    pa.field("patch_id", pa.int64(), False),
                    pa.field("seq", pa.int64(), False),
                    pa.field("op", pa.string(), False),
                    pa.field("value", arrow_value, True),
                ]
            )
            table = pa.Table.from_pydict(
                {
                    "patch_id": list(range(len(nulled_seqs))),
                    "seq": sorted(nulled_seqs),
                    "op": ["null"] * len(nulled_seqs),
                    "value": [None] * len(nulled_seqs),
                },
                schema=schema,
            )
            final = os.path.join(log._patch_dir, f"patch-{0:020d}.parquet")
            tmp = os.path.join(log._patch_dir, f".patch-{0:020d}.parquet.tmp")
            pq.write_table(table, tmp)
            os.rename(tmp, final)
            log._patch_id = 1
        log._seq = log._recover_seq()
    return len(ranges)
