"""Crash/recovery semantics (reference ``offset2/rw_test.go:148-191``:
corrupted journal auto-recovers; torn writes are invisible)."""

import os

import pytest

from margaret_spark import OffsetLog


def test_torn_write_invisible(spark, tmp_path):
    # A crash mid-append leaves a .tmp file; it must be invisible to
    # reopen (the atomic-rename publish protocol).
    path = str(tmp_path / "log")
    log = OffsetLog(spark, path)
    log.append_many([1, 2, 3])
    tmp_file = os.path.join(path, "data", "part-00000000000000000003-00000000000000000003.parquet.tmp")
    with open(tmp_file, "wb") as f:
        f.write(b"torn garbage")
    log2 = OffsetLog(spark, path)
    assert log2.seq() == 2
    assert list(log2.query()) == [1, 2, 3]
    log2.check_consistency()
    # the next append must not collide with the torn file
    assert log2.append(4) == 3
    assert list(log2.query()) == [1, 2, 3, 4]


def test_consistency_detects_gap(spark, tmp_path):
    path = str(tmp_path / "log")
    log = OffsetLog(spark, path)
    log.append_many([1, 2])
    log.append_many([3, 4])
    # simulate a lost data file (corruption): seqs 0-1 vanish
    files = sorted(os.listdir(os.path.join(path, "data")))
    os.remove(os.path.join(path, "data", files[0]))
    log2 = OffsetLog(spark, path)
    with pytest.raises(AssertionError):
        log2.check_consistency()


def test_open_sweeps_stale_staging_and_tmp(spark, tmp_path):
    """Crash leftovers (dot-tmp files in data/, old staging areas)
    are swept at open; FRESH staging (a possibly-live writer) is
    kept."""
    import os
    import time

    from margaret_spark.log import OffsetLog

    path = str(tmp_path / "log")
    log = OffsetLog(spark, path)
    log.append_many([1, 2, 3])

    # plant crash artifacts — dot-tmps are age-gated exactly like the
    # staging dirs (a FRESH tmp may be another process's in-flight
    # write; a reader open must never sabotage a live writer)
    old = time.time() - 7200
    tmp_file = os.path.join(log._data_dir, ".part-x.parquet.tmp")
    open(tmp_file, "w").write("junk")
    os.utime(tmp_file, (old, old))
    fresh_tmp = os.path.join(log._data_dir, ".part-y.parquet.tmp")
    open(fresh_tmp, "w").write("junk")
    stale_dir = os.path.join(path, "_staging", "old-load")
    os.makedirs(stale_dir)
    open(os.path.join(stale_dir, "part-0.parquet"), "w").write("junk")
    os.utime(stale_dir, (old, old))
    fresh_dir = os.path.join(path, "_staging", "inflight-load")
    os.makedirs(fresh_dir)
    patch_staging = os.path.join(path, "_compact_staging_patch")
    os.makedirs(patch_staging)
    stale_patch = os.path.join(patch_staging, "part-0.parquet")
    open(stale_patch, "w").write("junk")
    os.utime(stale_patch, (old, old))

    log2 = OffsetLog(spark, path)
    assert list(log2.query()) == [1, 2, 3]
    assert not os.path.exists(tmp_file)       # old dot-tmp swept
    assert os.path.exists(fresh_tmp)          # live writer untouched
    assert not os.path.exists(stale_dir)      # old staging swept
    assert os.path.exists(fresh_dir)          # live writer untouched
    assert not os.path.exists(stale_patch)    # crashed squash swept


def test_janitor_completes_interrupted_dir_swap(spark, tmp_path, monkeypatch):
    """Crash between compact_log's two renames in the
    whole-log-is-one-bulk-directory edge: at that instant the log's
    ONLY contents are dot-named files (.part-*.tmp + .part-*.dead);
    the janitor must COMPLETE the swap at next open, not sweep them
    (the sweep would silently empty the log)."""
    from pyspark.sql import functions as F

    from margaret_spark.sources import writers as W

    path = str(tmp_path / "log")
    log = OffsetLog(spark, path)
    log.append_df(spark.range(20).select(F.col("id").alias("value")))
    files = log._data_files()
    assert len(files) == 1 and os.path.isdir(files[0][2])

    real_rename = os.rename

    def crash_rename(a, b):
        real_rename(a, b)
        if str(b).endswith(".dead"):
            raise RuntimeError("simulated crash between the two renames")

    monkeypatch.setattr(W.os, "rename", crash_rename)
    with pytest.raises(RuntimeError, match="simulated crash"):
        W.compact_log(log, target_files=1)
    monkeypatch.undo()

    data_dir = os.path.join(path, "data")
    names = os.listdir(data_dir)
    assert names and all(n.startswith(".") for n in names), names

    log2 = OffsetLog(spark, path)
    assert log2.seq() == 19
    assert list(log2.query()) == list(range(20))
    log2.check_consistency()
    # swap completed: exactly one live plain file, no dot leftovers
    assert not [n for n in os.listdir(data_dir) if n.startswith(".")]


def test_janitor_restores_backup_when_tmp_is_torn(spark, tmp_path, monkeypatch):
    """Same mid-swap crash, but the tmp is torn (no parquet footer):
    the janitor must fall back to restoring the .dead backup — it
    never deletes the only copy of the data."""
    from pyspark.sql import functions as F

    from margaret_spark.sources import writers as W

    path = str(tmp_path / "log")
    log = OffsetLog(spark, path)
    log.append_df(spark.range(7).select(F.col("id").alias("value")))
    assert os.path.isdir(log._data_files()[0][2])

    real_rename = os.rename

    def crash_rename(a, b):
        real_rename(a, b)
        if str(b).endswith(".dead"):
            raise RuntimeError("simulated crash between the two renames")

    monkeypatch.setattr(W.os, "rename", crash_rename)
    with pytest.raises(RuntimeError, match="simulated crash"):
        W.compact_log(log, target_files=1)
    monkeypatch.undo()

    data_dir = os.path.join(path, "data")
    [tmp_name] = [n for n in os.listdir(data_dir) if n.endswith(".tmp")]
    with open(os.path.join(data_dir, tmp_name), "wb") as f:
        f.write(b"torn mid-write")  # no footer

    log2 = OffsetLog(spark, path)
    assert list(log2.query()) == list(range(7))
    log2.check_consistency()
