"""Kill-mid-stream / restart-from-checkpoint chaos tests for the six
custom stateful streaming operators (top-k, windowed top-k, as-of
join, horizon dedup, token-budget gate, SCD2 versioned ingest).

Scheme, identical for every operator: the same 3-micro-batch source is
drained twice — once cleanly (fresh checkpoint), and once with a bomb
in the sink that kills the query DURING the second micro-batch, after
batch 0 committed, followed by a restart from the same checkpoint.
Exactly-once contract under replay: the restarted query replays the
failed batch with the same batch id against the batch-0 state from the
checkpoint, so the chaos run's final output must equal the clean
run's, with nothing lost and nothing duplicated."""

import os
import time

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


class _ChaosKill(Exception):
    pass


def _armed(inner, fail_at, counter):
    """Wrap a sink callback: raise on the ``fail_at``-th invocation
    (BEFORE recording anything — a poisoned batch must contribute no
    output), pass through otherwise."""

    def cb(*a):
        counter["n"] += 1
        if counter["n"] == fail_at:
            raise _ChaosKill("chaos kill mid-stream")
        inner(*a)

    return cb


def _write_batches(spark, src, schema, batches):
    """One parquet file per batch with strictly increasing mtimes so
    maxFilesPerTrigger=1 replays them in order."""
    os.makedirs(src)
    now = time.time()
    for n, rows in enumerate(batches):
        d = os.path.join(src, f"f{n}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
        when = now - 60 * (len(batches) - n)
        for f in os.listdir(d):
            os.utime(os.path.join(d, f), (when, when))
        os.utime(d, (when, when))


def _file_stream(spark, src, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )


def _space_log_file_mtimes(log):
    """The file source orders by modification time at MILLISECOND
    granularity — back-to-back appends can tie and replay out of seq
    order (a documented ordering contract of the log-draining
    streams). Space the data files a minute apart in seq order so the
    micro-batch order is deterministic under any box load."""
    files = sorted(p for _lo, _hi, p in log._data_files())
    now = time.time()
    for n, p in enumerate(files):
        when = now - 60 * (len(files) - n)
        os.utime(p, (when, when))


def _run_chaos_then_restart(run, ck):
    """First drain dies on the bomb; the second, with a benign sink,
    resumes from the checkpoint."""
    with pytest.raises(Exception, match="chaos kill"):
        run(ck, fail_at=2)
    run(ck, fail_at=None)


# --- per-operator harnesses -------------------------------------------------


def _topk_harness(spark, tmp_path, keys):
    """keys: 3 per-batch key prefixes (equal for global top-k,
    distinct day buckets for the windowed variant)."""
    from margaret_spark.streaming.stateful import stream_topk

    schema = "k string, item long, score double"
    batches = [
        [(keys[0], 1, 10.0), (keys[0], 2, 5.0)],
        [(keys[1], 3, 20.0), (keys[0] + "b", 4, 1.0)],
        [(keys[2], 5, 30.0), (keys[0] + "b", 6, 7.0)],
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, batches)

    def make_run(store):
        def run(ck, fail_at):
            counter = {"n": 0}

            def sink(bdf, bid):
                store.append((bid, bdf.toPandas()))

            cb = sink if fail_at is None else _armed(sink, fail_at, counter)
            stream_topk(_file_stream(spark, src, schema), 2, ck, cb)

        return run

    def final(store):
        # latest emission per key wins (update semantics)
        latest = {}
        for bid, pdf in store:
            for k in set(pdf["k"]):
                sub = pdf[pdf["k"] == k]
                prev = latest.get(k)
                if prev is None or bid >= prev[0]:
                    latest[k] = (bid, sub)
        return {
            (k, int(r.item), int(r.rank), float(r.score))
            for k, (_b, sub) in latest.items()
            for r in sub.itertuples(index=False)
        }

    return make_run, final


def _asof_harness(spark, tmp_path):
    from margaret_spark.streaming.stateful import stream_asof_join

    schema = "k long, side string, tsu long"
    batches = [
        [(1, "R", 10), (1, "L", 15)],
        [(1, "R", 20), (1, "L", 25)],
        [(1, "L", 30), (2, "L", 9)],
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, batches)

    def make_run(store):
        def run(ck, fail_at):
            counter = {"n": 0}

            def sink(pdf):
                store.append(pdf)

            cb = sink if fail_at is None else _armed(sink, fail_at, counter)
            stream_asof_join(_file_stream(spark, src, schema), ck, cb)

        return run

    def final(store):
        return {
            (int(r.k), int(r.tsu)): (
                None if pd.isna(r.tsu_matched) else int(r.tsu_matched)
            )
            for pdf in store
            for r in pdf.itertuples(index=False)
        }

    return make_run, final


def _dedup_harness(spark, tmp_path, tag):
    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming.stateful import stream_dedup_window

    log = OffsetLog(spark, str(tmp_path / f"log_{tag}"), value_type=T.StringType())
    log.append_many(["x", "y"])  # seqs 0, 1
    log.append_many(["x", "z"])  # 2, 3: x suppressed (gap 2 <= ttl)
    log.append_many(["x", "y"])  # 4, 5: x suppressed (gap 2), y re-admitted
    _space_log_file_mtimes(log)

    def make_run(store):
        def run(ck, fail_at):
            counter = {"n": 0}

            def sink(pdf):
                store.append(pdf)

            cb = sink if fail_at is None else _armed(sink, fail_at, counter)
            stream_dedup_window(
                log, F.col("value"), cb, ck, ttl_seqs=2,
                max_files_per_trigger=1,
            )

        return run

    def final(store):
        return {
            int(r.keep_seq) for pdf in store for r in pdf.itertuples(index=False)
        }

    return make_run, final


def _budget_harness(spark, tmp_path):
    from margaret_spark.streaming import stream_token_budget

    schema = "stratum string, seq long, n_tokens long"
    batches = [
        [("s", 0, 30), ("t", 1, 5)],
        [("s", 2, 30), ("t", 3, 5)],
        [("s", 4, 30), ("t", 5, 5)],
    ]
    src = str(tmp_path / "src")
    _write_batches(spark, src, schema, batches)

    def make_run(store):
        def run(ck, fail_at):
            counter = {"n": 0}

            def sink(pdf):
                store.append(pdf)

            cb = sink if fail_at is None else _armed(sink, fail_at, counter)
            stream_token_budget(
                _file_stream(spark, src, schema), 50, ck, cb
            )

        return run

    def final(store):
        return {
            (r.stratum, int(r.seq), int(r.cum_tokens))
            for pdf in store
            for r in pdf.itertuples(index=False)
        }

    return make_run, final


def _scd2_harness(spark, tmp_path, tag):
    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_history, stream_scd2

    schema = "k long, v string"
    initial = spark.createDataFrame(
        [], "k long, v string, valid_from int, valid_to int"
    )
    log = OffsetLog(spark, str(tmp_path / f"log_{tag}"), value_type=T.StringType())
    log.append_many(['{"k":1,"v":"a"}', '{"k":2,"v":"b"}'])
    log.append_many(['{"k":1,"v":"a2"}'])
    log.append_many(['{"k":2,"v":"b2"}', '{"k":3,"v":"c"}'])
    _space_log_file_mtimes(log)

    def prepare(b):
        return b.select(
            F.from_json(F.col("value"), schema).alias("c"), "seq"
        ).select("c.*", "seq")

    def make_run(store):
        # store is the history dir (list holding one path)
        hist = store[0]

        def run(ck, fail_at):
            counter = {"n": 0}
            prep = prepare
            if fail_at is not None:
                def prep(b):
                    counter["n"] += 1
                    if counter["n"] == fail_at:
                        raise _ChaosKill("chaos kill mid-stream")
                    return prepare(b)

            stream_scd2(
                log, prep, "k", initial, hist, ck,
                version_of=lambda b: b + 1, available_now=True,
                max_files_per_trigger=1,
            )

        return run

    def final(store):
        h = read_history(spark, store[0])
        return {
            (r["k"], r["v"], r["valid_from"], r["valid_to"])
            for r in h.collect()
        }

    return make_run, final


OPS = ["topk", "topk_windowed", "asof", "dedup_window", "token_budget", "scd2"]


@pytest.mark.parametrize("op", OPS)
def test_kill_mid_stream_restart_matches_clean_run(spark, tmp_path, op):
    if op == "topk":
        make_run, final = _topk_harness(spark, tmp_path, ["a", "a", "a"])
        chaos_store, clean_store = [], []
    elif op == "topk_windowed":
        # composite (day|key) state keys: each batch opens a new window
        make_run, final = _topk_harness(
            spark, tmp_path, ["d1|x", "d2|x", "d3|x"]
        )
        chaos_store, clean_store = [], []
    elif op == "asof":
        make_run, final = _asof_harness(spark, tmp_path)
        chaos_store, clean_store = [], []
    elif op == "dedup_window":
        make_run, final = _dedup_harness(spark, tmp_path, "chaos")
        chaos_store, clean_store = [], []
    elif op == "token_budget":
        make_run, final = _budget_harness(spark, tmp_path)
        chaos_store, clean_store = [], []
    else:
        make_run, final = _scd2_harness(spark, tmp_path, "chaos")
        chaos_store = [str(tmp_path / "hist_chaos")]
        clean_store = [str(tmp_path / "hist_clean")]

    _run_chaos_then_restart(make_run(chaos_store), str(tmp_path / "ck_chaos"))
    make_run(clean_store)(str(tmp_path / "ck_clean"), fail_at=None)

    got, want = final(chaos_store), final(clean_store)
    assert got == want, f"{op}: chaos {got} != clean {want}"
    assert want, f"{op}: clean run produced no output (vacuous test)"

    if op == "dedup_window":
        # the horizon rule's ground truth: seqs 0,1,3 keep; 5 re-admits
        assert want == {0, 1, 3, 5}
    if op == "scd2":
        # replay after prune must still be safe under the >= 2 floor
        from margaret_spark.streaming import prune_history

        assert prune_history(chaos_store[0], keep_last=2) == 1
        assert final(chaos_store) == want


def test_kill_mid_stream_restart_sink_partitions_idempotent(spark, tmp_path):
    """Executor-side keeper sink under chaos: the bomb (an armed
    driver callback, which delivery() runs AFTER the executor-side
    parquet write) kills the query once batch 1's batch=1 partition
    has already committed; the restart replays batch 1 against the
    checkpointed batch-0 state and must OVERWRITE batch=1
    byte-identically — the read-back keeper set equals a clean run's,
    nothing lost, nothing duplicated."""
    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_dedup_exact

    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.StringType())
    log.append_many(["x", "y"])  # seqs 0, 1
    log.append_many(["x", "z"])  # 2, 3 (x is a dup)
    log.append_many(["w", "y"])  # 4, 5 (y is a dup)
    _space_log_file_mtimes(log)
    schema = "content_hash string, keep_seq long"

    def run(ck, sink, fail_at):
        counter = {"n": 0}
        cb = None if fail_at is None else _armed(
            lambda pdf: None, fail_at, counter
        )
        stream_dedup_exact(
            log, F.col("value"), cb, ck, sink_dir=sink,
            max_files_per_trigger=1,
        )

    chaos_sink = str(tmp_path / "sink_chaos")
    with pytest.raises(Exception, match="chaos kill"):
        run(str(tmp_path / "ck_chaos"), chaos_sink, fail_at=2)
    # batch 1's partition committed before the kill: the failure mode
    # this test pins is a replay DUPLICATING it
    assert os.path.isdir(os.path.join(chaos_sink, "batch=1"))
    run(str(tmp_path / "ck_chaos"), chaos_sink, fail_at=None)

    clean_sink = str(tmp_path / "sink_clean")
    run(str(tmp_path / "ck_clean"), clean_sink, fail_at=None)

    got = {
        (r["content_hash"], r["keep_seq"])
        for r in read_keeper_sink(spark, chaos_sink, schema).collect()
    }
    want = {
        (r["content_hash"], r["keep_seq"])
        for r in read_keeper_sink(spark, clean_sink, schema).collect()
    }
    assert got == want
    assert {s for _h, s in want} == {0, 1, 3, 4}
