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


def test_stream_nb_filter_replay_after_kill_matches_clean(spark, tmp_path, monkeypatch):
    """The trained-classifier gate under the house chaos scheme: the
    bomb fires DURING the second micro-batch AFTER its partial landed
    (the hard case — the partial exists but the epoch never
    committed); the restart replays that batch under the same id, the
    overwrite replaces the partial byte-identically, and the final
    keeper set equals a clean run's."""
    import margaret_spark.streaming.sinks as sinks
    from margaret_spark.log import OffsetLog
    from margaret_spark.operators.nbayes import fit_nb
    from margaret_spark.streaming import read_keeper_sink, stream_nb_filter

    train = spark.createDataFrame(
        [("good", "alpha beta gamma"), ("spam", "zz yy xx ww")],
        "label string, text string",
    )
    model = fit_nb(train, "label", "text")

    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.StringType())
    log.append_many(["alpha beta", "zz yy"])
    log.append_many(["beta gamma"])
    log.append_many(["alpha gamma", "xx ww"])
    _space_log_file_mtimes(log)

    real = sinks.write_batch

    def run(sink, ck, fail_at):
        counter = {"n": 0}
        if fail_at is None:
            monkeypatch.setattr(sinks, "write_batch", real)
        else:
            def bomb(batch_df, batch_id, sink_dir):
                counter["n"] += 1
                real(batch_df, batch_id, sink_dir)  # partial lands first
                if counter["n"] == fail_at:
                    raise _ChaosKill("chaos kill mid-stream")

            monkeypatch.setattr(sinks, "write_batch", bomb)
        stream_nb_filter(
            log, F.col("value"), model, sink, ck,
            keep_labels=["good"], max_files_per_trigger=1,
        )

    ck = str(tmp_path / "ck_chaos")
    with pytest.raises(Exception, match="chaos kill"):
        run(str(tmp_path / "sink_chaos"), ck, fail_at=2)
    run(str(tmp_path / "sink_chaos"), ck, fail_at=None)
    run(str(tmp_path / "sink_clean"), str(tmp_path / "ck_clean"), fail_at=None)

    def keepers(sink):
        return {
            (r["seq"], r["pred"], r["score"])
            for r in read_keeper_sink(
                spark, sink, "seq long, pred string, score double"
            ).collect()
        }

    got = keepers(str(tmp_path / "sink_chaos"))
    want = keepers(str(tmp_path / "sink_clean"))
    assert got == want, f"chaos {got} != clean {want}"
    assert {s for s, _, _ in want} == {0, 2, 3}  # spam seqs 1, 4 dropped


def test_sink_compaction_replay_after_fold_is_noop(spark, tmp_path):
    """Compaction × replay, end-to-end: the armed callback kills the
    query after batch=1's partition committed but BEFORE its epoch
    committed; compacting the sink then folds batches 0..1 into
    compacted=1; the RESTART replays batch 1 under the same id —
    recreating a batch=1 partition at/below the high water, which
    readers must ignore (supersede rule) — and streams the rest live.
    Final keeper set must equal a clean uncompacted run's, and a
    second compaction must sweep the stale replayed partition."""
    from margaret_spark.log import OffsetLog
    from margaret_spark.streaming import read_keeper_sink, stream_dedup_exact
    from margaret_spark.streaming.sinks import _layout, compact_sink

    log = OffsetLog(spark, str(tmp_path / "log"), value_type=T.StringType())
    log.append_many(["x", "y"])  # seqs 0, 1
    log.append_many(["x", "z"])  # 2, 3 (x dup)
    log.append_many(["w", "y"])  # 4, 5 (y dup)
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
        run(str(tmp_path / "ck"), chaos_sink, fail_at=2)
    assert os.path.isdir(os.path.join(chaos_sink, "batch=1"))
    # fold everything committed so far (batches 0 and 1)
    assert compact_sink(spark, chaos_sink) == 2
    hw, live, _sup, _t = _layout(chaos_sink, spark)
    assert hw == 1 and live == []
    # restart: replays batch 1 (stale partition at <= hw), then 2..
    run(str(tmp_path / "ck"), chaos_sink, fail_at=None)
    hw, live, sup, _t = _layout(chaos_sink, spark)
    assert hw == 1 and sup == [1] and live == [2], (hw, live, sup)

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
    assert got == want and {s for _h, s in want} == {0, 1, 3, 4}
    # second compaction folds batch 2 and sweeps the stale replay
    assert compact_sink(spark, chaos_sink) == 1
    hw, live, sup, _t = _layout(chaos_sink, spark)
    assert hw == 2 and live == [] and sup == []
    got2 = {
        (r["content_hash"], r["keep_seq"])
        for r in read_keeper_sink(spark, chaos_sink, schema).collect()
    }
    assert got2 == want


def test_sink_compaction_crash_windows(spark, tmp_path):
    """The two compactor crash windows: (a) death BEFORE publish
    leaves only a .compact-*.tmp — readers ignore it, the next run
    sweeps and completes; (b) death AFTER publish but before the
    sweep leaves the old segment + folded partials visible — readers
    take the highest compacted= segment and ignore partials at/below
    its high water."""
    import shutil

    from margaret_spark.streaming.sinks import (
        _layout, compact_sink, read_batch_sink, write_batch,
    )

    d = str(tmp_path / "sink")
    schema = "k string, v long"
    for i, rows in enumerate([[("a", 1)], [("b", 2)], [("c", 3)]]):
        write_batch(spark.createDataFrame(rows, schema), i, d)
    want = [("a", 1), ("b", 2), ("c", 3)]

    # (a) crashed-before-publish: a stale tmp with WRONG content
    wrong = spark.createDataFrame([("zzz", 99)], schema)
    wrong.write.mode("overwrite").parquet(os.path.join(d, ".compact-1.tmp"))
    got = sorted(tuple(r) for r in read_batch_sink(spark, d, schema).collect())
    assert got == want
    assert compact_sink(spark, d, upto_batch=1) == 2
    hw, live, _sup, tmps = _layout(d, spark)
    assert hw == 1 and live == [2] and tmps == []
    got = sorted(tuple(r) for r in read_batch_sink(spark, d, schema).collect())
    assert got == want

    # (b) crashed-after-publish: resurrect the OLD state next to the
    # published segment — an older compacted=0 plus its folded batch
    older = spark.createDataFrame([("a", 1)], schema)
    older.write.mode("overwrite").parquet(os.path.join(d, "compacted=0"))
    write_batch(spark.createDataFrame([("a", 1)], schema), 0, d)
    got = sorted(tuple(r) for r in read_batch_sink(spark, d, schema).collect())
    assert got == want  # highest segment wins; batch=0 <= hw ignored
    assert compact_sink(spark, d) == 1  # folds batch 2, sweeps the rest
    hw, live, sup, _t = _layout(d, spark)
    assert hw == 2 and live == [] and sup == []
    assert not os.path.exists(os.path.join(d, "compacted=0"))
    got = sorted(tuple(r) for r in read_batch_sink(spark, d, schema).collect())
    assert got == want
    shutil.rmtree(d)


def test_sink_compaction_with_reducers(spark, tmp_path):
    """compact_sink(reduce_fn=...) under each sink's own semantics:
    the latest-index UPDATE reduction and the CMS additive merge.
    Reads before and after compaction are identical, and the
    compacted segment is the REDUCED (bounded) table."""
    from margaret_spark.streaming import (
        cms_reduce, latest_index_reduce, read_cms,
        read_latest_index_sink,
    )
    from margaret_spark.streaming.sinks import compact_sink, write_batch

    # latest-index: addr "a" updates across batches; keep newest
    li = str(tmp_path / "li")
    s1 = "addr string, upd_seq long, value string"
    write_batch(spark.createDataFrame([("a", 0, "v0"), ("b", 1, "w0")], s1), 0, li)
    write_batch(spark.createDataFrame([("a", 2, "v1")], s1), 1, li)
    before = sorted(tuple(r) for r in read_latest_index_sink(spark, li).collect())
    assert compact_sink(spark, li, reduce_fn=latest_index_reduce) == 2
    after = sorted(tuple(r) for r in read_latest_index_sink(spark, li).collect())
    assert before == after == [("a", 2, "v1"), ("b", 1, "w0")]
    seg = spark.read.parquet(os.path.join(li, "compacted=1"))
    assert seg.count() == 2  # one row per addr, not per emission

    # cms: counters re-sum
    cm = str(tmp_path / "cms")
    s2 = "row int, bucket long, cnt long"
    write_batch(spark.createDataFrame([(0, 5, 2), (1, 9, 1)], s2), 0, cm)
    write_batch(spark.createDataFrame([(0, 5, 3)], s2), 1, cm)
    before = sorted(tuple(r) for r in read_cms(spark, cm).collect())
    assert compact_sink(spark, cm, reduce_fn=cms_reduce) == 2
    after = sorted(tuple(r) for r in read_cms(spark, cm).collect())
    assert before == after == [(0, 5, 5), (1, 9, 1)]


def test_sink_compaction_never_folds_inflight_batch(spark, tmp_path):
    """A compactor running concurrently with the live stream must not
    fold a batch whose write is still in flight: a mid-write
    ``batch=<id>`` has no ``_SUCCESS`` marker yet (the committer
    writes it last), only ``_temporary`` + partial files. The default
    fold takes the committed PREFIX only — the in-flight partial is
    neither read torn nor superseded — and once the write completes,
    the keeper set equals a clean run's."""
    from margaret_spark.streaming.sinks import (
        _layout, compact_sink, read_batch_sink, write_batch,
    )

    d = str(tmp_path / "sink")
    schema = "k string, v long"
    write_batch(spark.createDataFrame([("a", 1)], schema), 0, d)
    write_batch(spark.createDataFrame([("b", 2)], schema), 1, d)
    # batch=2 mid-write: committer state — _temporary only, no _SUCCESS
    os.makedirs(os.path.join(d, "batch=2", "_temporary", "0"))

    # default compaction folds ONLY the committed prefix (0, 1)
    assert compact_sink(spark, d) == 2
    hw, live, sup, _t = _layout(d, spark)
    assert hw == 1 and live == [2] and sup == []
    assert os.path.isdir(os.path.join(d, "batch=2", "_temporary"))

    # the stream's write completes (overwrite, as foreachBatch does)
    write_batch(spark.createDataFrame([("c", 3)], schema), 2, d)
    got = sorted(tuple(r) for r in read_batch_sink(spark, d, schema).collect())
    assert got == [("a", 1), ("b", 2), ("c", 3)]
    # quiescent now: the next compaction folds it
    assert compact_sink(spark, d) == 1
    hw, live, _sup, _t = _layout(d, spark)
    assert hw == 2 and live == []
    got = sorted(tuple(r) for r in read_batch_sink(spark, d, schema).collect())
    assert got == [("a", 1), ("b", 2), ("c", 3)]


def test_sink_compaction_committed_prefix_never_leapfrogs(spark, tmp_path):
    """A crash-replay hole (batch 1 uncommitted while batch 2 is
    committed) must stop the fold AT the hole: raising the high water
    to 2 would supersede batch 1's completed replay — silent loss."""
    from margaret_spark.streaming.sinks import _layout, compact_sink, write_batch

    d = str(tmp_path / "sink")
    schema = "k string, v long"
    write_batch(spark.createDataFrame([("a", 1)], schema), 0, d)
    os.makedirs(os.path.join(d, "batch=1", "_temporary", "0"))
    write_batch(spark.createDataFrame([("c", 3)], schema), 2, d)

    assert compact_sink(spark, d) == 1  # folds batch 0 only
    hw, live, sup, _t = _layout(d, spark)
    assert hw == 0 and live == [1, 2] and sup == []


def test_sink_foreign_entry_fails_loudly(spark, tmp_path):
    """A data-looking entry with a non-integer suffix (manual copy,
    stray staging dir) names itself in the error instead of crashing
    readers with a bare int() ValueError — and is never silently
    skipped (it might hold real keeper rows)."""
    from margaret_spark.streaming.sinks import has_batches, write_batch

    d = str(tmp_path / "sink")
    write_batch(spark.createDataFrame([("a", 1)], "k string, v long"), 0, d)
    os.makedirs(os.path.join(d, "batch=3.bak"))
    with pytest.raises(ValueError, match=r"batch=3\.bak"):
        has_batches(d, spark)


def test_sink_manifest_contents(spark, tmp_path):
    """The audit manifest inside the published segment records the
    fold: high_water, the folded batch ids, the previous high water.
    (Also exercises the bulk Hadoop-FS read path.)"""
    from margaret_spark.streaming.sinks import (
        compact_sink, read_sink_manifest, write_batch,
    )

    d = str(tmp_path / "sink")
    schema = "k string, v long"
    assert read_sink_manifest(spark, d) is None  # no segment yet
    write_batch(spark.createDataFrame([("a", 1)], schema), 0, d)
    write_batch(spark.createDataFrame([("b", 2)], schema), 1, d)
    assert compact_sink(spark, d) == 2
    m = read_sink_manifest(spark, d)
    assert m == {
        "high_water": 1,
        "folded_batches": [0, 1],
        "previous_high_water": -1,
    }
    write_batch(spark.createDataFrame([("c", 3)], schema), 2, d)
    assert compact_sink(spark, d) == 1
    m = read_sink_manifest(spark, d)
    assert m == {
        "high_water": 2,
        "folded_batches": [2],
        "previous_high_water": 1,
    }


def _mk_scd2_log(spark, tmp_path, tag):
    from margaret_spark.log import OffsetLog

    log = OffsetLog(
        spark, str(tmp_path / f"log_{tag}"), value_type=T.StringType()
    )
    log.append_many(['{"k":1,"v":"a"}', '{"k":2,"v":"b"}'])
    log.append_many(['{"k":1,"v":"a2"}'])
    log.append_many(['{"k":2,"v":"b2"}', '{"k":3,"v":"c"}'])
    log.append_many(['{"k":3,"v":"c2"}', '{"k":1,"v":"a3"}'])
    _space_log_file_mtimes(log)
    return log


def _scd2_prepare(b):
    return b.select(
        F.from_json(F.col("value"), "k long, v string").alias("c"), "seq"
    ).select("c.*", "seq")


def test_prune_concurrent_with_live_scd2_loses_no_version(
    spark, tmp_path, monkeypatch
):
    """The r8-acknowledged manifest race, now guarded: prune_history
    running CONCURRENTLY with a live stream_scd2 micro-batch must not
    drop the version the stream publishes (prune's read→republish is
    last-writer-wins without the lock) and the stream must not
    resurrect pruned entries (its publish once re-added a stale dict).

    Deterministic interleaving: a prune is injected INSIDE every
    micro-batch — after the batch's merge-input manifest read, before
    its publish — the exact window where the unguarded code lost
    whichever side wrote first. Afterwards the history must equal a
    clean run's, every manifest entry must resolve to a directory on
    disk, and the final batch's version must be published."""
    import margaret_spark.streaming.scd as scd_mod
    from margaret_spark.streaming import prune_history, read_history, stream_scd2

    initial = spark.createDataFrame(
        [], "k long, v string, valid_from int, valid_to int"
    )

    # clean reference run (no pruning)
    clean_log = _mk_scd2_log(spark, tmp_path, "clean")
    clean_hist = str(tmp_path / "hist_clean")
    stream_scd2(
        clean_log, _scd2_prepare, "k", initial, clean_hist,
        str(tmp_path / "ck_clean"), available_now=True,
        max_files_per_trigger=1,
    )
    want = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in read_history(spark, clean_hist).collect()
    }

    # chaos run: prune fires mid-batch, every batch
    chaos_log = _mk_scd2_log(spark, tmp_path, "chaos")
    chaos_hist = str(tmp_path / "hist_chaos")
    real_merge = scd_mod.scd2_merge
    pruned_total = {"n": 0}

    def merge_with_prune(cur, latest, keys, ver):
        pruned_total["n"] += prune_history(chaos_hist, keep_last=2)
        return real_merge(cur, latest, keys, ver)

    monkeypatch.setattr(scd_mod, "scd2_merge", merge_with_prune)
    stream_scd2(
        chaos_log, _scd2_prepare, "k", initial, chaos_hist,
        str(tmp_path / "ck_chaos"), available_now=True,
        max_files_per_trigger=1,
    )
    monkeypatch.setattr(scd_mod, "scd2_merge", real_merge)

    assert pruned_total["n"] >= 1  # the interleaving actually pruned
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in read_history(spark, chaos_hist).collect()
    }
    assert got == want
    versions = scd_mod._read_manifest(chaos_hist)
    assert max(versions) == 3  # the last batch's publish survived
    for b, vdir in versions.items():
        assert os.path.isdir(vdir), (b, vdir)  # no resurrected entries


def test_prune_racing_live_scd2_threads(spark, tmp_path):
    """True-concurrency variant: a background thread loops
    prune_history while the stream drains all four micro-batches.
    Nondeterministic interleaving, deterministic contract: final
    history equals the clean run's, the newest version is published,
    every manifest entry resolves, and nothing deadlocks (the test
    finishing IS the deadlock assertion)."""
    import threading

    import margaret_spark.streaming.scd as scd_mod
    from margaret_spark.streaming import prune_history, read_history, stream_scd2

    initial = spark.createDataFrame(
        [], "k long, v string, valid_from int, valid_to int"
    )
    log = _mk_scd2_log(spark, tmp_path, "race")
    hist = str(tmp_path / "hist_race")
    stop = threading.Event()

    def janitor():
        while not stop.is_set():
            prune_history(hist, keep_last=2)

    t = threading.Thread(target=janitor, daemon=True)
    t.start()
    try:
        stream_scd2(
            log, _scd2_prepare, "k", initial, hist,
            str(tmp_path / "ck_race"), available_now=True,
            max_files_per_trigger=1,
        )
    finally:
        stop.set()
        t.join(timeout=30)
    assert not t.is_alive()

    clean_hist = str(tmp_path / "hist_race_clean")
    stream_scd2(
        _mk_scd2_log(spark, tmp_path, "race_clean"), _scd2_prepare, "k",
        initial, clean_hist, str(tmp_path / "ck_race_clean"),
        available_now=True, max_files_per_trigger=1,
    )
    want = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in read_history(spark, clean_hist).collect()
    }
    got = {
        (r["k"], r["v"], r["valid_from"], r["valid_to"])
        for r in read_history(spark, hist).collect()
    }
    assert got == want
    versions = scd_mod._read_manifest(hist)
    assert max(versions) == 3
    for b, vdir in versions.items():
        assert os.path.isdir(vdir), (b, vdir)
