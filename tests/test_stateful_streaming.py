"""applyInPandasWithState custom stateful operator: gap sessionization
with cross-batch state and timeout-driven flush.

One continuous query (processingTime trigger): availableNow/once triggers
fire every processing-time timeout in their final batch, which would
flush all open state at the end of each run and make cross-batch
assertions meaningless."""

import datetime as dt
import os
import time


def _write_events(spark, path, rows):
    spark.createDataFrame(
        rows, "user_id string, ts timestamp, value double"
    ).coalesce(1).write.mode("append").parquet(path)


def _poll(spark, table, predicate, timeout_s=60):
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        got = {
            (r.user_id, r.n_events, r.total_value)
            for r in spark.sql(f"select * from {table}").collect()
        }
        if predicate(got):
            return got
        time.sleep(0.5)
    return got


def test_stateful_sessionize(spark, tmp_path):
    from horus_spark.streaming.incremental import stateful_sessionize

    src = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 6, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    stream = spark.readStream.schema(
        "user_id string, ts timestamp, value double"
    ).parquet(src)
    # 20s idle timeout: long enough that the write->assert->write phases
    # below never let a live group expire, short enough to observe the
    # flush at the end without a long wait
    sessions = stateful_sessionize(stream, gap_seconds=1800, state_timeout_ms=20_000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_live")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        # batch 1: u1 closes one session (2 events) and opens another
        _write_events(
            spark,
            src,
            [("u1", ts(0), 1.0), ("u1", ts(60), 2.0), ("u1", ts(5000), 10.0), ("u2", ts(0), 5.0)],
        )
        got = _poll(spark, "sessions_live", lambda g: ("u1", 2, 3.0) in g)
        assert ("u1", 2, 3.0) in got       # gap-closed session emitted
        assert ("u1", 1, 10.0) not in got  # open session held in state

        # batch 2: ts(5060) must MERGE into the state carried from batch 1;
        # ts(9000) then closes the merged session (value 10+20)
        _write_events(spark, src, [("u1", ts(5060), 20.0), ("u1", ts(9000), 7.0)])
        got = _poll(spark, "sessions_live", lambda g: ("u1", 2, 30.0) in g)
        assert ("u1", 2, 30.0) in got      # cross-batch state merge
        assert ("u2", 1, 5.0) not in got   # u2 not expired yet

        # no more data: idle state expires and open sessions flush (no-data
        # micro-batches fire the processing-time timeouts)
        got = _poll(
            spark,
            "sessions_live",
            lambda g: ("u2", 1, 5.0) in g and ("u1", 1, 7.0) in g,
            timeout_s=90,
        )
        assert ("u2", 1, 5.0) in got       # u2's open session flushed
        assert ("u1", 1, 7.0) in got       # u1's last open session flushed
    finally:
        q.stop()


def test_stateful_sessionize_out_of_order_straggler(spark, tmp_path):
    """Cross-batch straggler semantics (review finding): an event more
    than a gap BEFORE the open session must emit as its own closed
    session (not be silently absorbed), and one inside the envelope
    must merge while extending session_start backward."""
    from horus_spark.streaming.incremental import stateful_sessionize

    src = str(tmp_path / "events_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 6, 1, 12, 0, 0)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    stream = spark.readStream.schema(
        "user_id string, ts timestamp, value double"
    ).parquet(src)
    sessions = stateful_sessionize(stream, gap_seconds=1800, state_timeout_ms=15_000)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_straggler")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        _write_events(spark, src, [("u3", ts(10000), 1.0)])
        _poll(spark, "sessions_straggler", lambda g: False, timeout_s=3)
        # batch 2: ts(3000) is 7000s BEFORE the open session's start ->
        # its own closed session; ts(9000) is within the gap before
        # start -> merges and stretches session_start back to ts(9000)
        _write_events(spark, src, [("u3", ts(3000), 5.0), ("u3", ts(9000), 2.0)])
        got = _poll(
            spark, "sessions_straggler", lambda g: ("u3", 1, 5.0) in g
        )
        assert ("u3", 1, 5.0) in got  # straggler emitted, not absorbed
        # idle flush: the merged open session has 2 events and the
        # extended start
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "select * from sessions_straggler where n_events = 2"
            ).collect()
            if rows:
                break
            time.sleep(0.5)
        assert rows, "merged session never flushed"
        [r] = rows
        assert r.total_value == 3.0
        assert r.session_start == ts(9000)
        assert r.session_end == ts(10000)
    finally:
        q.stop()
