"""Sessionization: batch (lag+cumsum) == streaming (session_window),
and cross-micro-batch stateful keep-first dedup."""

from __future__ import annotations

from conftest import load_events, write_events_source

import shutil

from aiotcvectordb_spark.streaming.session import (
    sessionize_batch,
    sessionize_stream,
    stateful_dedup_first,
)


def _key(rows):
    return {
        (r.user_id, r.session_start): (r.session_end, r.n_events, round(r.value_sum, 6))
        for r in rows
    }


def test_batch_session_properties(spark, sf_dir):
    events = load_events(spark, sf_dir)
    sessions = sessionize_batch(events, gap="30 minutes").collect()
    assert sessions
    assert sum(r.n_events for r in sessions) == events.count()
    for r in sessions:
        assert r.session_start <= r.session_end
    # sessions of the same user are separated by >= gap
    by_user: dict[int, list] = {}
    for r in sessions:
        by_user.setdefault(r.user_id, []).append(r)
    for rs in by_user.values():
        rs.sort(key=lambda r: r.session_start)
        for a, b in zip(rs, rs[1:]):
            assert b.session_start - a.session_end >= 1800


def test_stream_session_equals_batch(spark, sf_dir, tmp_path):
    events = load_events(spark, sf_dir)
    batch = _key(sessionize_batch(events).collect())

    src = tmp_path / "src"
    src.mkdir()
    write_events_source(spark, sf_dir, src)
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = _key(spark.sql("SELECT * FROM sess").collect())
    assert streamed == batch


def test_udtf_session_equals_batch(spark, sf_dir):
    """The sessionize_by_gap SQL table function must produce the same
    sessions as the programmatic lag+cumsum batch path."""
    from aiotcvectordb_spark import queries as Q

    batch = _key(Q.q_sessionize(spark, sf_dir).collect())
    via_udtf = _key(Q.q_sessionize_udtf(spark, sf_dir).collect())
    assert via_udtf == batch


def test_udtf_session_boundaries(spark):
    """Gap >= threshold starts a new session; ties within a user order
    by the tiebreak column; state resets per PARTITION BY group."""
    from aiotcvectordb_spark.functions.session_udtf import (
        register_sessionize_udtf,
        sessionize_sql,
    )

    register_sessionize_udtf(spark)
    rows = [
        (1, 1, 0, 1.0),
        (1, 2, 100, 1.0),
        (1, 3, 1900, 1.0),   # 1800s after prev -> new session
        (2, 4, 0, 1.0),      # new user -> counter resets
    ]
    spark.createDataFrame(
        rows, "user_id long, event_id long, ts_sec long, value double"
    ).createOrReplaceTempView("events_udtf_unit")
    got = {
        (r.user_id, r.event_id): r.session_no
        for r in spark.sql(
            sessionize_sql("events_udtf_unit", gap_seconds=1800)
        ).collect()
    }
    assert got == {(1, 1): 1, (1, 2): 1, (1, 3): 2, (2, 4): 1}


def test_stateful_dedup_crosses_microbatches(spark, sf_dir, tmp_path):
    events = load_events(spark, sf_dir)
    half = events.count() // 2
    a = events.orderBy("event_id").limit(half)
    b = events.orderBy("event_id").offset(half)
    src = tmp_path / "src"
    # two files -> two micro-batches (maxFilesPerTrigger=1); users present
    # in both files must be emitted exactly once, from the first batch
    a.coalesce(1).write.parquet(str(src / "f0"))
    b.coalesce(1).write.parquet(str(src / "f1"))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = (
        stateful_dedup_first(stream, key_col="user_id", id_col="event_id")
        .writeStream.format("memory")
        .queryName("dedup_first")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    out = spark.sql("SELECT * FROM dedup_first").collect()
    users = [r.user_id for r in out]
    assert len(users) == len(set(users))  # exactly once per user
    assert set(users) == {r.user_id for r in events.select("user_id").collect()}


def test_dedup_within_watermark_bounded_state(spark, sf_dir, tmp_path):
    """Built-in dropDuplicatesWithinWatermark: one row per user when the
    delay spans the whole dataset, and the streaming plan carries an
    eviction watermark (bounded state, unlike plain dropDuplicates)."""
    from aiotcvectordb_spark.streaming.session import dedup_within_watermark

    events = load_events(spark, sf_dir)
    n_users = events.select("user_id").distinct().count()

    src = tmp_path / "src"
    src.mkdir()
    import shutil

    write_events_source(spark, sf_dir, src)
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    # delay far wider than the data's time span -> exactly one per user
    out = dedup_within_watermark(stream, key_col="user_id", delay="365 days")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("ddww")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM ddww").collect()
    users = [r.user_id for r in rows]
    assert len(users) == len(set(users)) == n_users
