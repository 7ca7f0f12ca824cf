"""Custom stateful streaming operators (applyInPandasWithState).

NOTE: queries with ProcessingTimeTimeout re-trigger micro-batches while
any group state is armed, so ``processAllAvailable()`` never settles —
tests poll the memory sink for the expected rows instead (bounded).
"""

import datetime as dt
import time

import pytest
from pyspark.sql import types as T

from easyner_spark.streaming.stateful import first_seen_filter, sessionized_user_stats

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_id", T.LongType()),
    ]
)


def _poll(spark, query, table, predicate, timeout_s=90):
    t0 = time.time()
    while time.time() - t0 < timeout_s:
        time.sleep(3)
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if predicate(rows):
            return rows
        if not query.isActive:
            break
    raise AssertionError(
        f"{table}: condition not reached; rows={spark.sql(f'SELECT * FROM {table}').collect()}"
        f" exc={query.exception()}"
    )


def test_sessionized_user_stats(spark, tmp_path):
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    base = dt.datetime(2026, 1, 1)
    rows = [
        # user 1: two sessions separated by a 3h gap (closes in-batch)
        (1, base, 1),
        (1, base + dt.timedelta(minutes=5), 2),
        (1, base + dt.timedelta(hours=3), 3),
        # user 2: one (still open) session
        (2, base, 4),
        (2, base + dt.timedelta(minutes=10), 5),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionized_user_stats(stream, gap_seconds=1800, timeout_ms=5_000)
        .writeStream.format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        # in-batch closed session for user 1 (2 events, 5-minute span)
        got = _poll(
            spark, q, "sess_out",
            lambda rs: any(r["user_id"] == 1 and r["n_events"] == 2 for r in rs),
        )
        r = next(r for r in got if r["user_id"] == 1 and r["n_events"] == 2)
        assert r["end_us"] - r["start_us"] == 5 * 60 * 1_000_000
        # open sessions flush via the processing-time timeout
        _poll(
            spark, q, "sess_out",
            lambda rs: any(r["user_id"] == 2 and r["n_events"] == 2 for r in rs),
        )
    finally:
        q.stop()


def test_first_seen_filter_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "in")
    ck = str(tmp_path / "ck")
    schema = T.StructType([T.StructField("url", T.StringType())])

    def w(urls):
        spark.createDataFrame([(u,) for u in urls], schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    w(["a", "b", "a"])
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        first_seen_filter(stream)
        .writeStream.format("memory")
        .queryName("fs_out")
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    try:
        _poll(spark, q, "fs_out", lambda rs: {r["url"] for r in rs} >= {"a", "b"})
        # second micro-batch re-sends 'a' and adds 'c'
        w(["a", "c"])
        _poll(spark, q, "fs_out", lambda rs: "c" in {r["url"] for r in rs})
        time.sleep(5)  # allow any (incorrect) duplicate emission to land
        got = sorted(r["url"] for r in spark.sql("SELECT * FROM fs_out").collect())
        assert got == ["a", "b", "c"]  # 'a' emitted exactly once across batches
    finally:
        q.stop()
