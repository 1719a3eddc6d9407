"""Cross-micro-batch state merge for streaming sessionization
(VERDICT r4 #3): the round-4 streaming oracles drained with
AvailableNow and could complete in ONE micro-batch, leaving
``session_window``'s state-merge path unexercised. Here the input is
split into 4 time-range files, drained with ``maxFilesPerTrigger=1``
(≥4 micro-batches), with sessions DESIGNED to straddle every file
boundary — the final complete-mode output must equal the batch
``session_window`` result exactly.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

GAP = "1800 seconds"


def _events(spark):
    # user A: one 6-hour session, events every 20 min (< 30-min gap) —
    # MUST merge across every file boundary. user B: four separate
    # sessions (one per quarter, 2h apart). user C: two sessions that
    # straddle the 2nd and 3rd boundaries.
    rows = []
    base = 1_600_000_000
    for i in range(19):
        rows.append(("A", base + i * 1200, 1.0))
    for q in range(4):
        rows.append(("B", base + q * 7200, 10.0 + q))
    rows.append(("C", base + 5400 - 600, 0.5))
    rows.append(("C", base + 5400 + 600, 0.5))  # straddles 1.5h mark
    rows.append(("C", base + 16200 - 600, 0.25))
    rows.append(("C", base + 16200 + 600, 0.25))
    return spark.createDataFrame(rows, "user_id string, sec long, value double").select(
        "user_id", F.timestamp_seconds("sec").alias("ts"), "value"
    )


def _agg(df):
    return (
        df.groupBy(F.session_window(F.col("ts"), GAP).alias("session"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("session.start").cast("timestamp")).alias("s_us"),
            F.unix_micros(F.col("session.end").cast("timestamp")).alias("e_us"),
            "n_events",
            "sum_value",
        )
    )


def test_session_merge_across_micro_batches(spark):
    ev = _events(spark)
    stage = tempfile.mkdtemp(prefix="mb_stage_")
    # 4 time-range files: every session of user A spans all of them
    ev.repartitionByRange(4, F.col("ts")).write.mode("overwrite").parquet(stage)

    sch = ev.schema
    name = f"mb_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        _agg(
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(stage)
        )
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="mb_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream drain timed out"
    batch_ids = set()
    for p in q.recentProgress:
        try:
            batch_ids.add(p.batchId)
        except AttributeError:
            batch_ids.add(p["batchId"])
    assert len(batch_ids) >= 3, f"only {len(batch_ids)} micro-batches ran"

    streamed = sorted(map(tuple, spark.table(name).collect()))
    batch = sorted(map(tuple, _agg(ev).collect()))
    assert streamed == batch

    # the designed merges actually happened: A collapsed to ONE session
    per_user = {u: n for u, n in spark.table(name).groupBy("user_id")
                .count().collect()}
    assert per_user == {"A": 1, "B": 4, "C": 2}
    a = spark.table(name).where(F.col("user_id") == "A").first()
    assert a["n_events"] == 19 and a["sum_value"] == 19.0


def test_oracled_stream_sessions_runs_multibatch(spark):
    """The driver-gate query itself (not just this sibling) must raise
    if its drain ever degrades to <3 micro-batches."""
    import __spark_entry__ as entry

    out = entry.q_stream_sessions(spark, "/root/testdata/sf0.001")
    # equality vs the batch session_window over the same staged files
    stage = f"{entry._oracle_dir('/root/testdata/sf0.001')}/events_stream4"
    ev = spark.read.parquet(stage)
    ep = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    batch = (
        ev.groupBy(F.session_window(F.col("ts"), GAP).alias("session"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,10)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select("user_id", ep("session.start").alias("session_start_us"),
                ep("session.end").alias("session_end_us"),
                "n_events", "sum_value")
    )
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, batch.collect()))
