"""Watermark observability: late rows are DROPPED and COUNTED.

The operational contract of every watermarked aggregation: data older
than the advanced watermark is excluded from results, and the drop is
visible in the query's progress metrics (numRowsDroppedByWatermark) —
the signal an ingestion monitor alarms on when an upstream feed starts
delivering stale events.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_late_rows_dropped_and_counted(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drop(rows):
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).parquet(str(src))
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count("*").alias("n"))
    )

    def run_once():
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return q

    # batch 1 advances the watermark to T0 + 2h - 30min
    drop([(1, T0, 1.0), (2, T0 + dt.timedelta(hours=2), 2.0)])
    run_once()

    # batch 2: one row far behind the watermark (dropped + counted),
    # one fresh row (kept)
    drop([(3, T0 - dt.timedelta(hours=1), 3.0),
          (4, T0 + dt.timedelta(hours=3), 4.0)])
    q2 = run_once()

    dropped = sum(
        so.get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        for so in p["stateOperators"]
    )
    assert dropped == 1

    # and the late row's window never reaches the sink
    windows = {
        r["window"]["start"] for r in spark.read.parquet(out).collect()
    }
    assert T0 - dt.timedelta(hours=1) not in windows
