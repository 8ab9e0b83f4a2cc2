"""applyInPandasWithState: state accumulates across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from scalable_data_ingestion_spark.streaming.stateful import running_user_totals


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, "user_id long, value double").coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "events_src")
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")
    _write_batch(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])

    def drain():
        stream = (
            spark.readStream.schema("user_id long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def sink(batch_df, batch_id):
            batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
                out_dir
            )

        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out_dir)

    out1 = drain()
    max_batch_1 = out1.agg(F.max("batch_id")).first()[0]
    got1 = {r["user_id"]: (r["n_events_total"], r["sum_value_total"]) for r in out1.collect()}
    assert got1 == {1: (2, 15.0), 2: (1, 1.0)}

    # second file arrives: state must carry over through the checkpoint
    _write_batch(spark, src, [(1, 2.5), (3, 7.0)])
    out2 = drain().filter(F.col("batch_id") > max_batch_1)
    got2 = {r["user_id"]: (r["n_events_total"], r["sum_value_total"]) for r in out2.collect()}
    # update mode emits only keys seen in the new batch, with lifetime totals
    assert got2 == {1: (3, 17.5), 3: (1, 7.0)}


def test_stateful_over_real_events(spark, tmp_path):
    """Drain the sf0.001 events table; lifetime totals equal the batch
    groupBy (last emitted row per user)."""
    from scalable_data_ingestion_spark.streaming.windows import event_stream_from_parquet

    stream = event_stream_from_parquet(spark, "/root/testdata/sf0.001/events.parquet")
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("totals_real")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: (r["n_events_total"], round(r["sum_value_total"], 4))
        for r in spark.table("totals_real").collect()
    }
    from scalable_data_ingestion_spark.catalog import table

    expected = {
        r["user_id"]: (r["n"], round(r["s"], 4))
        for r in table(spark, "/root/testdata/sf0.001", "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    }
    assert got == expected


def test_transform_with_state_watermarks(spark, tmp_path):
    """transformWithStateInPandas: ValueState carries (count, max)
    across micro-batches through the RocksDB store + checkpoint.

    Gated on protobuf: the TWS Python driver worker imports
    google.protobuf at startup (Spark's streaming runner protocol), so
    environments without it can't run the operator at all — same
    import-gate policy as the multimodal codecs.
    """
    pytest.importorskip("google.protobuf")
    from scalable_data_ingestion_spark.streaming.stateful import user_value_watermarks

    src = str(tmp_path / "tws_src")
    ckpt = str(tmp_path / "tws_ckpt")
    out_dir = str(tmp_path / "tws_out")
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        _write_batch(spark, src, [(1, 10.0), (1, 5.0), (2, 1.0)])

        def drain():
            stream = (
                spark.readStream.schema("user_id long, value double")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )

            def sink(batch_df, batch_id):
                batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(out_dir)

            q = (
                user_value_watermarks(stream)
                .writeStream.foreachBatch(sink)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return spark.read.parquet(out_dir)

        out1 = drain()
        max_batch_1 = out1.agg(F.max("batch_id")).first()[0]
        got1 = {r["user_id"]: (r["n_events_total"], r["max_value"]) for r in out1.collect()}
        assert got1 == {1: (2, 10.0), 2: (1, 1.0)}

        # new micro-batch: user 1's max must NOT regress below 10
        _write_batch(spark, src, [(1, 2.5), (3, 7.0)])
        out2 = drain().filter(F.col("batch_id") > max_batch_1)
        got2 = {r["user_id"]: (r["n_events_total"], r["max_value"]) for r in out2.collect()}
        assert got2 == {1: (3, 10.0), 3: (1, 7.0)}
    finally:
        if prev is not None:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
