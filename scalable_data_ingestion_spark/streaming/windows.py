"""Streaming event-time windows with watermarks (SURVEY.md §7 step 7).

Reuses the exact window builders from ``queries.py`` over a streaming
source — batch and streaming share one definition of every aggregate,
so the oracle-checked batch results certify the streaming semantics
(modulo late-data handling, which only exists here).

Late data: ``withWatermark`` bounds state and drops events later than
the threshold. In a real deployment the watermark is sized to the
source's observed lateness; tests use a generous watermark so nothing
drops at replay speed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .queries import session_agg, sliding_agg, tumbling_agg


def event_stream_from_parquet(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 10
) -> DataFrame:
    """Replay an events parquet directory as a stream (test/backfill
    harness; production swaps in Kafka or file drops)."""
    import os
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file streams need a directory; stage a single parquet file via
    # symlink into a temp dir (testdata tables are single files).
    if os.path.isfile(events_dir):
        staged = tempfile.mkdtemp(prefix="sdi_stream_")
        os.symlink(os.path.abspath(events_dir), os.path.join(staged, "part-0.parquet"))
        events_dir = staged
    static = spark.read.parquet(events_dir)
    schema = static.schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    if isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("CAST(ts DIV 1000 AS LONG)")))
    elif isinstance(df.schema["ts"].dataType, T.TimestampNTZType):
        # newer parquet readers surface the NANOS column as TIMESTAMP_NTZ,
        # which withWatermark rejects; the session runs in UTC so the cast
        # to TIMESTAMP is value-preserving.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def streaming_tumbling(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    return tumbling_agg(events.withWatermark("ts", watermark))


def streaming_sliding(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    return sliding_agg(events.withWatermark("ts", watermark))


def streaming_sessions(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    return session_agg(events.withWatermark("ts", watermark))


def run_to_memory(
    df: DataFrame, name: str, spark: SparkSession, output_mode: str = "complete"
) -> DataFrame:
    """Drain a streaming query into an in-memory table and return the
    result as a batch DataFrame. Aggregations use ``complete``;
    stream-stream joins emit rows once and need ``append``."""
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)
