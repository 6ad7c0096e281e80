"""Structured Streaming over the `events` table (SURVEY §2.9 extension).

The reference has no streaming operators (it is an OLTP store); this module
is the capability extension mandated by the north star: watermarked
tumbling/sliding/session windows and streaming dedup, written so the same
transformation applies to a batch frame (for oracle checks) and a
``readStream`` frame (for production).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch events table; the source stores ts as TIMESTAMP(NANOS) which
    Spark reads as long (nanosAsLong) — normalize to microsecond timestamp."""
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    return _normalize_ts(df)


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Watermarks require TimestampType; the source parquet stores ts either
    as TIMESTAMP(NANOS) (read as long) or as timestamp-without-zone (read as
    TIMESTAMP_NTZ). Session tz is pinned to UTC so the NTZ cast is lossless."""
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long")))
    if isinstance(dt, T.TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_stream(spark: SparkSession, sf_dir: str,
                  max_files_per_trigger: int = 1) -> DataFrame:
    """Replay the events parquet as a stream (deterministic source)."""
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    raw = (spark.readStream
           .schema(batch.schema)
           .option("maxFilesPerTrigger", max_files_per_trigger)
           .option("pathGlobFilter", "events.parquet")
           .parquet(sf_dir))
    return _normalize_ts(raw)


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (ev.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.round(F.sum("value"), 2).alias("total_value"))
              .select(F.unix_seconds(F.col("w.start").cast("timestamp"))
                      .alias("window_start"),
                      "event_type", "n", "total_value"))


def sliding_avg(events: DataFrame, window: str = "1 hour",
                slide: str = "30 minutes",
                watermark: str = "2 hours") -> DataFrame:
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (ev.groupBy(F.window("ts", window, slide).alias("w"))
              .agg(F.round(F.avg("value"), 6).alias("avg_value"),
                   F.count(F.lit(1)).alias("n"))
              .select(F.unix_seconds(F.col("w.start").cast("timestamp"))
                      .alias("window_start"), "avg_value", "n"))


def session_windows(events: DataFrame, gap: str = "10 minutes",
                    watermark: str = "2 hours") -> DataFrame:
    """Per-user session windows (session_window gap merge)."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (ev.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 2).alias("session_value"))
              .select("user_id",
                      F.unix_seconds(F.col("w.start").cast("timestamp"))
                      .alias("session_start"),
                      "n_events", "session_value"))


def stream_dedup(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Exactly-once by event_id within the watermark (dropDuplicates keeps
    state bounded by the watermark in streaming mode)."""
    ev = events.withWatermark("ts", watermark) if events.isStreaming else events
    return ev.dropDuplicates(["event_id"])


def json_props(events: DataFrame) -> DataFrame:
    """Dynamic JSON props -> typed column (from_json map escape hatch)."""
    return events.withColumn(
        "props_map",
        F.from_json(F.col("props"), "map<string,string>"))


def run_stream_to_memory(stream_df: DataFrame, name: str) -> None:
    """Drain a stream into an in-memory table with availableNow (test/dev)."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()


def interval_self_join(events: DataFrame, horizon_seconds: int = 600,
                       watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: for each 'click'-side event, the
    'view'-side events by the same user within the preceding horizon.
    In streaming mode both sides carry watermarks and the time-range
    predicate bounds the join state (Structured Streaming's
    stream-stream inner join contract); in batch mode the identical plan
    is a range-condition join."""
    left = events.filter(F.col("event_type") == "click") \
        .select(F.col("user_id").alias("l_user"),
                F.col("ts").alias("l_ts"),
                F.col("event_id").alias("l_id"))
    right = events.filter(F.col("event_type") == "view") \
        .select(F.col("user_id").alias("r_user"),
                F.col("ts").alias("r_ts"),
                F.col("event_id").alias("r_id"))
    if events.isStreaming:
        left = left.withWatermark("l_ts", watermark)
        right = right.withWatermark("r_ts", watermark)
    cond = ((F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts")
               - F.expr(f"INTERVAL {horizon_seconds} SECONDS"))
            & (F.col("r_ts") < F.col("l_ts")))
    return left.join(right, cond)
