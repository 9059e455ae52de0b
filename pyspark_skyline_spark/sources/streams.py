"""Streaming sources/sinks: Kafka edges (reference parity) + file streams.

The reference's only I/O is Kafka (src/jobs/batch_job.py:86-94,
144-153): CSV records in, JSON skyline arrays out. These builders
produce the same edge contracts on Structured Streaming. The Kafka
connector jar is not part of this environment, so these are exercised by
unit tests at the plan/options level and integration-gated at runtime
(``require_kafka``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "kafka_available",
    "decode_csv_points",
    "encode_json_records",
    "kafka_csv_points_source",
    "kafka_json_sink_writer",
    "file_stream_source",
]


def decode_csv_points(raw: DataFrame, d: int, value_col: str = "value") -> DataFrame:
    """Kafka-record-shaped rows (binary/string ``value``) -> x1..xd INT.

    The reference's exact ingest decode (batch_job.py:92-94:
    ``CAST(value AS STRING)`` + ``from_csv`` + flatten), factored off
    the transport so the transform round-trips in tests without a
    broker; works identically on batch and streaming DataFrames.
    """
    ddl = ", ".join(f"x{i} INT" for i in range(1, d + 1))
    return raw.select(
        F.from_csv(F.col(value_col).cast("string"), ddl).alias("data")
    ).select("data.*")


def encode_json_records(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Rows -> Kafka-record-shaped (key?, value) with a JSON-object
    value (reference egress contract, batch_job.py:137-141; one row per
    record — consumers aggregate per key). Transport-free twin of
    ``kafka_json_sink_writer`` for round-trip testing and batch writes.
    """
    cols = [c for c in df.columns if c != key_col]
    value = F.to_json(F.struct(*cols)).alias("value")
    sel = [value]
    if key_col:
        sel.insert(0, F.col(key_col).cast("string").alias("key"))
    return df.select(*sel)


def kafka_available(spark: SparkSession) -> bool:
    """True if the spark-sql-kafka connector is on the classpath."""
    try:
        spark.readStream.format("kafka").option("subscribe", "probe").option(
            "kafka.bootstrap.servers", "none:9092"
        ).load()
        return True
    except Exception as e:  # pragma: no cover - depends on classpath
        return "Failed to find data source" not in str(e)


def kafka_csv_points_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    d: int,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka topic of headerless CSV points -> streaming DataFrame of
    x1..xd INT (the reference's ingest contract, batch_job.py:86-94:
    ``CAST(value AS STRING)`` + ``from_csv`` + flatten)."""
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return decode_csv_points(raw, d)


def kafka_json_sink_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = None,
):
    """writeStream builder emitting each row as a JSON object (the
    reference emits JSON skyline arrays, batch_job.py:137-141; rows are
    the more composable unit — consumers aggregate per key)."""
    return (
        encode_json_records(df, key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )


def file_stream_source(
    spark: SparkSession,
    directory: str,
    schema,
    fmt: str = "parquet",
    max_files_per_trigger: int = 1,
    path_glob: str | None = None,
) -> DataFrame:
    reader = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if path_glob:
        reader = reader.option("pathGlobFilter", path_glob)
    return getattr(reader, fmt)(directory)
