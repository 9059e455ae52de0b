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
    "kafka_csv_points_source",
    "kafka_json_sink_writer",
    "file_stream_source",
]


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
    ddl = ", ".join(f"x{i} INT" for i in range(1, d + 1))
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(
        F.from_csv(F.col("value").cast("string"), ddl).alias("data")
    ).select("data.*")


def kafka_json_sink_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str | None = None,
):
    """writeStream builder emitting each row as a JSON object (the
    reference emits JSON skyline arrays, batch_job.py:137-141; rows are
    the more composable unit — consumers aggregate per key)."""
    cols = [c for c in df.columns if c != key_col]
    value = F.to_json(F.struct(*cols)).alias("value")
    sel = [value]
    if key_col:
        sel.insert(0, F.col(key_col).cast("string").alias("key"))
    return (
        df.select(*sel)
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
