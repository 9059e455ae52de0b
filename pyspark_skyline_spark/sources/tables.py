"""Batch sources.

The reference ingests CSV exclusively as Kafka payloads decoded with
``from_csv`` (src/jobs/batch_job.py:86-94; README.md:104 pushes files via
kafka-console-producer). This engine reads files directly — parquet for
the synthetic star schema, plus the reference's own headerless
``x1,...,xd`` integer CSV format (src/utils/functions.py:362-365) for
golden-output replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to
        # read natively (PARQUET_TYPE_ILLEGAL). Read it as raw nanos and
        # truncate to microseconds with exact integer division — the same
        # truncation DuckDB applies when it coerces NANOS to its us
        # TIMESTAMP, so oracle comparisons line up.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000").cast("long"))
            )
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_points_csv(spark: SparkSession, path: str, d: int) -> DataFrame:
    """Read the reference's headerless d-column integer point CSV with
    the same ``x1 INT, ..., xd INT`` schema (reference
    src/utils/functions.py:355-365)."""
    ddl = ", ".join(f"x{i} INT" for i in range(1, d + 1))
    return spark.read.schema(ddl).csv(path)
