"""Semi-structured JSON column operators (north-star extension;
completes the JSON-functions category beyond the Kafka edge builders in
``sources/streams.py`` — the reference touches JSON only at its Kafka
edges, ``batch_job.py:140,165-169``).

Event/metadata tables at pipeline scale routinely carry a free-form
JSON string column (here ``events.props``). These operators expose it
relationally without ever leaving the JVM:

- ``json_extract``: typed field extraction via ``get_json_object`` —
  pure Catalyst expressions, whole-stage-codegen'd, scan-speed.
- ``infer_json_schema``: bounded-sample schema inference (the sample —
  default 256 docs — is the ONLY driver materialization; the schema it
  returns then drives a fully distributed parse).
- ``json_flatten``: ``from_json`` with an explicit or inferred schema,
  top-level fields promoted to real columns; malformed documents parse
  to NULLs (PERMISSIVE), never fail the job.

At 100 TB the extraction path matters: ``get_json_object`` on a
projected column pushes the parquet scan down to (id, props) only, and
each task parses its own rows — no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType

__all__ = ["json_extract", "infer_json_schema", "json_flatten"]


def json_extract(
    df: DataFrame,
    col: str,
    fields: list[tuple[str, str, str]],
) -> DataFrame:
    """Extract typed fields from a JSON string column.

    ``fields`` is a list of ``(out_name, json_path, cast_type)`` —
    ``json_path`` in ``$.a.b[0]`` form, ``cast_type`` any Spark DDL
    type (``"bigint"``, ``"double"``, ``"string"``, ...). Missing
    paths, malformed documents, and failed casts all yield NULL (the
    ANSI-lenient semantics every JSON engine uses for ``->>``).

    Pure ``get_json_object`` + ``cast`` expressions: stays inside
    whole-stage codegen, needs only ``col`` from the scan.
    """
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in DataFrame columns {df.columns}")
    if not fields:
        raise ValueError("fields must be non-empty")
    out: list[Column] = []
    for out_name, path, cast_type in fields:
        if not path.startswith("$"):
            raise ValueError(f"json path {path!r} must start with '$'")
        c = F.get_json_object(F.col(col), path)
        if cast_type.lower() not in ("string", "varchar"):
            # try_cast, not cast: under ANSI mode (Spark 4 default) a
            # plain cast would fail the job on the first unparseable
            # value; JSON ->> semantics are NULL-on-failure
            c = c.try_cast(cast_type)
        out.append(c.alias(out_name))
    return df.select(*df.columns, *out)


def infer_json_schema(df: DataFrame, col: str, sample: int = 256) -> StructType:
    """Infer a Spark schema for a JSON string column from a bounded
    sample.

    Collects up to ``sample`` non-null documents to the driver (a
    bounded, documented materialization — ``sample`` docs, not row
    scale) and runs Spark's own JSON schema inference over them, so the
    result merges types across documents exactly the way
    ``spark.read.json`` would. Fields seen in no sampled document are
    absent; widen ``sample`` or pass an explicit schema to
    ``json_flatten`` when the tail matters.
    """
    if col not in df.columns:
        raise ValueError(f"column {col!r} not in DataFrame columns {df.columns}")
    if sample <= 0:
        raise ValueError("sample must be positive")
    docs = [
        r[0]
        for r in df.select(col).where(F.col(col).isNotNull()).limit(sample).collect()
    ]
    if not docs:
        raise ValueError(f"no non-null documents in {col!r} to infer a schema from")
    spark = df.sparkSession
    inferred = spark.read.json(spark.sparkContext.parallelize(docs, 1))
    schema = StructType([f for f in inferred.schema.fields if f.name != "_corrupt_record"])
    if not schema.fields:
        raise ValueError(f"sampled documents in {col!r} contain no parseable JSON objects")
    return schema


def json_flatten(
    df: DataFrame,
    col: str,
    schema: StructType | None = None,
    prefix: str = "",
    drop: bool = True,
    sample: int = 256,
) -> DataFrame:
    """Parse a JSON string column with ``from_json`` and promote its
    top-level fields to real columns named ``prefix + field``.

    ``schema=None`` infers one via :func:`infer_json_schema` (bounded
    sample). Parsing is PERMISSIVE: malformed documents yield NULL in
    every promoted column. ``drop=True`` removes the raw string column.
    Name collisions with existing columns are rejected loudly rather
    than silently shadowed.
    """
    if schema is None:
        schema = infer_json_schema(df, col, sample=sample)
    parsed = F.from_json(F.col(col), schema)
    out_names = [prefix + f.name for f in schema.fields]
    keep = [c for c in df.columns if not (drop and c == col)]
    clash = [n for n in out_names if n in keep]
    if clash:
        raise ValueError(
            f"flattened field names {clash} collide with existing columns; "
            "set prefix= to disambiguate"
        )
    tmp = "__json_parsed"
    res = df.withColumn(tmp, parsed)
    # index with getItem (F.col(tmp)[name]) rather than a dotted path
    # string: JSON keys legally contain dots ("user.id"), which a path
    # string would mis-parse as nested struct access
    return res.select(
        *keep,
        *[F.col(tmp)[f.name].alias(prefix + f.name) for f in schema.fields],
    )
