"""Reusable column-expression builders (array math, hashing, tokens)."""

from pyspark_skyline_spark.operators.similarity import cosine, dot_product, l2_norm
from pyspark_skyline_spark.operators.dedup import hash64_expr, shingles
from pyspark_skyline_spark.operators.text import tokens

__all__ = ["cosine", "dot_product", "l2_norm", "hash64_expr", "shingles", "tokens"]
