"""pyspark-skyline-engine: a PySpark-native skyline (Pareto frontier) and
LLM-data-pipeline operator library.

Re-expresses the capabilities of the reference project
miketheologitis/PySpark-Skyline (see SURVEY.md) as an idiomatic Spark
DataFrame library: native Column expressions for partitioning keys,
``applyInPandas`` NumPy kernels for the dominance test, and a
tree-structured final merge in place of the reference's single-task
global reduce (reference: src/jobs/batch_job.py:183-188).
"""

from pyspark_skyline_spark.kernel import find_skyline_mask, skyline_of_array
from pyspark_skyline_spark.parser import parse_skyline_query
from pyspark_skyline_spark.operators.skyline import skyline, skyline_sql

__all__ = [
    "find_skyline_mask",
    "skyline_of_array",
    "parse_skyline_query",
    "skyline",
    "skyline_sql",
]
