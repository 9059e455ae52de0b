import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # executor Python workers import pyspark_skyline_spark by NAME for
    # module-level applyInPandas functions (cloudpickle by-reference);
    # make that work from any cwd, as --py-files would on a cluster
    os.environ["PYTHONPATH"] = (
        repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")
    )
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("pyspark-skyline-tests")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
