"""SparkSession factory with the engine's scale-oriented defaults."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession


def _ship_package(spark: SparkSession) -> None:
    """Ship tilemaker_spark to executors (the spark-submit --py-files
    analog) so pandas-UDF workers can import it regardless of cwd."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    if not os.path.isdir(pkg_dir):
        # imported from a zip (spark-submit --py-files): already shipped
        return
    zip_base = os.path.join(tempfile.gettempdir(),
                            f"tilemaker_spark_pyfiles_{os.getpid()}")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=root,
                                   base_dir="tilemaker_spark")
    spark.sparkContext.addPyFile(zip_path)


def get_spark(app_name: str = "tilemaker_spark", master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a session.

    Defaults chosen for the target workload (wide shuffles keyed by tile
    ids, Arrow-heavy pandas UDFs):
      * AQE on (runtime coalescing + skew-join splitting),
      * Arrow enabled with a bounded records-per-batch so huge tiles
        don't blow a single Arrow batch,
      * shuffle partitions sized to cores by default (overridable; on a
        real cluster this would be ~2-3x total executor cores).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions",
                str(shuffle_partitions or int(cpus)))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        # timestamps in fixtures are naive UTC
        .config("spark.sql.session.timeZone", "UTC")
        # ANSI off: the engine relies on wraparound-free integer hashing
        # expressions that must evaluate identically to the DuckDB oracle
        .config("spark.sql.ansi.enabled", "false")
        # SPARK_GRAFT_TASK_CPUS > 1 reserves N cores per task slot —
        # used by the scaling benchmark to build UNCONTENDED local[k]
        # pairs (k JVM task threads + k Python workers must stay <=
        # physical cores, so slots = k / task.cpus)
        .config("spark.task.cpus",
                os.environ.get("SPARK_GRAFT_TASK_CPUS", "1"))
    )
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark
