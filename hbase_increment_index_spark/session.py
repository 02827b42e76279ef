"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-planning, skew-join splitting, partition
coalescing), shuffle partitions sized to the parallelism rather than
the 200 default, Arrow enabled for any pandas exchange, UTC session
timezone so timestamp arithmetic is reproducible against the DuckDB
oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hbase_increment_index_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    On a real cluster ``master``/memory come from spark-submit; here we
    default to ``local[$SPARK_GRAFT_CPUS]``. ``spark.sql.shuffle.partitions``
    defaults to the core count — at 100 TB you would size this to
    ~(total input / 128 MB) or simply let AQE coalesce from a high
    initial value, which is exactly what
    ``spark.sql.adaptive.coalescePartitions.enabled`` gives us.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    # AQE stays ON by default (the production setting — runtime
    # re-planning, skew splitting, partition coalescing). The env dial
    # exists for toy-scale correctness runs (the pytest suite at
    # sf0.001) where per-stage re-optimization latency outweighs any
    # re-planning benefit; results are identical either way.
    aqe = os.environ.get("SPARK_GRAFT_AQE", "1") != "0"

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true" if aqe else "false")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
