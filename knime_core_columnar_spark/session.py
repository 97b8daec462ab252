"""SparkSession factory with scale-oriented defaults.

The reference tunes a single-JVM pipeline (batch geometry, cache sizes,
thread pools — ``ColumnarPreferenceUtils.java:161-262``,
``HeapBadger.java:94-97``). On Spark the equivalents are session-level
configs: AQE for runtime re-planning, partition sizing, broadcast
thresholds, Arrow for the Python boundary. Tests run on ``local[N]`` but
every default below is chosen to also hold on a 1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Parquet row groups ≅ the reference's ~64 MiB write batches
# (HeapBadger.java:97); 128 MiB input splits are the Spark-standard
# balance between task overhead and memory at 100 TB inputs.
_DEFAULTS: dict[str, str] = {
    # Runtime re-planning: coalesce small shuffle partitions, split skewed
    # ones, demote/promote join strategies with real statistics.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow-accelerated Python boundary (Pandas UDFs, toPandas).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "32768",
    # Broadcast dims up to 64 MiB — region/nation/supplier style tables
    # stay broadcast even at large SF.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Scan geometry.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.sql.parquet.filterPushdown": "true",
    # Read INT64 TIMESTAMP(NANOS) parquet columns (e.g. events.ts) as long;
    # sources.load_table converts them to timestamp_ntz at micro precision.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Planner niceties.
    "spark.sql.cbo.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "knime-core-columnar-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and submit through spark-submit / YARN / K8s.
    ``shuffle_partitions`` defaults to 32 locally (matching local cores);
    on a cluster AQE coalescing makes a high initial value safe, so pass
    e.g. 2000 there.
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = builder.master(master)
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    conf["spark.ui.enabled"] = "false"
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
