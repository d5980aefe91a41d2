"""SparkSession factory with scale-oriented defaults.

AQE is on (runtime re-plan, skew-join splitting), Arrow is on (vectorized
pandas/Arrow UDF transfer), shuffle partitions default to the local core
count. On a real cluster the same builder is used by spark-submit with
`--py-files relation_graph_spark.zip` (north rule); nothing here assumes
local mode except the default master.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "relation-graph-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[32]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # see closure.ensure_iteration_confs: Spark 4.1 constraint-rewrite bug
        # on localCheckpoint of semi-naive union plans
        .config("spark.sql.constraintPropagation.enabled", "false")
        # stateful-streaming state (applyInPandasWithState dedup,
        # dropDuplicatesWithinWatermark, windowed aggs) lives in RocksDB —
        # off-heap, spillable, incrementally checkpointed — instead of the
        # default in-memory HDFSBackedStateStore, which caps state at
        # executor heap. Spark 4.x bundles the provider. Override with
        # RGS_STATE_STORE=hdfs to fall back.
        .config(
            "spark.sql.streaming.stateStore.providerClass",
            (
                "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
                if os.environ.get("RGS_STATE_STORE", "rocksdb").lower() == "rocksdb"
                else "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
            ),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
