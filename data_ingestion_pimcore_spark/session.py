"""SparkSession factory with scale-aware defaults.

Configured for correctness testing on local[N] but with settings chosen
for a large multi-executor cluster reading ~100 TB:

* AQE on — runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic join-strategy switching replace hand-tuned partition counts.
* Arrow on — every pandas_udf / mapInPandas boundary is Arrow-batched.
* Broadcast threshold raised to 64 MB — every dimension table in the
  star schema (region/nation/customer/supplier/part at reasonable SF)
  broadcast-joins instead of shuffling the fact table.
* maxPartitionBytes 128 MB — scan-side split sizing that keeps task
  counts sane at 100 TB (~800k tasks) while saturating executors.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))


def get_spark(
    app_name: str = "data_ingestion_pimcore_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    Respects an already-running session's master; otherwise uses
    ``local[$SPARK_GRAFT_CPUS]`` (default ``local[*]``).
    """
    # Pool start-method hook (r11 verdict item 4): when the CV3
    # checksum pool is configured for forkserver, start the forkserver
    # process NOW — before the JVM/py4j threads the session spawns
    # exist — so every later pool worker forks from a clean,
    # thread-free template and the fork-with-threads hazard (deadlock
    # on a lock held at fork time; deprecated in CPython 3.14) never
    # arises. A no-op when the server is already running.
    if os.environ.get("SPARK_GRAFT_POOL_START_METHOD") == "forkserver":
        from multiprocessing import forkserver

        forkserver.ensure_running()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
        # reader rejects; read as epoch-nanos long and convert in load().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Single-JVM test box: keep the driver fat; on a real cluster these
        # come from spark-submit and are ignored here if already set.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    # Streaming state at production size (stream-stream joins, dedup
    # over long horizons) belongs in RocksDB: state spills to local SSD
    # instead of executor heap, with incremental checkpointing. At toy
    # state sizes the per-instance overhead dominates (~1.7x slower on
    # the local suite), so it is opt-in here and on by default in any
    # real deployment.
    if os.environ.get("SPARK_GRAFT_ROCKSDB_STATE"):
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
    if SparkSession.getActiveSession() is None:
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
