"""SparkSession construction with scale-aware defaults.

The reference pinned ``local[1]`` for its preprocess job
(``preprocess.py:16``) — a hard single-core throughput ceiling. Here the
master defaults to ``local[$SPARK_GRAFT_CPUS]`` for local runs and is left
to spark-submit/cluster config in production; every other default is chosen
to survive a 1000-executor / 100 TB deployment:

- AQE on (runtime shuffle-partition coalescing, skew-join splitting)
- shuffle partitions sized for the local core count; on a real cluster AQE
  scales the initial number down/up from a deliberately high initial value
- Arrow transfers on, so any Pandas-UDF boundary is vectorized
- UTC session timezone so event-time semantics are deployment-independent
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_master() -> str:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")


def get_spark(
    app_name: str = "streaming-data-pipeline-capstone-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``shuffle_partitions`` defaults to the local parallelism; on a real
    cluster pass a high initial value (e.g. 2000) and let AQE coalesce.
    """
    master = master or default_master()
    if shuffle_partitions is None:
        # local[N] → N; local[*]/cluster → leave a sane floor of 32
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else "*"
        shuffle_partitions = int(inner) if inner.isdigit() else 32

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Runtime bloom-filter join pruning (default-on in Spark 4.x; pinned
        # explicitly so the scale posture survives a default change): on a
        # selective fact-fact sort-merge join, the filtered side's join keys
        # seed a bloom filter that prunes the other side's scan/shuffle. Its
        # size thresholds (~10MB creation side) mean it never fires at test
        # SF — plan-audit verified identical plans — and only kicks in at
        # the scale where it pays.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Split small file scans to full parallelism (byte-range splits, no
        # shuffle). Without this a single small parquet file reads as ONE
        # partition and every downstream expression runs serially — measured
        # 2.8s → 0.4s on sf0.1 document shingling. At 100 TB the scan has
        # far more splits than cores, so this is a no-op there.
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # PySpark's DataFrame-debugging origin capture (default ON) makes
        # EVERY wrapped DataFrame/Column API call pay a conf.get py4j
        # round-trip plus a JVM origin set/clear — pure Python-driver
        # overhead in any deployment, measured 2-3x of the serving-probe
        # build walls (sim_topk_ivfpq_filtered build 1.76 → 0.69 s). It
        # only enriches error messages with Python call sites; re-enable
        # via env when debugging.
        .config(
            "spark.python.sql.dataFrameDebugging.enabled",
            os.environ.get("SPARK_GRAFT_DF_DEBUG", "false"),
        )
    )
    # Large streaming state (per-key state at 100M+ keys) wants RocksDB
    # instead of the default in-heap HDFS-backed provider: incremental
    # checkpoints, state larger than executor heap. Opt-in so small local
    # runs keep the zero-dependency default.
    if os.environ.get("SPARK_GRAFT_ROCKSDB", "").lower() in ("1", "true"):
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
