"""SparkSession factory with scale-appropriate defaults.

Local mode is a correctness proxy; the same configs (AQE, skew join,
shuffle-partition sizing) are what we would submit on a 1000-executor
cluster via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "louvain_fast_move_cuda_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster you would set this to ~2-3x total executor cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        n = master.split("[")[-1].rstrip("]")
        shuffle_partitions = 32 if n == "*" else max(8, int(n))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # default 10k-record Arrow batches drown vectorized kernels in
        # per-batch overhead; 1M rows (~50 MB of edge state) amortizes the
        # JVM<->Python IPC while staying far under worker memory
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1000000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # allow shuffled-hash join where its size conditions hold (guide
        # §3.1/§9): the iterative supersteps join pre-partitioned state
        # tables whose per-partition build sides are bounded by the
        # scale-adaptive width rule, so skipping the sort-merge sorts is
        # pure win; AQE skew handling stays on, and a cluster profile can
        # flip this back via extra_conf if a build side outgrows memory
        .config("spark.sql.join.preferSortMergeJoin", "false")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
