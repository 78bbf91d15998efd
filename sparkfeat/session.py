"""SparkSession factory with scale-oriented defaults.

The reference parallelizes with a ``multiprocessing`` pool
(``transformation/base.py:19-27``); here parallelism is Spark partitions.
All sessions are UTC (the reference asserts UTC indices,
``cleaning.py:345``, ``cleaning.py:425``) and Arrow-enabled (all Python
crossings are vectorized pandas UDFs / applyInPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "sparkfeat",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for the feature engine.

    On a real cluster this is driven by spark-submit conf; the defaults
    here matter for local runs and encode the cluster posture:

    * AQE on (runtime coalescing + skew-join splitting — long
      conversations skew window work; see ``sparkfeat.transforms.ewma``
      chunking for the window-side skew story),
    * Arrow on (every Python crossing is vectorized),
    * UTC session timezone,
    * shuffle partitions sized to cores locally; on a 1000-executor
      cluster this is set via submit conf to ~2-3x total cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local mode: one shuffle partition per core keeps every stage
        # fully parallel without tiny-task overhead at test scale.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else cpus
        shuffle_partitions = int(cpus if n == "*" else n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # parquet scans: keep splits big enough to amortize task setup at
        # 100 TB but small enough to parallelize at test scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.driver.memory", os.environ.get("SPARKFEAT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
