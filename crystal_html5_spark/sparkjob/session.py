"""SparkSession factory with the pipeline's scale-oriented defaults.

AQE (skew-join + partition coalescing), Arrow-batched Python exchange, and
shuffle-partition sizing are set here so every entry point (tests, bench,
driver contract) runs the same configuration.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CONF = {
    # Let AQE re-plan at runtime: skew-split our salted repartition and
    # coalesce small post-shuffle partitions.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for all Python exchange; batch size tuned for PIPELINING of
    # the extract UDF: ~512 html rows (~3-4 MB) per batch lets compute
    # overlap transfer instead of each worker waiting for its whole
    # partition (measured 2.4s -> 1.6s on the 20k-page pipeline vs the
    # 10k-row default; per-batch numpy ops stay amply vectorized).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
    # Read-side split sizing for the 100 TB case: 128 MB splits.
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Single-JVM local mode: the driver hosts the executors too.
    "spark.driver.memory": "8g",
    "spark.driver.maxResultSize": "4g",
}


def get_spark(app_name: str = "crystal-html5-spark",
              master: str | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        if cpus:
            master = f"local[{cpus}]"
    if master:
        builder = builder.master(master)
    conf = dict(DEFAULT_CONF)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    else:
        conf.setdefault("spark.sql.shuffle.partitions", "32")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
