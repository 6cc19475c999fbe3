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
    # Arrow for all Python exchange.  8192 rows/batch: at 32 workers the
    # r2-era 512-row "pipelining" setting just multiplied Arrow batch
    # boundaries (interleaved A/B at local[32], 20k pages: median 1.86 s
    # and a 1.71-1.99 spread at 8192 vs 2.30 s / 1.75-2.61 at 512 — the
    # pipelining win did not replicate; larger batches are both faster
    # and far less noisy).  8192 html rows at ~6.5 KB avg is ~50 MB per
    # in-flight batch, bounded further by the UDF's byte-capped output
    # re-batching (extract_job._TARGET_OUT_BATCH_BYTES).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "8192",
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
