"""Bucketed co-located joins.

At 100 TB, a fact table that is repeatedly joined on the same key should
be written bucketed by that key: every subsequent join is exchange-free
(no shuffle of the big side, ever).  This module demonstrates the pattern
on the orders/lineitem pair; the test asserts the bucketed join plan
contains NO Exchange on either side while the plain join shuffles both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(spark: SparkSession, df: DataFrame, table: str,
                   key: str, buckets: int = 16) -> None:
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", f"{_warehouse(spark)}/{table}")
        .saveAsTable(table, format="parquet")
    )


def _warehouse(spark: SparkSession) -> str:
    return spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key_left: str, key_right: str) -> DataFrame:
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_left] == rt[key_right])


def setup_bucketed_orders_lineitem(spark: SparkSession, sf_dir: str,
                                   buckets: int = 16) -> None:
    """One-time bucketed materialization of the join pair."""
    from . import io as tableio
    orders = tableio.read_table(spark, f"{sf_dir}/orders.parquet")
    lineitem = tableio.read_table(spark, f"{sf_dir}/lineitem.parquet")
    write_bucketed(spark, orders, "orders_b", "o_orderkey", buckets)
    write_bucketed(spark, lineitem, "lineitem_b", "l_orderkey", buckets)
