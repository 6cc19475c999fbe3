"""Bucketed co-located join: plan-level proof that bucketing removes the
shuffle from repeated joins (the 100 TB pattern)."""

import pytest

pyspark = pytest.importorskip("pyspark")

from crystal_html5_spark.sparkjob.bucketing import (  # noqa: E402
    bucketed_join,
    setup_bucketed_orders_lineitem,
)
from crystal_html5_spark.sparkjob.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        "bucketing-tests", master="local[4]", shuffle_partitions=4,
        extra_conf={
            "spark.sql.warehouse.dir": str(wh),
            # make sure the shuffle-free plan is not just broadcast
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    )
    yield s
    s.stop()


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark):
    setup_bucketed_orders_lineitem(spark, SF, buckets=8)
    joined = bucketed_join(spark, "orders_b", "lineitem_b",
                           "o_orderkey", "l_orderkey")
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    # contrast: the plain parquet join shuffles both sides
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = o.join(li, o.o_orderkey == li.l_orderkey)
    assert "Exchange" in _plan(plain)
    # results identical
    assert joined.count() == plain.count()
