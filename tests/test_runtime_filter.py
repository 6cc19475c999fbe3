"""Runtime bloom-filter join pruning: with a selective dimension-side
predicate, Spark injects a bloom filter (might_contain) on the probe
side BEFORE the shuffle — at 100 TB this drops most fact rows at the
scan instead of shuffling them.  Pins both the plan shape and result
equality with the unfiltered plan."""

import pytest

from crystal_html5_spark.sparkjob.session import get_spark

_SQL = """
  SELECT l_orderkey, o_orderdate, l_extendedprice
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_totalprice > 490000
"""


@pytest.fixture(scope="module")
def spark():
    s = get_spark(
        "runtime-filter-tests", master="local[4]", shuffle_partitions=4,
        extra_conf={
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # local test data is tiny; drop the size gates so the
            # optimization actually fires (a real deployment keeps the
            # defaults and fires on genuinely large scans)
            "spark.sql.optimizer.runtime.bloomFilter"
            ".applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        })
    yield s
    s.stop()


def test_bloom_filter_injected_and_result_identical(spark):
    from crystal_html5_spark.sparkjob.queries import load_views

    load_views(spark, "/root/testdata/sf0.01")
    df = spark.sql(_SQL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "might_contain" in plan  # probe side pre-filtered

    got = sorted(map(tuple, df.collect()))
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
    try:
        want = sorted(map(tuple, spark.sql(_SQL).collect()))
    finally:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    assert got == want
    assert len(got) > 0
