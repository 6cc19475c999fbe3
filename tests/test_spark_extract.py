"""Spark-path tests: the mapInArrow pipeline must produce byte-identical
text to the pure-Python core, independent of partitioning; dedup, error-row
policy and resume are exercised too."""

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F  # noqa: E402

from crystal_html5_spark.html5x.extract import extract_document  # noqa: E402
from crystal_html5_spark.sparkjob.extract_job import (  # noqa: E402
    dedup_latest_capture,
    partition_metrics,
    run_extract,
)
from crystal_html5_spark.sparkjob.pages import pages_df, synth_rows  # noqa: E402
from crystal_html5_spark.sparkjob.session import get_spark  # noqa: E402

N_ROWS = 300


@pytest.fixture(scope="module")
def spark():
    s = get_spark("html5x-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def pages(spark):
    return pages_df(spark, N_ROWS).cache()


def test_spark_vs_python_byte_identity(spark, pages):
    out = run_extract(spark, pages, num_partitions=4).collect()
    # python-side oracle: latest capture per url, extract directly
    rows = synth_rows(N_ROWS)
    latest = {}
    for url, ts, html, _, _ in rows:
        if url not in latest or ts > latest[url][0]:
            latest[url] = (ts, html)
    assert len(out) == len(latest)
    for r in out:
        ts, html = latest[r["url"]]
        want = extract_document(html or b"")
        assert bytes(r["text"] or b"") == want["text"], r["url"]
        assert r["main_text"] == want["main_text"], r["url"]
        assert r["n_nodes"] == want["n_nodes"], r["url"]


def test_partition_invariance(spark, pages):
    a = {
        (r["url"], bytes(r["text"] or b""))
        for r in run_extract(spark, pages, num_partitions=2).collect()
    }
    b = {
        (r["url"], bytes(r["text"] or b""))
        for r in run_extract(spark, pages, num_partitions=13,
                             salt=3).collect()
    }
    assert a == b


def test_dedup_latest(spark, pages):
    deduped = dedup_latest_capture(pages)
    counts = deduped.groupBy("url").count().filter("count > 1").count()
    assert counts == 0
    # the latest capture (the recrawl) must win
    recrawled = (
        pages.groupBy("url").count().filter("count > 1").select("url")
    )
    joined = deduped.join(recrawled, "url").select("html").collect()
    assert joined and all(
        bytes(r["html"]).endswith(b"<!-- recrawl -->") for r in joined
    )


def test_oversize_error_rows(spark, pages):
    out = run_extract(spark, pages, num_partitions=4,
                      max_doc_bytes=100_000)
    errs = out.filter(out.err == "max_buf_exceeded")
    assert errs.count() > 0
    # error rows never produce text
    assert errs.filter(F.length("text") > 0).count() == 0


def test_resume_anti_join(spark, pages):
    full = run_extract(spark, pages, num_partitions=4)
    done = full.limit(50).select("url", "warc_ts")
    rest = run_extract(spark, pages, num_partitions=4, done_keys=done)
    assert rest.count() == full.count() - 50


def test_partition_metrics(spark, pages):
    out = run_extract(spark, pages, num_partitions=4)
    m = partition_metrics(out).collect()
    assert sum(r["n_docs"] for r in m) == out.count()
    assert all(r["sum_html_bytes"] >= 0 for r in m)


def test_top_error_pages(spark, pages):
    from crystal_html5_spark.sparkjob.extract_job import top_error_pages

    out = run_extract(spark, pages, num_partitions=4,
                      max_doc_bytes=100_000)
    top = top_error_pages(out, k=5).collect()
    assert 0 < len(top) <= 5
    assert all(r["err"] for r in top)
