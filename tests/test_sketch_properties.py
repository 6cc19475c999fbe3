"""Mathematical property pins for the sketch family, independent of the
Spark-vs-DuckDB equality gate: these run the DuckDB oracle side only
(fast, no JVM) and fail if a sketch ever violates its defining
guarantee — even if both engines drift together."""

import duckdb
import pytest

from crystal_html5_spark.sparkjob import queries as Q

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM"
                f" read_parquet('{SF}/documents.parquet')")
    return con


def test_bloom_never_false_negative(duck):
    import math

    df = duck.execute(Q._docs_bloom_sql("duck")).df()
    members = df[df.actually_present == 1]
    assert len(members) > 0
    assert (members.in_filter == 1).all()
    # and the FP branch is actually exercised on this fixture...
    n_non = (df.actually_present == 0).sum()
    fps = df.false_positive.sum()
    assert fps > 0
    # ...at a rate consistent with theory (not a degenerate all-ones
    # filter): expected (1 - e^{-kn/m})^k, asserted within 2x — review
    # round 4: without an upper bound, a filter answering yes to
    # everything would pass
    k, m, n_keys = Q._BLOOM_K, Q._BLOOM_BITS, len(members)
    p_theory = (1 - math.exp(-k * n_keys / m)) ** k
    assert fps <= 2 * p_theory * n_non


def test_cms_never_undercounts(duck):
    df = duck.execute(Q._docs_token_cms_sql("duck")).df()
    assert len(df) == 20
    assert (df.cms_count >= df.exact_count).all()


def test_hll_error_within_statistical_bound(duck):
    df = duck.execute(Q._docs_shingle_hll_sql("duck")).df()
    # m=256 -> stderr ~6.5%; 200 millis = ~3 sigma
    assert (df.err_millis.abs() <= 200).all()
    assert (df.n_exact > 0).all()


def test_pagerank_mass_conserved(duck):
    df = duck.execute(Q._docs_pagerank_oracle()).df()
    n = len(df)
    # floor losses only shrink mass, damping base bounds it below
    assert n > 0
    mean = df.rank_micros.mean()
    assert 0.95 * 1_000_000 <= mean <= 1_000_000


def test_quantiles_are_ordered(duck):
    df = duck.execute(Q._DOCS_LENGTH_QUANTILES).df()
    assert (df.p50_chars <= df.p90_chars).all()
    assert (df.p90_chars <= df.p99_chars).all()
