"""connected_components (large-star/small-star) vs a pure-Python
union-find reference, on graph shapes chosen to stress the algorithm:
long chains (worst diameter), stars, duplicated/reversed/self-loop
input edges, and seeded random graphs."""

import random

import pytest

from crystal_html5_spark.sparkjob.cc import connected_components
from crystal_html5_spark.sparkjob.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark("cc-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _union_find(edges):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # representative = min of component: min-rooted union keeps the
    # smaller root, so find() already yields the component minimum
    return sorted((x, find(x)) for x in list(parent))


def _run(spark, edges):
    df = spark.createDataFrame(edges, "a: long, b: long")
    out = connected_components(df, "a", "b")
    return sorted((r.node, r.component) for r in out.collect())


def test_chain_worst_diameter(spark):
    # a 40-node path: label propagation would need 40 rounds; the
    # star rounds must contract it well inside cc.MAX_ROUNDS
    edges = [(i, i + 1) for i in range(40)]
    assert _run(spark, edges) == [(i, 0) for i in range(41)]


def test_two_stars_and_reversed_duplicate_edges(spark):
    edges = [(10, i) for i in range(11, 15)] + [(i, 20) for i in range(21, 24)]
    edges += [(14, 10), (10, 11), (10, 10)]  # reversed, dup, self-loop
    got = _run(spark, edges)
    assert got == _union_find((a, b) for a, b in edges if a != b)


def test_descending_chain_ids(spark):
    # ids descending along the chain — exercises the small-star side
    edges = [(i + 1, i) for i in range(30, 0, -1)]
    assert _run(spark, edges) == _union_find(edges)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graphs_match_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run(spark, edges) == _union_find(edges)


def test_large_random_graph_converges_in_log_rounds(spark):
    """3000 nodes / 4000 edges: results match union-find and the
    star rounds converge in O(log n) — single digits, nowhere near
    the diameter a label-propagation loop would need."""
    rng = random.Random(99)
    edges = [(rng.randrange(3000), rng.randrange(3000))
             for _ in range(4000)]
    edges = [(a, b) for a, b in edges if a != b]
    from crystal_html5_spark.sparkjob.cc import connected_components
    df = spark.createDataFrame(edges, "a: long, b: long")
    stats = {}
    out = connected_components(df, "a", "b", stats=stats)
    got = sorted((r.node, r.component) for r in out.collect())
    assert got == _union_find(edges)
    assert stats["rounds"] <= 10
