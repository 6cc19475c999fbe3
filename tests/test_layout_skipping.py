"""Storage-layout scale check: a SURT-sorted parquet layout produces
tight, disjoint row-group min/max statistics on the sort key — the
property that lets engines (Spark parquet filter pushdown, DuckDB zone
maps) skip row groups on host-range predicates at corpus scale, which
is exactly why public crawl indexes cluster by SURT."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from crystal_html5_spark.sparkjob.session import get_spark
from crystal_html5_spark.sparkjob.warcio import surt_key


@pytest.fixture(scope="module")
def spark():
    s = get_spark("layout-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


def _urls(n):
    return [f"https://host{i % 97}.example/p/{i}" for i in range(n)]


def _write(path, urls, sort):
    keys = [surt_key(u) for u in urls]
    rows = sorted(zip(keys, urls)) if sort else list(zip(keys, urls))
    t = pa.table({
        "surt": pa.array([k for k, _ in rows], pa.string()),
        "url": pa.array([u for _, u in rows], pa.string()),
    })
    pq.write_table(t, path, row_group_size=100)
    return path


def _group_ranges(path):
    md = pq.read_metadata(path)
    out = []
    for g in range(md.num_row_groups):
        st = md.row_group(g).column(0).statistics
        out.append((st.min, st.max))
    return out


def test_sorted_layout_has_disjoint_rowgroup_stats(tmp_path):
    urls = _urls(2000)
    sorted_p = _write(tmp_path / "sorted.parquet", urls, sort=True)
    shuffled_p = _write(tmp_path / "shuffled.parquet", urls, sort=False)

    sr = _group_ranges(str(sorted_p))
    ur = _group_ranges(str(shuffled_p))
    assert len(sr) >= 10

    # sorted: consecutive groups' ranges are non-overlapping
    for (lo1, hi1), (lo2, hi2) in zip(sr, sr[1:]):
        assert hi1 <= lo2
    # a single-host range predicate overlaps few groups when sorted,
    # (nearly) all groups when shuffled
    probe = "example,host42)"
    hit_sorted = sum(1 for lo, hi in sr if lo <= probe + "\xff" and hi >= probe)
    hit_shuffled = sum(1 for lo, hi in ur if lo <= probe + "\xff" and hi >= probe)
    assert hit_sorted <= 2
    assert hit_shuffled >= len(ur) - 1


def test_spark_pushes_surt_filter_to_scan(spark, tmp_path):
    path = _write(tmp_path / "sorted.parquet", _urls(2000), sort=True)
    df = spark.read.parquet(str(path)).filter(
        "surt >= 'example,host42)' AND surt < 'example,host42*'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThanOrEqual(surt" in plan
    assert df.count() > 0


def test_zorder_layout_prunes_both_dimensions(tmp_path):
    """Z-order sorting keeps BOTH dimensions locally clustered: a
    selective predicate on EITHER column overlaps far fewer row groups
    than under a compound (x, y) sort, where only the leading column
    prunes."""
    import random

    rng = random.Random(5)
    n = 20_000
    xs = [rng.randrange(256) for _ in range(n)]
    ys = [rng.randrange(256) for _ in range(n)]

    def interleave(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i + 1)
            z |= ((y >> i) & 1) << (2 * i)
        return z

    def write(path, order):
        rows = sorted(zip(xs, ys), key=order)
        t = pa.table({
            "x": pa.array([r[0] for r in rows], pa.int32()),
            "y": pa.array([r[1] for r in rows], pa.int32()),
        })
        pq.write_table(t, path, row_group_size=500)
        return str(path)

    zp = write(tmp_path / "z.parquet",
               lambda r: interleave(r[0], r[1]))
    cp = write(tmp_path / "c.parquet", lambda r: (r[0], r[1]))

    def hits(path, col, lo, hi):
        md = pq.read_metadata(path)
        ci = 0 if col == "x" else 1
        n_hit = 0
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ci).statistics
            if st.min <= hi and st.max >= lo:
                n_hit += 1
        return n_hit, md.num_row_groups

    # trailing-dimension predicate: y in a narrow band
    zy, total = hits(zp, "y", 16, 31)
    cy, _ = hits(cp, "y", 16, 31)
    assert zy < total // 2       # z-order prunes y...
    assert cy == total           # ...compound sort cannot
    # leading dimension still prunes under z-order too
    zx, _ = hits(zp, "x", 16, 31)
    assert zx < total // 2
