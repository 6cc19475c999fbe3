"""Deterministic synthesis of the Common-Crawl-style ``pages`` table.

Schema per BASELINE.json::input_hint:
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Content mixes (FIXTURES.md §1): the golden tree-construction inputs, the
tokenizer-test inputs, the XPath sample page, composed "realistic" pages
(article body wrapped in nav/header/footer/script/style boilerplate), and
edge rows (empty, NUL bytes, \\r\\n newlines, an oversize doc).  Seed=42;
host ids are Zipf-skewed so a few hosts own most rows (exercises the salted
repartition); ~10% of urls get a second capture with a later warc_ts
(exercises latest-capture dedup).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import pathlib
import random

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_FIXTURES = _REPO_ROOT / "tests" / "fixtures"

LANGS = ("en", "es", "de", "fr", "ja")

_ARTICLE_SENTENCES = [
    "London is the capital city of England.",
    "It is the most populous city in the United Kingdom.",
    "Standing on the River Thames, London has been a major settlement "
    "for two millennia.",
    "The city's history goes back to its founding by the Romans.",
    "A metropolitan area of over 13 million inhabitants surrounds it.",
    "Entities like &amp; and &lt; must decode correctly.",
    "Numeric references such as &#169; and &#x2603; appear in real pages.",
]


def _compose_realistic(rng: random.Random, i: int) -> bytes:
    """An article wrapped in boilerplate, to exercise main-content strip.
    Sized like a real web page (~3-12 KB of markup), so benchmarks see a
    Common-Crawl-like compute/row ratio."""
    n_paras = 4 + rng.randrange(24)
    paras = []
    for p in range(n_paras):
        k = 2 + rng.randrange(10)
        sents = rng.choices(_ARTICLE_SENTENCES, k=k)
        if p % 5 == 0:
            paras.append(f"<h2>Section {p}</h2>")
        paras.append(
            "<p>" + " ".join(sents)
            + f' <a href="/ref/{i}/{p}">source</a></p>'
        )
    body = "\n".join(paras)
    return (
        f"<!DOCTYPE html><html><head><title>Page {i}</title>"
        f"<style>body {{ color: #000; }}</style>"
        f"<script>var x = 1 < 2 && 3 > 2; // <not a tag></script></head>"
        f"<body><header><h1>Site {i % 7}</h1></header>"
        f"<nav><ul><li><a href='/a{i}'>A</a></li>"
        f"<li><a href='/b{i}'>B</a></li></ul></nav>"
        f"<article>{body}</article>"
        f"<aside>Related link {i}</aside>"
        f"<footer>Copyright &copy; {2000 + i % 26}</footer>"
        f"</body></html>"
    ).encode("utf-8")


def fixture_htmls() -> list[bytes]:
    """All golden fixture inputs as html byte strings (deterministic order)."""
    out: list[bytes] = []
    tok = _FIXTURES / "token_tests.json"
    if tok.exists():
        for case in json.loads(tok.read_text()):
            out.append(case["html"].encode("utf-8"))
    for sub in ("treedata", "treedata_more"):
        d = _FIXTURES / sub
        if d.exists():
            from crystal_html5_spark.html5x.testsupport import read_dat_file

            for f in sorted(d.glob("*.dat")):
                for case in read_dat_file(str(f)):
                    if case.context:
                        continue  # fragments are not whole pages
                    out.append(case.text.encode("utf-8"))
    return out


_EDGE_ROWS = [
    b"",  # empty document
    b"<p>NUL\x00 byte</p>",
    b"<p>line one\r\nline two\rline three</p>",
    b"<pre>\nleading newline</pre>",
]


def synth_rows(n_rows: int, seed: int = 42,
               oversize_bytes: int = 262144) -> list[tuple]:
    """Deterministic page rows: (url, warc_ts, html, text, lang)."""
    rng = random.Random(seed)
    fixtures = fixture_htmls()
    base_ts = dt.datetime(2024, 1, 1)
    rows: list[tuple] = []
    i = 0
    while len(rows) < n_rows:
        # Zipf-ish host skew: a few hosts own most urls.
        host = int(rng.paretovariate(1.1)) % 997
        url = f"https://host{host}.example/p/{i}"
        ts = base_ts + dt.timedelta(seconds=i * 37)
        kind = i % 97
        if kind == 13:
            html = _EDGE_ROWS[i % len(_EDGE_ROWS)]
        elif kind == 29:
            html = b"<p>" + b"x" * oversize_bytes + b"</p>"
        elif kind % 3 == 0 and fixtures:
            html = fixtures[i % len(fixtures)] + (
                f"<!-- page {i} -->".encode()
            )
        else:
            html = _compose_realistic(rng, i)
        lang = LANGS[rng.randrange(len(LANGS))]
        rows.append((url, ts, html, None, lang))
        if len(rows) < n_rows and i % 10 == 0:
            # A later capture of the same url (latest-capture dedup).
            rows.append((
                url, ts + dt.timedelta(days=3),
                html + b"<!-- recrawl -->", None, lang,
            ))
        i += 1
    return rows[:n_rows]


PAGES_SCHEMA_DDL = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def pages_df(spark, n_rows: int, seed: int = 42):
    """Small-scale in-memory pages DataFrame (tests / smoke)."""
    return spark.createDataFrame(synth_rows(n_rows, seed),
                                 schema=PAGES_SCHEMA_DDL)


def pages_parquet(spark, n_rows: int, seed: int = 42,
                  cache_dir: str | None = None,
                  rows_per_file: int = 512) -> str:
    """Materialize the pages table as parquet (bench path: realistic scan,
    column pruning, predicate pushdown).  Written chunked with pyarrow
    directly — no driver-side createDataFrame of the whole table.
    Cached by (n_rows, seed, rows_per_file).

    512 rows/file (~1 MB of html): each file is one row group, and
    Spark's scan parallelism is row-group-granular, so the r5 layout's
    2048-row files gave the 20k-page bench table only 10 scan splits —
    every mapInArrow stage without its own repartition (page_xpath_stats)
    ran at 10/32 cores.  512-row files yield >= parallelism splits at the
    bench scale; file count scales with n_rows, so larger tables just get
    proportionally more (still multi-MB) files.  The rows_per_file is in
    the cache key so layout changes can never serve a stale directory."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cache_root = pathlib.Path(
        cache_dir or os.environ.get("SPARK_GRAFT_CACHE",
                                    str(_REPO_ROOT / "build"))
    )
    out = cache_root / f"pages_n{n_rows}_s{seed}_r{rows_per_file}.parquet"
    marker = out / "_DONE"
    if not marker.exists():
        out.mkdir(parents=True, exist_ok=True)
        schema = pa.schema([
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ])
        rows = synth_rows(n_rows, seed)
        for fi, start in enumerate(range(0, len(rows), rows_per_file)):
            chunk = rows[start:start + rows_per_file]
            cols = list(zip(*chunk))
            table = pa.Table.from_arrays(
                [pa.array(cols[0], pa.string()),
                 pa.array(cols[1], pa.timestamp("us")),
                 pa.array(cols[2], pa.binary()),
                 pa.array(cols[3], pa.string()),
                 pa.array(cols[4], pa.string())],
                schema=schema,
            )
            pq.write_table(table, out / f"part-{fi:05d}.parquet")
        marker.touch()
    return str(out)


def n_pages_for_sf(sf_dir: str) -> int:
    """Scale the synthetic pages table with the driver's sf directory."""
    name = pathlib.Path(sf_dir).name  # e.g. "sf0.01"
    try:
        sf = float(name.removeprefix("sf"))
    except ValueError:
        sf = 0.001
    return max(200, int(sf * 200_000))
