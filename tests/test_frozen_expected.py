"""Backstops for the frozen-parquet oracles (judge ADVICE r2: the freeze
is produced by the same engine the Spark UDFs call, so on its own it
cannot catch an engine bug).

Two independent checks:

1. Cross-engine spot check: Python's stdlib ``html.parser`` — a wholly
   independent HTML implementation — re-derives titles and a[href] links
   for the composed (well-formed) fixture pages and must agree with the
   frozen expected output.
2. Freshness: re-running the in-process engine NOW must reproduce the
   frozen parquets exactly, so an intentional engine/semantics change
   that forgets ``python scripts/freeze_expected.py`` fails loudly here
   instead of silently grading Spark against a stale oracle.
"""

from __future__ import annotations

import importlib.util
import pathlib
import sys

import pyarrow.parquet as pq
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

EXPECTED = REPO / "tests" / "fixtures" / "expected"
N = 500


def _freeze_mod():
    spec = importlib.util.spec_from_file_location(
        "freeze_expected", REPO / "scripts" / "freeze_expected.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def rows():
    from crystal_html5_spark.sparkjob.pages import synth_rows

    return synth_rows(N)


@pytest.fixture(scope="module")
def freeze():
    return _freeze_mod()


class _StdlibPage:
    """Title + a[href] extraction via stdlib html.parser (independent of
    the html5x engine)."""

    def __init__(self, html: bytes):
        from html.parser import HTMLParser

        outer = self

        class P(HTMLParser):
            def __init__(self):
                super().__init__(convert_charrefs=True)
                self.in_title = False
                self.title_parts: list[str] = []
                self.hrefs: list[str] = []

            def handle_starttag(self, tag, attrs):
                if tag == "title":
                    self.in_title = True
                d = dict(attrs)
                if tag == "a" and d.get("href") is not None:
                    self.hrefs.append(d["href"])

            def handle_endtag(self, tag):
                if tag == "title":
                    self.in_title = False

            def handle_data(self, data):
                if self.in_title:
                    self.title_parts.append(data)

        p = P()
        p.feed(html.decode("utf-8"))
        outer.title = "".join(p.title_parts)
        outer.hrefs = p.hrefs


def _composed(rows):
    """The composed 'realistic' pages: well-formed by construction, so a
    non-error-recovering parser (stdlib) agrees on their content."""
    return [(u, h) for u, _ts, h, _t, _l in rows
            if h.startswith(b"<!DOCTYPE html><html><head><title>Page ")]


def test_stdlib_agrees_on_titles(rows):
    titles = {r["url"]: r["title"]
              for r in pq.read_table(
                  EXPECTED / f"page_titles_{N}.parquet").to_pylist()}
    checked = 0
    for url, html in _composed(rows):
        assert titles[url] == _StdlibPage(html).title
        checked += 1
    assert checked > 300  # most fixture rows are composed pages


def test_stdlib_agrees_on_links(rows):
    links = {r["url"]: (r["n_links"], r["first_href"])
             for r in pq.read_table(
                 EXPECTED / f"page_links_{N}.parquet").to_pylist()}
    checked = 0
    for url, html in _composed(rows):
        sp = _StdlibPage(html)
        assert links[url] == (len(sp.hrefs), sp.hrefs[0] if sp.hrefs
                              else None)
        checked += 1
    assert checked > 300


def test_frozen_xpath_stats_fresh(rows, freeze):
    frozen = pq.read_table(
        EXPECTED / f"page_xpath_stats_{N}.parquet").to_pylist()
    assert len(frozen) == len(rows)
    for rec, (url, _ts, html, _t, _l) in zip(frozen, rows):
        got = freeze.xpath_stats_row(html)
        assert rec["url"] == url
        assert (rec["title_norm"], rec["n_ref_links"],
                rec["first_nav_href"], rec["n_nonempty_paras"]) == got


def test_frozen_extract_pages_fresh(rows, freeze):
    frozen = pq.read_table(
        EXPECTED / f"extract_pages_{N}.parquet").to_pylist()
    got = freeze.extract_pages_rows(rows)
    assert [(r["url"], r["text_sha256"], r["n_nodes"], r["main_len"],
             r["err"]) for r in frozen] == got


def test_frozen_titles_links_fresh(rows):
    """Sampled re-derivation of the r2-era freezes with the live engine."""
    from crystal_html5_spark.html5x.css import compile_selector
    from crystal_html5_spark.html5x.parser import parse
    from crystal_html5_spark.html5x.xpath import xpath

    titles = pq.read_table(EXPECTED / f"page_titles_{N}.parquet").to_pylist()
    links = pq.read_table(EXPECTED / f"page_links_{N}.parquet").to_pylist()
    sel = compile_selector("a[href]")
    for i in range(0, N, 7):
        url, _ts, html, _t, _l = rows[i]
        try:
            doc = parse(html or b"")
            hrefs = [m["href"] for m in sel.select(doc)]
        except Exception:  # noqa: BLE001
            hrefs = []
        assert links[i]["url"] == url
        assert links[i]["n_links"] == len(hrefs)
        assert links[i]["first_href"] == (hrefs[0] if hrefs else None)
        try:
            node = xpath(parse(html or b""), "//title")
            t = node.inner_text() if node is not None else None
            if t is not None:
                t = t.encode("utf-8", "replace").decode("utf-8")
        except Exception:  # noqa: BLE001
            t = None
        assert titles[i]["title"] == t


def test_frozen_lang_stats_fresh(rows, freeze):
    frozen = pq.read_table(
        EXPECTED / f"extract_lang_stats_{N}.parquet").to_pylist()
    got = freeze.lang_stats_rows(rows)
    assert [(r["lang"], r["n_pages"], r["sum_text_bytes"],
             r["sum_nodes"]) for r in frozen] == got


def test_frozen_near_dups_fresh(rows, freeze):
    frozen = pq.read_table(
        EXPECTED / f"extract_near_dups_{N}.parquet").to_pylist()
    got = freeze.near_dup_rows(rows)
    assert [(r["fullsig"], r["keep_url"], r["n_pages"])
            for r in frozen] == got
