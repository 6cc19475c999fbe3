#!/usr/bin/env python
"""Freeze expected outputs for page_links / page_titles.

Generates tests/fixtures/expected/*.parquet by running the golden-verified
IN-PROCESS engine (no Spark) over the deterministic 500-page fixture.
These parquets are the DuckDB oracle for the corresponding driver
queries: the driver's three-way check then compares Spark-through-Arrow
output against an independently-produced result.

Re-run only if the page synthesis or the parser/CSS/XPath semantics
change on purpose:  python scripts/freeze_expected.py
"""

from __future__ import annotations

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

N_PAGES = 500
OUT_DIR = REPO / "tests" / "fixtures" / "expected"


def main() -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from crystal_html5_spark.html5x.css import compile_selector
    from crystal_html5_spark.html5x.parser import parse
    from crystal_html5_spark.html5x.xpath import xpath
    from crystal_html5_spark.sparkjob.pages import synth_rows

    rows = synth_rows(N_PAGES)
    sel = compile_selector("a[href]")

    links = []
    titles = []
    for url, _ts, html, _text, _lang in rows:
        try:
            doc = parse(html or b"")
            hrefs = [m["href"] for m in sel.select(doc)]
        except Exception:  # noqa: BLE001
            hrefs = []
        links.append((url, len(hrefs), hrefs[0] if hrefs else None))
        try:
            node = xpath(parse(html or b""), "//title")
            t = node.inner_text() if node is not None else None
            if t is not None:
                t = t.encode("utf-8", "replace").decode("utf-8")
        except Exception:  # noqa: BLE001
            t = None
        titles.append((url, t))

    OUT_DIR.mkdir(parents=True, exist_ok=True)
    lt = pa.table({
        "url": pa.array([r[0] for r in links], pa.string()),
        "n_links": pa.array([r[1] for r in links], pa.int32()),
        "first_href": pa.array([r[2] for r in links], pa.string()),
    })
    pq.write_table(lt, OUT_DIR / f"page_links_{N_PAGES}.parquet")
    tt = pa.table({
        "url": pa.array([r[0] for r in titles], pa.string()),
        "title": pa.array([r[1] for r in titles], pa.string()),
    })
    pq.write_table(tt, OUT_DIR / f"page_titles_{N_PAGES}.parquet")
    print(f"wrote {len(links)} rows to {OUT_DIR}")


if __name__ == "__main__":
    main()
