"""Tree-construction golden suite (1,631 html5lib/WebKit .dat cases).

Fixture provenance: tests/fixtures/treedata/PROVENANCE.md.  Runner semantics
mirror /root/reference/spec/parser_spec.cr:6-22 (full tree-pointer
consistency check + pipe-indented dump comparison, fragment cases included).
"""

import pathlib

import pytest

from crystal_html5_spark.html5x.testsupport import read_dat_file, run_tree_case

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
DAT_DIRS = [FIXTURES / "treedata", FIXTURES / "treedata_more"]

ALL_CASES = []
for d in DAT_DIRS:
    for f in sorted(d.glob("*.dat")):
        ALL_CASES.extend(read_dat_file(str(f)))

IDS = [f"{pathlib.Path(c.fname).name}:{c.index}" for c in ALL_CASES]


@pytest.mark.parametrize("case", ALL_CASES, ids=IDS)
def test_tree_construction(case):
    doc, got = run_tree_case(case)
    assert got == case.want, (
        f"\n--- input ---\n{case.text}\n--- want ---\n{case.want}"
        f"--- got ---\n{got}"
    )


def test_scripting_disabled():
    # parser_spec.cr:24-40
    from crystal_html5_spark.html5x.parser import parse
    from crystal_html5_spark.html5x.testsupport import dump

    text = (
        "<noscript><img src='https://golang.org/doc/gopher/frontpage.png' />"
        "</noscript><p><img src='https://golang.org/doc/gopher/doc.png' /></p>"
    )
    doc = parse(text, scripting=False)
    got = dump(doc)
    want = (
        '| <html>\n'
        '|   <head>\n'
        '|     <noscript>\n'
        '|   <body>\n'
        '|     <img>\n'
        '|       src="https://golang.org/doc/gopher/frontpage.png"\n'
        '|     <p>\n'
        '|       <img>\n'
        '|         src="https://golang.org/doc/gopher/doc.png"\n'
    )
    assert got == want


def test_fragment_context_consistency_error():
    # parser_spec.cr:42-56
    from crystal_html5_spark.html5x.node import ELEMENT_NODE, Node
    from crystal_html5_spark.html5x.parser import parse_fragment

    err_node = Node(type=ELEMENT_NODE, data_atom="frameset", data="table")
    with pytest.raises(ValueError, match="inconsistent Node"):
        parse_fragment(b"<p>should not work</p>", err_node)
    # nil context must not raise
    parse_fragment(b"<p>should not raise any exception")
