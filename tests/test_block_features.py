"""block_features (jusText-style shallow text features): attribution of
text to the nearest block ancestor, link-text measurement, non-rendered
exclusion, and the (none) bucket for text outside any block."""

from crystal_html5_spark.html5x.extract import block_features
from crystal_html5_spark.html5x.parser import parse


def feats(html: bytes):
    return block_features(parse(html))


def test_text_attributes_to_nearest_block():
    rows = feats(b"<body><div>outer<p>inner</p>tail</div></body>")
    by_tag = {r[1]: r for r in rows}
    # 'outer' + 'tail' belong to div; 'inner' to the nested p
    assert by_tag["div"][2] == len("outer") + len("tail")
    assert by_tag["p"][2] == len("inner")


def test_link_text_measured_per_block():
    rows = feats(
        b"<body><nav><a href=x>Home</a> <a href=y>About</a></nav>"
        b"<p>Plain <a href=z>link</a> text</p></body>")
    by_tag = {r[1]: r for r in rows}
    assert by_tag["nav"][2] == 10      # 'Home' + ' ' + 'About'
    assert by_tag["nav"][3] == 9       # the space is nav text, not link
    assert by_tag["p"][3] == 4         # 'link'
    assert by_tag["p"][2] == len("Plain link text")


def test_nonrendered_text_excluded_but_nav_included():
    rows = feats(
        b"<body><script>var x = 'lots of js';</script>"
        b"<style>p{}</style><nav>menu</nav></body>")
    tags = [r[1] for r in rows]
    assert "nav" in tags
    total = sum(r[2] for r in rows)
    assert total == len("menu")  # script/style text never attributed


def test_block_inside_link_keeps_link_flag():
    rows = feats(b"<body><a href=x><div>boxed link</div></a></body>")
    by_tag = {r[1]: r for r in rows}
    assert by_tag["div"][2] == by_tag["div"][3] == len("boxed link")


def test_document_order_block_numbers():
    rows = feats(b"<body><p>a</p><div>b</div><p>c</p></body>")
    textual = [r for r in rows if r[2] > 0]
    assert [r[0] for r in textual] == sorted(r[0] for r in textual)
    assert [r[1] for r in textual] == ["p", "div", "p"]


def test_malformed_and_empty():
    assert feats(b"") != None  # noqa: E711 — just must not raise
    rows = feats(b"<p>unclosed <b>bold")
    assert sum(r[2] for r in rows) == len("unclosed bold")
