"""Entity/escape unit tests (ported from /root/reference/spec/escape_spec.cr
and spec/entity_spec.cr)."""

import pytest

from crystal_html5_spark.html5x.entities import (
    ENTITY,
    ENTITY2,
    LONGEST_ENTITY_WITHOUT_SEMICOLON,
)
from crystal_html5_spark.html5x.escape import (
    escape_string,
    unescape,
    unescape_string,
)

UNESCAPE_TESTS = [
    ("copy", "A\ttext\nstring", "A\ttext\nstring"),
    ("simple", "&amp; &gt; &lt;", "& > <"),
    ("stringEnd", "&amp &amp", "& &"),
    ("multiCodepoint", "text &gesl; blah", "text ⋛︀ blah"),
    ("decimalEntity", "Delta = &#916; ", "Delta = Δ "),
    ("hexadecimalEntity", "Lambda = &#x3bb; = &#X3Bb ", "Lambda = λ = λ "),
    (
        "numericEnds",
        "&# &#x &#128;43 &copy = &#169f = &#xa9",
        "&# &#x €43 © = ©f = ©",
    ),
    ("numericReplacements", "Footnote&#x87;", "Footnote‡"),
]


@pytest.mark.parametrize(
    "html,want", [(h, w) for _, h, w in UNESCAPE_TESTS],
    ids=[d for d, _, _ in UNESCAPE_TESTS],
)
def test_unescape(html, want):
    assert unescape_string(html) == want


ROUND_TRIP = [
    "",
    "abc def",
    "a & b",
    "a&amp;b",
    "a &amp b",
    "&quot;",
    '"',
    '"<&>"',
    "&quot;&lt;&amp;&gt;&quot;",
    '3&5==1 && 0<1, "0&lt;1", a+acute=&aacute;',
    "The special characters are: <, >, &, ' and \"",
]


@pytest.mark.parametrize("s", ROUND_TRIP)
def test_unescape_escape(s):
    assert unescape_string(escape_string(s)) == s


def test_entity_table_invariants():
    for k, v in ENTITY.items():
        assert 1 + len(k) >= len(v.encode("utf-8")), k
        if len(k) > LONGEST_ENTITY_WITHOUT_SEMICOLON:
            assert k.endswith(";"), k
    for k, v in ENTITY2.items():
        assert 1 + len(k) >= len(v.encode("utf-8")), k


def test_attribute_mode_entities():
    # "&name=" in attribute mode stays undecoded (escape.cr:161); text mode
    # uses longest-prefix matching for no-semicolon names.
    assert unescape(b"q=z&amp=5&notice=hello&not;=world", True) == (
        b"q=z&amp=5&notice=hello\xc2\xac=world"
    )
    assert unescape(b"&notit;&notin;", False) == "¬it;∉".encode()


def test_numeric_wrap_and_edge_codepoints():
    # Int32-wrapping accumulation (reference escape.cr:107-110): huge
    # numerics wrap; anything outside [1, 0x10FFFF] or surrogate -> U+FFFD.
    assert unescape_string("&#9999999999;") == "�"  # wraps positive
    assert unescape_string("&#4294967296;") == "�"  # wraps to 0
    assert unescape_string("&#x110000;") == "�"     # out of range
    assert unescape_string("&#xD800;") == "�"       # surrogate
    assert unescape_string("&#x80;") == "€"         # Win-1252 remap
    assert unescape_string("&#x9F;") == "Ÿ"
    assert unescape_string("&#x7F;") == "\x7f"           # disallowed kept
    assert unescape_string("&#xFDD0;") == "﷐"       # noncharacter kept
    assert unescape_string("&#0;") == "�"
