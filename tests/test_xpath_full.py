"""XPath 1.0 surface tests for the expanded evaluator (round-2: the
reference's users get full XPath 1.0 via the xpath2 shard, so our engine
must cover the real-world query shapes, not just the reference's own
spec suite).  Cases modeled on the W3C spec examples and the public
antchfx/xpath (the Go library xpath2 is derived from) test corpus."""

import math

import pytest

from crystal_html5_spark.html5x.parser import parse
from crystal_html5_spark.html5x.xpath import (
    XPathError,
    xpath,
    xpath_bool,
    xpath_evaluate,
    xpath_float,
    xpath_nodes,
    xpath_string,
)

HTML = """<!DOCTYPE html><html lang="en-US"><head>
<title>My page</title></head>
<body>
<div class="container" id="main">
  <h1>Heading</h1>
  <ul id="menu">
    <li class="first"><a href="/a">Alpha</a></li>
    <li><a href="/b" class="ext link">Beta</a></li>
    <li><a href="/c">Gamma</a></li>
    <li class="last"><a>NoHref</a></li>
  </ul>
  <article data-id="7">
    <p>one <b>bold</b> tail</p>
    <p>two</p>
    <p>three</p>
  </article>
  <span>  spaced   text </span>
  <em>3.5</em><em>1.5</em>
</div>
</body></html>"""

DOC = parse(HTML)


def texts(nodes):
    return [n.inner_text() for n in nodes]


# ------------------------------- axes -------------------------------------

def test_following_sibling():
    assert texts(xpath_nodes(DOC, "//p[1]/following-sibling::p")) == \
        ["two", "three"]


def test_preceding_sibling():
    assert texts(xpath_nodes(DOC, "//p[3]/preceding-sibling::p")) == \
        ["one bold tail", "two"]
    # proximity position: [1] is the NEAREST preceding sibling
    assert texts(xpath_nodes(DOC, "//p[3]/preceding-sibling::p[1]")) == \
        ["two"]


def test_ancestor():
    names = [n.data for n in xpath_nodes(DOC, "//b/ancestor::*")]
    assert names == ["html", "body", "div", "article", "p"]
    assert [n.data for n in
            xpath_nodes(DOC, "//b/ancestor-or-self::*")][-1] == "b"
    # nearest-first proximity for the positional predicate
    assert xpath(DOC, "//b/ancestor::*[1]").data == "p"


def test_following_preceding():
    after = [n.data for n in xpath_nodes(DOC, "//article/following::*")]
    assert after[:2] == ["span", "em"]
    before = [n.data for n in
              xpath_nodes(DOC, "//article/preceding::li")]
    assert len(before) == 4
    # preceding excludes ancestors
    assert "div" not in [n.data
                         for n in xpath_nodes(DOC, "//b/preceding::*")]


def test_descendant_or_self_and_parent():
    assert xpath(DOC, "//ul/descendant-or-self::ul").data == "ul"
    assert xpath(DOC, "//b/parent::p") is not None
    assert xpath(DOC, "//b/..").data == "p"


def test_self_axis():
    assert xpath(DOC, "//p/self::p") is not None
    assert xpath(DOC, "//p/self::div") is None


def test_attribute_axis_wildcard():
    vals = sorted(n.inner_text()
                  for n in xpath_nodes(DOC, "//ul/@*"))
    assert vals == ["menu"]
    # //a[2] is per-parent (each a is its li's first) -> empty;
    # (//a)[2] selects the second a in document order.
    assert xpath_nodes(DOC, "//a[2]/@*") == []
    a2 = xpath_nodes(DOC, "(//a)[2]/@*")
    assert sorted(n.data for n in a2) == ["class", "href"]


# ----------------------------- node tests ---------------------------------

def test_text_node_test():
    assert xpath_string(DOC, "//p[1]/text()[1]") == "one "
    assert xpath_string(DOC, "//p[1]/text()[2]") == " tail"
    assert len(xpath_nodes(DOC, "//p[1]/text()")) == 2


def test_comment_and_node_tests():
    doc = parse("<div><!-- hey --><p>x</p></div>")
    assert xpath_string(doc, "//div/comment()") == " hey "
    kids = xpath_nodes(doc, "//div/node()")
    assert len(kids) == 2  # comment + p


# ----------------------------- functions ----------------------------------

def test_string_functions():
    assert xpath_bool(DOC, "contains((//a)[2]/@class, 'ext')")
    assert xpath_bool(DOC, "starts-with(//a[1]/@href, '/')")
    assert xpath_string(DOC,
                        "substring-before((//a)[2]/@class, ' ')") == "ext"
    assert xpath_string(DOC,
                        "substring-after((//a)[2]/@class, ' ')") == "link"
    assert xpath_string(DOC, "substring('12345', 2, 3)") == "234"
    assert xpath_string(DOC, "substring('12345', 1.5, 2.6)") == "234"
    assert xpath_string(DOC, "normalize-space(//span)") == "spaced text"
    assert xpath_float(DOC, "string-length('abc')") == 3.0
    assert xpath_string(DOC, "translate('bar', 'abc', 'ABC')") == "BAr"
    assert xpath_string(DOC, "translate('--aaa--', 'abc-', 'ABC')") == "AAA"
    assert xpath_string(DOC, "concat('a', 'b', 'c')") == "abc"


def test_contains_class_idiom():
    # The #1 real-world query shape the round-1 subset rejected:
    n = xpath(DOC, "//div[contains(@class, 'contain')]")
    assert n is not None and n.data == "div"
    assert xpath(DOC, "//li[contains(concat(' ', @class, ' '), ' last ')]") \
        is not None


def test_numeric_functions():
    assert xpath_float(DOC, "count(//li)") == 4.0
    assert xpath_float(DOC, "sum(//em)") == 5.0
    assert xpath_float(DOC, "floor(3.7)") == 3.0
    assert xpath_float(DOC, "ceiling(3.2)") == 4.0
    assert xpath_float(DOC, "round(2.5)") == 3.0
    assert xpath_float(DOC, "round(-2.5)") == -2.0  # half toward +inf
    assert xpath_float(DOC, "number('7.5')") == 7.5
    assert math.isnan(xpath_float(DOC, "number('x')"))


def test_boolean_functions():
    assert xpath_bool(DOC, "not(//missing)")
    assert xpath_bool(DOC, "boolean(//li)")
    assert not xpath_bool(DOC, "false()")
    assert xpath_bool(DOC, "true() and not(false())")
    assert xpath_bool(DOC, "//html[lang('en')]")
    assert not xpath_bool(DOC, "//html[lang('de')]")


def test_position_last():
    assert texts(xpath_nodes(DOC, "//li[position() < 3]/a")) == \
        ["Alpha", "Beta"]
    assert texts(xpath_nodes(DOC, "//li[last()]")) == ["NoHref"]
    assert texts(xpath_nodes(DOC, "//li[position() = last() - 1]/a")) == \
        ["Gamma"]


def test_name_functions():
    assert xpath_string(DOC, "name(//ul)") == "ul"
    assert xpath_string(DOC, "local-name(//ul/@id)") == "id"
    # HTML elements live in the xhtml namespace (structural assignment);
    # attributes have the null namespace.
    assert xpath_string(DOC, "namespace-uri(//ul)") == \
        "http://www.w3.org/1999/xhtml"
    assert xpath_string(DOC, "namespace-uri(//ul/@id)") == ""


def test_id_function():
    assert xpath(DOC, "id('menu')").data == "ul"
    assert texts(xpath_nodes(DOC, "id('menu main')/self::ul")) == \
        [xpath(DOC, "//ul").inner_text()]


def test_string_conversion():
    assert xpath_string(DOC, "string(3)") == "3"
    assert xpath_string(DOC, "string(3.5)") == "3.5"
    assert xpath_string(DOC, "string(1 div 0)") == "Infinity"
    assert xpath_string(DOC, "string(0 div 0)") == "NaN"
    assert xpath_string(DOC, "string(//h1)") == "Heading"


# ---------------------------- operators -----------------------------------

def test_arithmetic():
    assert xpath_float(DOC, "1 + 2 * 3") == 7.0
    assert xpath_float(DOC, "(1 + 2) * 3") == 9.0
    assert xpath_float(DOC, "7 mod 3") == 1.0
    assert xpath_float(DOC, "-7 mod 3") == -1.0  # sign of dividend
    assert xpath_float(DOC, "10 div 4") == 2.5
    assert xpath_float(DOC, "-(2 + 3)") == -5.0


def test_comparisons():
    assert xpath_bool(DOC, "1 < 2 and 2 <= 2")
    assert xpath_bool(DOC, "3 > 2 or false()")
    assert xpath_bool(DOC, "'a' = 'a' and 'a' != 'b'")
    # node-set vs value: exists-semantics
    assert xpath_bool(DOC, "//em = 3.5")
    assert xpath_bool(DOC, "//em > 3")
    assert xpath_bool(DOC, "count(//li[a/@href]) = 3")


def test_union():
    got = [n.data for n in xpath_nodes(DOC, "//h1 | //span | //article")]
    assert got == ["h1", "article", "span"]  # document order
    with pytest.raises(XPathError):
        xpath_nodes(DOC, "1 | //a")


def test_predicates_with_paths_and_values():
    assert texts(xpath_nodes(DOC, "//li[a/@href='/b']/a")) == ["Beta"]
    assert texts(xpath_nodes(DOC, "//li[not(@class)]/a")) == \
        ["Beta", "Gamma"]
    assert texts(xpath_nodes(DOC, "//li[@class='first']/a")) == ["Alpha"]
    assert xpath(DOC, "//article[@data-id=7]") is not None


def test_relative_and_absolute():
    ul = xpath(DOC, "//ul")
    assert texts(xpath_nodes(ul, "li/a"))[:2] == ["Alpha", "Beta"]
    assert texts(xpath_nodes(ul, "./li[1]/a")) == ["Alpha"]
    # absolute path from a non-root context climbs to the document root
    assert xpath(ul, "/html/head/title").inner_text() == "My page"
    assert xpath(ul, "//h1").inner_text() == "Heading"


def test_filter_expr_paths():
    assert texts(xpath_nodes(DOC, "(//li)[2]/a")) == ["Beta"]
    assert texts(xpath_nodes(DOC, "(//a | //h1)[1]")) == ["Heading"]
    assert xpath_float(DOC, "count((//li)[position() > 2])") == 2.0


def test_errors():
    with pytest.raises(XPathError):
        xpath(DOC, "//li[")
    with pytest.raises(XPathError):
        xpath(DOC, "unknownfn(1)")
    with pytest.raises(XPathError):
        xpath(DOC, "//li/unknown-axis::a")
    with pytest.raises(XPathError):
        xpath_float(DOC, "//li")  # not a number


def test_doc_order_across_contexts():
    # results merge in document order even when contexts interleave
    got = texts(xpath_nodes(DOC, "//li/a | //h1"))
    assert got == ["Heading", "Alpha", "Beta", "Gamma", "NoHref"]


def test_whitespace_tolerance():
    assert xpath_float(DOC, " count( //li [ @class ] ) ") == 2.0


def test_operator_names_after_wildcard():
    # XPath 1.0 section 3.7: an NCName after a NameTest '*' is an
    # OperatorName — '//* and //b' must evaluate, not raise (and a '*'
    # after an operand is still multiplication).
    from crystal_html5_spark.html5x.xpath import xpath_bool

    assert xpath_bool(DOC, "//* and //h1") is True
    assert xpath_bool(DOC, "//nosuch and //h1") is False
    assert xpath_bool(DOC, "//* or //nosuch") is True
    assert xpath_float(DOC, "4 * 3") == 12.0
    assert xpath_float(DOC, "4 div 2 * 3 mod 4") == 2.0
    assert xpath_float(DOC, "count(//*) * 2") == \
        2.0 * xpath_float(DOC, "count(//*)")


def test_namespace_axis():
    from crystal_html5_spark.html5x.parser import parse
    from crystal_html5_spark.html5x.xpath import (
        xpath_bool,
        xpath_float,
        xpath_nodes,
        xpath_string,
    )

    doc = parse(b"<html><body><p>t</p><svg><circle/></svg>"
                b"<math><mi>x</mi></math></body></html>")
    # Two namespace nodes per element: default + implicit xml.
    assert xpath_float(doc, "count(//p/namespace::*)") == 2.0
    assert xpath_string(doc, "string(//p/namespace::*[1])") == \
        "http://www.w3.org/1999/xhtml"
    assert xpath_string(doc, "string(//p/namespace::xml)") == \
        "http://www.w3.org/XML/1998/namespace"
    # Foreign-content elements expose their structural namespace.
    assert xpath_string(doc, "string(//circle/namespace::*[1])") == \
        "http://www.w3.org/2000/svg"
    assert xpath_string(doc, "string(//mi/namespace::*[1])") == \
        "http://www.w3.org/1998/Math/MathML"
    # namespace-uri() of elements follows the same mapping.
    assert xpath_string(doc, "namespace-uri(//circle)") == \
        "http://www.w3.org/2000/svg"
    assert xpath_string(doc, "namespace-uri(//p)") == \
        "http://www.w3.org/1999/xhtml"
    # parent:: from a namespace node returns the owner element.
    assert xpath_bool(doc, "count(//p/namespace::*/parent::p) = 1")
    # name() of a namespace node is its prefix; materialized nodes carry
    # the URI as text.
    assert xpath_string(doc, "name(//p/namespace::*[2])") == "xml"
    ns_nodes = xpath_nodes(doc, "//p/namespace::*")
    assert [n.data for n in ns_nodes] == ["xmlns", "xml"]
    assert ns_nodes[0].inner_text() == "http://www.w3.org/1999/xhtml"
