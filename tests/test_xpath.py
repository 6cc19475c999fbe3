"""XPath smoke suite (ported from /root/reference/spec/xpath/xpath_spec.cr
over the sample doc in spec/xpath/spec_helper.cr)."""

from crystal_html5_spark.html5x.parser import parse
from crystal_html5_spark.html5x.xpath import (
    attribute_value,
    xpath,
    xpath_float,
    xpath_nodes,
)

SAMPLE_HTML = """<!DOCTYPE html><html lang="en-US">
<head>
<title>Hello,World!</title>
</head>
<body>
<div class="container">
<header>
\t<!-- Logo -->
   <h1>City Gallery</h1>
</header>
<nav>
  <ul>
    <li><a href="/London">London</a></li>
    <li><a href="/Paris">Paris</a></li>
    <li><a href="/Tokyo">Tokyo</a></li>
  </ul>
</nav>
<article>
  <h1>London</h1>
  <img src="pic_mountain.jpg" alt="Mountain View" style="width:304px;height:228px;">
  <p>London is the capital city of England. It is the most populous city in the  United Kingdom, with a metropolitan area of over 13 million inhabitants.</p>
  <p>Standing on the River Thames, London has been a major settlement for two millennia, its history going back to its founding by the Romans, who named it Londinium.</p>
</article>
<footer>Copyright &copy; W3Schools.com</footer>
</div>
</body>
</html>"""

DOC = parse(SAMPLE_HTML)


def test_xpath_suite():
    node = xpath(DOC, "//html")
    assert node is not None
    assert attribute_value(node, "lang") == "en-US"

    node = xpath(DOC, "//header")
    assert "Logo" not in node.inner_text()
    assert "Logo" in node.to_html()

    link = xpath(DOC, "//a[1]/@href")
    assert link is not None
    assert link.inner_text() == "/London"

    doc = parse('<html><b attr="1"></b></html>')
    node = xpath(doc, "//b/@attr/..")
    assert node is not None and node.data == "b"

    assert len(xpath_nodes(DOC, "//a")) == 3

    lst = xpath_nodes(DOC, "//a[@href]")
    assert len(lst) == 3
    assert [n.inner_text() for n in lst] == ["London", "Paris", "Tokyo"]

    assert xpath_float(DOC, "count(//img)") == 1.0


def test_xpath_evaluate():
    from crystal_html5_spark.html5x.xpath import xpath_evaluate

    assert xpath_evaluate(DOC, "count(//a)") == 3.0
    nodes = xpath_evaluate(DOC, "//a[@href]")
    assert [n.inner_text() for n in nodes] == ["London", "Paris", "Tokyo"]
