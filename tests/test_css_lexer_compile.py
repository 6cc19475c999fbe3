"""CSS lexer token-stream and compiler-unit tests (ported from
/root/reference/spec/css/lexer_spec.cr and compile_spec.cr:1-180)."""

import pytest

from crystal_html5_spark.html5x import css as C
from crystal_html5_spark.html5x.parser import parse


def lex_all(s):
    out = []
    for tok in C.Lexer(s).tokens():
        out.append((tok.type, tok.val, tok.start))
        if tok.type in (C.ERROR, C.EOF_T):
            break
    return out


LEXER_CASES = [
    ("7.3", [(C.NUMBER, "7.3", 0), (C.EOF_T, "", 3)]),
    ("7.", [(C.NUMBER, "7", 0), (C.DOT, ".", 1), (C.EOF_T, "", 2)]),
    ("7 \t5n", [(C.NUMBER, "7", 0), (C.SPACE, " \t", 1),
                (C.DIMENSION, "5n", 3), (C.EOF_T, "", 5)]),
    ("  ~", [(C.TILDE, "  ~", 0), (C.EOF_T, "", 3)]),
    ("  ~=", [(C.SPACE, "  ", 0), (C.MATCH_INCLUDES, "~=", 2),
              (C.EOF_T, "", 4)]),
    ("lang", [(C.IDENT, "lang", 0), (C.EOF_T, "", 4)]),
    ("lang(", [(C.FUNCTION, "lang(", 0), (C.EOF_T, "", 5)]),
    ("hi#name 43", [(C.IDENT, "hi", 0), (C.HASH, "#name", 2),
                    (C.SPACE, " ", 7), (C.NUMBER, "43", 8),
                    (C.EOF_T, "", 10)]),
    ("'this is  \\' a string ' \"another string\"",
     [(C.STRING, "'this is  \\' a string '", 0), (C.SPACE, " ", 23),
      (C.STRING, '"another string"', 24), (C.EOF_T, "", 40)]),
    ("::foo(", [(C.COLON, ":", 0), (C.COLON, ":", 1),
                (C.FUNCTION, "foo(", 2), (C.EOF_T, "", 6)]),
    (":not(#h2", [(C.NOT, ":not(", 0), (C.HASH, "#h2", 5),
                  (C.EOF_T, "", 8)]),
    (":not#h2", [(C.COLON, ":", 0), (C.IDENT, "not", 1),
                 (C.HASH, "#h2", 4), (C.EOF_T, "", 7)]),
    ("a[href^='https://']",
     [(C.IDENT, "a", 0), (C.LEFT_BRACE, "[", 1), (C.IDENT, "href", 2),
      (C.MATCH_PREFIX, "^=", 6), (C.STRING, "'https://'", 8),
      (C.RIGHT_BRACE, "]", 18), (C.EOF_T, "", 19)]),
    ("h2~a", [(C.IDENT, "h2", 0), (C.TILDE, "~", 2), (C.IDENT, "a", 3),
              (C.EOF_T, "", 4)]),
    ("p ~ span", [(C.IDENT, "p", 0), (C.TILDE, " ~", 1), (C.SPACE, " ", 3),
                  (C.IDENT, "span", 4), (C.EOF_T, "", 8)]),
    ("span > p, p",
     [(C.IDENT, "span", 0), (C.GREATER, " >", 4), (C.SPACE, " ", 6),
      (C.IDENT, "p", 7), (C.COMMA, ",", 8), (C.SPACE, " ", 9),
      (C.IDENT, "p", 10), (C.EOF_T, "", 11)]),
    ("span > p p",
     [(C.IDENT, "span", 0), (C.GREATER, " >", 4), (C.SPACE, " ", 6),
      (C.IDENT, "p", 7), (C.SPACE, " ", 8), (C.IDENT, "p", 9),
      (C.EOF_T, "", 10)]),
    ("-2n-1", [(C.DIMENSION, "-2n-1", 0), (C.EOF_T, "", 5)]),
]


@pytest.mark.parametrize("expr,want", LEXER_CASES,
                         ids=[c[0] for c in LEXER_CASES])
def test_lexer_tokens(expr, want):
    assert lex_all(expr) == want


def _run(html, sel, want):
    doc = parse(html)
    got = [n.to_html(True) for n in sel.select(doc, [])]
    assert got == want


def test_compile_group():
    doc = parse("<div><p>foo</p><span><p>bar</p></span></div>")
    sel = C.compile_selector("span > p, p")
    got = [n.to_html(True) for n in sel.select(doc)]
    assert got == ["<p>bar</p>", "<p>foo</p>", "<p>bar</p>"]


@pytest.mark.parametrize("expr", ["", "*foo"])
def test_compile_errors(expr):
    with pytest.raises(C.CSSException):
        C.compile_selector(expr)


COMPILE_SELECTOR_CASES = [
    ("<div><p>foo</p><span><p>bar</p></span></div>", "p",
     ["<p>foo</p>", "<p>bar</p>"]),
    ("<div><p>foo</p><span><p>bar</p></span></div>", "div > p",
     ["<p>foo</p>"]),
    ("<div><p>foo</p><span><p>bar</p></span></div>", "span > p",
     ["<p>bar</p>"]),
    ("<div><p>foo</p><span><p>bar</p></span></div>", "span p",
     ["<p>bar</p>"]),
    ("<div><p>foo</p><span><p>bar</p></span></div>", "div p",
     ["<p>foo</p>", "<p>bar</p>"]),
    ("<div><p>foo</p><span><p>bar</p></span></div>", "div div", []),
    ("<div><p>foo</p><span><p>bar</p></span></div>", "div *",
     ["<p>foo</p>", "<span><p>bar</p></span>", "<p>bar</p>"]),
    ('<div><p class="hi">foo</p><span><p class="hi">bar</p></span></div>',
     "div .hi", ['<p class="hi">foo</p>', '<p class="hi">bar</p>']),
    ('<p><a id="foo"></a></p>', "p :empty", ['<a id="foo"></a>']),
    ('<div><p><a id="foo"></a></p></div>', "div > p a",
     ['<a id="foo"></a>']),
    ('<p><a class="foo"></a></p>', "a.foo", ['<a class="foo"></a>']),
    ("<p><a></a></p>", "a.foo", []),
    ('<p><a id="foo"></a></p>', "a#foo", ['<a id="foo"></a>']),
    ('<p><a id="foo"></a></p>', "#foo", ['<a id="foo"></a>']),
    ('<p><a id="foo"></a></p>', "a[id=foo]", ['<a id="foo"></a>']),
    ('<p><a id="foo"></a></p>', "p:empty", []),
    ('<p><a id="1"></a><a id="2"></a><a id="3"></a><a id="4"></a></p>',
     "a:nth-child(odd)", ['<a id="1"></a>', '<a id="3"></a>']),
]


@pytest.mark.parametrize("html,expr,want", COMPILE_SELECTOR_CASES,
                         ids=[c[1] for c in COMPILE_SELECTOR_CASES])
def test_compile_selector(html, expr, want):
    comp = C.Compiler(C.Lexer(expr).tokens())
    sel = comp.compile_selector()
    assert comp.peek().type == C.EOF_T, "did not parse entire input"
    _run(html, sel, want)


ATTR_CASES = [
    ('<p><a id="foo"></a></p>', "[id=foo]", ['<a id="foo"></a>']),
    ('<p><a id="foo"></a></p>', "[id = 'foo']", ['<a id="foo"></a>']),
    ('<p><a id="foo"></a></p>', '[id="foo"]', ['<a id="foo"></a>']),
    ('<p><a id="hello-world"></a><a id="helloworld"></a></p>',
     '[id|="hello"]', ['<a id="hello-world"></a>']),
    ('<p><a id="hello-world"></a><a id="worldhello"></a></p>',
     '[id^="hello"]', ['<a id="hello-world"></a>']),
    ('<p><a id="hello-world"></a><a id="worldhello"></a></p>',
     '[id$="hello"]', ['<a id="worldhello"></a>']),
    ('<p><a id="hello-world"></a><a id="worldhello"></a></p>',
     '[id*="hello"]',
     ['<a id="hello-world"></a>', '<a id="worldhello"></a>']),
    ('<p><a id="hello world"></a><a id="hello-world"></a></p>',
     '[id~="hello"]', ['<a id="hello world"></a>']),
]


@pytest.mark.parametrize("html,expr,want", ATTR_CASES,
                         ids=[c[1] for c in ATTR_CASES])
def test_compile_attr(html, expr, want):
    comp = C.Compiler(C.Lexer(expr).tokens())
    m = comp.compile_attr()
    sel = C.SelectorSequence([m])
    comp.next()
    assert comp.peek().type == C.EOF_T
    _run(html, sel, want)


NTH_ARG_CASES = [
    ("even", 2, 0),
    ("odd", 2, 1),
    ("2n+1", 2, 1),
    ("-2n-1", -2, -1),
    ("2n", 2, 0),
    ("+2n", 2, 0),
    ("-2n", -2, 0),
    ("4", 0, 4),
    ("4n - 3", 4, -3),
]


@pytest.mark.parametrize("expr,a,b", NTH_ARG_CASES,
                         ids=[c[0] for c in NTH_ARG_CASES])
def test_parse_nth_args(expr, a, b):
    comp = C.Compiler(C.Lexer(expr).tokens())
    got = comp.parse_nth_args()
    assert comp.peek().type == C.EOF_T
    assert got == (a, b)


def test_parse_nth_units():
    assert C._parse_nth("9n") == (9, 0, False)
    assert C._parse_nth("-2n+2") == (-2, 2, True)
    with pytest.raises(C.SyntaxError_):
        C._parse_nth("91n3n")
