"""Streaming (IO-input) tokenizer/parser: byte-identity with the
in-memory engine at every chunk size, and the bounded-window guarantee
(round-2: closes the round-1 'whole document in memory' gap vs the
reference's IO tokenization, token.cr:213-283)."""

import io

import pytest

from crystal_html5_spark.html5x.parser import parse
from crystal_html5_spark.html5x.stream import (
    StreamTokenizer,
    parse_io,
    stream_tokens,
)
from crystal_html5_spark.html5x.tokenizer import (
    ERROR,
    MaxBufferExceeded,
    Tokenizer,
)
from crystal_html5_spark.sparkjob.pages import fixture_htmls, synth_rows

DOCS = [
    b"",
    b"<p>hello</p>",
    b"<html><head><title>T</title></head><body>"
    b"<div class='a' id=\"b\">x &amp; y</div>"
    b"<script>var a = '<not>' + 1;</script>"
    b"<!-- comment --><pre>\nkeep</pre></body></html>",
    b"<p>NUL\x00 byte</p>",
    b"<p>line one\r\nline two\rline three</p>",
    b"<ul>" + b"".join(b"<li><a href='/x%d'>i%d</a></li>" % (i, i)
                       for i in range(40)) + b"</ul>",
    b"<p>unterminated <b>tag at eof <i attr=",
    b"<table><tr><td>foster<div>me</table>",
]


def all_tokens(data: bytes) -> list[str]:
    z = Tokenizer(data)
    out = []
    while z.next() != ERROR:
        out.append(str(z.token()))
    return out


@pytest.mark.parametrize("chunk", [1, 3, 7, 64, 4096])
def test_stream_tokens_identical(chunk):
    for doc in DOCS:
        expect = all_tokens(doc)
        got = [str(t) for t in
               stream_tokens(io.BytesIO(doc), chunk_size=chunk)]
        assert got == expect, (chunk, doc[:40])


@pytest.mark.parametrize("chunk", [1, 17, 1024])
def test_parse_io_identical(chunk):
    for doc in DOCS:
        expect = parse(doc).to_html(self_only=False)
        got = parse_io(io.BytesIO(doc), chunk_size=chunk) \
            .to_html(self_only=False)
        assert got == expect, (chunk, doc[:40])


def test_parse_io_on_fixture_corpus():
    """Every whole-page golden fixture input parses identically via IO."""
    for doc in fixture_htmls()[:300]:
        expect = parse(doc).to_html(self_only=False)
        got = parse_io(io.BytesIO(doc), chunk_size=97) \
            .to_html(self_only=False)
        assert got == expect


def test_parse_io_on_synth_pages():
    for url, _ts, html, _t, _l in synth_rows(60):
        expect = parse(html).to_html(self_only=False)
        got = parse_io(io.BytesIO(html), chunk_size=1009) \
            .to_html(self_only=False)
        assert got == expect, url


def test_bounded_window():
    """The window holds O(largest token + chunk), not O(document):
    many small tokens through a small chunk never accumulate."""
    n = 5000
    doc = b"".join(b"<p>word%d</p>" % i for i in range(n))
    st = StreamTokenizer(io.BytesIO(doc), chunk_size=256)
    peak = 0
    while st.next() != ERROR:
        st.token()
        peak = max(peak, st.max_window)
    assert peak <= 1024, peak  # few chunks, despite a ~60 KB document


def test_stream_max_buf():
    doc = b"<p>" + b"x" * 100_000 + b"</p>"
    with pytest.raises(MaxBufferExceeded):
        for _ in stream_tokens(io.BytesIO(doc), chunk_size=512,
                               max_buf=4096):
            pass
