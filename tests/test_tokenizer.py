"""Tokenizer golden tests.

Fixture provenance: re-encoded from the reference's spec suite
(/root/reference/spec/token_spec.cr:7-437) — golden token streams joined
with '$'.  Also ports the raw-reconstruction invariant (:497-509), the
max-buffer tests (:454-495), the Buf-API depth test (:511-540) and the
newline-conversion table (:542-568).
"""

import json
import pathlib

import pytest

from crystal_html5_spark.html5x import tokenizer as tk
from crystal_html5_spark.html5x.escape import convert_new_lines

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
TOKEN_TESTS = json.loads((FIXTURES / "token_tests.json").read_text())


@pytest.mark.parametrize("case", TOKEN_TESTS, ids=[c["desc"] for c in TOKEN_TESTS])
def test_tokenizer_golden(case):
    z = tk.Tokenizer(case["html"].encode("utf-8"))
    if case["golden"]:
        for i, want in enumerate(case["golden"].split("$")):
            assert z.next() != tk.ERROR, f"token {i}: want {want!r}, got Error"
            got = str(z.token())
            assert got == want, f"token {i}: want {want!r}, got {got!r}"
    z.next()


@pytest.mark.parametrize("case", TOKEN_TESTS, ids=[c["desc"] for c in TOKEN_TESTS])
def test_raw_reconstruction(case):
    """Concatenated raw spans reassemble the input exactly."""
    html = case["html"].encode("utf-8")
    z = tk.Tokenizer(html)
    parsed = bytearray()
    while True:
        tt = z.next()
        parsed += z.raw()
        if tt == tk.ERROR:
            break
    assert bytes(parsed) == html


def test_max_buffer():
    z = tk.Tokenizer(b"<" + b"t" * 10, max_buf=5)
    with pytest.raises(tk.MaxBufferExceeded):
        z.next()
    assert z.raw() == b"<tttt"


@pytest.mark.parametrize("case", TOKEN_TESTS, ids=[c["desc"] for c in TOKEN_TESTS])
def test_max_buffer_reconstruction(case):
    """At every max_buf size, raw output + unconsumed input == input."""
    html = case["html"].encode("utf-8")
    max_buf = 1
    while True:
        z = tk.Tokenizer(html, max_buf=max_buf)
        tokenized = bytearray()
        while True:
            try:
                tt = z.next()
            except tk.MaxBufferExceeded:
                tokenized += z.raw()
                break
            tokenized += z.raw()
            if tt == tk.ERROR:
                break
        tokenized += z.buf[z.pos:]
        assert bytes(tokenized) == html, f"max_buf={max_buf}"
        if z.eof:
            break
        max_buf += 1


def test_buf_api_depth():
    s = b"0<a>1</a>2<b>3<a>4<a>5</a>6</b>7</a>8<a/>9"
    z = tk.Tokenizer(s)
    result = bytearray()
    depth = 0
    while True:
        tt = z.next()
        if tt == tk.ERROR:
            if z.eof:
                break
        elif tt == tk.TEXT:
            if depth > 0:
                result += z.text() or b""
        elif tt in (tk.START_TAG, tk.END_TAG):
            tn, _ = z.tag_name()
            if tn == b"a":
                depth += 1 if tt == tk.START_TAG else -1
    assert bytes(result) == b"14567"


CONVERT_NL = {
    b"Mac\rDOS\r\nUnix\n": b"Mac\nDOS\nUnix\n",
    b"Unix\nMac\rDOS\r\n": b"Unix\nMac\nDOS\n",
    b"DOS\r\nDOS\r\nDOS\r\n": b"DOS\nDOS\nDOS\n",
    b"": b"",
    b"\n": b"\n",
    b"\n\r": b"\n\n",
    b"\r": b"\n",
    b"\r\n": b"\n",
    b"\r\n\n": b"\n\n",
    b"\r\n\r": b"\n\n",
    b"\r\n\r\n": b"\n\n",
    b"\r\r": b"\n\n",
    b"\r\r\n": b"\n\n",
    b"\r\r\n\n": b"\n\n\n",
    b"\r\r\r\n": b"\n\n\n",
    b"\r \n": b"\n \n",
    b"xyz": b"xyz",
}


def test_convert_new_lines():
    for k, v in CONVERT_NL.items():
        assert convert_new_lines(k) == v, repr(k)
