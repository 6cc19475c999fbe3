"""From-scratch PDF writer + text extractor (north_rule: PDF/layout
parse as part of main-content extraction)."""

from __future__ import annotations

import random
import zlib

import pytest

from crystal_html5_spark.sparkjob.pdfcodec import (
    PdfError,
    encode_simple_pdf,
    extract_pdf_text,
)


def test_roundtrip_multipage():
    pages = ["first page", "second page\nwith lines", "third"]
    assert extract_pdf_text(encode_simple_pdf(pages)) == pages


def test_roundtrip_escapes_and_unicode():
    pages = [
        "parens (nested (deeply)) and \\ backslash",
        "newline\nCR\rtab\tdone",
        "unicode: ünïcødé ©  — em-dash",
        "",
    ]
    assert extract_pdf_text(encode_simple_pdf(pages)) == pages


def test_extractor_handles_hex_strings_and_tj_arrays():
    # Hand-built page: hex string + TJ array with kerning numbers, the
    # other common text-showing shapes beyond our writer's single Tj.
    content = b"BT <48656C6C6F> Tj [(wo) -20 (rld)] TJ ET"
    stream = zlib.compress(content)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length " + str(len(stream)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stream
        + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["Helloworld"]


def test_extractor_indirect_length():
    content = b"BT (x) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + content
        + b"\nendstream\nendobj\n"
        b"5 0 obj\n" + str(len(content)).encode() + b"\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["x"]


def test_page_order_follows_kids_not_object_numbers():
    """External generators number objects freely; page order is the
    /Pages /Kids traversal, not ascending object ids."""
    c_first = b"BT (first) Tj ET"
    c_second = b"BT (second) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        # Kids list the HIGHER-numbered page first.
        b"2 0 obj\n<< /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >>\n"
        b"endobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length " + str(len(c_second)).encode()
        + b" >>\nstream\n" + c_second + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>\n"
        b"endobj\n"
        b"6 0 obj\n<< /Length " + str(len(c_first)).encode()
        + b" >>\nstream\n" + c_first + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["first", "second"]


def test_page_order_nested_tree_and_orphans():
    """Intermediate /Pages nodes recurse depth-first; a /Page object
    unreachable from the catalog is still extracted, appended last."""
    def content_obj(num: int, text: bytes) -> bytes:
        return (f"{num} 0 obj\n<< /Length {len(text)} >>\n".encode()
                + b"stream\n" + text + b"\nendstream\nendobj\n")

    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [7 0 R 3 0 R] /Count 3 >>\n"
        b"endobj\n"
        # Intermediate tree node holding the first page.
        b"7 0 obj\n<< /Type /Pages /Kids [5 0 R] /Parent 2 0 R >>\n"
        b"endobj\n"
        b"5 0 obj\n<< /Type /Page /Parent 7 0 R /Contents 6 0 R >>\n"
        b"endobj\n" + content_obj(6, b"BT (a) Tj ET")
        + b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n" + content_obj(4, b"BT (b) Tj ET")
        # Orphan page: never referenced by any /Kids array.
        + b"8 0 obj\n<< /Type /Page /Contents 9 0 R >>\nendobj\n"
        + content_obj(9, b"BT (orphan) Tj ET")
        + b"%%EOF\n"
    )
    assert extract_pdf_text(pdf) == ["a", "b", "orphan"]


def test_rejects_garbage_with_typed_error():
    for blob in (b"", b"not a pdf", b"%PDF-1.4\njunk only",
                 b"%PDF-1.4\n1 0 obj\n<< /Type /Page /Contents 9 0 R >>"
                 b"\nendobj\n"):
        with pytest.raises(PdfError):
            extract_pdf_text(blob)


def test_fuzz_never_crashes():
    rng = random.Random(17)
    good = encode_simple_pdf(["seed page"])
    for _ in range(300):
        # random bytes, and random mutations of a valid document
        if rng.random() < 0.5:
            blob = b"%PDF-" + bytes(rng.randrange(256)
                                    for _ in range(rng.randrange(300)))
        else:
            blob = bytearray(good)
            for _ in range(rng.randrange(1, 8)):
                blob[rng.randrange(len(blob))] = rng.randrange(256)
            blob = bytes(blob)
        try:
            extract_pdf_text(blob)
        except PdfError:
            pass  # typed rejection is the contract
