"""Minimal pure-stdlib PDF writer + text extractor (north_rule names
"PDF/layout parse" as part of main-content extraction).

Writer: spec-valid PDF 1.4 with one FlateDecode content stream per page
(catalog / page tree / Helvetica / xref / trailer), used to synthesize
deterministic documents for tests and the driver query.

Extractor: from-scratch object-level parse — finds ``N G obj`` objects,
resolves /Page objects and their /Contents streams (direct or indirect
/Length), inflates FlateDecode, and walks the content stream for the
text-showing operators ``Tj``, ``'``, ``"`` and ``TJ`` with literal
``(...)`` (incl. escapes and nesting) and hex ``<...>`` strings.  This
covers the output of simple generators (including this writer) honestly;
anything else raises the typed ``PdfError`` so a hostile blob at 100 TB
becomes an error row, not a task failure.

The driver query's oracle exploits the ROUND-TRIP invariant: Spark goes
text -> PDF bytes -> extract -> text, while DuckDB computes the expected
page count and text hash straight from the source table — the oracle
never sees a PDF byte, so codec bugs cannot cancel out.
"""

from __future__ import annotations

import re
import zlib


class PdfError(ValueError):
    """Malformed or unsupported PDF input."""


_PDF_ESCAPE = {ord("("): b"\\(", ord(")"): b"\\)", ord("\\"): b"\\\\",
               ord("\r"): b"\\r", ord("\n"): b"\\n"}


def _escape_string(data: bytes) -> bytes:
    out = bytearray()
    for byte in data:
        esc = _PDF_ESCAPE.get(byte)
        if esc is not None:
            out += esc
        else:
            out.append(byte)
    return bytes(out)


def encode_simple_pdf(pages: list[str]) -> bytes:
    """Encode one text chunk per page (raw UTF-8 bytes in the string
    object; extraction returns them verbatim)."""
    objects: list[bytes] = []  # 1-indexed

    n_pages = len(pages)
    page_obj_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{oid} 0 R" for oid in page_obj_ids)
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")  # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
        .encode())  # 2
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # 3
    for i, text in enumerate(pages):
        content_id = page_obj_ids[i] + 1
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {content_id} 0 R >>".encode())
        stream = (b"BT /F1 12 Tf 72 720 Td ("
                  + _escape_string(text.encode("utf-8"))
                  + b") Tj ET")
        flate = zlib.compress(stream)
        objects.append(
            f"<< /Length {len(flate)} /Filter /FlateDecode >>\n"
            .encode() + b"stream\n" + flate + b"\nendstream")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_pos}\n%%EOF\n").encode()
    return bytes(out)


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_STREAM_RE = re.compile(rb"stream\r?\n", re.S)
_CONTENTS_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_LENGTH_REF_RE = re.compile(rb"/Length\s+(\d+)\s+\d+\s+R")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?![\s]*\d+\s+R)")
_NUM_ONLY_RE = re.compile(rb"\s*(\d+)\s*$")


def _object_map(data: bytes) -> dict[int, bytes]:
    objs: dict[int, bytes] = {}
    for m in _OBJ_RE.finditer(data):
        objs[int(m.group(1))] = m.group(3)
    if not objs:
        raise PdfError("no objects")
    return objs


def _stream_of(body: bytes, objs: dict[int, bytes]) -> bytes | None:
    sm = _STREAM_RE.search(body)
    if sm is None:
        return None
    head = body[:sm.start()]
    start = sm.end()
    lm = _LENGTH_REF_RE.search(head)
    if lm is not None:  # indirect /Length
        ref = objs.get(int(lm.group(1)))
        nm = _NUM_ONLY_RE.match(ref or b"")
        if nm is None:
            raise PdfError("unresolvable stream length")
        length = int(nm.group(1))
    else:
        lm = _LENGTH_RE.search(head)
        if lm is None:
            raise PdfError("stream without /Length")
        length = int(lm.group(1))
    raw = body[start:start + length]
    if len(raw) != length:
        raise PdfError("truncated stream")
    if b"/FlateDecode" in head:
        try:
            raw = zlib.decompress(raw)
        except zlib.error as e:
            raise PdfError(f"flate: {e}") from e
    elif b"/Filter" in head:
        raise PdfError("unsupported stream filter")
    return raw


def _decode_literal(body: bytes, pos: int) -> tuple[bytes, int]:
    """Decode a ``(...)`` string starting at the '('; returns (bytes,
    position after the closing paren)."""
    out = bytearray()
    depth = 1
    i = pos + 1
    n = len(body)
    while i < n:
        c = body[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                break
            e = body[i + 1]
            mapped = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08,
                      0x66: 0x0C, 0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C}
            if e in mapped:
                out.append(mapped[e])
                i += 2
                continue
            if 0x30 <= e <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= body[j] <= 0x37:
                    val = val * 8 + (body[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
                continue
            if e in (0x0A, 0x0D):  # line continuation
                i += 2
                if e == 0x0D and i < n and body[i] == 0x0A:
                    i += 1
                continue
            out.append(e)
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out.append(c)
        i += 1
    raise PdfError("unterminated string literal")


def _text_from_content(content: bytes) -> bytes:
    """All bytes shown by Tj / ' / \" / TJ operators, in stream order."""
    out = bytearray()
    i = 0
    n = len(content)
    pending: list[tuple[bytes, int]] = []  # (string, end-pos) awaiting op
    while i < n:
        c = content[i]
        if c == 0x28:  # (
            s, i = _decode_literal(content, i)
            pending.append((s, i))
            continue
        if c == 0x3C and not content.startswith(b"<<", i):  # hex string
            end = content.find(b">", i + 1)
            if end == -1:
                raise PdfError("unterminated hex string")
            hx = re.sub(rb"\s+", b"", content[i + 1:end])
            if len(hx) % 2:
                hx += b"0"
            try:
                pending.append((bytes.fromhex(hx.decode("ascii")), end + 1))
            except ValueError as e:
                raise PdfError("bad hex string") from e
            i = end + 1
            continue
        if c in (0x54, 0x27, 0x22):  # T / ' / "
            op = content[i:i + 2]
            if op in (b"Tj", b"TJ") or c in (0x27, 0x22):
                for s, _pos in pending:
                    out += s
                pending.clear()
                i += 2 if c == 0x54 else 1
                continue
        if c in (0x2F, 0x5B, 0x5D):  # names/array brackets: skip
            i += 1
            continue
        if c not in (0x20, 0x0A, 0x0D, 0x09):
            # a non-string operand (number) or other operator: strings
            # accumulated so far still belong to the NEXT show op, keep
            pass
        i += 1
    return bytes(out)


def _is_page_leaf(body: bytes) -> bool:
    return (b"/Type" in body and b"/Page" in body
            and b"/Pages" not in body and b"/Kids" not in body)


def _pages_in_tree_order(objs: dict[int, bytes]) -> list[int]:
    """Page-object numbers in true page-tree order: walk the catalog's
    /Pages reference through /Kids arrays (intermediate /Pages nodes
    recurse, depth-first, left-to-right — PDF 32000-1 §7.7.3 defines
    page order as the in-order traversal of the tree).  Any /Page
    object never reached from the tree (orphan) is appended afterwards
    in ascending object-number order so no content is dropped."""
    order: list[int] = []
    seen: set[int] = set()

    def walk(num: int) -> None:
        if num in seen:  # cycle guard: hostile blob, not a task failure
            return
        seen.add(num)
        body = objs.get(num)
        if body is None:
            return
        km = _KIDS_RE.search(body)
        if km is not None:  # intermediate /Pages node
            for rm in _REF_RE.finditer(km.group(1)):
                walk(int(rm.group(1)))
        elif _is_page_leaf(body):
            order.append(num)

    for body in objs.values():
        if b"/Type" in body and b"/Catalog" in body:
            pm = _PAGES_REF_RE.search(body)
            if pm is not None:
                walk(int(pm.group(1)))
            break
    orphans = sorted(num for num, body in objs.items()
                     if num not in seen and _is_page_leaf(body))
    return order + orphans


def extract_pdf_text(data: bytes) -> list[str]:
    """Text per page, in page-tree (/Kids) order — object numbering is
    NOT assumed to match tree order."""
    if not data.startswith(b"%PDF-"):
        raise PdfError("missing %PDF header")
    objs = _object_map(data)
    pages: list[bytes] = []
    for num in _pages_in_tree_order(objs):
        body = objs[num]
        cm = _CONTENTS_RE.search(body)
        if cm is None:
            pages.append(b"")
            continue
        cobj = objs.get(int(cm.group(1)))
        if cobj is None:
            raise PdfError("dangling /Contents reference")
        stream = _stream_of(cobj, objs)
        if stream is None:
            raise PdfError("contents object has no stream")
        pages.append(_text_from_content(stream))
    if not pages:
        raise PdfError("no /Page objects")
    return [t.decode("utf-8", "replace") for t in pages]
