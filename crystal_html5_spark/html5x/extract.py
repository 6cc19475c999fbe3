"""Document-level extraction: the scalar core of the Spark pipeline.

``inner_text`` parity: node.cr:326-360 — concatenation of Text-node data in
document order, skipping comments, no whitespace normalization.  This is the
byte-identical-per-url target.

``main_text`` is the boilerplate-stripped variant (north_star): the same
document-order traversal with script/style/template/nav/header/footer/
aside/form subtrees (and comments) removed.
"""

from __future__ import annotations

import time

from .node import COMMENT_NODE, TEXT_NODE, Node
from .parser import Parser
from .tokenizer import MaxBufferExceeded, s2b

# Subtrees dropped by main-content extraction (SURVEY.md §2.5 / north_star).
BOILERPLATE_TAGS = frozenset((
    "script", "style", "template", "nav", "header", "footer", "aside",
    "form", "noscript", "iframe",
))


def inner_text_bytes(doc: Node) -> bytes:
    """Exact bytes of the reference's inner_text (UTF-8 +surrogateescape so
    invalid input bytes round-trip)."""
    return s2b(doc.inner_text())


def main_text(doc: Node) -> str:
    """Document-order text with boilerplate subtrees stripped."""
    out: list[str] = []
    stack = [doc]
    while stack:
        n = stack.pop()
        t = n.type
        if t == TEXT_NODE:
            out.append(n.data)
            continue
        if t == COMMENT_NODE:
            continue
        if n.namespace == "" and n.data in BOILERPLATE_TAGS:
            continue
        kids = []
        c = n.first_child
        while c is not None:
            kids.append(c)
            c = c.next_sibling
        stack.extend(reversed(kids))
    return "".join(out)


def count_nodes(doc: Node) -> int:
    n = 0
    stack = [doc]
    while stack:
        cur = stack.pop()
        n += 1
        c = cur.first_child
        while c is not None:
            stack.append(c)
            c = c.next_sibling
    return n


def extract_document(html: bytes, max_doc_bytes: int = 0) -> dict:
    """Parse one document and extract text + metrics.

    Never raises: oversize/failed documents produce an error row so a single
    bad page cannot kill a 100 TB task (SURVEY.md §4 max_buf policy).
    """
    t0 = time.perf_counter()
    try:
        p = Parser(html, max_buf=max_doc_bytes)
        p.parse()
        doc = p.doc
        text = inner_text_bytes(doc)
        main = main_text(doc)
        return {
            "text": text,
            "main_text": main,
            "n_nodes": count_nodes(doc) - 1,  # exclude the Document node
            "err": "",
            "parse_ms": (time.perf_counter() - t0) * 1000.0,
        }
    except MaxBufferExceeded:
        return {
            "text": b"", "main_text": "", "n_nodes": 0,
            "err": "max_buf_exceeded",
            "parse_ms": (time.perf_counter() - t0) * 1000.0,
        }
    except Exception as ex:  # noqa: BLE001 — error-row policy, never crash
        return {
            "text": b"", "main_text": "", "n_nodes": 0,
            "err": f"parse_error: {type(ex).__name__}: {ex}"[:500],
            "parse_ms": (time.perf_counter() - t0) * 1000.0,
        }
