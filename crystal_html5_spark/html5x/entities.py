"""WHATWG named character reference tables.

Parity target: /root/reference/src/html5/entity.cr:3-2247 (ENTITY ~2138
single-codepoint entries incl. legacy no-semicolon forms, ENTITY2 ~93
two-codepoint entries).  Both the reference's table and Python's
``html.entities.html5`` are generated from the same WHATWG spec JSON, so we
derive ours from the stdlib instead of shipping a 2k-line literal.

Keys include the trailing ``;`` where the spec defines one (e.g. both
``"amp;"`` and ``"amp"`` are keys), matching the reference's lookup scheme.
"""

from __future__ import annotations

import html.entities as _stdlib_entities

# Single-codepoint named references: name -> 1-char string.
ENTITY: dict[str, str] = {
    k: v for k, v in _stdlib_entities.html5.items() if len(v) == 1
}

# Two-codepoint named references (e.g. "NotEqualTilde;" -> U+2242 U+0338).
# "nGt;" and "nLt;" are excluded by the reference (entity.cr:2154-2155):
# their UTF-8 encodings are longer than the escaped form, which the
# in-place decoder cannot grow — they therefore stay UNdecoded.
ENTITY2: dict[str, str] = {
    k: v
    for k, v in _stdlib_entities.html5.items()
    if len(v) == 2 and k not in ("nGt;", "nLt;")
}

# All no-semicolon legacy names are at most this long (reference:
# entity.cr:3 LONGEST_ENTITY_WITHOUT_SEMICOLON).
LONGEST_ENTITY_WITHOUT_SEMICOLON = 6

assert all(
    len(k) - 1 <= LONGEST_ENTITY_WITHOUT_SEMICOLON
    for k in _stdlib_entities.html5
    if not k.endswith(";")
)
