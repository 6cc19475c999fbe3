"""Entity escaping/unescaping with reference-exact semantics.

Parity target: /root/reference/src/html5/escape.cr:8-271 (which follows the
WHATWG "consume a character reference" rules with HTML4-legacy quirks:
Windows-1252 numeric remapping for 0x80-0x9F, U+FFFD for NUL / surrogates /
out-of-range, longest-prefix matching of no-semicolon named references in
text (not attribute) mode, and the ``&name=`` attribute-mode exception).

This is deliberately NOT ``html.unescape``: the stdlib decodes disallowed
codepoints and no-semicolon references differently.
"""

from __future__ import annotations

from .entities import ENTITY, ENTITY2, LONGEST_ENTITY_WITHOUT_SEMICOLON

# Windows-1252 remapping for numeric references 0x80..0x9F
# (escape.cr:8-43; spec: "consume a character reference").
REPLACEMENT_TABLE = (
    "€‚ƒ„…†‡"
    "ˆ‰Š‹ŒŽ"
    "‘’“”•–—"
    "˜™š›œžŸ"
)

_AMP = 0x26
_HASH = 0x23
_SEMI = 0x3B
_EQ = 0x3D

_INT32_MASK = 0xFFFFFFFF


def _wrap32(x: int) -> int:
    """Wrap to signed 32-bit (the reference accumulates the numeric value in a
    wrapping Int32 — escape.cr:107,110)."""
    x &= _INT32_MASK
    return x - 0x100000000 if x >= 0x80000000 else x


def _is_alnum(c: int) -> bool:
    return 0x61 <= c <= 0x7A or 0x41 <= c <= 0x5A or 0x30 <= c <= 0x39


def _unescape_entity(b: bytes, out: bytearray, src: int, attribute: bool) -> int:
    """Decode one ``&...`` reference starting at b[src] (b[src] == '&').

    Appends the decoded bytes to ``out`` and returns the new src cursor.
    Mirrors escape.cr:78-189.
    """
    n = len(b)
    rem = n - src  # len(s) where s = b[src:]
    if rem <= 1:
        out.append(b[src])
        return src + 1

    i = 1
    if b[src + 1] == _HASH:
        if rem <= 3:  # need at least "&#." to attempt a numeric reference
            out.append(b[src])
            return src + 1
        i = 2
        c = b[src + i]
        hexmode = c in (0x78, 0x58)  # 'x' / 'X'
        if hexmode:
            i += 1
        x = 0
        while src + i < n:
            c = b[src + i]
            i += 1
            if hexmode and (
                0x30 <= c <= 0x39 or 0x61 <= c <= 0x66 or 0x41 <= c <= 0x46
            ):
                x = _wrap32(16 * x + int(chr(c), 16))
                continue
            if 0x30 <= c <= 0x39 and not hexmode:
                x = _wrap32(10 * x + (c - 0x30))
                continue
            if c != _SEMI:
                i -= 1
            break
        if i <= 3:  # no digit matched
            out.append(b[src])
            return src + 1

        if 0x80 <= x <= 0x9F:
            s = REPLACEMENT_TABLE[x - 0x80]
        elif x == 0 or x > 0x10FFFF or 0xD800 <= x <= 0xDFFF or x < 0:
            # 0 / out-of-range / surrogates → U+FFFD; negative (Int32 wrap)
            # lands in encode_int's out-of-range branch (escape.cr:56).
            s = "�"
        else:
            # Both the "allowed" chr() path and the disallowed-codepoint
            # encode_int fallback produce the UTF-8 encoding of x
            # (escape.cr:121-143).
            s = chr(x)
        out += s.encode("utf-8")
        return src + i

    # Named reference: consume the longest alphanumeric run (+ optional ';').
    while src + i < n:
        c = b[src + i]
        i += 1
        if _is_alnum(c):
            continue
        if c != _SEMI:
            i -= 1
        break
    name = b[src + 1 : src + i].decode("utf-8", "replace")
    if not name:
        pass
    elif attribute and not name.endswith(";") and rem > i and b[src + i] == _EQ:
        pass  # "&name=" in an attribute: leave undecoded (escape.cr:161)
    elif name in ENTITY:
        out += ENTITY[name].encode("utf-8")
        return src + i
    elif name in ENTITY2:
        out += ENTITY2[name].encode("utf-8")
        return src + i
    elif not attribute:
        max_len = min(len(name) - 1, LONGEST_ENTITY_WITHOUT_SEMICOLON)
        for j in range(max_len, 1, -1):
            prefix = name[:j]
            if prefix in ENTITY:
                out += ENTITY[prefix].encode("utf-8")
                return src + j + 1
    out += b[src : src + i]
    return src + i


# Memo for semicolon-terminated references: raw span -> decoded bytes.
# Such spans decode position-independently, but text and attribute mode
# still diverge on unknown names (longest-prefix fallback is text-only),
# so each mode gets its own cache.  &amp; / &#169; style refs dominate.
import re as _re

_RE_ENTREF = _re.compile(rb"&(?:#[0-9]+;|#[xX][0-9a-fA-F]+;|[0-9A-Za-z]+;)")
_RE_ENTREF_CAP = _re.compile(rb"(&(?:#[0-9]+;|#[xX][0-9a-fA-F]+;|[0-9A-Za-z]+;))")
_ENT_CACHES: tuple[dict, dict] = ({}, {})


def unescape(b: bytes, attribute: bool) -> bytes:
    """Decode all entities in ``b`` (escape.cr:193-212).

    Batch fast path: when every '&' heads a ;-terminated reference that
    decodes exactly its own span (the overwhelmingly common shape), one
    C-level split replaces the per-byte cursor loop.  Any other shape —
    bare '&', legacy no-semicolon refs, longest-prefix splits like
    "&notit;" — falls back to the reference-exact loop below."""
    amp = b.find(b"&")
    if amp == -1:
        return b
    cache = _ENT_CACHES[attribute]
    parts = _RE_ENTREF_CAP.split(b)
    # Every matched span holds exactly one '&', so "all '&'s head a
    # matched reference" reduces to one C-level count.
    if len(parts) > 1 and b.count(b"&") == len(parts) // 2:
        out_l = parts  # reuse the list; odd slots get replaced
        ok = True
        for i in range(1, len(parts), 2):
            p = parts[i]
            rep = cache.get(p)
            if rep is None:
                tmp = bytearray()
                end = _unescape_entity(p, tmp, 0, attribute)
                if end != len(p):
                    ok = False  # prefix-split shape: not span-local
                    break
                rep = bytes(tmp)
                if len(cache) < 4096:
                    cache[p] = rep
            out_l[i] = rep
        if ok:
            return b"".join(out_l)
    out = bytearray(b[:amp])
    src = amp
    n = len(b)
    while src < n:
        if b[src] == _AMP:
            m = _RE_ENTREF.match(b, src)
            if m is not None:
                span = m.group()
                rep = cache.get(span)
                if rep is None:
                    tmp = bytearray()
                    end = _unescape_entity(b, tmp, src, attribute)
                    rep = bytes(tmp)
                    if end == m.end() and len(cache) < 4096:
                        # consumed exactly the ;-terminated span ->
                        # position-independent, safe to memoize
                        cache[span] = rep
                    out += rep
                    src = end
                    continue
                out += rep
                src += len(span)
                continue
            src = _unescape_entity(b, out, src, attribute)
        else:
            nxt = b.find(b"&", src + 1)
            if nxt == -1:
                nxt = n
            out += b[src:nxt]
            src = nxt
    return bytes(out)


_ESCAPE_TABLE = {
    "&": "&amp;",
    "'": "&#39;",
    "<": "&lt;",
    ">": "&gt;",
    '"': "&#34;",
    "\r": "&#13;",
}
_ESCAPE_TRANS = str.maketrans(_ESCAPE_TABLE)


def escape_string(s: str) -> str:
    """Escape ``& ' < > " \\r`` for the render path (escape.cr:218-259)."""
    return s.translate(_ESCAPE_TRANS)


def unescape_string(s: str) -> str:
    """String-level entity decode (escape.cr:266-271)."""
    if "&" not in s:
        return s
    return unescape(s.encode("utf-8"), False).decode("utf-8", "replace")


def lower(b: bytes) -> bytes:
    """Unicode-lowercase a UTF-8 byte string (escape.cr:214-216 uses
    String#downcase, i.e. full Unicode lowering, not ASCII-only)."""
    return b.decode("utf-8", "replace").lower().encode("utf-8")


def convert_new_lines(b: bytes) -> bytes:
    """``\\r`` / ``\\r\\n`` → ``\\n`` (token.cr:1051-1075)."""
    if b.find(0x0D) == -1:
        return b
    return b.replace(b"\r\n", b"\n").replace(b"\r", b"\n")
