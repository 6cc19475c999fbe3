"""Streaming (IO-input) tokenization with a bounded, re-based buffer.

Parity target: the reference tokenizes from an ``IO`` holding only the
current raw token in memory (/root/reference/src/html5/token.cr:213-283 —
byte-at-a-time reads into a buffer that is re-based after each token and
capped by ``max_buf``).  Round 1 documented the gap: our Tokenizer needs
the whole document in memory, so a page larger than ``max_doc_bytes``
could only be skipped, never stream-parsed.

Design (window + re-scan, byte-identical by construction):

- An inner in-memory :class:`Tokenizer` runs over a window that always
  starts at the current token's first byte.
- The tokenizer-visible state is snapshotted before each ``next()``; when
  the scan hits the window end while the stream still has bytes, the
  state is restored, the window is extended from the IO, and the SAME
  token is re-scanned.  A token scan is a pure function of (window,
  start state), so the final, complete scan equals the scan the
  in-memory tokenizer would have produced over the whole document.
- Before each token the consumed prefix is dropped (re-base), so peak
  memory is O(largest single token + read chunk), not O(document) —
  the same bound as the reference; ``max_buf`` caps it identically
  (MaxBufferExceeded propagates from the capped inner scan).
"""

from __future__ import annotations

import io as _io

from .tokenizer import ERROR, Token, Tokenizer

_DEFAULT_CHUNK = 64 * 1024

# Tokenizer attributes mutated by a next() scan — snapshot/restore set.
_SCAN_STATE = (
    "pos", "raw_start", "data_start", "data_end", "pend_ks", "pend_ke",
    "pend_vs", "pend_ve", "attr", "n_attr_returned", "raw_tag",
    "text_is_raw", "convert_nul", "allow_cdata", "eof", "tt",
)


class StreamTokenizer:
    """Tokenizes from a binary file-like object with bounded memory.

    Drop-in for the accessor surface of :class:`Tokenizer` (next, text,
    tag_name, tag_attr, token, next_token, raw) — each token is fully
    contained in the current window when it is returned.
    """

    def __init__(self, reader, context_tag: str = "", max_buf: int = 0,
                 chunk_size: int = _DEFAULT_CHUNK):
        if isinstance(reader, (bytes, bytearray)):
            reader = _io.BytesIO(bytes(reader))
        self._reader = reader
        self._chunk = max(1, chunk_size)
        self._stream_done = False
        self._tok = Tokenizer(b"", context_tag=context_tag, max_buf=max_buf)
        self._fill()

    # -- window management ------------------------------------------------

    def _fill(self) -> bool:
        """Append one chunk from the stream; False at stream end."""
        if self._stream_done:
            return False
        chunk = self._reader.read(self._chunk)
        if not chunk:
            self._stream_done = True
            return False
        t = self._tok
        t.buf = t.buf + chunk
        t.n = len(t.buf)
        return True

    def _rebase(self) -> None:
        """Drop the consumed prefix (everything before pos == the start of
        the next raw token).  Keeps the window at O(current token)."""
        t = self._tok
        cut = t.pos
        if cut > 0:
            t.buf = t.buf[cut:]
            t.n = len(t.buf)
            t.pos = 0
            t.raw_start = 0
            t.data_start = max(0, t.data_start - cut)
            t.data_end = max(0, t.data_end - cut)

    # -- tokenizer surface --------------------------------------------------

    def next(self) -> int:
        t = self._tok
        self._rebase()
        snap = {k: getattr(t, k) for k in _SCAN_STATE}
        snap["attr"] = list(snap["attr"])
        while True:
            tt = t.next()
            if not t.eof or self._stream_done:
                return tt
            # The scan ran off the window end but the stream has more:
            # restore the pre-scan state, extend, re-scan this token.
            grew = self._fill()
            for k, v in snap.items():
                setattr(t, k, list(v) if k == "attr" else v)
            if not grew:
                # raced to stream end: the last scan result stands
                return t.next()

    def next_token(self, reuse: Token | None = None) -> Token:
        self.next()
        if reuse is None:
            return self._tok.token()
        return self._materialize(reuse)

    def _materialize(self, reuse: Token) -> Token:
        # mirror Tokenizer.next_token's reuse body without re-scanning
        t = self._tok
        tt = t.tt
        out = reuse
        out.type = tt
        from .tokenizer import (
            COMMENT,
            DOCTYPE,
            END_TAG,
            SELF_CLOSING_TAG,
            START_TAG,
            TEXT,
            b2s,
        )
        if tt in (TEXT, COMMENT, DOCTYPE):
            out.data_atom = ""
            out.data = b2s(t.text() or b"")
            out.attr = []
        elif tt in (START_TAG, SELF_CLOSING_TAG, END_TAG):
            t._fill_tag_token(out, tt)
        else:
            out.data_atom = ""
            out.data = ""
            out.attr = []
        return out

    # pass-throughs used by the parser / tests
    def token(self):
        return self._tok.token()

    def text(self):
        return self._tok.text()

    def tag_name(self):
        return self._tok.tag_name()

    def tag_attr(self):
        return self._tok.tag_attr()

    def raw(self) -> bytes:
        return self._tok.raw()

    @property
    def eof(self) -> bool:
        return self._tok.eof and self._stream_done

    @property
    def tt(self) -> int:
        return self._tok.tt

    @property
    def raw_tag(self) -> str:
        return self._tok.raw_tag

    @raw_tag.setter
    def raw_tag(self, v: str) -> None:
        self._tok.raw_tag = v

    @property
    def allow_cdata(self) -> bool:
        return self._tok.allow_cdata

    @allow_cdata.setter
    def allow_cdata(self, v: bool) -> None:
        self._tok.allow_cdata = v

    @property
    def max_window(self) -> int:
        return self._tok.n


def stream_tokens(reader, chunk_size: int = _DEFAULT_CHUNK,
                  max_buf: int = 0):
    """Yield materialized Tokens from a binary stream with bounded memory."""
    st = StreamTokenizer(reader, max_buf=max_buf, chunk_size=chunk_size)
    while True:
        tt = st.next()
        if tt == ERROR and st.eof:
            return
        yield st.token()


def parse_io(reader, chunk_size: int = _DEFAULT_CHUNK, max_buf: int = 0,
             scripting: bool = True):
    """Parse a document from a binary file-like object (the reference's
    ``HTML5.parse(io)`` surface) holding only O(largest token + chunk)
    of the input in memory at once."""
    from .parser import Parser

    p = Parser(b"", scripting=scripting, max_buf=max_buf)
    p.tokenizer = StreamTokenizer(reader, max_buf=max_buf,
                                  chunk_size=chunk_size)
    p.parse()
    return p.doc
