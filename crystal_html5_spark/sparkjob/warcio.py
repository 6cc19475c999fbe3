"""WARC (ISO 28500) reader/writer — the format 100 TB web corpora ship
in (Common Crawl WARC/WET files).

Writer and parser implement the public WARC/1.0 record grammar: a
version line, CRLF-terminated named headers (WARC-Type, WARC-Target-URI,
WARC-Date, Content-Length, ...), a CRLF CRLF separator, ``Content-Length``
bytes of block, and a CRLF CRLF record terminator.  ``response`` records
carry an HTTP/1.1 response block whose body is the page HTML; other
record types (warcinfo, request, metadata) are walked over and skipped,
as a real crawl file requires.

Spark integration mirrors the scale pattern for raw-byte corpora: one
WARC file per input split read as ``binaryFile`` (a real deployment
points the same reader at thousands of .warc segments), parsed inside
``mapInArrow`` so record parsing is distributed and the driver never
sees a page byte.
"""

from __future__ import annotations

import datetime as dt

_CRLF = b"\r\n"


class WarcError(ValueError):
    """Malformed WARC input."""


def _http_response_block(html: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF + html
    )


def write_warc(rows, warcinfo: bytes = b"software: spark-graft\r\n") \
        -> bytes:
    """Serialize (url, warc_ts datetime, html bytes) rows as WARC/1.0.

    Emits a leading ``warcinfo`` record like real crawler output, then
    one ``response`` record per row."""
    out = bytearray()

    def record(headers: list[tuple[bytes, bytes]], block: bytes) -> None:
        out.extend(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            out.extend(k + b": " + v + _CRLF)
        out.extend(b"Content-Length: " + str(len(block)).encode() + _CRLF)
        out.extend(_CRLF)
        out.extend(block)
        out.extend(_CRLF + _CRLF)

    record([(b"WARC-Type", b"warcinfo"),
            (b"Content-Type", b"application/warc-fields")], warcinfo)
    for url, ts, html in rows:
        iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
        block = _http_response_block(html)
        record([
            (b"WARC-Type", b"response"),
            (b"WARC-Target-URI", url.encode()),
            (b"WARC-Date", iso),
            (b"Content-Type", b"application/http; msgtype=response"),
        ], block)
    return bytes(out)


def parse_warc(data: bytes):
    """Yield (url, warc_ts datetime, html bytes) from WARC/1.0 bytes.

    Skips non-response records; raises WarcError on structural damage
    (bad version line, missing Content-Length, truncated block)."""
    pos = 0
    n = len(data)
    while pos < n:
        # Tolerate extra record separators (some writers pad).
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol == -1 or not data[pos:eol].startswith(b"WARC/"):
            raise WarcError("bad WARC version line")
        pos = eol + 2
        headers: dict[bytes, bytes] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol == -1:
                raise WarcError("truncated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            sep = line.find(b":")
            if sep == -1:
                raise WarcError("malformed header line")
            headers[line[:sep].strip().lower()] = line[sep + 1:].strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError("missing/invalid Content-Length") from exc
        if length < 0 or pos + length > n:
            raise WarcError("truncated record block")
        block = data[pos:pos + length]
        pos += length
        if data[pos:pos + 4] != _CRLF + _CRLF:
            raise WarcError("missing record terminator")
        pos += 4
        if headers.get(b"warc-type") != b"response":
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace")
        date = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = dt.datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError as exc:
            raise WarcError("bad WARC-Date") from exc
        # Split the HTTP response block: body follows the first CRLFCRLF.
        hdr_end = block.find(_CRLF + _CRLF)
        if hdr_end == -1:
            raise WarcError("response block lacks HTTP header terminator")
        yield url, ts, block[hdr_end + 4:]


def read_warc_pages(spark, warc_dir: str):
    """WARC directory -> pages DataFrame (url, warc_ts, html).

    ``binaryFile`` gives one row per .warc file; record parsing runs
    distributed in mapInArrow.  At 100 TB the same plan fans one task
    per WARC segment (the format is designed for per-file splits)."""
    files = spark.read.format("binaryFile") \
        .option("pathGlobFilter", "*.warc") \
        .load(warc_dir).select("content")

    def records(iterator):
        import pyarrow as pa

        for batch in iterator:
            urls, tss, htmls = [], [], []
            for blob in batch.column("content"):
                for url, ts, html in parse_warc(blob.as_py()):
                    urls.append(url)
                    tss.append(ts)
                    htmls.append(html)
            yield pa.RecordBatch.from_arrays(
                [pa.array(urls, pa.string()),
                 pa.array(tss, pa.timestamp("us")),
                 pa.array(htmls, pa.binary())],
                names=["url", "warc_ts", "html"],
            )

    return files.mapInArrow(
        records, "url string, warc_ts timestamp, html binary")


def write_wet(rows, warcinfo: bytes = b"format: WET\r\n") -> bytes:
    """Serialize (url, warc_ts, text bytes) rows as WET — the WARC
    variant real pipelines emit for extracted text: ``conversion``
    records whose block is the raw text (no HTTP envelope), preceded by
    a ``warcinfo`` record, per the Common-Crawl-published WET layout."""
    out = bytearray()

    def record(headers, block: bytes) -> None:
        out.extend(b"WARC/1.0" + _CRLF)
        for k, v in headers:
            out.extend(k + b": " + v + _CRLF)
        out.extend(b"Content-Length: " + str(len(block)).encode() + _CRLF)
        out.extend(_CRLF)
        out.extend(block)
        out.extend(_CRLF + _CRLF)

    record([(b"WARC-Type", b"warcinfo"),
            (b"Content-Type", b"application/warc-fields")], warcinfo)
    for url, ts, text in rows:
        iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ").encode()
        record([
            (b"WARC-Type", b"conversion"),
            (b"WARC-Target-URI", url.encode()),
            (b"WARC-Date", iso),
            (b"Content-Type", b"text/plain"),
        ], text)
    return bytes(out)


def parse_wet(data: bytes):
    """Yield (url, warc_ts, text bytes) from WET conversion records
    (same record grammar as parse_warc; the block IS the text)."""
    pos = 0
    n = len(data)
    while pos < n:
        while data[pos:pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol == -1 or not data[pos:eol].startswith(b"WARC/"):
            raise WarcError("bad WARC version line")
        pos = eol + 2
        headers: dict[bytes, bytes] = {}
        while True:
            eol = data.find(_CRLF, pos)
            if eol == -1:
                raise WarcError("truncated header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            sep = line.find(b":")
            if sep == -1:
                raise WarcError("malformed header line")
            headers[line[:sep].strip().lower()] = line[sep + 1:].strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError) as exc:
            raise WarcError("missing/invalid Content-Length") from exc
        if length < 0 or pos + length > n:
            raise WarcError("truncated record block")
        block = data[pos:pos + length]
        pos += length
        if data[pos:pos + 4] != _CRLF + _CRLF:
            raise WarcError("missing record terminator")
        pos += 4
        if headers.get(b"warc-type") != b"conversion":
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace")
        date = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = dt.datetime.strptime(date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError as exc:
            raise WarcError("bad WARC-Date") from exc
        yield url, ts, block


def write_wet_sink(extracted, out_dir: str) -> None:
    """Distributed WET sink: each partition of the extracted frame
    becomes one .warc.wet segment file (the corpus-native layout —
    thousands of independently readable segments at 100 TB).  Pure
    foreachPartition file emit; idempotent per task via deterministic
    segment names + atomic rename."""
    import os

    os.makedirs(out_dir, exist_ok=True)

    def emit(it) -> None:
        import os as _os

        rows = [(r["url"], r["warc_ts"], bytes(r["text"])) for r in it]
        if not rows:
            return
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        final = _os.path.join(out_dir, f"part-{pid:05d}.warc.wet")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(write_wet(rows))
        _os.replace(tmp, final)  # atomic: re-run overwrites, no torn file

    extracted.select("url", "warc_ts", "text").foreachPartition(emit)
