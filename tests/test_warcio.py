"""WARC (ISO 28500) reader/writer: round-trip, record skipping,
robustness, and the distributed file-based source."""

import datetime as dt
import random

import pytest

from crystal_html5_spark.sparkjob.session import get_spark
from crystal_html5_spark.sparkjob.warcio import (
    WarcError,
    parse_warc,
    read_warc_pages,
    write_warc,
)

@pytest.fixture(scope="module")
def spark():
    s = get_spark("warc-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


ROWS = [
    ("https://a.example/1", dt.datetime(2024, 1, 1, 0, 0, 0),
     b"<p>hello</p>"),
    ("https://b.example/2", dt.datetime(2024, 1, 1, 0, 0, 37),
     b"<html><body>bytes \xff\x00 ok</body></html>"),
    ("https://a.example/1", dt.datetime(2024, 1, 1, 1, 0, 0),
     b"<p>recrawl</p>"),
    ("https://c.example/empty", dt.datetime(2024, 2, 2, 3, 4, 5), b""),
]


def test_round_trip_exact():
    blob = write_warc(ROWS)
    assert blob.startswith(b"WARC/1.0\r\n")
    assert list(parse_warc(blob)) == ROWS


def test_non_response_records_skipped():
    blob = write_warc(ROWS)
    # warcinfo is already present and skipped; splice in a metadata
    # record between responses too.
    meta = (b"WARC/1.0\r\nWARC-Type: metadata\r\n"
            b"Content-Length: 5\r\n\r\nhello\r\n\r\n")
    first_resp = blob.index(b"WARC-Type: response") - len(b"WARC/1.0\r\n")
    spliced = blob[:first_resp] + meta + blob[first_resp:]
    assert list(parse_warc(spliced)) == ROWS


def test_http_body_split_preserves_crlf_in_html():
    html = b"line1\r\n\r\nline2"  # CRLFCRLF inside the BODY
    blob = write_warc([("u", dt.datetime(2024, 1, 1), html)])
    assert list(parse_warc(blob))[0][2] == html


def test_truncated_and_garbage_raise_typed():
    blob = write_warc(ROWS)
    for cut in (3, 20, len(blob) // 2, len(blob) - 2):
        try:
            list(parse_warc(blob[:cut]))
        except WarcError:
            pass  # typed rejection is the contract
    rng = random.Random(8)
    for _ in range(200):
        junk = b"WARC/1.0\r\n" + bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 120)))
        try:
            list(parse_warc(junk))
        except WarcError:
            pass


def test_bad_content_length_raises():
    blob = write_warc(ROWS[:1]).replace(b"Content-Length: 12",
                                        b"Content-Length: 9999999", 1)
    with pytest.raises(WarcError):
        list(parse_warc(blob))


def test_read_warc_pages_from_files(spark, tmp_path):
    (tmp_path / "seg1.warc").write_bytes(write_warc(ROWS[:2]))
    (tmp_path / "seg2.warc").write_bytes(write_warc(ROWS[2:]))
    (tmp_path / "ignored.txt").write_bytes(b"not a warc")
    got = read_warc_pages(spark, str(tmp_path)).collect()
    assert len(got) == len(ROWS)
    back = sorted((r["url"], r["warc_ts"], bytes(r["html"])) for r in got)
    assert back == sorted(ROWS)


def test_wet_round_trip():
    from crystal_html5_spark.sparkjob.warcio import parse_wet, write_wet

    rows = [(u, t, b"extracted text of " + h[:10]) for u, t, h in ROWS]
    blob = write_wet(rows)
    assert b"WARC-Type: conversion" in blob
    assert list(parse_wet(blob)) == rows
    # WET parser skips response records; WARC parser skips conversion.
    from crystal_html5_spark.sparkjob.warcio import parse_warc

    assert list(parse_warc(blob)) == []
    assert list(parse_wet(write_warc(ROWS))) == []


def test_wet_sink_distributed(spark, tmp_path):
    """foreachPartition WET sink: every (url, ts, text) row lands in
    exactly one .warc.wet segment, re-runs are idempotent (atomic
    overwrite), and the segments parse back to the full set."""
    import glob

    from crystal_html5_spark.sparkjob.extract_job import run_extract
    from crystal_html5_spark.sparkjob.pages import pages_df
    from crystal_html5_spark.sparkjob.warcio import (
        parse_wet,
        write_wet_sink,
    )

    out = run_extract(spark, pages_df(spark, 60), num_partitions=4)
    dest = str(tmp_path / "wet")
    write_wet_sink(out, dest)
    write_wet_sink(out, dest)  # idempotent re-run
    segs = sorted(glob.glob(dest + "/part-*.warc.wet"))
    assert 1 <= len(segs) <= 4 and not glob.glob(dest + "/*.tmp")
    back = []
    for seg in segs:
        back.extend(parse_wet(open(seg, "rb").read()))
    want = {(r["url"], r["warc_ts"]): bytes(r["text"])
            for r in out.collect()}
    assert {(u, t): x for u, t, x in back} == want
