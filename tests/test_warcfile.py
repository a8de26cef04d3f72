"""WARC source: byte round-trips for both container conventions, the
payload-containing-magic-bytes trap, and multi-file ingest."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from pagerank_spark.sources.warcfile import parse_warc_bytes, read_warc, write_warc

T0 = datetime(2026, 1, 1, tzinfo=timezone.utc)

RECORDS = [
    ("https://a.example/1", T0, "response", "text/html", b"<html>hi</html>"),
    # payload containing the record magic — Content-Length delimiting must
    # not split here (a scan for b"WARC/1.0" would)
    (
        "https://a.example/2",
        datetime(2026, 1, 1, 0, 3, 20, tzinfo=timezone.utc),
        "response",
        "application/octet-stream",
        b"xxWARC/1.0\r\nWARC-Type: fake\r\n\r\nyy",
    ),
    ("https://a.example/3", T0, "metadata", "application/json", b""),
    ("https://a.example/4", T0, "response", "text/plain", "unicodé".encode()),
]


def _norm(rows):
    return sorted(
        (
            r["url"],
            r["warc_ts"].replace(tzinfo=timezone.utc).timestamp(),
            r["rec_type"],
            r["content_type"],
            bytes(r["payload"]),
        )
        for r in rows
    )


EXPECT = sorted(
    (u, ts.timestamp(), rt, ct, p) for u, ts, rt, ct, p in RECORDS
)


def test_parse_is_writer_inverse_local():
    import io

    buf = io.BytesIO()
    write_warc(RECORDS, "/tmp/_warc_local.warc")
    data = open("/tmp/_warc_local.warc", "rb").read()
    got = list(parse_warc_bytes(data))
    assert [(u, ts, rt, ct, p) for u, ts, rt, ct, p in got] == RECORDS
    assert buf is not None


@pytest.mark.parametrize("suffix", ["warc", "warc.gz"])
def test_read_warc_roundtrip_distributed(spark, tmp_path, suffix):
    path = str(tmp_path / f"f1.{suffix}")
    write_warc(RECORDS, path)
    got = read_warc(spark, path).collect()
    assert _norm(got) == EXPECT


def test_read_warc_glob_multiple_files(spark, tmp_path):
    write_warc(RECORDS[:2], str(tmp_path / "p1.warc.gz"))
    write_warc(RECORDS[2:], str(tmp_path / "p2.warc.gz"))
    got = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
    assert _norm(got) == EXPECT


def test_parse_http_response_columns(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.sources.warcfile import parse_http_response

    binary_body = bytes(range(256))  # every byte value must round-trip
    payloads = [
        (1, b"HTTP/1.1 200 OK\r\nServer: x\r\nContent-Type: text/html; charset=utf-8\r\n\r\n<html>ok</html>"),
        (2, b"HTTP/1.0 404 Not Found\r\ncontent-type: text/plain\r\n\r\n"),
        (3, b"HTTP/1.1 200 OK\r\nServer: y\r\n\r\n" + binary_body),
        (4, b"not an http payload at all"),
    ]
    df = spark.createDataFrame(payloads, "id long, payload binary")
    got = {
        r["id"]: (r["http_status"], r["http_content_type"], bytes(r["body"]))
        for r in parse_http_response(df).collect()
    }
    assert got[1] == (200, "text/html; charset=utf-8", b"<html>ok</html>")
    assert got[2] == (404, "text/plain", b"")
    assert got[3] == (200, None, binary_body)
    assert got[4] == (None, None, b"not an http payload at all")


def test_parse_http_response_stays_jvm_side(spark):
    from pagerank_spark.sources.warcfile import parse_http_response

    df = spark.createDataFrame([(1, b"x")], "id long, payload binary")
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        parse_http_response(df)._jdf.queryExecution(), "formatted"
    )
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan
    assert "Exchange" not in plan


def test_write_warc_converts_tz_and_truncates_subseconds(tmp_path):
    from datetime import timedelta

    ts = datetime(2026, 1, 1, 12, 0, 0, 250000, tzinfo=timezone(timedelta(hours=2)))
    p = str(tmp_path / "tz.warc")
    write_warc([("https://a/1", ts, "response", "text/plain", b"x")], p)
    (got,) = parse_warc_bytes(open(p, "rb").read())
    assert got[1] == datetime(2026, 1, 1, 10, 0, 0, tzinfo=timezone.utc)


def test_parse_warc_tolerates_truncated_tail_and_fractional_dates():
    good = (
        b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://a/1\r\n"
        b"WARC-Date: 2026-01-01T00:00:00.123456Z\r\nContent-Type: t\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    truncated = b"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-UR"
    got = list(parse_warc_bytes(good + truncated))
    assert len(got) == 1  # the good record survives, the cut tail is dropped
    assert got[0][1] == datetime(2026, 1, 1, tzinfo=timezone.utc)
    assert got[0][4] == b"hi"
    # missing Content-Length also ends the container without raising
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload"
    assert list(parse_warc_bytes(good + no_len)) == got


def test_parse_http_response_non_response_passes_whole_payload(spark):
    from pagerank_spark.sources.warcfile import parse_http_response

    req = b"GET / HTTP/1.1\r\nHost: x\r\n\r\nrest"
    df = spark.createDataFrame([(1, req)], "id long, payload binary")
    row = parse_http_response(df).first()
    assert row["http_status"] is None
    assert row["http_content_type"] is None
    assert bytes(row["body"]) == req  # NOT split at the blank line
