"""WARC (ISO 28500) source — the Common Crawl container format.

A web-scale link-graph engine ingests crawls as WARC: ~1 GB container
files, each a sequence of records (request/response/metadata), each record
a small header block + Content-Length-delimited payload. Common Crawl
ships them with every record an independent gzip MEMBER concatenated into
one ``.warc.gz`` (so readers can seek to a record without decompressing
the file); plain ``.warc`` is the uncompressed form. Both are supported.

Execution model (the real-world CC layout IS the partitioning):

- ``spark.read.format("binaryFile")`` yields one row per container file —
  WARC is not block-splittable (records are variable-length and gzip
  members aren't indexed), so FILE-granularity parallelism is the correct
  and standard unit: a 100 TB crawl is ~100k files fanning out across
  executors, each task holding ONE container in memory (bounded by the
  ~1 GB container convention, same bound every production CC job accepts).
- Parsing runs inside ``mapInPandas`` (Arrow-batched); records are
  delimited by the declared ``Content-Length`` — never by scanning for
  the magic bytes, which can legally appear INSIDE a payload.

The writer is a driver-side fixture/export helper (tests, round-trips,
small exports) — generation at scale belongs to the crawler, not this
engine.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = (
    "url string, warc_ts timestamp, rec_type string, "
    "content_type string, payload binary"
)

_CRLF = b"\r\n"


def write_warc(
    records: list[tuple[str, datetime, str, str, bytes]],
    path: str,
    per_record_gzip: bool | None = None,
) -> None:
    """Write (url, ts, rec_type, content_type, payload) records as WARC/1.0.

    ``per_record_gzip=None`` infers from the path suffix (``.gz`` → the
    Common Crawl member-per-record convention; mtime zeroed so output is
    byte-deterministic). Timestamps are converted to UTC (naive values
    are taken AS UTC) and truncated to whole seconds — the WARC/1.0
    ``WARC-Date`` granularity."""
    if per_record_gzip is None:
        per_record_gzip = path.endswith(".gz")
    out = io.BytesIO()
    for url, ts, rec_type, content_type, payload in records:
        if ts.tzinfo is not None:
            ts = ts.astimezone(timezone.utc)
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {rec_type}\r\n".encode()
            + f"WARC-Target-URI: {url}\r\n".encode()
            + f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n".encode()
            + f"Content-Type: {content_type}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + _CRLF
        )
        rec = head + payload + _CRLF + _CRLF
        if per_record_gzip:
            gz = io.BytesIO()
            with gzip.GzipFile(fileobj=gz, mode="wb", mtime=0) as f:
                f.write(rec)
            out.write(gz.getvalue())
        else:
            out.write(rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members (the CC convention)."""
    out = io.BytesIO()
    while data:
        d = zlib.decompressobj(wbits=31)
        out.write(d.decompress(data))
        out.write(d.flush())
        data = d.unused_data
    return out.getvalue()


def parse_warc_bytes(
    data: bytes,
) -> Iterator[tuple[str, datetime, str, str, bytes]]:
    """Yield (url, ts, rec_type, content_type, payload) from raw WARC bytes.

    Records are delimited by the declared Content-Length — a payload that
    happens to contain the literal bytes ``WARC/1.0`` parses correctly.
    Fault tolerance matches what a production CC reader does: a truncated
    or malformed record TAIL (header block cut off, Content-Length
    missing/garbled) ends parsing of that container — the records before
    it are kept, the job does not fail. Fractional-second WARC-Dates
    (WARC/1.1) parse with the fraction dropped."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end == -1:  # truncated header block: keep what we have
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:  # [0] is WARC/1.0
            k, _, v = line.decode("utf-8", "replace").partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):  # undelimitable: stop this container
            break
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        raw_ts = headers.get("warc-date", "1970-01-01T00:00:00Z")
        try:
            ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = datetime.strptime(raw_ts, "%Y-%m-%dT%H:%M:%S.%fZ").replace(
                microsecond=0
            )
        ts = ts.replace(tzinfo=timezone.utc)
        yield (
            headers.get("warc-target-uri", ""),
            ts,
            headers.get("warc-type", ""),
            headers.get("content-type", ""),
            payload,
        )
        pos = body_start + length


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.warc`` / ``.warc.gz`` container files (glob ok) into
    (url, warc_ts, rec_type, content_type, payload) — one task per
    container file, memory bounded by the container size (the CC ~1 GB
    convention). Pipe ``rec_type == 'response'`` rows into the extraction
    UDFs / ``build_link_graph`` exactly like the parquet pages table."""
    files = spark.read.format("binaryFile").load(path)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path_, content in zip(b["path"], b["content"]):
                raw = bytes(content)
                if path_.endswith(".gz"):
                    raw = _gunzip_members(raw)
                rows = list(parse_warc_bytes(raw))
                yield pd.DataFrame(
                    {
                        "url": [r[0] for r in rows],
                        "warc_ts": [r[1] for r in rows],
                        "rec_type": [r[2] for r in rows],
                        "content_type": [r[3] for r in rows],
                        "payload": [r[4] for r in rows],
                    }
                )

    return files.select("path", "content").mapInPandas(gen, WARC_SCHEMA)


def parse_http_response(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Split ``application/http; msgtype=response`` payloads (what Common
    Crawl response records actually carry) into typed columns::

        http_status       int     from the status line
        http_content_type string  Content-Type header (case-insensitive)
        body              binary  everything after the header block

    Pure Column expressions — the payload is decoded ISO-8859-1 (a
    lossless byte<->char bijection, unlike UTF-8 which would mangle
    binary bodies), parsed with regex/locate, and the body re-encoded to
    the original bytes. Map-only, whole-stage codegen, no UDF; rows whose
    payload is not an HTTP response get NULL status/content-type and the
    whole payload as body.
    """
    from pyspark.sql import functions as F

    s = F.decode(F.col(payload_col), "ISO-8859-1")
    sep = F.locate("\r\n\r\n", s)
    status = F.regexp_extract(s, r"^HTTP/1\.[01] ([0-9]{3})", 1)
    is_http = status != ""
    head = F.when(sep > 0, F.substring(s, F.lit(1), sep - 1)).otherwise(s)
    ctype = F.regexp_extract(head, r"(?i)\r\ncontent-type: *([^\r\n]*)", 1)
    # the header/body split only applies to actual responses — anything
    # else (request records, raw binary that happens to contain a blank
    # line) passes through whole; a response with no blank line is a
    # headers-only malformation and gets an empty body
    body = (
        F.when(~is_http, s)
        .when(sep > 0, F.substring(s, sep + 4, F.length(s)))
        .otherwise(F.lit(""))
    )
    return (
        df.withColumn("http_status", F.when(is_http, status.cast("int")))
        .withColumn("http_content_type", F.when(is_http & (ctype != ""), ctype))
        .withColumn("body", F.encode(body, "ISO-8859-1"))
    )
