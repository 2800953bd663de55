"""WARC source: Common-Crawl-style web-archive ingestion.

The north-star input is an Iceberg table of Common-Crawl-style pages,
and Common Crawl itself ships WARC files (ISO 28500 / WARC 1.0-1.1:
version line, named headers, blank line, Content-Length octets of
block, two CRLFs between records; Common Crawl stores one gzip MEMBER
per record, and RFC 1952 makes concatenated members one valid stream).
This module turns those bytes into the pages table every operator here
consumes: (url, warc_ts, record_type, content_type, http_status, html).

Scale shape: each WARC file is one ~1 GB self-contained unit, so the
natural 100 TB plan is ``spark.read.format("binaryFile")`` over the
file listing — one task per file, records parsed in-partition, only
the projected page rows ever shuffle. No record crosses a file
boundary (the WARC spec guarantees it), so there is no split/merge
coordination at all; parallelism = file count (Common Crawl publishes
~64k files per crawl, far above any executor count).

Parsing is plain-Python per record, not per byte: header blocks are
tiny (the per-record work is dict building over ~10 lines), and the
body is a zero-copy slice. The expensive part at scale is gunzip +
the downstream extraction kernel, both already measured paths.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("record_type", StringType()),
        StructField("content_type", StringType()),
        StructField("http_status", IntegerType()),
        StructField("html", BinaryType()),
    ]
)


def _gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream — the Common
    Crawl record-per-member layout — into one plain byte string."""
    out = []
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # 31 = gzip wrapper
        out.append(d.decompress(data[pos:]))
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:  # trailing garbage that is not gzip — stop
            break
        pos += consumed
    return b"".join(out)


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, block) per WARC record from raw or gzip bytes.

    Header names are lower-cased; the version line is kept under the
    ``"__version__"`` key. Malformed trailing bytes end the iteration
    instead of raising — a truncated tail file loses its last record,
    not the whole task.
    """
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        lines = data[pos:head_end].split(b"\r\n")
        if not lines or not lines[0].startswith(b"WARC/"):
            break
        headers = {"__version__": lines[0].decode("ascii", "replace")}
        for line in lines[1:]:
            k, sep, v = line.partition(b":")
            if sep:
                headers[k.strip().decode("ascii", "replace").lower()] = (
                    v.strip().decode("ascii", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated record
        yield headers, data[body_start : body_start + length]
        pos = body_start + length


def _split_http(block: bytes) -> tuple[int | None, str | None, bytes]:
    """(status, content_type, payload) from an HTTP response block."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head = block[:sep].split(b"\r\n")
    status = None
    parts = head[0].split(b" ")
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for line in head[1:]:
        k, s, v = line.partition(b":")
        if s and k.strip().lower() == b"content-type":
            ctype = v.strip().decode("ascii", "replace")
            break
    return status, ctype, block[sep + 4 :]


def _records_to_rows(data: bytes) -> list[tuple]:
    rows = []
    for headers, block in iter_warc_records(data):
        rtype = headers.get("warc-type")
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        when = None
        if ts:
            when = pd.to_datetime(ts, utc=True, errors="coerce")
            when = None if when is pd.NaT else when.tz_localize(None)
        if rtype == "response":
            status, ctype, payload = _split_http(block)
        else:
            status, ctype, payload = None, headers.get("content-type"), block
        rows.append((url, when, rtype, ctype, status, bytearray(payload)))
    return rows


def parse_warc_records(
    df: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """One page row per WARC record from a binary column of WARC (or
    .warc.gz) bytes — the distributed parse step shared by
    :func:`read_warc`. Non-response records (warcinfo, request,
    metadata) come through with their record_type and a NULL
    http_status so callers can filter; response records carry the HTTP
    payload (the html) with status and Content-Type split out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                if payload is None:
                    continue
                out.extend(_records_to_rows(bytes(payload)))
            yield pd.DataFrame(
                out,
                columns=[
                    "url",
                    "warc_ts",
                    "record_type",
                    "content_type",
                    "http_status",
                    "html",
                ],
            )

    return df.select(payload_col).mapInPandas(run, WARC_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Load WARC/.warc.gz files as the pages frame: one task per file
    via the binaryFile source (a WARC record never crosses a file
    boundary, so files are the natural split unit), records parsed
    in-partition."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_records(files.select(F.col("content").alias("payload")))


def encode_warc(records: list[dict], gzip_members: bool = False) -> bytes:
    """Build WARC bytes from record dicts — the fixture/test writer
    (and the inverse contract iter_warc_records is tested against).

    Each dict: ``type``, optional ``url``, ``date`` (ISO8601 string),
    ``http_status`` + ``content_type`` + ``body`` (bytes) for response
    records, plain ``body`` otherwise. ``gzip_members=True`` emits the
    Common Crawl layout (one gzip member per record).
    """
    chunks = []
    for r in records:
        if r.get("http_status") is not None:
            http = (
                f"HTTP/1.1 {r['http_status']} OK\r\n"
                f"Content-Type: {r.get('content_type', 'text/html')}\r\n"
                "\r\n"
            ).encode() + bytes(r.get("body", b""))
            block = http
            block_type = "application/http; msgtype=response"
        else:
            block = bytes(r.get("body", b""))
            block_type = r.get("content_type", "application/octet-stream")
        head = [f"WARC/1.0", f"WARC-Type: {r['type']}"]
        if r.get("url"):
            head.append(f"WARC-Target-URI: {r['url']}")
        if r.get("date"):
            head.append(f"WARC-Date: {r['date']}")
        head.append(f"Content-Type: {block_type}")
        head.append(f"Content-Length: {len(block)}")
        rec = ("\r\n".join(head) + "\r\n\r\n").encode() + block + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            import gzip as _gzip

            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gf:
                gf.write(rec)
            rec = buf.getvalue()
        chunks.append(rec)
    return b"".join(chunks)
