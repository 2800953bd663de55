"""WARC source: record framing round-trips (plain + Common-Crawl gzip
members), resilience to truncation/garbage, the binaryFile read path,
and composition into the extraction kernel."""

import gzip

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hll_spark.sources.warc import (
    encode_warc,
    iter_warc_records,
    parse_warc_records,
    read_warc,
)


def _recs(n=5, start=0):
    out = [
        {
            "type": "warcinfo",
            "date": "2024-01-01T00:00:00Z",
            "body": b"software: fixture",
        }
    ]
    for i in range(start, start + n):
        out.append(
            {
                "type": "response",
                "url": f"https://h{i % 3}.example.com/p/{i}",
                "date": f"2024-01-01T00:00:{i % 60:02d}Z",
                "http_status": 200,
                "content_type": "text/html",
                "body": f"<html><body>doc-{i}</body></html>".encode(),
            }
        )
    return out


@pytest.mark.parametrize("gz", [False, True])
def test_roundtrip(gz):
    data = encode_warc(_recs(7), gzip_members=gz)
    rows = list(iter_warc_records(data))
    assert len(rows) == 8
    assert rows[0][0]["warc-type"] == "warcinfo"
    assert rows[3][0]["warc-target-uri"] == "https://h2.example.com/p/2"
    assert rows[1][1].startswith(b"HTTP/1.1 200")


def test_truncated_tail_loses_only_last_record():
    data = encode_warc(_recs(5))
    rows_full = list(iter_warc_records(data))
    cut = list(iter_warc_records(data[:-30]))  # clip into the last body
    assert len(cut) == len(rows_full) - 1
    assert cut == rows_full[:-1]


def test_garbage_and_bad_length_stop_cleanly():
    assert list(iter_warc_records(b"not a warc at all")) == []
    bad = b"WARC/1.0\r\nWARC-Type: response\r\nContent-Length: zap\r\n\r\nxx"
    assert list(iter_warc_records(bad)) == []
    # valid record, then garbage: the valid one still parses
    data = encode_warc(_recs(2)) + b"garbage tail without framing"
    assert len(list(iter_warc_records(data))) == 3


def test_multi_member_gzip_matches_plain():
    plain = encode_warc(_recs(4), gzip_members=False)
    members = encode_warc(_recs(4), gzip_members=True)
    assert list(iter_warc_records(plain)) == list(iter_warc_records(members))
    # whole-file single-member gzip also works (RFC 1952 stream)
    whole = gzip.compress(plain, mtime=0)
    assert list(iter_warc_records(whole)) == list(iter_warc_records(plain))


def test_parse_warc_records_dataframe(spark):
    blobs = [
        (0, bytearray(encode_warc(_recs(4, start=0)))),
        (1, bytearray(encode_warc(_recs(4, start=4), gzip_members=True))),
        (2, None),
    ]
    df = spark.createDataFrame(blobs, "file_id bigint, payload binary")
    out = parse_warc_records(df).toPandas()
    assert len(out) == 10  # 2 warcinfo + 8 responses
    resp = out[out.record_type == "response"]
    assert len(resp) == 8
    assert set(resp.http_status) == {200}
    assert resp.url.notna().all()
    info = out[out.record_type == "warcinfo"]
    assert info.http_status.isna().all() and info.url.isna().all()


def test_read_warc_binary_file_source(spark, tmp_path):
    p1 = tmp_path / "a.warc"
    p2 = tmp_path / "b.warc.gz"
    p1.write_bytes(encode_warc(_recs(3, start=0)))
    p2.write_bytes(encode_warc(_recs(3, start=3), gzip_members=True))
    pages = read_warc(spark, str(tmp_path / "*.warc*"))
    got = pages.where(F.col("record_type") == "response").toPandas()
    assert sorted(got.url) == sorted(
        f"https://h{i % 3}.example.com/p/{i}" for i in range(6)
    )
    ts = pd.to_datetime(got.warc_ts)
    assert (ts.dt.year == 2024).all()


def test_warc_feeds_the_extraction_kernel(spark, tmp_path):
    # the ingestion contract: WARC -> pages frame -> extract_text
    # recovers the fixture text byte-for-byte
    from hll_spark.operators.extract import extract_text
    from hll_spark.operators.extract import wrap_html_py

    texts = ["hello web  world", "second doc text", "third & escaped"]
    recs = [
        {
            "type": "response",
            "url": f"https://x.example.com/{i}",
            "date": "2024-01-01T00:00:00Z",
            "http_status": 200,
            "content_type": "text/html",
            "body": wrap_html_py(t).encode(),
        }
        for i, t in enumerate(texts)
    ]
    (tmp_path / "c.warc").write_bytes(encode_warc(recs))
    pages = read_warc(spark, str(tmp_path / "c.warc"))
    got = (
        pages.where(F.col("record_type") == "response")
        .withColumn("text", extract_text(F.col("html").cast("string")))
        .select("url", "text")
        .toPandas()
        .sort_values("url")
    )
    import re

    want = [re.sub(r"\s+", " ", t).strip() for t in texts]
    assert list(got.text) == want
