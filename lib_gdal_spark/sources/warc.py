"""WARC source — the container format Common-Crawl pages actually
arrive in (ISO 28500 / WARC 1.0; the reference consumes the *extracted*
tables, but the north-rule input is "Common-Crawl-style web pages", and
at 10^12 documents the ingest step IS a WARC scan).

Reader: plain ``.warc`` and the Common-Crawl ``.warc.gz`` convention
(one gzip MEMBER per record, so members can be sliced independently —
decoded here by walking ``zlib.decompressobj().unused_data`` across
member boundaries). Records parse to (warc_type, url, date, status,
content_type, body); ``warc_response_pages`` shapes HTTP responses into
the repo's pages schema (url, warc_ts, html binary) feeding the
extraction pipeline (functions/extract.py).

Writer: deterministic WARC/1.0 encode (plain or per-record-gzip) for
round-trip tests and synthetic corpora.

Distributed shape: one WARC file per task via ``binaryFile`` (the CC
corpus is ~90k files/crawl × ~1 GB — natural task granularity); record
splitting and HTTP parsing run inside Arrow batches, zero shuffle.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RECORD_SCHEMA = ("src string, rec_no int, warc_type string, url string, "
                 "warc_date string, http_status int, content_type string, "
                 "body binary")


# -------------------------------------------------------------- codec
def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Multi-member gzip -> decompressed member payloads (the CC
    one-record-per-member layout)."""
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(rest)
        yield out
        if not d.eof:  # truncated trailing member
            return
        rest = d.unused_data


def _parse_record(raw: bytes) -> tuple | None:
    """One WARC record (headers + payload) -> field tuple."""
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0 or not raw.startswith(b"WARC/"):
        return None
    headers: dict[str, str] = {}
    for line in raw[:head_end].split(b"\r\n")[1:]:
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode()] = v.strip().decode(
            "utf-8", "replace")
    try:
        clen = int(headers.get("content-length", "0"))
    except ValueError:
        clen = 0
    payload = raw[head_end + 4:head_end + 4 + clen]
    wtype = headers.get("warc-type", "")
    url = headers.get("warc-target-uri")
    date = headers.get("warc-date")
    status = None
    ctype = None
    body = payload
    if wtype == "response" and payload.startswith(b"HTTP/"):
        he = payload.find(b"\r\n\r\n")
        if he >= 0:
            lines = payload[:he].split(b"\r\n")
            parts = lines[0].split()
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            for line in lines[1:]:
                k, _, v = line.partition(b":")
                if k.strip().lower() == b"content-type":
                    ctype = v.strip().decode("ascii", "replace")
            body = payload[he + 4:]
    return (wtype, url, date, status, ctype, body)


def parse_warc(data: bytes) -> list[tuple]:
    """.warc or .warc.gz bytes -> [(rec_no, type, url, date, status,
    content_type, body)]."""
    if data[:2] == b"\x1f\x8b":
        chunks: Iterator[bytes] = _split_gzip_members(data)
    else:
        # plain WARC: records separated by \r\n\r\n after each payload;
        # split on the record marker (payloads are length-delimited, so
        # re-scan record by record)
        chunks = _split_plain(data)
    out = []
    n = 0
    for raw in chunks:
        rec = _parse_record(raw)
        if rec is not None:
            out.append((n, *rec))
            n += 1
    return out


def _split_plain(data: bytes) -> Iterator[bytes]:
    off = 0
    while off < len(data):
        if not data[off:].startswith(b"WARC/"):
            nxt = data.find(b"WARC/", off)
            if nxt < 0:
                return
            off = nxt
        head_end = data.find(b"\r\n\r\n", off)
        if head_end < 0:
            return
        clen = 0
        for line in data[off:head_end].split(b"\r\n"):
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"content-length":
                try:
                    clen = int(v.strip())
                except ValueError:
                    clen = 0
        end = head_end + 4 + clen
        yield data[off:end]
        off = end + 4  # trailing \r\n\r\n


def write_warc(records: list[dict], gzip_members: bool = True) -> bytes:
    """records: [{url, date, body(bytes), status?, content_type?,
    warc_type?}] -> WARC/1.0 bytes (CC-style per-record gzip members
    when ``gzip_members``). Deterministic (no clocks, mtime=0)."""
    out = bytearray()
    for r in records:
        body = r["body"]
        status = r.get("status", 200)
        ctype = r.get("content_type", "text/html")
        payload = (f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
                   f"Content-Length: {len(body)}\r\n\r\n"
                   ).encode() + body
        head = (f"WARC/1.0\r\n"
                f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
                f"WARC-Target-URI: {r['url']}\r\n"
                f"WARC-Date: {r['date']}\r\n"
                f"Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n").encode()
        rec = head + payload + b"\r\n\r\n"
        if gzip_members:
            out += gzip.compress(rec, compresslevel=6, mtime=0)
        else:
            out += rec
    return bytes(out)


# ---------------------------------------------------- Spark integration
def parse_warc_documents(files: DataFrame, content_col: str = "content",
                         id_col: str = "path") -> DataFrame:
    """(id, warc_bytes) rows -> distributed record table."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["src", "rec_no", "warc_type", "url", "warc_date",
                "http_status", "content_type", "body"]
        for b in batches:
            rows = []
            for src, blob in zip(b[id_col], b[content_col]):
                for rec in parse_warc(bytes(blob)):
                    rows.append((str(src), *rec))
            yield pd.DataFrame(rows, columns=cols)

    return files.select(id_col, content_col).mapInPandas(
        work, schema=RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC file(s) at ``path`` (glob ok) -> distributed record table."""
    files = spark.read.format("binaryFile").load(path)
    return parse_warc_documents(files)


def warc_response_pages(records: DataFrame) -> DataFrame:
    """Record table -> the repo's pages shape (url, warc_ts, html) —
    the ingest head of the north-star pipeline. Pure JVM projection."""
    return records.where(
        (F.col("warc_type") == "response")
        & F.col("http_status").isNotNull()
    ).select(
        "url",
        F.to_timestamp("warc_date",
                       "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        F.col("body").alias("html"),
    )
