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
    # non-response records (WET conversion, WAT metadata, …) carry their
    # payload type in the WARC header itself
    ctype = headers.get("content-type") if wtype != "response" else None
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


def _wrap_record(wtype: str, url: str, date: str, content_type: str,
                 payload: bytes, gzip_members: bool) -> bytes:
    """One non-response WARC record (WET ``conversion`` / WAT
    ``metadata``) in the CC per-record-gzip-member convention."""
    head = (f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    rec = head + payload + b"\r\n\r\n"
    return gzip.compress(rec, compresslevel=6, mtime=0) if gzip_members \
        else rec


def write_wet(records: list[dict], gzip_members: bool = True) -> bytes:
    """Common-Crawl WET (extracted-text) encode: records
    [{url, date, text}] -> ``WARC-Type: conversion`` +
    ``Content-Type: text/plain`` members. Deterministic."""
    out = bytearray()
    for r in records:
        out += _wrap_record("conversion", r["url"], r["date"],
                            "text/plain", r["text"].encode("utf-8"),
                            gzip_members)
    return bytes(out)


def write_wat(records: list[dict], gzip_members: bool = True) -> bytes:
    """Common-Crawl WAT (metadata) encode: records
    [{url, date, title, links: [str]}] -> ``WARC-Type: metadata`` +
    ``Content-Type: application/json`` members carrying the CC WAT
    envelope shape (Envelope -> Payload-Metadata ->
    HTTP-Response-Metadata -> HTML-Metadata -> Head/Links)."""
    import json

    out = bytearray()
    for r in records:
        doc = {"Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": r["url"], "WARC-Date": r["date"]},
            "Payload-Metadata": {"HTTP-Response-Metadata": {
                "HTML-Metadata": {
                    "Head": {"Title": r.get("title", "")},
                    "Links": [{"path": "A@/href", "url": u}
                              for u in r.get("links", [])]}}}}}
        payload = json.dumps(doc, sort_keys=True,
                             separators=(",", ":")).encode("utf-8")
        out += _wrap_record("metadata", r["url"], r["date"],
                            "application/json", payload, gzip_members)
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


def wet_text_records(records: DataFrame) -> DataFrame:
    """WET record table -> (url, warc_ts, text): the extracted-text view
    Common Crawl publishes beside each .warc.gz. Pure JVM projection
    (decode + filter); this is the natural ingest head when the pipeline
    wants text without the HTML parse."""
    return records.where(F.col("warc_type") == "conversion").select(
        "url",
        F.to_timestamp("warc_date",
                       "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        F.decode(F.col("body"), "UTF-8").alias("text"),
    )


#: CC WAT envelope subset (Head.Title + Links) — hyphenated JSON keys
#: are fine as StructType field names, keeping the parse in the JVM.
_WAT_SCHEMA = (
    "struct<Envelope: struct<"
    "`Payload-Metadata`: struct<"
    "`HTTP-Response-Metadata`: struct<"
    "`HTML-Metadata`: struct<"
    "Head: struct<Title: string>, "
    "Links: array<struct<path: string, url: string>>>>>>>"
)


def wat_metadata_records(records: DataFrame) -> DataFrame:
    """WAT record table -> (url, warc_ts, title, links array<string>):
    the CC metadata sidecar, parsed with ``from_json`` so the whole JSON
    walk stays JVM-side (no Python in the record path)."""
    meta = F.from_json(F.decode(F.col("body"), "UTF-8"), _WAT_SCHEMA)
    html_md = (meta["Envelope"]["Payload-Metadata"]
               ["HTTP-Response-Metadata"]["HTML-Metadata"])
    return records.where(
        (F.col("warc_type") == "metadata")
        & (F.col("content_type") == "application/json")
    ).select(
        "url",
        F.to_timestamp("warc_date",
                       "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("warc_ts"),
        html_md["Head"]["Title"].alias("title"),
        F.coalesce(
            F.transform(html_md["Links"], lambda l: l["url"]),
            F.array().cast("array<string>"),
        ).alias("links"),
    )


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
