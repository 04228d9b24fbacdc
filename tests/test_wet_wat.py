"""WET/WAT Common-Crawl sidecar formats (sources/warc.py)."""

import pandas as pd

from lib_gdal_spark.sources.warc import (
    parse_warc, parse_warc_documents, wat_metadata_records,
    wet_text_records, write_wat, write_wet,
)

WET = [
    {"url": "https://a.example/p1", "date": "2024-01-02T03:04:05Z",
     "text": "hello one two"},
    {"url": "https://b.example/p2", "date": "2024-01-02T03:04:06Z",
     "text": "solo"},
]
WAT = [
    {"url": "https://a.example/p1", "date": "2024-01-02T03:04:05Z",
     "title": "Page One", "links": ["https://b.example/p2",
                                    "https://c.example/p3"]},
    {"url": "https://b.example/p2", "date": "2024-01-02T03:04:06Z",
     "title": "Page Two", "links": []},
]


def test_wet_roundtrip_plain_and_gzip():
    for gz in (True, False):
        rows = parse_warc(write_wet(WET, gzip_members=gz))
        assert [r[1] for r in rows] == ["conversion"] * 2
        assert rows[0][5] == "text/plain"
        assert rows[0][6] == b"hello one two"
        assert rows[1][2] == "https://b.example/p2"


def test_wat_roundtrip():
    rows = parse_warc(write_wat(WAT))
    assert [r[1] for r in rows] == ["metadata"] * 2
    assert rows[0][5] == "application/json"
    assert b'"Title":"Page One"' in rows[0][6]
    assert b"https://c.example/p3" in rows[0][6]


def test_spark_wet_wat_join(spark):
    files = spark.createDataFrame(
        pd.DataFrame({"path": ["x.wet.gz", "x.wat.gz"],
                      "content": [write_wet(WET), write_wat(WAT)]}))
    recs = parse_warc_documents(files)
    wet = {r["url"]: r for r in wet_text_records(recs).collect()}
    assert wet["https://a.example/p1"]["text"] == "hello one two"
    assert str(wet["https://b.example/p2"]["warc_ts"]).startswith(
        "2024-01-02 03:04:06")
    wat = {r["url"]: r for r in wat_metadata_records(recs).collect()}
    assert wat["https://a.example/p1"]["title"] == "Page One"
    assert list(wat["https://a.example/p1"]["links"]) == WAT[0]["links"]
    assert list(wat["https://b.example/p2"]["links"]) == []
    # WET records must not leak into the WAT view and vice versa
    assert wet_text_records(recs).count() == 2
    assert wat_metadata_records(recs).count() == 2


def test_wat_ignores_malformed_json(spark):
    bad = write_wat([{"url": "u", "date": "2024-01-01T00:00:00Z",
                      "title": "t", "links": []}])
    # corrupt the JSON payload but keep the envelope intact
    files = spark.createDataFrame(
        pd.DataFrame({"path": ["ok.wat.gz"], "content": [bad]}))
    recs = parse_warc_documents(files).withColumn(
        "body", recs_body_corrupt())
    out = wat_metadata_records(recs).collect()
    assert len(out) == 1 and out[0]["title"] is None
    assert list(out[0]["links"]) == []


def recs_body_corrupt():
    from pyspark.sql import functions as F
    return F.encode(F.lit("{not json"), "UTF-8")


def test_wet_ingest_runs_on_a_stream(spark, tmp_path):
    """The WET parse chain (mapInPandas + JVM projection) is stateless,
    so the BATCH operators run unchanged on a Structured Streaming blob
    source (WARC blobs staged as a parquet stream here; any binary
    stream works)."""
    import pandas as pd

    blobs = []
    for k in range(4):
        wet = [{"url": f"https://s{k}.example/{i}",
                "date": "2024-03-01T00:00:00Z",
                "text": f"w{i} " * (i + 1)} for i in range(6)]
        blobs.append((f"f{k}.wet.gz", write_wet(wet)))
    src = str(tmp_path / "src")
    spark.createDataFrame(
        pd.DataFrame(blobs, columns=["path", "content"])
    ).repartition(2).write.parquet(src)

    stream = spark.readStream.schema("path string, content binary") \
        .parquet(src)
    out = wet_text_records(parse_warc_documents(stream))
    q = (out.writeStream.format("memory").queryName("wet_stream")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["url"], r["text"]) for r in
           spark.table("wet_stream").collect()}
    want = {(r["url"], r["text"]) for r in
            wet_text_records(parse_warc_documents(
                spark.read.parquet(src))).collect()}
    assert got == want and len(want) == 24
