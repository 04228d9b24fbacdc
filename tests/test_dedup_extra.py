"""Decontamination operator (operators/dedup.py::decontaminate)."""

from lib_gdal_spark.operators.dedup import decontaminate
from lib_gdal_spark.session import local_df


def test_decontaminate(spark):
    docs = local_df(spark, [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "completely unrelated text with no overlap whatsoever here"),
        (3, "prefix words then the quick brown fox jumps over the "
            "lazy dog today and suffix"),
        (4, "short doc"),
    ], "doc_id long, text string")
    bench = local_df(
        spark,
        [("the quick brown fox jumps over the lazy dog today",)],
        "text string")
    got = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(docs, bench, n=10).collect()}
    assert got == {1: 1, 2: 0, 3: 1, 4: 0}
    # n larger than both docs: whole-text gram only matches exact text
    got = {r["doc_id"]: r["contaminated"]
           for r in decontaminate(docs, bench, n=30).collect()}
    assert got == {1: 1, 2: 0, 3: 0, 4: 0}
