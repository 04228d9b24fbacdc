"""Unicode NFC, mojibake repair, domain-suffix blocklist."""

from pyspark.sql import functions as F

from lib_gdal_spark.operators.textops import (
    _repair_mojibake_str,
    block_by_domain_suffix,
    fix_mojibake,
    host_suffixes,
    normalize_unicode,
    url_host,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestNormalizeUnicode:
    def test_nfc_composes(self, spark):
        d = _docs(spark, [(1, "café"), (2, "å"), (3, None)])
        out = {r.doc_id: r.text_norm
               for r in normalize_unicode(d).collect()}
        assert out[1] == "café" and len(out[1]) == 4
        assert out[2] == "å"
        assert out[3] is None

    def test_nfkc_folds_compat(self, spark):
        d = _docs(spark, [(1, "ﬁle ①")])  # fi-ligature, circled 1
        out = normalize_unicode(d, form="NFKC").collect()[0].text_norm
        assert out == "file 1"


class TestFixMojibake:
    def test_double_encoded_repairs(self, spark):
        clean = "café ’quote’ €5 — end"
        moji = clean.encode("utf-8").decode("cp1252")
        d = _docs(spark, [(1, moji), (2, "plain ascii")])
        out = {r.doc_id: r.text_fixed for r in fix_mojibake(d).collect()}
        assert out[1] == clean
        assert out[2] == "plain ascii"

    def test_real_accents_untouched(self, spark):
        # 'é' matches the marker class but is NOT valid UTF-8 as bytes
        d = _docs(spark, [(1, "résumé étude")])
        out = fix_mojibake(d).collect()[0].text_fixed
        assert out == "résumé étude"

    def test_unmappable_char_untouched(self):
        s = "Ãሴ"  # marker present but a char > 0xFF w/o cp1252 byte
        assert _repair_mojibake_str(s) == s


class TestDomainBlocklist:
    def _pages(self, spark):
        rows = [(1, "https://ads.example.com/x"),
                (2, "https://sub.ads.example.com/y"),
                (3, "https://example.com/z"),
                (4, "https://good.org:8080/w"),
                (5, "HTTPS://ADS.EXAMPLE.COM/upper")]
        return spark.createDataFrame(rows, "doc_id long, url string")

    def test_literal_list(self, spark):
        out = block_by_domain_suffix(self._pages(spark), ["ads.example.com"])
        assert sorted(r.doc_id for r in out.collect()) == [3, 4]

    def test_dataframe_blocklist(self, spark):
        bl = spark.createDataFrame([("ads.example.com",), ("good.org",)],
                                   "suffix string")
        out = block_by_domain_suffix(self._pages(spark), bl)
        assert sorted(r.doc_id for r in out.collect()) == [3]
        assert out.columns == ["doc_id", "url"]

    def test_host_and_suffixes(self, spark):
        df = spark.range(1).select(
            url_host(F.lit("http://A.B.co:8080/p?q#f")).alias("h")
        ).select("h", host_suffixes(F.col("h")).alias("s"))
        r = df.collect()[0]
        assert r.h == "a.b.co"
        assert r.s == ["a.b.co", "b.co", "co"]
