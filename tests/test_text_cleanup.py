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


class TestBoilerplateLines:
    """Kohlschütter WSDM-2010 NumWordsRulesClassifier (round-4)."""

    def _run(self, spark, lines):
        from lib_gdal_spark.operators.textops import boilerplate_lines
        df = spark.createDataFrame([(1, "\n".join(lines))],
                                   "doc_id long, html string")
        return boilerplate_lines(df).collect()[0]

    def test_link_dense_line_is_boilerplate(self, spark):
        # after a link-dense line the tree demands >40 words (nav context)
        heavy = "a long informative paragraph " + " ".join(
            "word%d" % i for i in range(38))
        r = self._run(spark, [
            '<a href="x">home</a> <a href="y">about</a> <a href="z">faq</a>',
            heavy,
        ])
        assert r["n_content"] == 1
        assert r["content_text"].startswith("a long informative")

    def test_nav_context_needs_heavier_line(self, spark):
        # prev linkDensity > 0.555556: an 8-word line needs next>17 words
        nav = '<a href="x">one two three four five six</a>'
        mid = "just eight words sit on this line here"
        heavy = " ".join(["w%d" % i for i in range(18)])
        light = " ".join(["w%d" % i for i in range(10)])
        keep = self._run(spark, [nav, mid, heavy + "."])
        drop = self._run(spark, [nav, mid, light + "."])
        mids_kept = "just eight words" in keep["content_text"]
        mids_dropped = "just eight words" not in drop["content_text"]
        assert mids_kept and mids_dropped

    def test_short_line_rescued_by_prev_words(self, spark):
        # prev ld<=0.5556, curr<=16, next<=15: content iff prev>4 words
        long_prev = "five words and then some more padding tokens"
        r = self._run(spark, [long_prev, "short tail line"])
        # the 8-word opener itself has no prev and a short next -> dropped;
        # the short tail is rescued by its 8-word predecessor
        assert r["n_content"] == 1
        assert r["content_text"] == "short tail line"
        r2 = self._run(spark, ["tiny one", "short tail line"])
        assert r2["n_content"] == 0

    def test_tags_stripped_and_whitespace_collapsed(self, spark):
        r = self._run(spark, [
            "body <b>bold</b>   words with more than sixteen tokens "
            "one two three four five six seven eight nine ten",
        ])
        assert "  " not in r["content_text"]
        assert "<b>" not in r["content_text"]
        assert r["content_text"].startswith("body bold words")

    def test_empty_and_blank_lines(self, spark):
        r = self._run(spark, ["", "   ", "x"])
        assert r["n_lines"] == 3
        assert r["n_content"] == 0
        assert r["content_text"] == ""


class TestDupNgramCharFrac:
    """Gopher duplicate-n-gram character coverage (round-4)."""

    def _run(self, spark, text, ns=(5,)):
        from lib_gdal_spark.operators.textops import dup_ngram_char_frac
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return dup_ngram_char_frac(df, ns=ns).collect()[0]

    def test_hand_computed_coverage(self, spark):
        # "a b c d e" occurs at positions 0 and 5 -> covers tokens 0..9
        # of 13 single-char tokens -> 10/13
        r = self._run(spark, "a b c d e a b c d e x y z")
        assert r["n_chars"] == 13
        assert abs(r["dup_5gram_char_frac"] - 10.0 / 13.0) < 1e-12

    def test_overlap_counted_once(self, spark):
        # "a a a a a a" has 5-grams at 0 and 1, both duplicated ("a"x5),
        # spans 0-4 and 1-5 union to ALL 6 tokens -> frac 1.0, not >1
        r = self._run(spark, "a a a a a a")
        assert r["dup_5gram_char_frac"] == 1.0

    def test_no_duplicates_and_short_doc(self, spark):
        assert self._run(spark, "all fully distinct words here now"
                         )["dup_5gram_char_frac"] == 0.0
        assert self._run(spark, "too short")["dup_5gram_char_frac"] == 0.0

    def test_char_weighting(self, spark):
        # duplicated gram made of LONG tokens dominates n_chars
        txt = "looooong tokens here make grams looooong tokens here make grams x"
        r = self._run(spark, txt)
        # covered = both occurrences of the 5-gram = 10 tokens
        covered = sum(len(w) for w in txt.split()[:10])
        total = sum(len(w) for w in txt.split())
        assert abs(r["dup_5gram_char_frac"] - covered / total) < 1e-12

    def test_multiple_ns(self, spark):
        r = self._run(spark, " ".join(["w%d" % (i % 12) for i in range(40)]),
                      ns=(5, 10))
        # a 12-token period repeated >3x: both n=5 and n=10 near-fully cover
        assert r["dup_5gram_char_frac"] > 0.9
        assert r["dup_10gram_char_frac"] > 0.9
        assert r["dup_5gram_char_frac"] >= r["dup_10gram_char_frac"]


class TestGopherQualitySignals:
    """Gopher §A1.1 document-level rules (round-4)."""

    def _run(self, spark, text):
        from lib_gdal_spark.operators.textops import gopher_quality_signals
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return gopher_quality_signals(df).collect()[0]

    def test_clean_doc_passes(self, spark):
        text = " ".join(
            ["the quick brown fox jumps over that lazy dog with"] * 6)
        r = self._run(spark, text)
        assert r["gopher_pass"] == 1
        assert r["n_words"] == 60
        assert r["n_stop_hits"] >= 2

    def test_word_count_bounds(self, spark):
        assert self._run(spark, "the of words")["gopher_pass"] == 0

    def test_symbol_ratio(self, spark):
        base = " ".join(["the quick brown fox jumps that with go on it"] * 6)
        # 10 hashes over 70 words > 0.1
        r = self._run(spark, base + " " + "# " * 9 + "#")
        assert r["symbol_word_ratio"] > 0.1
        assert r["gopher_pass"] == 0
        # unicode and triple-dot ellipses both count
        r2 = self._run(spark, base + " x… y... z")
        assert abs(r2["symbol_word_ratio"] - 2.0 / r2["n_words"]) < 1e-9

    def test_bullet_and_ellipsis_lines(self, spark):
        words = "the quick brown fox that with over it go now"
        bullets = "\n".join(["• %s" % words] * 10)
        r = self._run(spark, bullets)
        assert r["bullet_line_frac"] == 1.0 and r["gopher_pass"] == 0
        ell = "\n".join(["%s..." % words] * 4 + [words] * 6)
        r2 = self._run(spark, ell)
        assert abs(r2["ellipsis_line_frac"] - 0.4) < 1e-9
        assert r2["gopher_pass"] == 0

    def test_alpha_word_fraction(self, spark):
        words = ["the", "of"] + ["w%d" % i for i in range(48)]
        nums = ["123", "456", "789", "000"] * 4
        r = self._run(spark, " ".join(words + nums))
        frac = len(words) / (len(words) + len(nums))
        assert abs(r["alpha_word_frac"] - frac) < 1e-9


class TestTopNgramCharFrac:
    def test_hand_computed(self, spark):
        from lib_gdal_spark.operators.textops import top_ngram_char_frac
        df = spark.createDataFrame([(1, "x y x y x y z w q")],
                                   "doc_id long, text string")
        r = top_ngram_char_frac(df, ns=(2,)).collect()[0]
        # top bigram "x y" x3, gram chars 2 -> 6/9
        assert r["n_chars"] == 9
        assert abs(r["top_2gram_char_frac"] - 6.0 / 9.0) < 1e-12

    def test_tie_breaks_lexicographic(self, spark):
        from lib_gdal_spark.operators.textops import top_ngram_char_frac
        # "b a" and "a b" both occur twice; tie -> "a b" chosen (same
        # char count here, but the deterministic argmax is the contract)
        df = spark.createDataFrame([(1, "a b a b"), (2, "zz yy zz yy")],
                                   "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               top_ngram_char_frac(df, ns=(2,)).collect()}
        # doc 2: "zz yy" x2 (4 chars x 2 = 8) over 8 chars -> 1.0
        assert out[2]["top_2gram_char_frac"] == 1.0
        assert abs(out[1]["top_2gram_char_frac"] - 4.0 / 4.0) < 1e-12


class TestReadability:
    """Flesch / Flesch-Kincaid (round-4)."""

    def _run(self, spark, text):
        from lib_gdal_spark.operators.textops import readability_scores
        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return readability_scores(df).collect()[0]

    def test_classic_sentence(self, spark):
        # 6 monosyllables, 1 sentence: FRE = 206.835 - 1.015*6 - 84.6*1
        r = self._run(spark, "The cat sat on the mat.")
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (6, 1, 6)
        assert abs(r["fre"] - 116.145) < 1e-9
        assert abs(r["fk_grade"] - (0.39 * 6 + 11.8 - 15.59)) < 1e-9

    def test_silent_e_and_le_guard(self, spark):
        # age/late/time/make: silent e -> 1 each; table/little: -le
        # keeps its group -> 2 each
        r = self._run(spark, "age late time make")
        assert r["n_syllables"] == 4
        r2 = self._run(spark, "table little")
        assert r2["n_syllables"] == 4

    def test_sentence_split_on_terminators(self, spark):
        r = self._run(spark, "One two! Three four? Five six.")
        assert r["n_sentences"] == 3

    def test_no_terminator_is_one_sentence(self, spark):
        r = self._run(spark, "words with no end mark at all")
        assert r["n_sentences"] == 1

    def test_nonletter_words(self, spark):
        # digits count as words but contribute no syllables
        r = self._run(spark, "cat 123 456 dog.")
        assert r["n_words"] == 4
        assert r["n_syllables"] == 2


class TestUrlQualityFeatures:
    """RefinedWeb/Dolma-style URL-shape signals (round-4)."""

    def _run(self, spark, url):
        from lib_gdal_spark.operators.textops import url_quality_features
        df = spark.createDataFrame([(1, url)], "doc_id long, url string")
        return url_quality_features(df).collect()[0]

    def test_full_url(self, spark):
        r = self._run(
            spark,
            "https://sub.example.com:8080/blog/2024/01/post-title"
            "?page=2&utm_source=x&gclid=abc#frag")
        assert r["path_depth"] == 4
        assert r["n_query_params"] == 3
        assert r["n_tracking_params"] == 2
        assert r["has_port"] == 1
        assert abs(r["digit_seg_frac"] - 0.5) < 1e-12  # 2024, 01
        assert r["max_seg_len"] == len("post-title")

    def test_bare_and_rooted(self, spark):
        r = self._run(spark, "https://example.com")
        assert r["path_depth"] == 0
        assert r["n_query_params"] == 0
        assert r["digit_seg_frac"] == 0.0
        assert r["max_seg_len"] == 0
        r2 = self._run(spark, "https://example.com/")
        assert r2["path_depth"] == 0

    def test_fragment_excluded_from_query(self, spark):
        r = self._run(spark, "https://e.com/p?a=1#b=2&c=3")
        assert r["n_query_params"] == 1

    def test_no_scheme_passthrough(self, spark):
        r = self._run(spark, "example.com/a/b")
        # schemeless: host swallows 'example.com', path /a/b
        assert r["path_depth"] == 2
        assert r["has_port"] == 0


class TestCcnetBuckets:
    """CCNet head/middle/tail perplexity split (round-4)."""

    def test_thirds_and_order(self, spark):
        from lib_gdal_spark.operators.textops import (
            ccnet_perplexity_buckets)
        # 9 scorable docs in one language: fluent docs repeat corpus-
        # common bigrams, garbled ones are unique -> lower entropy for
        # fluent
        fluent = "the cat sat on the mat and the cat sat"
        rows = [(i, "en", fluent) for i in range(6)]
        rows += [(10 + i, "en", f"zq{i} xv{i} qk{i} jw{i} vv{i}")
                 for i in range(3)]
        rows += [(99, "en", "one")]  # unscorable (1 token)
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = {r["doc_id"]: r for r in
               ccnet_perplexity_buckets(df).collect()}
        # 9 ranked docs -> 3 head, 3 middle, 3 tail
        from collections import Counter
        c = Counter(r["bucket"] for r in out.values()
                    if r["bucket"] is not None)
        assert c == {"head": 3, "middle": 3, "tail": 3}
        # the garbled docs land in the tail
        assert {out[10]["bucket"], out[11]["bucket"], out[12]["bucket"]} \
            == {"tail"}
        assert out[99]["bucket"] is None and out[99]["ppl_pct"] is None

    def test_per_language_partitions(self, spark):
        from lib_gdal_spark.operators.textops import (
            ccnet_perplexity_buckets)
        rows = [(i, "en", "the cat sat on the mat ok fine") for i in range(3)]
        rows += [(10 + i, "de", "der hund lief durch den wald gut ja")
                 for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = ccnet_perplexity_buckets(df).collect()
        # each language ranks independently: one head per language
        heads = [r["doc_id"] for r in out if r["bucket"] == "head"]
        assert len(heads) == 2
        assert len({h // 10 for h in heads}) == 2


def test_ccnet_quantile_path_agrees_with_rank(spark):
    """The 100 TB threshold path buckets identically to percent_rank
    away from threshold ties, and the loud guards hold."""
    import random

    from pyspark.sql import functions as F

    from lib_gdal_spark.operators.textops import ccnet_perplexity_buckets

    rng = random.Random(3)
    vocab = ["the", "cat", "dog", "runs", "fast", "slow", "big", "red"]
    rows = [(i, "en", " ".join(rng.choices(vocab, k=12)))
            for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    rank = {r["doc_id"]: r["bucket"] for r in
            ccnet_perplexity_buckets(df, method="rank").collect()}
    quant = {r["doc_id"]: r["bucket"] for r in
             ccnet_perplexity_buckets(df, method="quantile").collect()}
    # entropies can tie at the cut; everything else must agree
    diff = [k for k in rank if rank[k] != quant[k]]
    assert len(diff) <= len(rank) * 0.2
    order = {"head": 0, "middle": 1, "tail": 2}
    for k in diff:  # any disagreement is at most one adjacent bucket
        assert abs(order[rank[k]] - order[quant[k]]) == 1
    import pytest as _pt
    with _pt.raises(ValueError):
        ccnet_perplexity_buckets(df, method="nope")


def test_sample_temperature_source_guard(spark):
    from pyspark.sql import functions as F

    from lib_gdal_spark.operators import mixing as MX
    import pytest as _pt

    df = spark.range(20000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("host"), F.col("id")).alias("source"),
        F.lit("x").alias("text"))
    with _pt.raises(ValueError, match="distinct sources"):
        MX.sample_temperature(df)


class TestLuhnValidation:
    """ISO/IEC 7812 Luhn mod-10 (round-4)."""

    def test_known_vectors(self, spark):
        from lib_gdal_spark.operators.textops import luhn_valid
        rows = [("4539578763621486",), ("79927398713",), ("49927398716",),
                ("4539578763621487",), ("79927398710",), ("",), ("12ab34",)]
        df = spark.createDataFrame(rows, "d string")
        got = [r["v"] for r in
               df.select(luhn_valid(F.col("d")).alias("v")).collect()]
        # the first three are published Luhn-valid vectors
        assert got == [True, True, True, False, False, False, False]

    def test_candidate_extraction(self, spark):
        from lib_gdal_spark.operators.textops import (
            validate_card_candidates)
        df = spark.createDataFrame([
            (1, "pay 4539578763621486 or 4539 5787 6362 1486 ok"),
            (2, "fake 4539578763621487 and short 12345"),
            (3, "no numbers at all here"),
        ], "doc_id long, text string")
        out = {r["doc_id"]: r for r in
               validate_card_candidates(df).collect()}
        assert out[1]["n_candidates"] == 2
        assert out[1]["n_luhn_valid"] == 2
        assert set(out[1]["valid_cards"]) == {"4539578763621486"}
        assert out[2]["n_candidates"] == 1
        assert out[2]["n_luhn_valid"] == 0
        assert out[3]["n_candidates"] == 0


class TestIbanValidation:
    """ISO 13616 mod-97 (round-4)."""

    def test_published_examples(self, spark):
        from lib_gdal_spark.operators.textops import iban_valid
        rows = [("GB82 WEST 1234 5698 7654 32",),
                ("DE89 3704 0044 0532 0130 00",),
                ("FR14 2004 1010 0505 0001 3M02 606",),
                ("gb82 west 1234 5698 7654 32",),   # case-folded input
                ("GB82 WEST 1234 5698 7654 33",),   # corrupted check
                ("DE00 0000 0000 0000 0000 00",),
                ("XX12 34",), ("",)]
        df = spark.createDataFrame(rows, "i string")
        got = [r["v"] for r in
               df.select(iban_valid(F.col("i")).alias("v")).collect()]
        assert got == [True, True, True, True, False, False, False, False]

    def test_fold_matches_bigint_mod(self, spark):
        """The int64 streaming fold == direct big-integer mod 97."""
        import random
        rng = random.Random(6)
        rows = []
        for _ in range(200):
            bban = "".join(rng.choice("0123456789") for _ in range(18))
            cc = rng.randrange(0, 100)
            rows.append((f"DE{cc:02d}{bban}",))
        df = spark.createDataFrame(rows, "i string")
        from lib_gdal_spark.operators.textops import iban_valid
        got = [r["v"] for r in
               df.select(iban_valid(F.col("i")).alias("v")).collect()]
        want = [int(f"{r[0][4:]}1314{r[0][2:4]}") % 97 == 1 for r in rows]
        assert got == want


class TestSoundexNara:
    """Strict NARA soundex incl. the H/W rule (round-4)."""

    def test_published_census_anchors(self, spark):
        from lib_gdal_spark.operators.textops import soundex_nara
        import __spark_entry__ as E
        df = spark.createDataFrame(E._SOUNDEX_ANCHORS, "n string, want string")
        bad = df.select(
            "n", "want", soundex_nara(F.col("n")).alias("got")
        ).filter(F.col("got") != F.col("want")).collect()
        assert bad == []

    def test_hw_vs_vowel_separation(self, spark):
        from lib_gdal_spark.operators.textops import soundex_nara
        # c-H-c codes once (Ashcraft A261); c-A-c codes twice (Tymczak)
        df = spark.createDataFrame(
            [("BOB",), ("BHOB",), ("BAOB",)], "n string")
        got = [r["s"] for r in
               df.select(soundex_nara(F.col("n")).alias("s")).collect()]
        # B-O-B: vowel separates -> B100? B then B codes 1 -> B100
        assert got[0] == "B100"
        # B-H-O-B: H transparent, then vowel -> still B100
        assert got[1] == "B100"
        assert got[2] == "B100"
        df2 = spark.createDataFrame([("PFB",), ("PHFB",), ("PAFB",)],
                                    "n string")
        got2 = [r["s"] for r in
                df2.select(soundex_nara(F.col("n")).alias("s")).collect()]
        # P-F-B: one run of code 1 -> P000; H transparent keeps the run;
        # a vowel BREAKS it, so P-A-F-B codes the 1 once after the reset
        assert got2 == ["P000", "P000", "P100"]

    def test_normalization_and_empty(self, spark):
        from lib_gdal_spark.operators.textops import soundex_nara
        df = spark.createDataFrame(
            [(" o'Brien! ",), ("123",), (None,)], "n string")
        got = [r["s"] for r in
               df.select(soundex_nara(F.col("n")).alias("s")).collect()]
        assert got[0] == "O165"
        assert got[1] is None and got[2] is None
