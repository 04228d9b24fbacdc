"""RAKE keyword extraction (textops.rake_keywords)."""

from lib_gdal_spark.operators import textops as TXT


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rake_hand_computed(spark):
    # phrases: [deep learning models] [great] [deep learning wins]
    # freq: deep 2, learning 2, models 1, great 1, wins 1
    # deg:  deep 6, learning 6, models 3, great 1, wins 3
    # scores: 3+3+3=9, 1, 3+3+3=9 (in millionths)
    d = _docs(spark, [(1, "Deep learning models are great. "
                          "Deep learning wins.")])
    rows = {r["phrase"]: r for r in TXT.rake_keywords(d).collect()}
    assert rows["deep learning models"]["score_micro"] == 9_000_000
    assert rows["deep learning wins"]["score_micro"] == 9_000_000
    assert rows["great"]["score_micro"] == 1_000_000
    # tie on 9e6 breaks on the phrase string
    assert rows["deep learning models"]["rank"] == 1
    assert rows["deep learning wins"]["rank"] == 2
    assert rows["great"]["rank"] == 3
    assert rows["deep learning models"]["n_words"] == 3


def test_rake_duplicate_phrase_collapses(spark):
    d = _docs(spark, [(1, "red fox and red fox and blue bird")])
    rows = {r["phrase"]: r for r in TXT.rake_keywords(d).collect()}
    assert rows["red fox"]["n_occ"] == 2
    assert rows["blue bird"]["n_occ"] == 1
    # red/fox: freq 2, deg 4 -> 2.0 each; phrase = 4.0
    assert rows["red fox"]["score_micro"] == 4_000_000
    assert rows["blue bird"]["score_micro"] == 4_000_000


def test_rake_all_stopwords_doc_absent(spark):
    d = _docs(spark, [(1, "the and of to"), (2, "solar panels")])
    rows = TXT.rake_keywords(d).collect()
    assert {r["doc_id"] for r in rows} == {2}


def test_rake_top_n_and_per_doc_scope(spark):
    # deg/freq is PER DOCUMENT: 'alpha' in doc 1 ignores doc 2's usage
    d = _docs(spark, [(1, "alpha beta. alpha."),
                      (2, "alpha gamma delta epsilon")])
    rows = TXT.rake_keywords(d, top_n=1).collect()
    by_doc = {r["doc_id"]: r for r in rows}
    assert len(rows) == 2
    # doc1: alpha freq 2 deg 3 -> 1.5; beta freq 1 deg 2 -> 2.0
    assert by_doc[1]["phrase"] == "alpha beta"
    assert by_doc[1]["score_micro"] == 3_500_000
    assert by_doc[2]["phrase"] == "alpha gamma delta epsilon"
    assert by_doc[2]["score_micro"] == 16_000_000


def test_rake_partition_invariance(spark):
    d = _docs(spark, [
        (i, f"term{i % 5} shared word. term{(i * 3) % 5} other phrase")
        for i in range(40)
    ])
    a = sorted(map(tuple, TXT.rake_keywords(d).collect()))
    b = sorted(map(tuple, TXT.rake_keywords(d.repartition(7)).collect()))
    assert a == b
