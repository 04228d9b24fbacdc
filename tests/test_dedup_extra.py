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


def test_decontaminate_by_item_containment(spark):
    """Per-eval-item containment: hand-computed fractions + threshold."""
    from lib_gdal_spark.operators import dedup as DD
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta epsilon zeta"),   # contains e1 fully
        (2, "alpha beta gamma nope nope2 nope3"),     # partial overlap
        (3, "totally different words here now ok"),   # clean
    ], "doc_id long, text string")
    bench = spark.createDataFrame([
        (100, "alpha beta gamma delta"),              # 2 distinct 3-grams
        (200, "unrelated eval question text"),
    ], "eval_id long, text string")
    out = {(r["doc_id"], r["eval_id"]): r for r in
           DD.decontaminate_by_item(docs, bench, n=3, threshold=0.5)
           .collect()}
    # eval 100 grams: "alpha beta gamma", "beta gamma delta"
    r1 = out[(1, 100)]
    assert r1["eval_grams"] == 2 and r1["n_hits"] == 2
    assert r1["containment"] == 1.0 and r1["flagged"] == 1
    r2 = out[(2, 100)]
    assert r2["n_hits"] == 1 and abs(r2["containment"] - 0.5) < 1e-12
    assert r2["flagged"] == 1  # 0.5 >= threshold
    # clean doc and unrelated eval never materialize
    assert (3, 100) not in out and (1, 200) not in out
    # stricter threshold unflags the partial pair
    strict = {(r["doc_id"], r["eval_id"]): r["flagged"] for r in
              DD.decontaminate_by_item(docs, bench, n=3, threshold=0.9)
              .collect()}
    assert strict[(2, 100)] == 0 and strict[(1, 100)] == 1


def test_typo_near_dup_pairs_recall_complete(spark):
    """SymSpell delete-neighborhood join vs a brute-force oracle: every
    distance-<=1 pair is found, nothing above survives."""
    import itertools

    from lib_gdal_spark.operators import dedup as DD

    titles = [
        (1, "hello world"), (2, "hello world"), (3, "hello worl"),
        (4, "hxllo world"), (5, "jello wxrld"), (6, "other thing"),
        (7, "hello worlds"), (8, ""),
    ]
    df = spark.createDataFrame(titles, "doc_id long, title string")
    got = {(r["id1"], r["id2"], r["dist"]) for r in
           DD.typo_near_dup_pairs(df).collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {(i, j, lev(a, b))
            for (i, a), (j, b) in itertools.combinations(titles, 2)
            if lev(a, b) <= 1}
    assert got == want
    # insertions (the reverse deletion) are caught too
    assert (1, 7, 1) in got
