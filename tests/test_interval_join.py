"""Bucketized interval-overlap join: brute-force equality on random
intervals, endpoint-touching and containment cases, cross-bucket spans,
and exactly-once emission."""

import random

from lib_gdal_spark.operators.events import interval_join
from lib_gdal_spark.session import local_df


def _l(spark, rows):
    return local_df(spark, rows, "lid long, lstart long, lend long")


def _r(spark, rows):
    return local_df(spark, rows, "rid long, rstart long, rend long")


def _brute(lrows, rrows):
    out = set()
    for lid, ls, le in lrows:
        for rid, rs, re_ in rrows:
            if ls <= re_ and rs <= le:
                out.add((lid, ls, le, rid, rs, re_))
    return out


def test_matches_brute_force_random(spark):
    rng = random.Random(99)
    lrows = [(i, rng.randrange(0, 5000), 0) for i in range(300)]
    lrows = [(i, s, s + rng.randrange(0, 200)) for (i, s, _) in lrows]
    rrows = [(i, rng.randrange(0, 5000), 0) for i in range(300)]
    rrows = [(i, s, s + rng.randrange(0, 300)) for (i, s, _) in rrows]
    got = set(map(tuple,
                  interval_join(_l(spark, lrows), _r(spark, rrows),
                                bucket=64).collect()))
    assert got == _brute(lrows, rrows)


def test_touching_containment_and_disjoint(spark):
    lrows = [(1, 10, 20), (2, 100, 300), (3, 50, 50)]
    rrows = [(7, 20, 30),     # touches lend of 1 -> overlap (closed)
             (8, 150, 160),   # contained in 2
             (9, 0, 9),       # disjoint from everything
             (10, 50, 50)]    # point-on-point with 3
    got = set((t[0], t[3]) for t in
              interval_join(_l(spark, lrows), _r(spark, rrows),
                            bucket=64).collect())
    assert got == {(1, 7), (2, 8), (3, 10)}


def test_exactly_once_across_many_buckets(spark):
    # one giant left interval spanning 40 buckets x one giant right:
    # the pair must appear exactly ONCE despite 40 shared buckets
    lrows = [(1, 0, 2560)]
    rrows = [(2, 100, 2400)]
    rows = interval_join(_l(spark, lrows), _r(spark, rrows),
                         bucket=64).collect()
    assert len(rows) == 1
    assert (rows[0]["lid"], rows[0]["rid"]) == (1, 2)
