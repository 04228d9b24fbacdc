"""robots.txt policy evaluation (operators/robots.py)."""

from lib_gdal_spark.operators.robots import (
    parse_robots, parse_robots_text, robots_filter,
)
from lib_gdal_spark.session import local_df

ROBOTS_A = """# comment
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /*.pdf$

User-agent: specialbot
Disallow: /
"""

ROBOTS_B = """User-agent: otherbot
Disallow: /
"""


def test_parse_robots_text():
    rows = parse_robots_text("a.example", ROBOTS_A)
    assert ("a.example", "*", "disallow", "/private/", 9) in rows
    assert ("a.example", "*", "allow", "/private/ok/", 12) in rows
    assert ("a.example", "specialbot", "disallow", "/", 1) in rows
    # directives before any User-agent bind to '*'
    rows = parse_robots_text("x", "Disallow: /secret/")
    assert rows == [("x", "*", "disallow", "/secret/", 8)]
    # empty Disallow emits no rule
    assert parse_robots_text("x", "User-agent: *\nDisallow:") == []


def _pages(spark):
    return local_df(spark, [
        ("a.example", "/index.html"),
        ("a.example", "/private/x"),
        ("a.example", "/private/ok/y"),
        ("a.example", "/docs/file.pdf"),
        ("a.example", "/docs/file.pdf.html"),
        ("b.example", "/anything"),
        ("c.example", "/no/robots/at/all"),
    ], "host string, path string")


def test_robots_filter_default_agent(spark):
    docs = local_df(spark, [("a.example", ROBOTS_A),
                            ("b.example", ROBOTS_B)],
                    "host string, robots string")
    rules = parse_robots(docs)
    got = {(r["host"], r["path"]): r["allowed"]
           for r in robots_filter(_pages(spark), rules).collect()}
    assert got == {
        ("a.example", "/index.html"): True,
        ("a.example", "/private/x"): False,
        ("a.example", "/private/ok/y"): True,   # longer allow wins
        ("a.example", "/docs/file.pdf"): False,  # $-anchored wildcard
        ("a.example", "/docs/file.pdf.html"): True,  # $ anchor respected
        ("b.example", "/anything"): True,  # otherbot group doesn't bind *
        ("c.example", "/no/robots/at/all"): True,  # no robots.txt
    }


def test_robots_filter_specific_agent(spark):
    docs = local_df(spark, [("a.example", ROBOTS_A)],
                    "host string, robots string")
    rules = parse_robots(docs)
    got = {r["path"]: r["allowed"]
           for r in robots_filter(_pages(spark).where(
               "host = 'a.example'"), rules,
               agent="specialbot").collect()}
    # specific group overrides '*': everything disallowed
    assert got == {"/index.html": False, "/private/x": False,
                   "/private/ok/y": False, "/docs/file.pdf": False,
                   "/docs/file.pdf.html": False}


def test_sitemaps_from_robots(spark):
    import pandas as pd

    from lib_gdal_spark.operators.robots import sitemaps_from_robots
    docs = spark.createDataFrame(pd.DataFrame({
        "host": ["a.example", "b.example", "c.example"],
        "robots": [
            "User-agent: *\nDisallow: /x\n"
            "Sitemap: https://a.example/sm1.xml\n"
            "sitemap:https://a.example/sm2.xml\n",
            "SITEMAP:   https://b.example/s.xml  \n"
            "Disallow: /private\n",
            "User-agent: *\nAllow: /\n",       # none
        ]}))
    got = sorted((r["host"], r["sitemap"])
                 for r in sitemaps_from_robots(docs).collect())
    assert got == [
        ("a.example", "https://a.example/sm1.xml"),
        ("a.example", "https://a.example/sm2.xml"),
        ("b.example", "https://b.example/s.xml"),
    ]


def test_crawl_delays_grouped_by_agent(spark):
    import pandas as pd

    from lib_gdal_spark.operators.robots import crawl_delays
    docs = spark.createDataFrame(pd.DataFrame({
        "host": ["a.example"],
        "robots": ["User-agent: *\nCrawl-delay: 2\nDisallow: /x\n"
                   "User-agent: fastbot\ncrawl-delay: 0.5\n"
                   "Crawl-delay: not-a-number\n"]}))
    got = sorted((r["agent"], r["delay_s"])
                 for r in crawl_delays(docs).collect())
    assert got == [("*", 2.0), ("fastbot", 0.5)]


def test_crawl_frontier_schedule(spark):
    import pandas as pd

    from lib_gdal_spark.operators.robots import (
        crawl_delays, crawl_frontier)
    rules = spark.createDataFrame(pd.DataFrame({
        "host": ["slow.example"],
        "robots": ["User-agent: *\nCrawl-delay: 10\n"]}))
    pages = spark.createDataFrame(pd.DataFrame({
        "url": [f"https://slow.example/{i}" for i in range(5)]
        + [f"https://fast.example/{i}" for i in range(3)],
        "host": ["slow.example"] * 5 + ["fast.example"] * 3}))
    fr = crawl_frontier(pages, crawl_delays(rules)).collect()
    by_host = {}
    for r in fr:
        by_host.setdefault(r["host"], []).append(
            (r["fetch_seq"], r["fetch_at_s"]))
    slow = sorted(by_host["slow.example"])
    assert slow == [(i, 10.0 * i) for i in range(5)]
    fast = sorted(by_host["fast.example"])
    assert fast == [(i, 1.0 * i) for i in range(3)]  # default delay
    # determinism across parallelism
    fr2 = crawl_frontier(pages.repartition(7),
                         crawl_delays(rules)).collect()
    assert {(r["url"], r["fetch_seq"]) for r in fr} == \
           {(r["url"], r["fetch_seq"]) for r in fr2}
