"""robots.txt policy evaluation — the crawl-side filter every
Common-Crawl-style pipeline applies before a page may enter the corpus
(REP, RFC 9309; the reference has no crawler, this belongs to the
web-pages payload the north rule targets).

Two stages, both Spark-native:

* ``parse_robots`` — robots.txt document strings -> a (host, agent,
  rule, path, prio) rule table. Pure narrow map (one small text parse
  per host, Arrow-batched).
* ``robots_filter`` — pages joined to the rule table BY HOST (the rule
  table is tiny relative to the corpus — one row per directive per
  host — so Spark broadcasts it; at 10^12 pages the join stays
  map-side), then RFC 9309 precedence entirely in JVM expressions: the
  longest matching path wins, ties prefer ``allow``; no matching rule
  (or no robots.txt) means allowed.

Path patterns support the REP wildcards: ``*`` matches any run of
characters and a trailing ``$`` anchors the end; evaluation compiles
each pattern to an RE2-safe regex via ``regexp_like`` so matching stays
in whole-stage codegen rather than Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULE_SCHEMA = ("host string, agent string, rule string, path string, "
               "plen int")


def parse_robots_text(host: str, text: str) -> list[tuple]:
    """One robots.txt -> rule rows. Groups of ``User-agent`` lines bind
    the directives that follow (RFC 9309 §2.1 group semantics)."""
    rows: list[tuple] = []
    agents: list[str] = []
    in_group = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_group:  # a directive closed the previous group
                agents = []
                in_group = False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_group = True
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            for a in agents or ["*"]:
                rows.append((host, a, key, val, len(val)))
    return rows


def parse_robots(docs: DataFrame, host_col: str = "host",
                 text_col: str = "robots") -> DataFrame:
    """(host, robots.txt text) rows -> distributed rule table."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows: list[tuple] = []
            for h, t in zip(b[host_col], b[text_col]):
                rows.extend(parse_robots_text(str(h), str(t)))
            yield pd.DataFrame(rows, columns=["host", "agent", "rule",
                                              "path", "plen"])

    return docs.select(host_col, text_col).mapInPandas(
        work, schema=RULE_SCHEMA)


def sitemaps_from_robots(docs: DataFrame, host_col: str = "host",
                         text_col: str = "robots") -> DataFrame:
    """(host, robots.txt text) -> (host, sitemap) rows from ``Sitemap:``
    directives (sitemaps.org / RFC 9309 §2.3 — agent-independent, may
    appear anywhere in the file, case-insensitive key). This is how a
    crawler DISCOVERS the sitemap set; the URLs feed
    sources/sitemap.py. Pure JVM: split -> filter -> regexp-extract ->
    explode; zero Python, zero shuffle."""
    lines = F.split(F.col(text_col), "\n")
    sm = F.filter(
        lines, lambda l: F.trim(l).rlike(r"(?i)^sitemap\s*:"))
    urls = F.transform(
        sm, lambda l: F.trim(F.regexp_replace(
            F.trim(l), r"(?i)^sitemap\s*:\s*", "")))
    return docs.select(
        F.col(host_col).alias("host"),
        F.explode(urls).alias("sitemap"),
    ).where(F.col("sitemap") != "")


def crawl_delays(docs: DataFrame, host_col: str = "host",
                 text_col: str = "robots") -> DataFrame:
    """(host, robots.txt) -> (host, agent, delay_s) from ``Crawl-delay``
    lines (the de-facto extension honored by most crawlers; attributed
    to the nearest preceding ``User-agent`` group like allow/disallow).
    Pure JVM: an aggregate-fold over the line array carries the current
    agent group; zero Python, zero shuffle."""
    lines = F.split(F.col(text_col), "\n")
    acc0 = F.struct(
        F.lit("*").alias("agent"),
        F.array().cast("array<struct<agent:string,delay:double>>")
        .alias("out"))

    def step(acc, l):
        t = F.trim(l)
        is_agent = t.rlike(r"(?i)^user-agent\s*:")
        is_delay = t.rlike(r"(?i)^crawl-delay\s*:\s*[0-9.]+\s*$")
        agent = F.when(
            is_agent,
            F.trim(F.regexp_replace(t, r"(?i)^user-agent\s*:\s*", "")),
        ).otherwise(acc["agent"])
        entry = F.struct(
            acc["agent"].alias("agent"),
            F.regexp_extract(t, r"([0-9.]+)", 1).cast("double")
            .alias("delay"))
        out = F.when(is_delay, F.concat(acc["out"], F.array(entry))) \
            .otherwise(acc["out"])
        return F.struct(agent.alias("agent"), out.alias("out"))

    folded = F.aggregate(lines, acc0, step, lambda acc: acc["out"])
    return docs.select(
        F.col(host_col).alias("host"), F.explode(folded).alias("e")
    ).select(
        "host", F.col("e.agent").alias("agent"),
        F.col("e.delay").alias("delay_s"))


def crawl_frontier(
    pages: DataFrame,
    delays: DataFrame,
    agent: str = "*",
    default_delay_s: float = 1.0,
    url_col: str = "url",
    host_col: str = "host",
    order_by: str = "hash",
) -> DataFrame:
    """Politeness-scheduled fetch plan: pages grouped per host, ordered
    deterministically — ``order_by='hash'`` (default; xxhash64 of the
    url spreads deep-path crawls instead of walking one directory) or
    ``'url'`` (lexicographic) — each host's k-th fetch scheduled at
    k * delay (robots Crawl-delay for ``agent``, else
    ``default_delay_s``). Reproducible at any parallelism either way.

    Output: (url, host, fetch_seq, fetch_at_s).

    Scale: one shuffle on the host key for the per-host window — the
    politeness constraint itself serializes a host, so a host's rows
    landing in one task is the semantics, not a skew accident; the
    delays side is a per-host aggregate joined broadcast-style (hosts
    << pages)."""
    d = (delays.where(F.col("agent") == agent)
         .groupBy("host").agg(F.max("delay_s").alias("delay_s")))
    if order_by not in ("hash", "url"):
        raise ValueError("order_by must be 'hash' or 'url'")
    from pyspark.sql import Window
    keys = [F.xxhash64(url_col), F.col(url_col)] \
        if order_by == "hash" else [F.col(url_col)]
    w = Window.partitionBy(host_col).orderBy(*keys)
    seq = (F.row_number().over(w) - 1).alias("fetch_seq")
    return (pages.join(F.broadcast(d), pages[host_col] == d["host"],
                       "left")
            .drop(d["host"])
            .select(
                url_col, host_col, seq,
                ((F.row_number().over(w) - 1)
                 * F.coalesce(F.col("delay_s"),
                              F.lit(default_delay_s)))
                .alias("fetch_at_s")))


def _pattern_regex(path: F.Column) -> F.Column:
    """REP path pattern -> anchored regex: quote specials, '*' -> '.*',
    trailing '$' -> end anchor."""
    ends = F.endswith(path, F.lit("$"))
    body = F.when(ends, F.expr("substring(path, 1, length(path) - 1)")) \
        .otherwise(path)
    quoted = F.regexp_replace(body, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    wild = F.regexp_replace(quoted, r"\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(ends, F.lit("$"))
                    .otherwise(F.lit("")))


def robots_filter(pages: DataFrame, rules: DataFrame, agent: str = "*",
                  host_col: str = "host",
                  path_col: str = "path") -> DataFrame:
    """Pages + rule table -> pages with an ``allowed`` boolean.

    Agent resolution per RFC 9309: rules for the specific agent if any
    exist for the host, else the ``*`` group. Precedence: longest
    ``path`` match wins; tie -> allow. The whole evaluation is one
    broadcastable equi-join + regexp_like + one window — no Python.
    """
    agent = agent.lower()
    r = rules.where(F.col("agent").isin(agent, "*"))
    # does this host have specific-agent rules? (tiny aggregate)
    has_specific = r.groupBy("host").agg(
        F.max(F.when(F.col("agent") == agent, 1).otherwise(0))
        .alias("has_spec"))
    r = (r.join(has_specific, "host")
         .where((F.col("agent") == agent) | (F.col("has_spec") == 0))
         .withColumn("rx", _pattern_regex(F.col("path"))))
    # ONE broadcast row per host carrying its rule array: precedence
    # resolves with higher-order array functions on the page row itself,
    # so the corpus NEVER shuffles — no window, no row-id bookkeeping,
    # duplicate page rows trivially survive.
    per_host = r.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(F.struct(
            F.col("plen"), (F.col("rule") == "allow").alias("ok"),
            F.col("rx"))).alias("_rules"))
    j = pages.join(F.broadcast(per_host),
                   pages[host_col] == F.col("_rhost"), "left")
    # longest match wins; ties prefer allow (struct compares plen, ok)
    best = F.array_max(F.expr(
        f"transform(filter(_rules, x -> regexp_like({path_col}, x.rx)),"
        f" x -> struct(x.plen as plen, x.ok as ok))"))
    return j.select(
        *[pages[c] for c in pages.columns],
        (best.isNull() | best["ok"]).alias("allowed"))
