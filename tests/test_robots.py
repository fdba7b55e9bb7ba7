"""robots.txt parser/matcher vs a pure-Python reference.

The reference implements the documented subset directly (group
assembly, longest-match precedence, allow-beats-disallow ties,
* wildcards, trailing-$ anchor, default allow) so the DataFrame
implementation is pinned rule-for-rule and url-for-url.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from ocr_engine_spark.functions.robots import (
    filter_robots_disallowed, parse_robots, robots_decisions,
    robots_path_col, robots_pattern_regex,
)

ROBOTS = """# policy
User-agent: gptbot
Disallow: /

User-agent: *
User-agent: research-bot
Disallow: /docs/
Allow: /docs/report_00*
Disallow: /*.pdf$
Disallow: /private
Allow:

User-agent: otherbot
Disallow: /other
"""


def _py_rules(body, agent="*"):
    rules, cur_agents, in_rules = [], [], False
    for line in body.split("\n"):
        line = re.sub(r"#.*$", "", line).strip()
        m = re.match(r"^([^:]+):(.*)$", line)
        if not m:
            continue
        field, value = m.group(1).strip().lower(), m.group(2).strip()
        if field == "user-agent":
            if in_rules:
                cur_agents, in_rules = [], False
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_rules = True
            # RFC 9309: empty-pattern rules are no-ops (an empty
            # Disallow is the canonical allow-all file)
            if value and (agent.lower() in cur_agents
                          or "*" in cur_agents):
                rules.append((field == "allow", value))
    return rules


def _py_match(rules, path):
    best = None
    for allow, pat in rules:
        anchored = pat.endswith("$")
        body = pat[:-1] if anchored else pat
        rx = "^" + re.escape(body).replace(r"\*", ".*") + (
            "$" if anchored else "")
        if re.search(rx, path):
            key = (len(pat), allow)
            if best is None or key > best[0]:
                best = (key, allow, pat)
    if best is None:
        return True, "(default)"
    return best[1], best[2]


PATHS = ["/", "/docs/report_00004.pdf", "/docs/report_01999.pdf",
         "/docs/index.html", "/a/b.pdf", "/a/b.pdfx", "/private",
         "/private/x", "/priv", "/ar/articles/story_1", "/other"]


def test_parse_rules_match_reference(spark):
    df = spark.createDataFrame([("h", ROBOTS)], ["host", "robots_txt"])
    got = sorted((r["allow"], r["pattern"])
                 for r in parse_robots(df).collect())
    assert got == sorted(_py_rules(ROBOTS))
    # the gptbot-only and otherbot-only groups are excluded for '*'
    assert ("/",) not in [(p,) for _a, p in got]
    assert all(p != "/other" for _a, p in got)


def test_parse_rules_for_named_agent(spark):
    df = spark.createDataFrame([("h", ROBOTS)], ["host", "robots_txt"])
    got = sorted((r["allow"], r["pattern"])
                 for r in parse_robots(df, agent="gptbot").collect())
    # gptbot gets its own group AND the '*' group
    assert got == sorted(_py_rules(ROBOTS, "gptbot"))
    assert (False, "/") in got


def test_decisions_match_reference(spark):
    robots = spark.createDataFrame([("ex.com", ROBOTS)],
                                   ["host", "robots_txt"])
    pages = spark.createDataFrame(
        [(f"https://ex.com{p}",) for p in PATHS]
        + [("https://norobots.io/anything",)], ["url"])
    got = {r["url"]: (r["allowed"], r["matched_pattern"])
           for r in robots_decisions(pages, robots).collect()}
    rules = _py_rules(ROBOTS)
    for p in PATHS:
        want = _py_match(rules, p)
        assert got[f"https://ex.com{p}"] == want, p
    # host without robots.txt: default allow
    assert got["https://norobots.io/anything"] == (True, "(default)")
    kept = {r["url"] for r in
            filter_robots_disallowed(pages, robots).collect()}
    assert kept == {u for u, (a, _p) in got.items() if a}


def test_pattern_regex_escapes_metachars(spark):
    # '+' '.' '(' in patterns are literals; '*' and trailing '$' are not
    df = spark.createDataFrame(
        [("/a+b.c(d", "/a+b.c(d", True),
         ("/a+b.c(d", "/aab.c(d", False),
         ("/x*z$", "/xyyyz", True),
         ("/x*z$", "/xyyyza", False)],
        ["pattern", "path", "want"])
    got = (df.withColumn("rx", robots_pattern_regex(F.col("pattern")))
           .withColumn("m", F.expr("path RLIKE rx")))
    assert all(r["m"] == r["want"] for r in got.collect())


def test_path_extraction(spark):
    df = spark.createDataFrame(
        [("https://h.io",), ("https://h.io/a/b?q=1#frag",),
         ("https://h.io/?x",)], ["url"])
    got = [r["p"] for r in
           df.select(robots_path_col(F.col("url")).alias("p")).collect()]
    assert got == ["/", "/a/b?q=1", "/?x"]


def test_empty_disallow_is_allow_all(spark):
    # the canonical allow-everything robots.txt must not block anything
    robots = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow:\n")],
        ["host", "robots_txt"])
    pages = spark.createDataFrame(
        [("https://ex.com/a",), ("https://ex.com/docs/x.pdf",)], ["url"])
    got = {r["url"]: (r["allowed"], r["matched_pattern"])
           for r in robots_decisions(pages, robots).collect()}
    assert all(v == (True, "(default)") for v in got.values())


def test_filter_does_not_multiply_duplicate_urls(spark):
    robots = spark.createDataFrame(
        [("ex.com", "User-agent: *\nDisallow: /private\n")],
        ["host", "robots_txt"])
    pages = spark.createDataFrame(
        [("https://ex.com/a", 1), ("https://ex.com/a", 2),
         ("https://ex.com/private", 3)], ["url", "rev"])
    kept = filter_robots_disallowed(pages, robots).collect()
    # both revisions of the allowed url survive, EXACTLY once each
    assert sorted(r["rev"] for r in kept) == [1, 2]


def test_sitemap_declarations(spark):
    from ocr_engine_spark.functions.robots import sitemap_declarations
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /x\n"
                   "Sitemap: https://a.com/s.xml\n"
                   "sitemap: https://a.com/s2.xml # trailing comment\n"
                   "SITEMAP:\n"            # empty value: drop
                   "Sitemap https://no-colon.example/\n"),  # no field
         ("b.com", "Disallow: /\n")],
        ["host", "robots_txt"])
    got = [(r["host"], r["pos"], r["sitemap_url"])
           for r in sitemap_declarations(robots)
           .orderBy("host", "pos").collect()]
    assert got == [
        ("a.com", 2, "https://a.com/s.xml"),
        ("a.com", 3, "https://a.com/s2.xml"),
    ]


def test_sitemap_records(spark):
    from ocr_engine_spark.functions.robots import sitemap_records
    urlset = ("<?xml version='1.0'?><urlset>"
              "<url><loc> https://s/a </loc>"
              "<lastmod>2024-01-15</lastmod></url>"
              "<url changefreq='daily'><loc>https://s/b</loc></url>"
              "<url><lastmod>2024-02-02</lastmod></url>"   # no loc: drop
              "<url><loc></loc></url>"                     # empty: drop
              "</urlset>")
    index = ("<sitemapindex>"
             "<SITEMAP><LOC>https://s/child1.xml</LOC>"
             "<lastmod>2024-03-01T10:00:00Z</lastmod></SITEMAP>"
             "<sitemap><loc>https://s/child2.xml</loc></sitemap>"
             "</sitemapindex>")
    df = spark.createDataFrame(
        [("https://s/sitemap.xml", urlset),
         ("https://s/index.xml", index),
         ("https://s/empty.xml", "not xml at all")],
        ["url", "body"])
    got = [(r["url"], r["kind"], r["pos"], r["loc"], r["lastmod"])
           for r in sitemap_records(df)
           .orderBy("url", "kind", "pos").collect()]
    assert got == [
        ("https://s/index.xml", "sitemap", 0,
         "https://s/child1.xml", "2024-03-01T10:00:00Z"),
        ("https://s/index.xml", "sitemap", 1,
         "https://s/child2.xml", None),
        ("https://s/sitemap.xml", "url", 0, "https://s/a", "2024-01-15"),
        ("https://s/sitemap.xml", "url", 1, "https://s/b", None),
    ]


def test_feed_records(spark):
    from ocr_engine_spark.functions.robots import feed_records
    rss = ("<rss><channel><title>chan</title>"
           "<item><title> Post  One </title>"
           "<link>https://s/p1</link>"
           "<pubDate>Mon, 01 Jan 2024 00:00:00 GMT</pubDate></item>"
           "<item><title><![CDATA[wrapped]]></title>"      # CDATA: null
           "<link>https://s/p2</link></item>"
           "<item><title>no link</title></item>"           # drop
           "</channel></rss>")
    atom = ("<feed><title>feed</title>"
            "<ENTRY><title>A1</title>"
            "<link rel='alternate' href='https://s/a1'/>"
            "<updated>2024-02-02T00:00:00Z</updated></ENTRY>"
            "<entry><link href=https://s/a2 /></entry>"
            "</feed>")
    df = spark.createDataFrame(
        [("https://s/f.rss", rss), ("https://s/f.atom", atom),
         ("https://s/none", "plain text")],
        ["url", "body"])
    got = [(r["url"], r["kind"], r["pos"], r["title"], r["link"],
            r["published"])
           for r in feed_records(df).orderBy("url", "kind", "pos")
           .collect()]
    assert got == [
        ("https://s/f.atom", "atom", 0, "A1", "https://s/a1",
         "2024-02-02T00:00:00Z"),
        ("https://s/f.atom", "atom", 1, None, "https://s/a2", None),
        ("https://s/f.rss", "rss", 0, "Post One", "https://s/p1",
         "Mon, 01 Jan 2024 00:00:00 GMT"),
        ("https://s/f.rss", "rss", 1, None, "https://s/p2", None),
    ]


def test_feed_links(spark):
    from ocr_engine_spark.functions.robots import feed_links
    rows = [
        ("u1", b"<html><link rel='alternate' "
               b"type='application/rss+xml' href='/feed.xml'>"
               b"<link rel=stylesheet href=/style.css>"     # hole
               b"<link type=\"application/atom+xml\" "
               b"href=\"https://s/atom\">"),
        ("u2", b"<html><link type='text/css' href='/x'>"),
        ("u3", b"%PDF-1.4 <link type='application/rss+xml' href=/f>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["feed_url"])
           for r in feed_links(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "/feed.xml"),
        ("u1", 2, "https://s/atom"),
    ]


def test_agent_specific_group_and_fallback(spark):
    # gptbot has a dedicated block-all group AND inherits the '*'
    # group (merged-groups semantics, see parse_robots docstring);
    # ccbot has no dedicated group and must fall through to '*' only.
    from ocr_engine_spark.functions.robots import robots_decisions
    body = ("User-agent: gptbot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /private/\n")
    robots = spark.createDataFrame(
        [("h.example", body)], ["host", "robots_txt"])
    pages = spark.createDataFrame(
        [("https://h.example/a",), ("https://h.example/private/x",)],
        ["url"])
    def decide(agent):
        rows = robots_decisions(pages, robots, agent=agent) \
            .orderBy("url").collect()
        return {r["url"].rsplit("/", 2)[-1] or "private": r["allowed"]
                for r in rows}
    got_gpt = decide("gptbot")
    assert got_gpt == {"a": False, "x": False}
    got_cc = decide("ccbot")
    assert got_cc == {"a": True, "x": False}
    got_star = decide("*")
    assert got_star == got_cc
