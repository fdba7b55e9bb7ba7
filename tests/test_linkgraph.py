"""Link-graph layer: href extraction, url resolution, host edges, and
integer fixed-point PageRank (ocr_engine_spark/functions/linkgraph.py).

The extraction vectors are hand-written expected rows (quoted /
single-quoted / bare hrefs, attribute-order traps, skip schemes,
non-ASCII rejection); PageRank is checked three ways: against a pure-
Python fixed-point replica (exact), against a float PageRank
(tolerance — the fixed-point arithmetic approximates the textbook
algorithm), and for bit-identity across different input partitioning
(the reproducibility property the fixed-point design exists for).
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from hypothesis import example, given, settings, strategies as st
from pyspark.sql import functions as F

from ocr_engine_spark.functions.linkgraph import (
    PAGERANK_SCALE,
    anchor_records,
    hits,
    host_edges,
    outlink_records,
    pagerank,
    resolve_url_col,
    target_host_col,
    trustrank,
)

HTML = (b'<html><body>\n'
        b'<a href="/about">About us</a>\n'
        b'<a href="https://Other.Example.COM/x?q=1#f">ext <b>link</b></a>\n'
        b"<a href='//cdn.example.net/lib.js'>cdn</a>\n"
        b'<a href=bare/path.html>bare</a>\n'
        b'<a href="#top">top</a>\n'
        b'<a href="mailto:x@y.z">mail</a>\n'
        b'<a href="?page=2">next</a>\n'
        b'<a data-href="/no" href="/yes">first wins</a>\n'
        b'<a href="">empty</a>\n'
        b'<a href="/bs\\lash">bs</a>\n'
        b'<a href="/hi\xffbyte">high</a>\n'
        b'</body></html>')
PDF = b'%PDF-1.4 <a href="/fake">never decoded</a>'
BASE = "http://www.site-a.org/dir/page.html"


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame([(BASE, HTML), ("http://b.org/", PDF)],
                                 "url string, html binary")


def test_outlink_records_vectors(pages):
    got = {(r.href, r.target_url)
           for r in outlink_records(pages).collect()}
    assert got == {
        ("/about", "http://www.site-a.org/about"),
        ("https://Other.Example.COM/x?q=1#f",
         "https://Other.Example.COM/x?q=1#f"),
        ("//cdn.example.net/lib.js", "http://cdn.example.net/lib.js"),
        ("bare/path.html", "http://www.site-a.org/dir/bare/path.html"),
        ("?page=2", "http://www.site-a.org/dir/page.html?page=2"),
        ("/yes", "http://www.site-a.org/yes"),
    }
    # fragment-only, mailto, empty, backslash, high-byte: all dropped;
    # the PDF payload contributes nothing (never decoded)


def test_anchor_records(pages):
    got = {r.href: r.anchor_text for r in anchor_records(pages).collect()}
    assert got["/about"] == "About us"
    assert got["https://Other.Example.COM/x?q=1#f"] == "ext link"  # tag-strip
    assert got["/yes"] == "first wins"  # data-href never matches
    assert "/no" not in got


def test_resolution_vectors(spark):
    vecs = [
        # (base, href, expected)
        ("https://a.b/c/d.html", "e.html", "https://a.b/c/e.html"),
        ("https://a.b/c/d.html", "/e", "https://a.b/e"),
        ("https://a.b/c/d.html?q=1#z", "f.html", "https://a.b/c/f.html"),
        ("https://a.b", "x.html", "https://a.b/x.html"),  # origin-only base
        ("https://a.b/c/", "sub/y", "https://a.b/c/sub/y"),
        ("https://a.b/c", "//cdn.z/l", "https://cdn.z/l"),
        ("https://a.b/c", "ftp://f.g/h", "ftp://f.g/h"),
        ("https://a.b/c", "#frag", None),
        ("https://a.b/c", "javascript:void(0)", None),
        ("https://a.b/c", "tel:+123", None),
        ("https://a.b/c", "../up.html", "https://a.b/../up.html"),  # literal
    ]
    df = spark.createDataFrame([(b, h) for b, h, _ in vecs],
                               "base string, href string")
    out = df.select(
        resolve_url_col(F.col("href"), F.col("base")).alias("r")).collect()
    assert [r.r for r in out] == [e for _, _, e in vecs]


def test_target_host_vectors(spark):
    vecs = [
        ("HTTPS://Big.Host/x", "self.host", "big.host"),
        ("//CDN.Z/l", "self.host", "cdn.z"),
        ("/rel", "self.host", "self.host"),
        ("rel.html", "self.host", "self.host"),
        ("mailto:a@b", "self.host", None),
        ("urn:isbn:123", "self.host", None),
        ("#f", "self.host", None),
    ]
    df = spark.createDataFrame([(h, s) for h, s, _ in vecs],
                               "href string, src string")
    out = df.select(
        target_host_col(F.col("href"), F.col("src")).alias("t")).collect()
    assert [r.t for r in out] == [e for _, _, e in vecs]


def test_host_edges_and_self_loops(pages):
    rows = {(r.src_host, r.dst_host): r.n_links
            for r in host_edges(pages).collect()}
    assert rows == {("www.site-a.org", "www.site-a.org"): 4,
                    ("www.site-a.org", "other.example.com"): 1,
                    ("www.site-a.org", "cdn.example.net"): 1}
    no_self = {(r.src_host, r.dst_host)
               for r in host_edges(pages, keep_self_loops=False).collect()}
    assert ("www.site-a.org", "www.site-a.org") not in no_self
    assert ("www.site-a.org", "cdn.example.net") in no_self


def test_blob_escape_contract():
    """The _blob_ascii_unescape oracle helper (entry module) assumes
    DuckDB's blob escape projection escapes EXACTLY quote, apostrophe
    and backslash within printable ASCII — pin that exhaustively so a
    DuckDB upgrade that changes the projection fails loudly here, not
    as a silent oracle mismatch."""
    import re

    import duckdb
    import pyarrow as pa

    con = duckdb.connect()
    con.register("t", pa.table({"b": pa.array([bytes(range(32, 127))],
                                              pa.binary())}))
    s = con.sql("SELECT b::VARCHAR FROM t").fetchall()[0][0]
    escaped = {chr(int(m.group(1), 16))
               for m in re.finditer(r"\\x([0-9A-F]{2})", s)}
    assert escaped == {'"', "'", "\\"}


def test_anchor_term_profile(spark):
    from ocr_engine_spark.functions.linkgraph import anchor_term_profile

    html = (b'<html><a href="https://t.example/a">great docs</a>'
            b'<a href="https://t.example/b">great API</a>'
            b'<a href="https://t.example/c">docs</a>'
            b'<a href="https://u.example/">caf\xe9 menu</a>'
            b'<a href="/self">home</a></html>')
    pages = spark.createDataFrame([("http://s.example/p", html)],
                                  "url string, html binary")
    rows = anchor_term_profile(pages, top_k=2, ascii_only=True).collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r.dst_host, []).append((r.term, r.n_term, r.pos))
    # tie between 'docs'(2) ... 'great'(2): n desc then term asc
    assert by_host["t.example"] == [("docs", 2, 1), ("great", 2, 2)]
    assert by_host["s.example"] == [("home", 1, 1)]
    # non-ASCII anchor text dropped in ascii_only mode
    assert "u.example" not in by_host
    # default keeps it
    all_rows = anchor_term_profile(pages, top_k=2).collect()
    assert any(r.dst_host == "u.example" for r in all_rows)


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------

EDGES = [
    # a hub, a chain into it, a 2-cycle, two dangling sinks
    ("b", "a"), ("c", "a"), ("d", "a"), ("e", "a"),
    ("a", "b"), ("a", "sink1"),
    ("c", "d"), ("d", "e"), ("e", "c"),
    ("f", "g"), ("g", "f"),
    ("b", "sink2"), ("x", "x"),  # self loop: dropped
]


def ref_pagerank_fixed(edges, iterations=5, scale=PAGERANK_SCALE, dp=85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    es = {(s, d) for s, d in edges if s != d}
    n = len(nodes)
    deg = Counter(s for s, _ in es)
    base = scale // n
    tele = (base * (100 - dp)) // 100
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for s, d in es:
            contrib[d] += rank[s] // deg[s]
        dangling = sum(rank[v] for v in nodes if v not in deg)
        rank = {v: tele + (dp * (contrib[v] + dangling // n)) // 100
                for v in nodes}
    return rank


def ref_pagerank_float(edges, iterations=5, d=0.85):
    nodes = sorted({s for s, _ in edges} | {dd for _, dd in edges})
    es = {(s, dd) for s, dd in edges if s != dd}
    n = len(nodes)
    deg = Counter(s for s, _ in es)
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(float)
        for s, dd in es:
            contrib[dd] += rank[s] / deg[s]
        dangling = sum(rank[v] for v in nodes if v not in deg)
        rank = {v: (1 - d) / n + d * (contrib[v] + dangling / n)
                for v in nodes}
    return rank


@pytest.fixture(scope="module")
def edges_df(spark):
    return spark.createDataFrame(EDGES, "src_host string, dst_host string")


def test_pagerank_matches_fixed_point_reference(edges_df):
    got = {r.node: r["rank"] for r in pagerank(edges_df,
                                               iterations=5).collect()}
    assert got == ref_pagerank_fixed(EDGES, iterations=5)


def test_pagerank_close_to_float_reference(edges_df):
    got = {r.node: r["rank"] for r in pagerank(edges_df,
                                               iterations=5).collect()}
    ref = ref_pagerank_float(EDGES, iterations=5)
    for v, r in got.items():
        assert abs(r / PAGERANK_SCALE - ref[v]) < 1e-6


def test_pagerank_bit_identical_across_partitioning(edges_df):
    """The reproducibility property: integer mass sums are reduce-order
    independent, so any partitioning (any cluster size) produces the
    same bits."""
    a = {r.node: r["rank"]
         for r in pagerank(edges_df.repartition(1),
                           iterations=4).collect()}
    b = {r.node: r["rank"]
         for r in pagerank(edges_df.repartition(7, "dst_host"),
                           iterations=4).collect()}
    assert a == b


def test_pagerank_mass_and_dangling(edges_df):
    rows = pagerank(edges_df, iterations=5).collect()
    total = sum(r["rank"] for r in rows)
    n = len(rows)
    # truncation-only loss: each division drops < 1 unit per node/edge
    assert PAGERANK_SCALE * 0.999 < total <= PAGERANK_SCALE
    got = {r.node: r["rank"] for r in rows}
    # the f<->g 2-cycle is a rank trap (only teleport leaks out), so it
    # tops everything; the hub 'a' outranks its spokes and the sinks
    assert got["f"] == got["g"] == max(got.values())
    assert got["a"] > max(got["c"], got["d"], got["e"], got["sink1"],
                          got["sink2"])
    # self-loop-only node: present as an isolated dangling node with
    # teleport-level rank (it propagates nothing, receives no links)
    assert 0 < got["x"] < min(got["f"], got["a"])
    assert got["sink1"] > 0 and got["sink2"] > 0


def ref_pagerank_weighted(edges, iterations=4, scale=PAGERANK_SCALE,
                          dp=85):
    agg = Counter()
    for s, d, w in edges:
        if s != d:
            agg[(s, d)] += w
    nodes = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    n = len(nodes)
    wsum = Counter()
    for (s, _), w in agg.items():
        wsum[s] += w
    base = scale // n
    tele = (base * (100 - dp)) // 100
    rank = {v: base for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for (s, d), w in agg.items():
            contrib[d] += (rank[s] * w) // wsum[s]
        dangling = sum(rank[v] for v in nodes if v not in wsum)
        rank = {v: tele + (dp * (contrib[v] + dangling // n)) // 100
                for v in nodes}
    return rank


def test_pagerank_weighted(spark):
    wedges = [("a", "b", 9), ("a", "c", 1), ("b", "a", 1),
              ("c", "a", 1), ("a", "b", 2),  # parallel edge: summed
              ("d", "a", 5)]
    df = spark.createDataFrame(
        wedges, "src_host string, dst_host string, n_links long")
    got = {r.node: r["rank"]
           for r in pagerank(df, weight="n_links",
                             iterations=4).collect()}
    assert got == ref_pagerank_weighted(wedges, iterations=4)
    # the heavy edge a->b (11:1) pushes b far above c
    assert got["b"] > 3 * got["c"]


_SEG = st.from_regex(r"[a-z0-9]{1,3}", fullmatch=True)
_HOST = st.from_regex(r"[a-z]{1,6}\.[a-z]{2,3}", fullmatch=True)
_RELPATH = st.lists(_SEG, min_size=1, max_size=3).map("/".join)


def _href_strategy():
    return st.one_of(
        _RELPATH,                                        # relative
        _RELPATH.map(lambda p: "/" + p),                 # root-relative
        _SEG.map(lambda s: "?" + s + "=1"),              # query-only
        st.tuples(_HOST, _SEG).map(lambda t: f"//{t[0]}/{t[1]}"),
        st.tuples(_HOST, _SEG).map(lambda t: f"https://{t[0]}/{t[1]}"),
        st.tuples(_RELPATH, _SEG).map(lambda t: f"{t[0]}#{t[1]}"),
    )


def _base_strategy():
    return st.tuples(
        _HOST, st.one_of(st.just(""), _RELPATH.map(lambda p: "/" + p)),
        st.one_of(st.just(""), _SEG.map(lambda s: "?" + s)),
    ).map(lambda t: f"http://{t[0]}{t[1]}{t[2]}")


@settings(max_examples=12, deadline=None)
@given(st.lists(st.tuples(_base_strategy(), _href_strategy()),
                min_size=1, max_size=25))
def test_resolution_matches_urljoin(spark, pairs):
    """On the dot-segment-free subset this module supports,
    resolve_url_col must agree with the stdlib's RFC 3986 reference
    resolver (urllib.parse.urljoin) exactly."""
    from urllib.parse import urljoin
    df = spark.createDataFrame(pairs, "base string, href string")
    got = [r.r for r in df.select(
        resolve_url_col(F.col("href"), F.col("base")).alias("r"))
        .collect()]
    assert got == [urljoin(b, h) for b, h in pairs]


@settings(max_examples=10, deadline=None)
# pinned counterexamples: Java regex `$` matches BEFORE a trailing
# line terminator (U+0085 NEL, U+2028 LS, U+2029 PS, \n, \r), so the
# old `^[ -~]*$` gate leaked hrefs ENDING in one — found by hypothesis
# in round 3, fixed by the anchor-free gate in functions/portability.
@example(payloads=[b"\x85"])                       # ISO-8859-1 -> U+0085
@example(payloads=[b"x\xe2\x80\xa8"])              # ends in U+2028 bytes
@example(payloads=[b"x\xe2\x80\xa9"])              # ends in U+2029 bytes
@example(payloads=[b"clean\n", b"clean\r"])        # plain terminators
@given(st.lists(st.binary(min_size=0, max_size=400),
                min_size=1, max_size=30))
def test_outlink_extraction_fuzz(spark, payloads):
    """Arbitrary payload bytes (including ones that start with '<' and
    contain mangled half-anchors) must never error, and every href
    that comes out must satisfy the clean-printable-ASCII gate — the
    invariant the DuckDB oracle parity rests on."""
    rows = [(f"http://fuzz.example/{i}", b"<a href=" + p)
            for i, p in enumerate(payloads)]
    rows += [(f"http://raw.example/{i}", p)
             for i, p in enumerate(payloads)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = outlink_records(df).collect()
    for r in out:
        assert all(0x20 <= ord(c) <= 0x7E for c in r.href)
        assert "\\" not in r.href and r.href != ""


def test_crawl_frontier(spark):
    from ocr_engine_spark.functions.linkgraph import crawl_frontier

    now = 1_767_225_600  # 2026-01-01T00:00:00Z
    hour = 3600
    rows = [
        ("https://hot.example/a", now - 10 * hour),
        ("https://hot.example/b", now - 20 * hour),
        ("https://hot.example/c", now - 30 * hour),  # over budget
        ("https://cold.example/x", now - 10 * hour),
        ("https://new.example/y", None),             # never crawled
    ]
    pages = spark.createDataFrame(
        [(u, None if t is None else __import__("datetime").datetime
          .utcfromtimestamp(t)) for u, t in rows],
        "url string, warc_ts timestamp")
    ranks = spark.createDataFrame(
        [("hot.example", 500_000_000)], "node string, rank long")
    out = crawl_frontier(pages, ranks, now_epoch=now,
                         per_host_budget=2, top_n=10).collect()
    got = [(r.url, r.rank_micro, r.staleness_h, r.priority, r.host_pos)
           for r in out]
    by_url = {u: (rm, st, p, hp) for u, rm, st, p, hp in got}
    # budget: hot.example keeps its 2 STALEST urls (higher priority)
    assert "https://hot.example/c" in by_url
    assert "https://hot.example/b" in by_url
    assert "https://hot.example/a" not in by_url
    # never-crawled: epoch-0 staleness dominates everything
    assert got[0][0] == "https://new.example/y"
    assert by_url["https://new.example/y"][0] == 0  # unranked
    # unranked-but-stale beats nothing here, but holds a real priority
    assert by_url["https://cold.example/x"][2] == 1_000_000 * 10
    # ranked host's priority = (rank + floor) * staleness
    assert by_url["https://hot.example/c"][2] == 501_000_000 * 30
    # output is priority-descending
    assert [p for _, _, _, p, _ in got] == sorted(
        (p for _, _, _, p, _ in got), reverse=True)
    # robots gate: disallowed urls never enter the schedule; urls
    # absent from the decisions table stay schedulable (default-allow)
    robots = spark.createDataFrame(
        [("https://new.example/y", False),
         ("https://hot.example/c", True)],
        "url string, allowed boolean")
    gated = {r.url for r in crawl_frontier(
        pages, ranks, now_epoch=now, per_host_budget=2, top_n=10,
        robots=robots).collect()}
    assert "https://new.example/y" not in gated
    assert {"https://hot.example/c", "https://cold.example/x"} <= gated


# ---------------------------------------------------------------------------
# Harmonic centrality (KMV sketches)
# ---------------------------------------------------------------------------


def _h45(node: str) -> int:
    import hashlib
    return int(hashlib.md5(node.encode()).hexdigest()[:15], 16) // 32768


def ref_harmonic_kmv(edges, iterations, k):
    """Pure-Python replica of harmonic_centrality's integer pipeline."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    es = {(s, d) for s, d in edges if s != d}
    domain = 1 << 45
    sk = {v: [_h45(v)] for v in nodes}
    prev = {v: 1 for v in nodes}
    h = {v: 0 for v in nodes}
    for t in range(1, iterations + 1):
        nxt = {}
        for v in nodes:
            merged = set(sk[v])
            for s, d in es:
                if d == v:
                    merged.update(sk[s])
            nxt[v] = sorted(merged)[:k]
        sk = nxt
        for v in nodes:
            est = (len(sk[v]) if len(sk[v]) < k
                   else ((k - 1) * domain) // max(sk[v][k - 1], 1))
            h[v] += ((est - prev[v]) * 1_000_000) // t
            prev[v] = est
    return {v: (prev[v], h[v]) for v in nodes}


def ref_harmonic_exact(edges, iterations):
    """Exact truncated harmonic centrality by reverse BFS (what the
    sketch computes EXACTLY while every ball fits within k)."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    es = {(s, d) for s, d in edges if s != d}
    rev = defaultdict(set)
    for s, d in es:
        rev[d].add(s)
    out = {}
    for v in nodes:
        seen, frontier = {v}, {v}
        h = 0
        for t in range(1, iterations + 1):
            frontier = {u for f in frontier for u in rev[f]} - seen
            h += (len(frontier) * 1_000_000) // t
            seen |= frontier
        out[v] = (len(seen), h)
    return out


HC_EDGES = [("a", "b"), ("b", "c"), ("c", "d"),
            ("x", "e"), ("y", "e"), ("z", "e"), ("e", "a")]


def test_harmonic_exact_regime(spark):
    """k larger than any ball -> the sketch degenerates to EXACT
    truncated harmonic centrality (zero sketch error by construction)."""
    from ocr_engine_spark.functions.linkgraph import harmonic_centrality
    df = spark.createDataFrame(HC_EDGES, "src_host string, dst_host string")
    got = {r.node: (r.reach_est, r.harmonic_micro)
           for r in harmonic_centrality(df, iterations=4,
                                        k=32).collect()}
    assert got == ref_harmonic_exact(HC_EDGES, iterations=4)
    assert got == ref_harmonic_kmv(HC_EDGES, iterations=4, k=32)


def test_harmonic_estimate_regime(spark):
    """Balls past k: ranks come from the (k-1)-th order statistic —
    exact match vs the Python KMV replica, and the estimate stays
    within the sketch's error regime of the true ball size."""
    from ocr_engine_spark.functions.linkgraph import harmonic_centrality
    edges = ([(f"s{i}", "hub") for i in range(400)]
             + [("hub", "out1"), ("out1", "out2")])
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r.node: (r.reach_est, r.harmonic_micro)
           for r in harmonic_centrality(df, iterations=3,
                                        k=32).collect()}
    # the REAL check: bit-exact vs the Python replica of the integer
    # KMV pipeline (hub ball = 401 >> k, firmly in estimate territory)
    assert got == ref_harmonic_kmv(edges, iterations=3, k=32)
    exact = ref_harmonic_exact(edges, iterations=3)
    # accuracy sanity on this DETERMINISTIC md5 draw (this specific
    # name set lands ~8% off the true 401; bound kept loose because a
    # single draw of the 32nd order statistic can sit 2-3 sigma out)
    assert abs(got["hub"][0] - exact["hub"][0]) / exact["hub"][0] < 0.5
    # source nodes have singleton in-balls: still counted exactly
    assert got["s0"] == exact["s0"] == (1, 0)


def test_harmonic_bit_identical_across_partitioning(spark):
    from ocr_engine_spark.functions.linkgraph import harmonic_centrality
    df = spark.createDataFrame(HC_EDGES, "src_host string, dst_host string")
    a = {r.node: r.harmonic_micro
         for r in harmonic_centrality(df.repartition(1),
                                      iterations=3, k=4).collect()}
    b = {r.node: r.harmonic_micro
         for r in harmonic_centrality(df.repartition(5, "src_host"),
                                      iterations=3, k=4).collect()}
    assert a == b


def test_harmonic_validations(spark):
    from ocr_engine_spark.functions.linkgraph import harmonic_centrality
    df = spark.createDataFrame(HC_EDGES, "src_host string, dst_host string")
    with pytest.raises(ValueError):
        harmonic_centrality(df, iterations=0)
    with pytest.raises(ValueError):
        harmonic_centrality(df, k=3)


def test_pagerank_validations(edges_df, spark):
    with pytest.raises(ValueError):
        pagerank(edges_df, iterations=0)
    with pytest.raises(ValueError):
        pagerank(edges_df, damping_pct=101)
    empty = spark.createDataFrame([], "src_host string, dst_host string")
    assert pagerank(empty, iterations=1).count() == 0


def test_crawl_schedule_bounds(spark):
    """The politeness bound binds on a hot host; throughput binds on a
    shard of many small hosts; drain is the max of the two."""
    from ocr_engine_spark.functions.linkgraph import crawl_schedule
    rows = ([(f"https://hot.example/p{i}",) for i in range(50)]
            + [(f"https://tiny{j}.example/only",) for j in range(40)]
            + [("not a url",)])  # hostless rows must be dropped
    pages = spark.createDataFrame(rows, "url string")
    out = crawl_schedule(pages, n_shards=2, delay_ms=1000,
                         service_ms=100).collect()
    assert sum(r.n_hosts for r in out) == 41
    assert sum(r.n_urls for r in out) == 90
    for r in out:
        assert r.polite_bound_ms == r.hottest_host_urls * 1000
        assert r.throughput_bound_ms == r.n_urls * 100
        assert r.drain_ms == max(r.polite_bound_ms, r.throughput_bound_ms)
    hot = next(r for r in out if r.hottest_host_urls == 50)
    # 50 urls x 1 s politeness = 50 s serial chain >> service bound
    assert hot.drain_ms == 50_000


def test_recrawl_intervals_change_math(spark):
    from ocr_engine_spark.functions.linkgraph import recrawl_intervals
    from datetime import datetime
    rows = [
        # page 1: 3 obs, changes at obs2 (a->b) and obs3 (b->a)
        (0, datetime(2024, 1, 1, 0, 0, 0), 1, "a"),
        (1, datetime(2024, 1, 1, 1, 0, 0), 1, "b"),
        (2, datetime(2024, 1, 1, 2, 0, 0), 1, "a"),
        # page 2: 3 obs, never changes
        (3, datetime(2024, 1, 1, 0, 0, 0), 2, "x"),
        (4, datetime(2024, 1, 1, 4, 0, 0), 2, "x"),
        (5, datetime(2024, 1, 1, 8, 0, 0), 2, "x"),
        # page 3: single observation
        (6, datetime(2024, 1, 1, 0, 0, 0), 3, "y"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    got = {r.page_id: r for r in recrawl_intervals(df).collect()}
    p1 = got[1]
    assert (p1.n_obs, p1.n_changes, p1.span_ms) == (3, 2, 7_200_000)
    assert p1.change_ppm == 1_000_000
    assert p1.recrawl_ms == 3_600_000       # span / 2 changes
    p2 = got[2]
    assert (p2.n_changes, p2.change_ppm) == (0, 0)
    # no changes -> span/1, inside the clamp
    assert p2.recrawl_ms == 28_800_000
    p3 = got[3]
    assert p3.n_obs == 1 and p3.change_ppm is None
    assert p3.recrawl_ms == 7 * 24 * 3_600_000   # max clamp


def test_recrawl_clamps(spark):
    from ocr_engine_spark.functions.linkgraph import recrawl_intervals
    from datetime import datetime
    rows = [
        # page changes every second -> raw 1000 ms, clamped up to min
        (0, datetime(2024, 1, 1, 0, 0, 0), 1, "a"),
        (1, datetime(2024, 1, 1, 0, 0, 1), 1, "b"),
        (2, datetime(2024, 1, 1, 0, 0, 2), 1, "c"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string")
    r = recrawl_intervals(df, min_ms=60_000).collect()[0]
    assert r.recrawl_ms == 60_000


# ---------------------------------------------------------------------------
# HITS hubs/authorities
# ---------------------------------------------------------------------------

def ref_hits_fixed(edges, iterations=3, scale=1_000_000):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    es = sorted({(s, d) for s, d in edges if s != d})
    n = len(nodes)
    hub = {v: scale // n for v in nodes}
    auth = {v: 0 for v in nodes}
    for _ in range(iterations):
        araw = defaultdict(int)
        for s, d in es:
            araw[d] += hub[s]
        ta = sum(araw.values())
        auth = {v: (araw.get(v, 0) * scale) // ta if ta > 0 else 0
                for v in nodes}
        hraw = defaultdict(int)
        for s, d in es:
            hraw[s] += auth[d]
        th = sum(hraw.values())
        hub = {v: (hraw.get(v, 0) * scale) // th if th > 0 else 0
               for v in nodes}
    return hub, auth


def test_hits_matches_fixed_point_reference(edges_df):
    rows = hits(edges_df, iterations=3).collect()
    rhub, rauth = ref_hits_fixed(EDGES, iterations=3)
    assert {r.node: r["hub"] for r in rows} == rhub
    assert {r.node: r["auth"] for r in rows} == rauth


def test_hits_bit_identical_across_partitioning(edges_df):
    a = {(r.node, r["hub"], r["auth"])
         for r in hits(edges_df.repartition(1), iterations=2).collect()}
    b = {(r.node, r["hub"], r["auth"])
         for r in hits(edges_df.repartition(7, "dst_host"),
                       iterations=2).collect()}
    assert a == b


def test_hits_structure(edges_df):
    """'a' (linked by b,c,d,e) is the top authority; the pure sinks
    have zero hub score; L1 mass of each vector is ~scale."""
    got = {r.node: r for r in hits(edges_df, iterations=3).collect()}
    top_auth = max(got.values(), key=lambda r: r["auth"])
    assert top_auth.node == "a"
    assert got["sink1"]["hub"] == 0 and got["sink2"]["hub"] == 0
    for key in ("hub", "auth"):
        total = sum(r[key] for r in got.values())
        assert 1_000_000 * 0.999 < total <= 1_000_000


def test_hits_validations(edges_df):
    with pytest.raises(ValueError):
        hits(edges_df, iterations=0)


# ---------------------------------------------------------------------------
# TrustRank
# ---------------------------------------------------------------------------

def ref_trustrank_fixed(edges, seeds, iterations=5,
                        scale=PAGERANK_SCALE, dp=85):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    es = {(s, d) for s, d in edges if s != d}
    deg = Counter(s for s, _ in es)
    sd = set(seeds) & set(nodes)
    ns = len(sd)
    base = scale // ns
    tele = (base * (100 - dp)) // 100
    tr = {v: base if v in sd else 0 for v in nodes}
    for _ in range(iterations):
        contrib = defaultdict(int)
        for s, d in es:
            contrib[d] += tr[s] // deg[s]
        dangling = sum(tr[v] for v in nodes if v not in deg)
        tr = {v: (tele if v in sd else 0)
              + (dp * (contrib[v]
                       + (dangling // ns if v in sd else 0))) // 100
              for v in nodes}
    return tr


def _seed_df(spark, names):
    return spark.createDataFrame([(s,) for s in names], "node string")


def test_trustrank_matches_fixed_point_reference(edges_df, spark):
    got = {r.node: r["trust"]
           for r in trustrank(edges_df, _seed_df(spark, ["a", "c"]),
                              iterations=5).collect()}
    assert got == ref_trustrank_fixed(EDGES, ["a", "c"], iterations=5)


def test_trustrank_spam_farm_has_rank_but_no_trust(spark):
    """The paper's motivating case: a dense spam farm earns PageRank
    but — unreachable from any seed — zero trust."""
    edges = [
        ("good1", "good2"), ("good2", "good1"), ("good1", "news"),
        ("good2", "news"),
        # spam farm: 3 boosters all pointing at the target, cycle back
        ("s1", "spamtarget"), ("s2", "spamtarget"), ("s3", "spamtarget"),
        ("spamtarget", "s1"), ("spamtarget", "s2"), ("spamtarget", "s3"),
    ]
    e = spark.createDataFrame(edges, "src_host string, dst_host string")
    tr = {r.node: r["trust"]
          for r in trustrank(e, _seed_df(spark, ["good1", "good2"]),
                             iterations=5).collect()}
    pr = {r.node: r["rank"] for r in pagerank(e, iterations=5).collect()}
    assert tr["spamtarget"] == 0
    assert pr["spamtarget"] > 0
    assert tr["news"] > 0            # reachable from seeds
    assert tr["good1"] > tr["news"]  # trust decays with distance


def test_trustrank_seeds_outside_graph_ignored(edges_df, spark):
    got = trustrank(edges_df, _seed_df(spark, ["a", "nope"]),
                    iterations=2).collect()
    ref = ref_trustrank_fixed(EDGES, ["a"], iterations=2)
    assert {r.node: r["trust"] for r in got} == ref
    with pytest.raises(ValueError):
        trustrank(edges_df, _seed_df(spark, ["nope"]), iterations=2)


def test_graph_stats_hand_counted(spark):
    """EDGES fixture counted by hand: 10 nodes (a..g, sink1, sink2,
    x), 12 non-loop edges, 1 self loop; reciprocal directed edges are
    the a<->b and f<->g mutual pairs (4 edges) over 12."""
    from ocr_engine_spark.functions.linkgraph import graph_stats
    e = spark.createDataFrame(EDGES, "src_host string, dst_host string")
    r = graph_stats(e).collect()[0]
    assert r.n_nodes == 10
    assert r.n_edges == 12
    assert r.n_self_loops == 1
    # no out-edges: sink1, sink2, and x (its only edge is the loop)
    assert r.n_dangling == 3
    assert r.max_in_deg == 4          # a <- b,c,d,e
    assert r.max_out_deg == 2         # every linking host fans out 2
    assert r.n_reciprocal == 4        # a<->b, f<->g
    assert r.reciprocity_micro == (4 * 1_000_000) // 12


def test_text_urls_linkifier_conventions(spark):
    from ocr_engine_spark.functions.linkgraph import text_urls
    rows = [
        (0, "see https://a.example/x. and (http://b.example/y?q=1) "
            "plus https://C.Example:8080/z#f, done"),
        (1, "no urls here, https:// alone is not one either"),
        # (the grammar needs >= 1 char after '//', so doc 1 is empty)
        (2, "touching<https://d.example/w>brackets"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r["doc_id"], r["pos"], r["url"], r["host"])
           for r in text_urls(df).orderBy("doc_id", "pos").collect()]
    assert got == [
        (0, 0, "https://a.example/x", "a.example"),
        (0, 1, "http://b.example/y?q=1", "b.example"),
        (0, 2, "https://C.Example:8080/z#f", "c.example:8080"),
        (2, 0, "https://d.example/w", "d.example"),
    ]
