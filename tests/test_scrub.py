"""Corpus-cleaning operator tests: PII scrub, frequent-line pruning,
repetition ratio, URL canonicalization / host skew."""

import pyspark.sql.functions as F

from ocr_engine_spark.functions.scrub import (
    canonical_url_col, host_col, host_skew_report, prune_frequent_lines,
    scrub_pii_col,
)
from ocr_engine_spark.functions.text import with_repetition_ratio


def test_scrub_pii(spark):
    rows = [
        ("mail me at a.b+c@ex-ample.co.uk thanks",),
        ("server 192.168.0.1 and phone +971 (0)50-123-4567",),
        ("no pii here at all",),
    ]
    got = [r.s for r in spark.createDataFrame(rows, ["t"]).select(
        scrub_pii_col(F.col("t")).alias("s")).collect()]
    assert got[0] == "mail me at <EMAIL> thanks"
    assert "<IP>" in got[1] and "192.168" not in got[1]
    assert "<PHONE>" in got[1] and "123-4567" not in got[1]
    assert got[2] == "no pii here at all"


def test_prune_frequent_lines(spark):
    banner = "ACCEPT COOKIES"
    rows = [(i, f"{banner}\nunique body line {i}\n\ntail {i}")
            for i in range(4)] + [(9, "no banner doc")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r.pruned_text
           for r in prune_frequent_lines(df, min_docs=3).collect()}
    for i in range(4):
        # banner removed; body lines + blank line survive in order
        assert out[i] == f"unique body line {i}\n\ntail {i}"
    assert out[9] == "no banner doc"
    # a doc that is ONLY boilerplate prunes to empty string
    df2 = df.unionByName(
        spark.createDataFrame([(99, banner)], ["doc_id", "text"]))
    out2 = {r.doc_id: r.pruned_text
            for r in prune_frequent_lines(df2, min_docs=3).collect()}
    assert out2[99] == ""


def test_repetition_ratio(spark):
    rows = [(0, "a b c d e f"),            # all 3-grams unique -> 0
            (1, "a b c a b c a b c"),      # heavy repetition
            (2, "x y")]                    # too short -> 0
    d = with_repetition_ratio(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", n=3)
    got = {r.doc_id: r.rep_ratio for r in d.collect()}
    assert got[0] == 0.0 and got[2] == 0.0
    # 7 grams, 3 distinct -> 1 - 3/7
    assert abs(got[1] - (1 - 3 / 7)) < 1e-6


def test_url_helpers(spark):
    rows = [("HTTPS://Example.COM/Path/?q=1#frag",),
            ("https://a.example.com/x/",),
            ("not a url",),
            ("https://e.com/p?next=/home/",),
            ("example.com/schemeless/",)]
    df = spark.createDataFrame(rows, ["url"])
    got = df.select(host_col(F.col("url")).alias("h"),
                    canonical_url_col(F.col("url")).alias("c")).collect()
    assert got[0].h == "example.com"
    assert got[0].c == "https://example.com/Path/?q=1"
    assert got[1].c == "https://a.example.com/x"
    assert got[2].h == ""
    # a slash ending a QUERY VALUE is semantic - never stripped
    assert got[3].c == "https://e.com/p?next=/home/"
    # schemeless inputs pass through unchanged (no collapsing to '')
    assert got[4].c == "example.com/schemeless/"


def test_host_skew_report(spark):
    rows = [(f"https://hot.example.com/{i}",) for i in range(6)] + \
           [(f"https://cold{i}.example.org/x",) for i in range(4)]
    rep = host_skew_report(spark.createDataFrame(rows, ["url"]),
                           top_k=3).collect()
    assert rep[0].host == "hot.example.com"
    assert rep[0].n_pages == 6 and abs(rep[0].share - 0.6) < 1e-9


def test_pii_counts_no_double_count(spark):
    """Counts follow the progressive-scrub contract: an IPv4 counts as
    one IP and zero phones (the phone pass never sees its digits), and
    an injected 12-digit phone DOES fire the phone rule."""
    from ocr_engine_spark.functions.scrub import pii_counts_cols
    rows = [("server 10.0.145.7 up",),
            ("call +971501234567 now",),
            ("a@b.co and 10.1.1.1 and +971501234567",)]
    df = spark.createDataFrame(rows, ["t"])
    got = df.select(*pii_counts_cols(F.col("t"))).collect()
    assert (got[0].n_ips, got[0].n_phones) == (1, 0)
    assert (got[1].n_ips, got[1].n_phones) == (0, 1)
    assert (got[2].n_emails, got[2].n_ips, got[2].n_phones) == (1, 1, 1)


def test_canonical_url_optional_flags(spark):
    """Round-2 advice: opt-in www / default-port / unreserved-escape
    merging; the conservative default is unchanged."""
    rows = [
        ("http://www.example.com:80/a/",),
        ("https://www.example.com:443/a?x=1",),
        ("https://www.com/a",),              # registrable www.com stays
        ("http://example.com:8080/a",),      # non-default port stays
        ("https://e.com/p%61th/%7Euser",),   # %61='a', %7E='~'
        ("https://e.com/a%2Fb",),            # %2F reserved: stays
        ("https://e.com/%4a%4A",),           # both hex cases of 'J'
        ("http://www.sub.example.com/",),    # only ONE www label drops
    ]
    df = spark.createDataFrame(rows, ["url"])
    full = df.select(canonical_url_col(
        F.col("url"), strip_www=True, strip_default_port=True,
        decode_unreserved=True).alias("c")).collect()
    assert full[0].c == "http://example.com/a"
    assert full[1].c == "https://example.com/a?x=1"
    assert full[2].c == "https://www.com/a"
    assert full[3].c == "http://example.com:8080/a"
    assert full[4].c == "https://e.com/path/~user"
    assert full[5].c == "https://e.com/a%2Fb"
    assert full[6].c == "https://e.com/JJ"
    assert full[7].c == "http://sub.example.com"
    # defaults unchanged: none of the new merges happen
    cons = df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    assert cons[0].c == "http://www.example.com:80/a"
    assert cons[4].c == "https://e.com/p%61th/%7euser".replace("%7e", "%7E")


def test_domain_blocklist_map_side(spark):
    """Suffix semantics: exact host and any subdomain match; sibling
    domains and suffix-of-label lookalikes (notexample.org) don't.
    Report and filter partition the corpus exactly."""
    from ocr_engine_spark.functions.scrub import (
        blocked_domain_report, filter_blocked_domains,
    )
    rows = [
        (0, "https://news.example.org/a"),        # sub of example.org
        (1, "https://example.org/b"),             # exact
        (2, "https://notexample.org/c"),          # label boundary: clean
        (3, "https://shop.example.co:8080/d"),    # port stripped, exact
        (4, "http://user@bad.example.dev/e"),     # userinfo stripped
        (5, "https://blog.example.net/f"),        # clean
        (6, "not a url"),                         # no host: clean
    ]
    df = spark.createDataFrame(rows, ["page_id", "url"])
    blocked = ["example.org", "shop.example.co", "example.dev"]
    rep = {r.page_id: r.blocked_domain
           for r in blocked_domain_report(df, blocked).collect()}
    assert rep == {0: "example.org", 1: "example.org",
                   3: "shop.example.co", 4: "example.dev"}
    kept = {r.page_id
            for r in filter_blocked_domains(df, blocked).collect()}
    assert kept == {2, 5, 6}


def test_domain_blocklist_join_path_equivalent(spark):
    """The big-blocklist equi-join path flags exactly the same rows as
    the map-side literal path, and no nested-loop join appears in the
    plan."""
    from ocr_engine_spark.functions.scrub import (
        blocked_domain_report, blocked_domains_join,
    )
    rows = [(i, f"https://{h}/p") for i, h in enumerate(
        ["a.x.com", "x.com", "b.y.org", "y.org", "z.net",
         "deep.a.x.com", "xx.com"])]
    df = spark.createDataFrame(rows, ["page_id", "url"])
    blocked = ["x.com", "y.org"]
    bdf = spark.createDataFrame([(d,) for d in blocked], ["domain"])
    got = {(r.page_id, r.blocked_domain)
           for r in blocked_domains_join(df, bdf,
                                         id_col="page_id").collect()}
    want = {(r.page_id, r.blocked_domain)
            for r in blocked_domain_report(df, blocked).collect()}
    assert got == want
    plan = blocked_domains_join(df, bdf, id_col="page_id") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


# --- meta-robots politeness gate ---------------------------------------

def test_meta_robots_directive_extraction(spark):
    from ocr_engine_spark.functions.scrub import (
        filter_noindex, meta_robots_col, noindex_col, robots_report,
    )
    rows = [
        # quoted, uppercase, name-first
        (1, b'<html><head><META NAME="Robots" CONTENT="NOINDEX, nofollow">'),
        # single-quoted, content-first
        (2, b"<html><meta content='index, follow' name='robots'>"),
        # unquoted attributes
        (3, b"<html><meta name=robots content=none>"),
        # no robots meta (charset meta must not match)
        (4, b'<html><head><meta charset="utf-8"></head>body</html>'),
        # PDF payload: never decoded, never matched
        (5, b"%PDF-1.4 \xff\xfe\x00garbage"),
        # legacy-charset page (invalid UTF-8) with an ASCII robots tag:
        # the latin-1 byte scan still sees it
        (6, '<html><meta name="robots" content="noindex">caf\xe9'
            .encode("latin-1")),
    ]
    df = spark.createDataFrame(rows, "doc_id int, html binary")
    got = {r["doc_id"]: (r["d"], r["ni"]) for r in df.select(
        "doc_id",
        meta_robots_col(F.col("html")).alias("d"),
        noindex_col(F.col("html")).alias("ni")).collect()}
    assert got == {1: ("noindex, nofollow", True),
                   2: ("index, follow", False),
                   3: ("none", True),
                   4: (None, False),
                   5: (None, False),
                   6: ("noindex", True)}
    assert sorted(r["doc_id"] for r in filter_noindex(df).collect()) \
        == [2, 4, 5]
    rep = {r["directive"]: (r["n_pages"], r["n_dropped"])
           for r in robots_report(df).collect()}
    assert rep["(absent)"] == (2, 0)
    assert rep["noindex, nofollow"] == (1, 1)


def test_meta_robots_prefix_bound(spark):
    from ocr_engine_spark.functions.scrub import meta_robots_col
    # tag beyond scan_bytes is not seen; within the bound it is
    far = b"<html>" + b" " * 5000 + b'<meta name=robots content=noindex>'
    near = b"<html><meta name=robots content=noindex>" + b"x" * 5000
    df = spark.createDataFrame([(1, far), (2, near)],
                               "doc_id int, html binary")
    got = {r["doc_id"]: r["d"] for r in df.select(
        "doc_id",
        meta_robots_col(F.col("html"), scan_bytes=4096).alias("d"))
        .collect()}
    assert got == {1: None, 2: "noindex"}


def test_meta_robots_requires_exact_name(spark):
    from ocr_engine_spark.functions.scrub import meta_robots_col
    rows = [
        # site-specific extension names that merely START with 'robots'
        (1, b'<html><meta name="robots-news" content="noindex">'),
        (2, b"<html><meta name=robotsx content=noindex>"),
        (3, b"<html><meta content=noindex name=robots-news>"),
        # real tag still matches in all delimiter forms
        (4, b"<html><meta name=robots content=noindex>"),
        (5, b'<html><meta name="robots" content="noindex">'),
        (6, b"<html><meta content=noindex name=robots>"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, html binary")
    got = {r["doc_id"]: r["d"] for r in df.select(
        "doc_id", meta_robots_col(F.col("html")).alias("d")).collect()}
    assert got == {1: None, 2: None, 3: None,
                   4: "noindex", 5: "noindex", 6: "noindex"}


def test_page_metadata_extraction(spark):
    """Title / description / canonical over both attribute orders,
    whitespace collapse, PDF gating, high-byte portability gate."""
    from ocr_engine_spark.functions.scrub import page_metadata
    rows = [
        ("u1", b"<html><title> A \t B </title>"
               b"<meta name='description' content='hello  there'>"
               b"<link rel=canonical href='https://ex.com/a'>"),
        ("u2", b"<html><meta content=\"desc first\" name=description>"
               b"<link href=https://ex.com/b rel='canonical'>"
               b"<title>T2</title>"),
        ("u3", b"<html><title>caf\xe9</title>"),   # high byte -> NULL
        ("u4", b"%PDF-1.4 <title>x</title>"),      # not HTML -> NULLs
        ("u5", b"<html>nothing here"),
        ("u6", b"<html><title></title>"),          # empty -> NULL
        ("u7", b"<html><title>first</title><title>second</title>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["title"], r["meta_description"],
                      r["canonical_url"])
           for r in page_metadata(df).collect()}
    assert got["u1"] == ("A B", "hello there", "https://ex.com/a")
    assert got["u2"] == ("T2", "desc first", "https://ex.com/b")
    assert got["u3"] == (None, None, None)
    assert got["u4"] == (None, None, None)
    assert got["u5"] == (None, None, None)
    assert got["u6"] == (None, None, None)
    assert got["u7"][0] == "first"  # first match wins
    # prefix bound: metadata past scan_bytes is invisible
    far = spark.createDataFrame(
        [("u8", b"<html>" + b"x" * 9000 + b"<title>late</title>")],
        "url string, html binary")
    assert page_metadata(far).collect()[0]["title"] is None
    assert page_metadata(far, scan_bytes=None) \
        .collect()[0]["title"] == "late"


def test_heading_records_extraction(spark):
    """h1-h6 outline: levels, document order, attr/case variants,
    child-tag skip semantics, empty drop, PDF + high-byte gates."""
    from ocr_engine_spark.functions.scrub import heading_records
    rows = [
        ("u1", b"<html><h1> Main \t Title </h1><p>x</p>"
               b"<H2 id=a>Upper</H2><h3 class='y'>Deep  dive</h3>"),
        ("u2", b"<html><h3>with <b>bold</b> tail</h3>"   # child tag: skip
               b"<h7>seven</h7>"                         # not a heading
               b"<h2>ok two</h2><h4></h4>"),             # empty: drop
        ("u3", b"<html><h1>caf\xe9</h1><h2>clean</h2>"), # high byte gated
        ("u4", b"%PDF-1.4 <h1>x</h1>"),                  # PDF: never decode
        ("u5", b"<html><h2>mismatch close</h5></html>"), # close level free
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["level"], r["heading"])
           for r in heading_records(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, 1, "Main Title"),
        ("u1", 1, 2, "Upper"),
        ("u1", 2, 3, "Deep dive"),
        ("u2", 0, 2, "ok two"),
        ("u3", 1, 2, "clean"),   # pos 0 was the gated high-byte h1
        ("u5", 0, 2, "mismatch close"),
    ]
    # prefix bound: headings past scan_bytes are invisible
    far = spark.createDataFrame(
        [("u8", b"<html>" + b"x" * 9000 + b"<h1>late</h1>")],
        "url string, html binary")
    assert heading_records(far).count() == 0
    assert heading_records(far, scan_bytes=None).count() == 1


def test_outline_profile(spark):
    from ocr_engine_spark.functions.scrub import outline_profile
    rows = [
        ("u1", b"<html><h2>s</h2><h1>the title</h1><h1>other</h1>"
               b"<h3>deep</h3>"),
        ("u2", b"<html><h4>only</h4>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict()
           for r in outline_profile(df).collect()}
    assert got["u1"]["n_headings"] == 4
    assert got["u1"]["min_level"] == 1
    assert got["u1"]["max_level"] == 3
    assert got["u1"]["first_h1"] == "the title"   # lowest pos among h1s
    assert got["u2"]["first_h1"] is None


def test_table_records_extraction(spark):
    """HTML table mining: table/row/cell positions, header flag,
    rich-cell skip, empty-slot holes, nested-table truncation,
    PDF + high-byte gates, prefix bound."""
    from ocr_engine_spark.functions.scrub import table_records
    rows = [
        ("u1", b"<html><table><tr><th>Name</th><th>Age</th></tr>"
               b"<tr><td> Ann \t X </td><td>34</td></tr>"
               b"<tr><td><b>rich</b></td><td>77</td></tr></table>"),
        ("u2", b"<html><table id=a><TR><TD>A</TD></TR></table>"
               b"<table><tr><td>B1</td><td></td><td>B3</td></tr>"
               b"</table>"),
        ("u3", b"<html><table><thead><tr><th>H</th></tr></thead>"
               b"<tbody><tr><td>caf\xe9</td><td>ok</td></tr>"
               b"</tbody></table>"),
        ("u4", b"%PDF-1.4 <table><tr><td>x</td></tr></table>"),
        ("u5", b"<html><table><tr><td>outer</td><td>"
               b"<table><tr><td>inner</td></tr></table></td></tr>"
               b"</table>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [tuple(r) for r in table_records(df)
           .orderBy("url", "table_pos", "row_pos", "col_pos").collect()]
    assert got == [
        ("u1", 0, 0, 0, True, "Name"),
        ("u1", 0, 0, 1, True, "Age"),
        ("u1", 0, 1, 0, False, "Ann X"),   # whitespace collapsed
        ("u1", 0, 1, 1, False, "34"),
        # <td><b>rich</b></td> never matches the tag-free grammar, so
        # it occupies NO col slot: 77 is col 0 of its row.
        ("u1", 0, 2, 0, False, "77"),
        ("u2", 0, 0, 0, False, "A"),       # case-insensitive tags
        ("u2", 1, 0, 0, False, "B1"),
        # empty <td></td> MATCHES and keeps its slot, then drops: hole
        ("u2", 1, 0, 2, False, "B3"),
        ("u3", 0, 0, 0, True, "H"),
        # high-byte cell gated out, slot hole at col 0
        ("u3", 0, 1, 1, False, "ok"),
        # nested table: inner </table> truncates the outer block; the
        # rich outer cell is skipped, the inner td parses as col 1.
        ("u5", 0, 0, 0, False, "outer"),
        ("u5", 0, 0, 1, False, "inner"),
    ]
    far = spark.createDataFrame(
        [("u8", b"<html>" + b"x" * 9000
          + b"<table><tr><td>late</td></tr></table>")],
        "url string, html binary")
    assert table_records(far).count() == 0
    assert table_records(far, scan_bytes=None).count() == 1


def test_table_profile(spark):
    from ocr_engine_spark.functions.scrub import table_profile
    rows = [
        ("u1", b"<html><table><tr><th>A</th><th>B</th></tr>"
               b"<tr><td>1</td><td>2</td><td>3</td></tr></table>"
               b"<table><tr><td>solo</td></tr></table>"),
        ("u2", b"<html><p>no tables</p>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in table_profile(df).collect()}
    assert got["u1"]["n_tables"] == 2
    assert got["u1"]["n_rows"] == 3
    assert got["u1"]["n_cells"] == 6
    assert got["u1"]["n_header_cells"] == 2
    assert got["u1"]["max_row_width"] == 3
    assert "u2" not in got


def test_jsonld_records_extraction(spark):
    """JSON-LD block mining: quote/case/order variants, trim-only
    payloads, empty drop, escape gate, PDF gate, prefix bound."""
    from ocr_engine_spark.functions.scrub import jsonld_records
    rows = [
        ("u1", b'<html><script type="application/ld+json">'
               b'  {"@type":"Article","name":"A"}  </script>'
               b"<script type='application/ld+json'>"
               b'{"@type":"Product"}</script>'),
        ("u2", b"<html><SCRIPT data-x=1 TYPE=application/ld+json>"
               b'{"k":"bare attr"}</SCRIPT>'
               b'<script type="text/javascript">{"k":"not ld"}</script>'
               b'<script type="application/ld+json"></script>'    # empty
               b'<script type="application/ld+json">{"z":9}</script>'),
        ("u3", b'<html><script type="application/ld+json">'
               b'{"name":"q\\"esc"}</script>'),        # backslash: gated
        ("u4", b'%PDF-1.4 <script type="application/ld+json">'
               b'{"x":1}</script>'),                   # PDF: never decode
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [tuple(r) for r in jsonld_records(df)
           .orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, '{"@type":"Article","name":"A"}'),   # trimmed only
        ("u1", 1, '{"@type":"Product"}'),
        ("u2", 0, '{"k":"bare attr"}'),
        # the empty block held pos 1; the non-ld script never matched
        ("u2", 2, '{"z":9}'),
    ]
    far = spark.createDataFrame(
        [("u8", b"<html>" + b"x" * 9000
          + b'<script type="application/ld+json">{"a":1}</script>')],
        "url string, html binary")
    assert jsonld_records(far).count() == 0
    assert jsonld_records(far, scan_bytes=None).count() == 1


def test_jsonld_entities(spark):
    """Strict-parse gate + headline field extraction, incl. the
    documented divergence classes (dup keys, single quotes)."""
    from ocr_engine_spark.functions.scrub import jsonld_entities
    rows = [
        ("u1", b'<html><script type="application/ld+json">'
               b'{"@context":"https://schema.org","@type":"Article",'
               b'"name":"Title"}</script>'),
        ("u2", b'<html><script type="application/ld+json">'
               b'{"@type":["Organization","Brand"],"name":{"a": 1}}'
               b'</script>'),
        ("u3", b'<html><script type="application/ld+json">'
               b'{"@type":"Broken",</script>'),        # invalid JSON
        ("u4", b'<html><script type="application/ld+json">'
               b"{'name':'single'}</script>"),         # lenient-only
        ("u5", b'<html><script type="application/ld+json">'
               b'{"name":"d","name":"d2"}</script>'),  # dup keys
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict()
           for r in jsonld_entities(df).collect()}
    assert got["u1"]["is_valid"] and got["u1"]["ld_name"] == "Title"
    assert got["u1"]["ld_context"] == "https://schema.org"
    assert got["u1"]["ld_type"] == "Article"
    # array/object values re-render compactly (oracle-parity form)
    assert got["u2"]["ld_type"] == '["Organization","Brand"]'
    assert got["u2"]["ld_name"] == '{"a":1}'
    # strict gate: lenient-only and dup-key payloads are NOT parsed
    for u in ("u3", "u4", "u5"):
        assert not got[u]["is_valid"] and got[u]["ld_name"] is None


def test_hreflang_records(spark):
    """hreflang alternates: attr orders, bare/quoted values, lang
    lowercasing, rel first-token rule, pos holes, PDF + gates."""
    from ocr_engine_spark.functions.scrub import hreflang_records
    rows = [
        ("u1", b"<html>"
               b"<link rel='alternate' hreflang='FR-fr' "
               b"href='https://ex.org/fr'>"
               b"<link rel=canonical href='https://ex.org/a'>"  # hole
               b"<link hreflang=de href=https://ex.org/de "
               b"rel=alternate>"),
        ("u2", b"<html>"
               b"<LINK HREFLANG=\"ja\" REL=\"alternate stylesheet\" "
               b"HREF=\"/ja/x\">"                    # token list: first ok
               b"<link rel='stylesheet alternate' hreflang='ko' "
               b"href='/ko'>"                        # not first: drop
               b"<link rel='alternate' hreflang='es'>"),  # no href: drop
        ("u3", b"<html><link rel=alternate hreflang='pt' "
               b"href='a\\\\b'>"),                   # backslash gated
        ("u4", b"%PDF-1.4 <link rel=alternate hreflang=x href=y>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["hreflang"], r["href"])
           for r in hreflang_records(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "fr-fr", "https://ex.org/fr"),
        ("u1", 2, "de", "https://ex.org/de"),
        ("u2", 0, "ja", "/ja/x"),
    ]
    far = spark.createDataFrame(
        [("u8", b"<html>" + b"x" * 9000 +
          b"<link rel=alternate hreflang=fr href=/fr>")],
        "url string, html binary")
    assert hreflang_records(far).count() == 0
    assert hreflang_records(far, scan_bytes=None).count() == 1


def test_bitext_candidates(spark):
    """In-corpus cross-language pair mining: fetched targets only,
    same-language and self pairs dropped, multi-declared target
    collapses to one candidate."""
    from ocr_engine_spark.functions.scrub import bitext_candidates
    a_en = (b"<html>"
            b"<link rel=alternate hreflang=fr href='https://s/fr/a'>"
            b"<link rel=alternate hreflang=fr href='https://s/fr/a'>"
            b"<link rel=alternate hreflang=de href='https://s/de/a'>"
            b"<link rel=alternate hreflang=en "
            b"href='https://s/en/a'>")  # self: drop
    b_fr = (b"<html>"
            b"<link rel=alternate hreflang=en href='https://s/en/a'>")
    c_en = (b"<html>"
            b"<link rel=alternate hreflang=en-gb "
            b"href='https://s/en/a'>")  # same stored lang: drop
    rows = [("https://s/en/a", a_en, "en"),
            ("https://s/fr/a", b_fr, "fr"),
            ("https://s/en/c", c_en, "en")]
    # https://s/de/a is NOT in the corpus -> not a candidate
    df = spark.createDataFrame(rows, "url string, html binary, lang string")
    got = sorted((r["url"], r["lang"], r["alt_url"], r["alt_hreflang"],
                  r["alt_lang"]) for r in bitext_candidates(df).collect())
    assert got == [
        ("https://s/en/a", "en", "https://s/fr/a", "fr", "fr"),
        ("https://s/fr/a", "fr", "https://s/en/a", "en", "en"),
    ]


def test_og_metadata(spark):
    """Open Graph fields: both attribute orders, first match wins,
    whitespace collapse, plain-meta tags ignored, PDF + gates."""
    from ocr_engine_spark.functions.scrub import og_metadata
    rows = [
        ("u1", b"<html>"
               b"<meta property='og:title' content=' A  B '>"
               b"<meta content=\"article\" property=\"og:type\">"
               b"<meta property=og:image content=https://ex.org/i.png>"
               b"<meta name='description' content='plain'>"),
        ("u2", b"<html><meta property='og:title' content='first'>"
               b"<meta property='og:title' content='second'>"),
        ("u3", b"<html><meta property='og:title' content='caf\xe9'>"),
        ("u4", b"%PDF-1.4 <meta property='og:title' content='x'>"),
        ("u5", b"<html><meta property='og:description' content=''>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in og_metadata(df).collect()}
    assert got["u1"]["og_title"] == "A B"
    assert got["u1"]["og_type"] == "article"
    assert got["u1"]["og_image"] == "https://ex.org/i.png"
    assert got["u1"]["og_description"] is None  # plain meta ignored
    assert got["u2"]["og_title"] == "first"
    assert got["u3"]["og_title"] is None        # high byte gated
    assert got["u4"] == {"url": "u4", "og_title": None,
                         "og_description": None, "og_type": None,
                         "og_image": None}
    assert got["u5"]["og_description"] is None  # empty -> NULL


def test_microdata_records(spark):
    """itemprop mining: content-attr precedence, immediate-text
    fallback, flat non-DOM semantics, collapse, gates, pos holes."""
    from ocr_engine_spark.functions.scrub import microdata_records
    rows = [
        ("u1", b"<html><div itemscope itemtype='https://schema.org/P'>"
               b"<meta itemprop='name' content=' Acme  Widget '>"
               b"<span itemprop=price>9.99</span>"
               b"<span itemprop='rating' content='4.5'>ignored</span>"
               b"</div>"),
        ("u2", b"<html><span itemprop='empty'></span>"     # no value
               b"<span itemprop='nested'><b>child</b></span>"  # no text
               b"<span itemprop='ok'> kept \t here </span>"),
        ("u3", b"<html><span itemprop='x'>caf\xe9</span>"  # gated
               b"<span itemprop='y'>clean</span>"),
        ("u4", b"<html><span data-itemprop='no'>decoy</span>"),
        ("u5", b"%PDF-1.4 <span itemprop='x'>y</span>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["itemprop"], r["value"])
           for r in microdata_records(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "name", "Acme Widget"),
        ("u1", 1, "price", "9.99"),
        ("u1", 2, "rating", "4.5"),     # content beats inner text
        ("u2", 2, "ok", "kept here"),   # pos holes at 0,1
        ("u3", 1, "y", "clean"),        # high-byte value gated at 0
    ]
    # data-itemprop matches the whitespace-boundary rule? it must NOT:
    # the attr name is 'data-itemprop', preceded by whitespace but the
    # grammar requires whitespace IMMEDIATELY before 'itemprop'
    assert not [g for g in got if g[0] == "u4"]


def test_microdata_types(spark):
    from ocr_engine_spark.functions.scrub import microdata_types
    rows = [
        ("u1", b"<html><div itemscope "
               b"itemtype='https://schema.org/Product'>"
               b"<div itemscope itemtype=https://schema.org/Offer></div>"),
        ("u2", b"<html><div data-itemtype='https://no'>x</div>"),
        ("u3", b"%PDF-1.4 itemtype='https://schema.org/X'"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["itemtype"])
           for r in microdata_types(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "https://schema.org/Product"),
        ("u1", 1, "https://schema.org/Offer"),
    ]


def test_url_features(spark):
    from ocr_engine_spark.functions.scrub import url_features
    rows = [
        ("https://Ex.com/",),
        ("https://ex.com/a/b/page123.HTML?x=1&y=&utm_source=nl",),
        ("https://ex.com/2024/01/02/post.php#frag",),
        ("https://ex.com",),                       # empty path -> '/'
        ("https://ex.com/dl/file.tar.gz",),
    ]
    df = spark.createDataFrame(rows, "url string")
    got = {r["url"]: r.asDict() for r in url_features(df).collect()}
    r0 = got["https://Ex.com/"]
    assert (r0["host"], r0["path_depth"], r0["path_len"],
            r0["is_homepage"], r0["ext"]) == ("ex.com", 0, 1, True,
                                              None)
    r1 = got["https://ex.com/a/b/page123.HTML?x=1&y=&utm_source=nl"]
    assert r1["path_depth"] == 3 and r1["n_params"] == 3
    assert r1["ext"] == "html" and r1["has_tracker"]
    assert r1["path_len"] == len("/a/b/page123.HTML")
    assert r1["digit_frac_micro"] == 3 * 1_000_000 // 17
    r2 = got["https://ex.com/2024/01/02/post.php#frag"]
    assert r2["path_depth"] == 4 and r2["ext"] == "php"
    assert not r2["has_tracker"] and r2["n_params"] == 0
    r3 = got["https://ex.com"]
    assert r3["is_homepage"] and r3["path_len"] == 1
    assert got["https://ex.com/dl/file.tar.gz"]["ext"] == "gz"


def test_host_concentration(spark):
    """Exact integer Gini + shares on a hand-computable corpus."""
    from ocr_engine_spark.functions.scrub import host_concentration
    # host a: 6 pages, b: 3, c: 1  (n=3, S=10)
    rows = ([(f"https://a.com/{i}",) for i in range(6)]
            + [(f"https://b.com/{i}",) for i in range(3)]
            + [("https://c.com/x",)])
    df = spark.createDataFrame(rows, "url string")
    r = host_concentration(df, top_k=2).collect()[0]
    assert (r["n_hosts"], r["n_pages"]) == (3, 10)
    assert r["top1_share_micro"] == 6 * 1_000_000 // 10
    assert r["topk_share_micro"] == 9 * 1_000_000 // 10
    # ranks asc by count: c=1, b=2, a=3 -> S1 = 1*1 + 2*3 + 3*6 = 25
    # gini = (2*25 - 4*10) / (3*10) = 10/30
    assert r["gini_micro"] == (2 * 25 - 4 * 10) * 1_000_000 // 30
    # uniform corpus -> gini 0
    uni = spark.createDataFrame(
        [(f"https://h{i}.com/x",) for i in range(4)], "url string")
    assert host_concentration(uni).collect()[0]["gini_micro"] == 0


def test_template_report(spark):
    """Tag-skeleton template detection: same template different text
    -> one skeleton; attr change -> new skeleton; PDF/high-byte
    skeletons out."""
    from ocr_engine_spark.functions.scrub import template_report
    t = b"<html><body><div class=x><p>%s</p></div></body></html>"
    rows = [
        ("https://a.com/1", t % b"alpha text"),
        ("https://a.com/2", t % b"totally other words"),
        ("https://a.com/3", t % b"third  page"),
        ("https://a.com/4", b"<html><body><div class=y><p>z</p>"
                            b"</div></body></html>"),   # attr differs
        ("https://b.com/1", b"%PDF-1.4 not html"),       # gated out
        ("https://b.com/2", t % b"solo"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["host"]: (r["n_pages"], r["n_skeletons"],
                       r["top_share_micro"])
           for r in template_report(df).collect()}
    assert got["a.com"] == (4, 2, 3 * 1_000_000 // 4)
    assert got["b.com"] == (1, 1, 1_000_000)


def test_image_captions(spark):
    """img alt-text pair mining: quoted-alt requirement, min length,
    attr orders, pos holes, PDF + gates."""
    from ocr_engine_spark.functions.scrub import image_captions
    rows = [
        ("u1", b"<html>"
               b"<img src='/a.jpg' alt=' A red  fox jumping '>"
               b"<img alt=\"Sunset over water\" src=https://c.dn/b.png>"
               b"<img src='/noalt.jpg'>"                  # hole
               b"<IMG SRC='/c.gif' ALT='tiny'>"),         # len 4 < 5
        ("u2", b"<html><img src='/d.jpg' alt=bare caption here>"
               b"<img src='/e.jpg' alt=''>"),             # bare + empty
        ("u3", b"<html><img src='/f.jpg' alt='caf\xe9 scene pic'>"),
        ("u4", b"%PDF-1.4 <img src='/g' alt='not html here'>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["src"], r["alt"])
           for r in image_captions(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "/a.jpg", "A red fox jumping"),
        ("u1", 1, "https://c.dn/b.png", "Sunset over water"),
    ]


def test_media_links(spark):
    from ocr_engine_spark.functions.scrub import media_links
    rows = [
        ("u1", b"<html><video controls src='/v.mp4'></video>"
               b"<audio src=https://c.dn/a.ogg></audio>"
               b"<video poster='/p.jpg'><source src='/v.webm' "
               b"type='video/webm'><track src='/cc.vtt'></video>"),
        ("u2", b"<html><video controls></video>"),   # srcless: empty
        ("u3", b"%PDF-1.4 <video src='/x'>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["tag"], r["src"])
           for r in media_links(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "video", "/v.mp4"),
        ("u1", 1, "audio", "https://c.dn/a.ogg"),
        ("u1", 3, "source", "/v.webm"),   # pos 2 = srcless video
        ("u1", 4, "track", "/cc.vtt"),
    ]


def test_pagination_links(spark):
    from ocr_engine_spark.functions.scrub import pagination_links
    rows = [
        ("u1", b"<html><link rel='next' href='/page/3'>"
               b"<link rel='prev' href='/page/1'>"
               b"<link rel='next' href='/decoy'>"),   # first wins
        ("u2", b"<html><link rel=next href=/p2>"),
        ("u3", b"<html><link rel='nexttrap' href='/x'>"  # bad rel
               b"<link rel='canonical' href='/c'>"),
        ("u4", b"%PDF-1.4"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: (r["rel_next"], r["rel_prev"])
           for r in pagination_links(df).collect()}
    assert got == {
        "u1": ("/page/3", "/page/1"),
        "u2": ("/p2", None),
    }


def test_list_records(spark):
    """ul/ol/li mining: ordered flag, omitted </li>, child-element
    holes, nested truncation, gates."""
    from ocr_engine_spark.functions.scrub import list_records
    rows = [
        ("u1", b"<html><ul><li> Alpha  one </li><li>beta</li></ul>"
               b"<OL start=3><LI>step a<LI>step b</OL>"),  # no </li>
        ("u2", b"<html><ul><li><b>rich</b> child first</li>"
               b"<li>plain kept</li></ul>"),
        ("u3", b"<html><ul><li>outer<ol><li>inner</li></ol></li></ul>"),
        ("u4", b"%PDF-1.4 <ul><li>x</li></ul>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["list_pos"], r["ordered"], r["item_pos"],
            r["item"])
           for r in list_records(df)
           .orderBy("url", "list_pos", "item_pos").collect()]
    assert got == [
        ("u1", 0, False, 0, "Alpha one"),
        ("u1", 0, False, 1, "beta"),
        ("u1", 1, True, 0, "step a"),
        ("u1", 1, True, 1, "step b"),
        ("u2", 0, False, 1, "plain kept"),   # hole at 0 (rich child)
        # u3: outer block truncates at the INNER closer; items 'outer'
        # and 'inner' both attribute to the one truncated outer block
        ("u3", 0, False, 0, "outer"),
        ("u3", 0, False, 1, "inner"),
    ]


def test_rdfa_records(spark):
    from ocr_engine_spark.functions.scrub import rdfa_records, rdfa_types
    rows = [
        ("u1", b"<html><div vocab='https://schema.org/' typeof='Product'>"
               b"<meta property='name' content=' RDFa  Widget '>"
               b"<span property=price>19.99</span>"
               b"<meta property='og:title' content='og is rdfa'></div>"),
        ("u2", b"<html><span property='empty'></span>"
               b"<span property='ok'>kept</span>"),
        ("u3", b"%PDF-1.4 <span property='x'>y</span>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["property"], r["value"])
           for r in rdfa_records(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "name", "RDFa Widget"),
        ("u1", 1, "price", "19.99"),
        ("u1", 2, "og:title", "og is rdfa"),
        ("u2", 1, "ok", "kept"),     # hole at 0
    ]
    ts = [(r["url"], r["pos"], r["type_of"])
          for r in rdfa_types(df).orderBy("url", "pos").collect()]
    assert ts == [("u1", 0, "Product")]


def test_bitext_candidates_resolve(spark):
    """resolve=True: relative alternate hrefs resolve against the
    declaring page before the corpus join."""
    from ocr_engine_spark.functions.scrub import bitext_candidates
    a_en = (b"<html>"
            b"<link rel=alternate hreflang=fr href='/fr/a'>")  # relative
    b_fr = b"<html><p>bonjour</p>"
    rows = [("https://s/en/a", a_en, "en"),
            ("https://s/fr/a", b_fr, "fr")]
    df = spark.createDataFrame(rows, "url string, html binary, lang string")
    # verbatim default: '/fr/a' matches no corpus url
    assert bitext_candidates(df).count() == 0
    got = [(r["url"], r["alt_url"], r["alt_lang"])
           for r in bitext_candidates(df, resolve=True).collect()]
    assert got == [("https://s/en/a", "https://s/fr/a", "fr")]


def test_embed_links(spark):
    from ocr_engine_spark.functions.scrub import embed_links
    rows = [
        ("u1", b"<html><iframe width=560 "
               b"src='https://www.youtube.com/embed/xyz'></iframe>"
               b"<iframe sandbox></iframe>"          # srcless hole
               b"<EMBED SRC='/flash.swf' TYPE='application/x'>"),
        ("u2", b"%PDF-1.4 <iframe src='/x'>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = [(r["url"], r["pos"], r["tag"], r["src"])
           for r in embed_links(df).orderBy("url", "pos").collect()]
    assert got == [
        ("u1", 0, "iframe", "https://www.youtube.com/embed/xyz"),
        ("u1", 2, "embed", "/flash.swf"),
    ]


def test_charset_report(spark):
    from ocr_engine_spark.functions.scrub import charset_report
    rows = [
        ("u1", b"<html><meta charset='UTF-8'>"),
        ("u2", b"<html><meta http-equiv='Content-Type' "
               b"content='text/html; charset=ISO-8859-1'>"),
        ("u3", b"<html><p>nothing declared</p>"),
        ("u4", b"%PDF-1.4"),
        ("u5", b"<html><meta charset=utf-8><meta charset=latin-1>"),
    ]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["charset"]: r["n_pages"]
           for r in charset_report(df).collect()}
    assert got == {"utf-8": 2, "iso-8859-1": 1,
                   "(undeclared)": 1, "(binary)": 1}


def test_page_features(spark):
    from ocr_engine_spark.functions.scrub import page_features
    h1 = (b"<html><head><title>T</title>"
          b"<link rel='canonical' href='/c'>"
          b"<script type='application/ld+json'>{}</script>"
          b"<meta charset=utf-8></head><body>"
          b"<h1>a</h1><h3>b</h3><table><tr><td>x</td></tr></table>"
          b"<ul><li>i</li></ul><ol><li>j</li></ol>"
          b"<a href='/1'>l</a><a name=anchor>no href</a>"
          b"<img src='/i.png'><video src='/v'></video>"
          b"<iframe src='/f'></iframe></body></html>")
    rows = [("u1", h1), ("u2", b"%PDF-1.4 <h1>not html</h1>")]
    df = spark.createDataFrame(rows, "url string, html binary")
    got = {r["url"]: r.asDict() for r in page_features(df).collect()}
    r = got["u1"]
    assert (r["n_headings"], r["n_tables"], r["n_lists"]) == (2, 1, 2)
    assert (r["n_links"], r["n_images"], r["n_media"],
            r["n_embeds"]) == (1, 1, 1, 1)
    assert r["n_scripts"] == 1 and r["n_meta"] == 1
    assert r["has_title"] and r["has_canonical"] and r["has_jsonld"]
    assert r["html_bytes"] == len(h1)
    n_tags = sum(1 for i in range(len(h1) - 1)
                 if h1[i:i+1] == b"<" and h1[i+1:i+2].isalpha())
    assert r["tags_per_kb_micro"] == n_tags * 1024000000 // len(h1)
    p = got["u2"]
    assert p["n_headings"] == 0 and not p["has_title"]
    assert p["html_bytes"] == len(rows[1][1])


def _pages(spark, htmls):
    return spark.createDataFrame(
        [(f"u{i}", h.encode()) for i, h in enumerate(htmls)],
        "url string, html binary")


def test_table_triples_th_headers(spark):
    from ocr_engine_spark.functions.scrub import table_triples
    df = _pages(spark, [
        "<table><tr><th>Name</th><th>Qty</th></tr>"
        "<tr><td>alpha</td><td>3</td></tr>"
        "<tr><td>beta</td><td>7</td></tr></table>",
    ])
    rows = table_triples(df).orderBy("row_pos", "col_pos").collect()
    got = [(r.row_pos, r.header, r.value) for r in rows]
    assert got == [(1, "Name", "alpha"), (1, "Qty", "3"),
                   (2, "Name", "beta"), (2, "Qty", "7")]


def test_table_triples_first_row_inference(spark):
    from ocr_engine_spark.functions.scrub import table_triples
    df = _pages(spark, [
        "<table><tr><td>city</td><td>pop</td></tr>"
        "<tr><td>oslo</td><td>634</td></tr></table>",
    ])
    rows = table_triples(df).orderBy("col_pos").collect()
    assert [(r.header, r.value) for r in rows] == \
        [("city", "oslo"), ("pop", "634")]


def test_table_triples_no_header_fallback(spark):
    from ocr_engine_spark.functions.scrub import table_triples
    df = _pages(spark, [
        # all-text: inference must NOT fire; every row is data
        "<table><tr><td>just</td><td>text</td></tr>"
        "<tr><td>more</td><td>words</td></tr></table>",
        # numeric first row: inference must NOT fire either
        "<table><tr><td>1</td><td>2</td></tr>"
        "<tr><td>3</td><td>4</td></tr></table>",
    ])
    rows = table_triples(df).collect()
    assert len(rows) == 8                      # all cells are data
    assert {r.header for r in rows} == {"col0", "col1"}


def test_table_triples_wide_data_row_falls_back(spark):
    from ocr_engine_spark.functions.scrub import table_triples
    df = _pages(spark, [
        "<table><tr><th>A</th></tr>"
        "<tr><td>x</td><td>42</td></tr></table>",
    ])
    rows = {r.col_pos: r for r in table_triples(df).collect()}
    assert rows[0].header == "A"
    assert rows[1].header == "col1" and rows[1].value == "42"


def test_table_triples_single_row_is_data(spark):
    from ocr_engine_spark.functions.scrub import table_triples
    df = _pages(spark, [
        "<table><tr><td>lonely</td><td>9</td></tr></table>",
    ])
    rows = table_triples(df).collect()
    assert [(r.header, r.value) for r in
            sorted(rows, key=lambda r: r.col_pos)] == \
        [("col0", "lonely"), ("col1", "9")]


def test_wilson_bounds_match_reference(spark):
    from ocr_engine_spark.functions.scrub import host_risk_bounds
    from pyspark.sql import functions as F
    import math
    rows = [("a", i, i < 2) for i in range(2)] + \
           [("b", i, True) for i in range(200)] + \
           [("c", i, False) for i in range(50)]
    df = spark.createDataFrame(rows, "source string, i long, bad boolean")
    got = {r.stratum: r for r in
           host_risk_bounds(df, F.col("bad")).collect()}

    def wilson(k, n):
        z = 1.96
        ph = k / n
        c = ph + z * z / (2 * n)
        r = z * math.sqrt((ph * (1 - ph) + z * z / (4 * n)) / n)
        d = 1 + z * z / n
        return (math.floor(max(0.0, (c - r) / d) * 1e6 + 0.5),
                math.floor(min(1.0, (c + r) / d) * 1e6 + 0.5))

    for s, k, n in (("a", 2, 2), ("b", 200, 200), ("c", 0, 50)):
        lo, hi = wilson(k, n)
        assert (got[s].wilson_low_ppm, got[s].wilson_high_ppm) == \
            (lo, hi), s
    # the small-sample trap: both a and b are 100% bad, but only b's
    # LOWER bound is strong evidence
    assert got["a"].rate_ppm == got["b"].rate_ppm == 1_000_000
    assert got["a"].wilson_low_ppm < 400_000
    assert got["b"].wilson_low_ppm > 970_000
    # k=0 stays well-defined (the normal approximation collapses)
    assert got["c"].wilson_low_ppm == 0
    assert 0 < got["c"].wilson_high_ppm < 120_000


def test_url_template_collapse(spark):
    from ocr_engine_spark.functions.scrub import url_template_col
    import pyspark.sql.functions as F
    rows = [
        ("https://h/cal/2024-3-14",),
        ("https://h/cal/2024-12-1",),          # same template
        ("https://h/p?sid=deadbeef42&x=7#f",),  # hex id + value + frag
        ("https://h/",),
        ("https://h",),                         # empty path -> '/'
    ]
    df = spark.createDataFrame(rows, ["url"])
    got = [r[0] for r in
           df.select(url_template_col(F.col("url"))).collect()]
    assert got == ["/cal/N-N-N", "/cal/N-N-N",
                   "/p?sid=V&x=V", "/", "/"]


def test_url_trap_report_flags_generator(spark):
    from ocr_engine_spark.functions.scrub import url_trap_report
    urls = [(f"https://trap.example/cal/2024-{m}-{d}",)
            for m in range(1, 4) for d in range(1, 5)]   # 12 urls, 1 tpl
    urls += [(f"https://ok.example/post/{i}",) for i in range(3)]
    df = spark.createDataFrame(urls, ["url"])
    rows = {(r["host"], r["template"]): r
            for r in url_trap_report(df, trap_min_urls=8).collect()}
    trap = rows[("trap.example", "/cal/N-N-N")]
    assert trap["n_urls"] == 12 and trap["is_trap"]
    assert trap["share_ppm"] == 1_000_000
    ok = rows[("ok.example", "/post/N")]
    assert ok["n_urls"] == 3 and not ok["is_trap"]


def test_lexicon_scan_word_boundaries(spark):
    from ocr_engine_spark.functions.scrub import lexicon_scan
    rows = [
        (0, "the fast dog ran fast past a fastball"),   # 2 hits, not 3
        (1, "nothing listed here"),
        (2, "Slow... very SLOW, slowly"),               # 2 (case, punct)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lex = {"hype": ["fast"], "latency": ["slow"]}
    got = {r["doc_id"]: r for r in lexicon_scan(df, lex).collect()}
    assert got[0]["hype_hits"] == 2 and got[0]["latency_hits"] == 0
    assert got[0]["dropped"]
    assert got[1]["total_hits"] == 0 and not got[1]["dropped"]
    assert got[2]["latency_hits"] == 2   # 'slowly' must NOT match
    assert got[2]["hit_ppm"] == (2 * 1_000_000) // 4


def test_luhn_card_detection(spark):
    from ocr_engine_spark.functions.scrub import luhn_card_report
    rows = [
        (0, "pay with 4111 1111 1111 1111 now"),      # valid Visa test
        (1, "bad card 4111-1111-1111-1112"),          # checksum broken
        (2, "call 555-123-4567 or 555 987 6543"),     # too short
        (3, "amex 3782 822463 10005 works"),          # valid 15-digit
        (4, "plain text"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_candidates"], r["n_valid"])
           for r in luhn_card_report(df).collect()}
    assert got[0] == (1, 1)
    assert got[1] == (1, 0)
    assert got[2] == (0, 0)
    assert got[3] == (1, 1)
    assert got[4] == (0, 0)


def test_benford_report_planted_distributions(spark):
    import math

    from ocr_engine_spark.functions.scrub import benford_report
    # corpus A: Benford-ish powers (1, 1.xx growth) vs corpus B:
    # uniform fabricated leads
    rows_a = [(0, " ".join(str(int(100 * (1.17 ** i)))
                           for i in range(60)))]
    df_a = spark.createDataFrame(rows_a, "doc_id long, text string")
    got = {r.digit: r for r in benford_report(df_a).collect()}
    assert set(got) == set(range(1, 10))
    assert sum(r.n for r in got.values()) == 60
    # digit 1 dominates a geometric series (Benford's mechanism)
    assert got[1].share_ppm > got[9].share_ppm
    assert got[1].benford_ppm == int(
        math.floor(math.log10(2) * 1e6 + 0.5))
    # uniform leads: every digit off its Benford share in a known
    # direction (1 under, 9 over)
    uni = [(1, " ".join(f"{d}00" for d in range(1, 10)) * 10)]
    df_u = spark.createDataFrame(uni, "doc_id long, text string")
    gu = {r.digit: r for r in benford_report(df_u).collect()}
    assert gu[1].dev_ppm < 0 < gu[9].dev_ppm
    # word-embedded digit runs never count; short numbers don't either
    none = spark.createDataFrame([(2, "ab123cd 42 7 x99")],
                                 "doc_id long, text string")
    gn = benford_report(none).collect()
    assert all(r.n == 0 and r.share_ppm == 0 for r in gn)
