r"""Regression tests for the shared printable-ASCII portability gate
(functions/portability.py).

Round-3 verdict bug: the old per-site ``rlike(r"^[ -~]*$")`` gate
leaked values ENDING in a Unicode line terminator, because Java regex
``$`` matches BEFORE a final terminator and Java's terminator set
includes U+0085 (the Latin-1 decode of byte 0x85), U+2028 and U+2029.
DuckDB's RE2 ``$`` does not, so Spark/oracle value agreement broke on
adversarial bytes.  The gate is now the anchor-free negated-class form
``~rlike("[^ -~]")`` defined ONCE — these tests pin the falsifying
vectors against the helper itself and against representative consumers
from every family that inlined the old form (linkgraph, scrub
discovery extractors, robots feed discovery).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from ocr_engine_spark.functions.portability import (
    NON_PORTABLE_RE, is_portable_ascii, portable_or_null,
    sql_portable_gate,
)

# byte payloads whose Latin-1 decode ENDS in a Java line terminator —
# each one passed the old gate and fails the fixed one
TERMINATOR_TAIL_BYTES = [
    b"\x85",                 # U+0085 NEL (the round-3 falsifying example)
    b"x\xc2\x85",            # UTF-8 NEL tail (Latin-1: ...Â\x85)
    b"x\xe2\x80\xa8",        # UTF-8 U+2028 LS tail
    b"x\xe2\x80\xa9",        # UTF-8 U+2029 PS tail
    b"clean\n",
    b"clean\r",
]

ADVERSARIAL_STRINGS = [
    "ends-in-nel",
    "ends-in-ls ",
    "ends-in-ps ",
    "ends-in-nl\n",
    "ends-in-cr\r",
    "middle",
    "back\\slash",
]

CLEAN_STRINGS = ["", "a", "http://h/p?q=1&r=2", "~!tilde", " space "]


def test_gate_rejects_trailing_terminators(spark):
    df = spark.createDataFrame([(s,) for s in ADVERSARIAL_STRINGS],
                               "v string")
    kept = df.where(is_portable_ascii(F.col("v"))).count()
    assert kept == 0
    nulls = df.select(portable_or_null(F.col("v")).alias("p")) \
              .where(F.col("p").isNull()).count()
    assert nulls == len(ADVERSARIAL_STRINGS)


def test_gate_keeps_printable_ascii(spark):
    df = spark.createDataFrame([(s,) for s in CLEAN_STRINGS], "v string")
    assert df.where(is_portable_ascii(F.col("v"))).count() \
        == len(CLEAN_STRINGS)


def test_gate_agrees_with_duckdb_twin(spark):
    """Spark gate and the SQL_GATE oracle twin must classify every
    vector identically — the property the old `$` anchor broke."""
    duckdb = pytest.importorskip("duckdb")
    vals = ADVERSARIAL_STRINGS + CLEAN_STRINGS
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got_spark = sorted(r.v for r in
                       df.where(is_portable_ascii(F.col("v"))).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(v VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in vals])
    got_duck = sorted(r[0] for r in con.execute(
        f"SELECT v FROM t WHERE {sql_portable_gate('v')} ORDER BY v"
    ).fetchall())
    assert got_spark == got_duck


def test_no_anchor_in_gate_regex():
    # the regression class: any anchored form reintroduces the Java
    # line-terminator special case
    assert "$" not in NON_PORTABLE_RE and "^" == NON_PORTABLE_RE[1]


def test_extractors_never_emit_nonportable(spark):
    """Every discovery extractor that gates attr values must drop (or
    NULL) values with terminator tails — exercised through real HTML
    payloads built from the round-3 falsifying bytes."""
    from ocr_engine_spark.functions.linkgraph import outlink_records
    from ocr_engine_spark.functions.scrub import (
        hreflang_records, media_links, pagination_links,
    )

    def page(i, body):
        return (f"http://fuzz.example/{i}",
                b"<html><body>" + body + b"</body></html>")

    rows = []
    for i, tail in enumerate(TERMINATOR_TAIL_BYTES):
        rows.append(page(10 * i + 0, b'<a href="/ok' + tail + b'">t</a>'))
        rows.append(page(10 * i + 1, b"<a href=" + tail))
        rows.append(page(
            10 * i + 2,
            b'<link rel="next" href="/n' + tail + b'">'))
        rows.append(page(
            10 * i + 3,
            b'<link rel="alternate" hreflang="en' + tail
            + b'" href="/en">'))
        rows.append(page(
            10 * i + 4,
            b'<video src="/v' + tail + b'.mp4"></video>'))
    # plus one clean control page per extractor family
    rows.append(page(900, b'<a href="/clean">t</a>'
                          b'<link rel="next" href="/next">'
                          b'<link rel="alternate" hreflang="en"'
                          b' href="/en">'
                          b'<video src="/v.mp4"></video>'))
    df = spark.createDataFrame(rows, "url string, html binary")

    def assert_portable(values):
        for v in values:
            if v is None:
                continue
            assert all(0x20 <= ord(c) <= 0x7E for c in v), repr(v)
            assert "\\" not in v

    out = outlink_records(df).collect()
    assert_portable([r.href for r in out])
    assert any(r.href == "/clean" for r in out)

    hl = hreflang_records(df).collect()
    assert_portable([r.hreflang for r in hl])
    assert_portable([r.href for r in hl])
    assert any(r.hreflang == "en" for r in hl)

    pg = pagination_links(df).collect()
    assert_portable([r.rel_next for r in pg])
    assert_portable([r.rel_prev for r in pg])
    assert any(r.rel_next == "/next" for r in pg)

    ml = media_links(df).collect()
    assert_portable([r.src for r in ml])
    assert any(r.src == "/v.mp4" for r in ml)


def test_attr_grammar_factory_boundary_property():
    """All discovery attr grammars come from ONE factory; the leading
    whitespace boundary must reject data-<attr>= lookalikes and accept
    every real declaration form (bare / quoted / spaced)."""
    import re

    from ocr_engine_spark.functions.scrub import (
        _HREF_VAL_RE, _HREFLANG_VAL_RE, _IMG_SRC_RE, _MD_PROP_VAL_RE,
        _PAGINATION_REL_RE, _RDFA_PROP_VAL_RE, _REL_ALTERNATE_RE,
        attr_token_re, attr_val_re,
    )
    assert _HREF_VAL_RE == attr_val_re("href")
    assert _PAGINATION_REL_RE == attr_token_re("rel", r"(next|prev)")
    for pat, attr in [(_HREF_VAL_RE, "href"), (_IMG_SRC_RE, "src"),
                      (_MD_PROP_VAL_RE, "itemprop"),
                      (_RDFA_PROP_VAL_RE, "property"),
                      (_HREFLANG_VAL_RE, "hreflang")]:
        rx = re.compile(pat)
        assert rx.search(f'<link {attr}=/v>'), attr
        assert rx.search(f"<link {attr} = '/v'>"), attr
        assert not rx.search(f'<link data-{attr}=/v>'), attr
    for pat, val in [(_REL_ALTERNATE_RE, "alternate"),
                     (_PAGINATION_REL_RE, "next")]:
        rx = re.compile(pat)
        assert rx.search(f'<link rel="{val}" href=x>')
        assert not rx.search(f'<link data-rel="{val}" href=x>')
