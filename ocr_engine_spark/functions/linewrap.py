r"""Line-wrap and hyphenation repair for extracted text.

PDF layout analysis (and fixed-width plain-text crawls) emit HARD line
breaks inside paragraphs, and words split across lines with a trailing
hyphen (``exam-\nple``).  Downstream tokenizers then see ``exam-`` and
``ple`` as two garbage tokens, so every serious extraction pipeline
carries a reflow + de-hyphenation pass (pdfminer's LTTextLine merge,
trafilatura's ``--no-comments`` reflow, the Grobid/CERMINE
de-hyphenation step).  Reference analog: the reference's OCR
post-processing normalizes whitespace after extraction
(test/ocr_postprocessing.py — the clean pipeline this repo reproduces
in kernels/clean.py); this module is the layout-level repair that runs
BEFORE that clean pass at Common-Crawl scale.

Everything here is pure Catalyst ``regexp_replace`` / string
expressions — zero UDFs, zero shuffles: the repair is embarrassingly
parallel per document, exactly what you want in the hot path of a
10^12-row extraction job.

Portability contract (Spark ``rlike``/``regexp_replace`` is Java
regex, the DuckDB oracle twin is RE2):

* no lookaround (RE2 has none) — repairs consume their left context,
  so the pass has documented ONE-PASS semantics: two wrap sites that
  share a boundary character (consecutive one-word lines) need a
  second application.  Real reflow sites are words apart, and the
  oracle injections keep that invariant.
* character classes are explicit ASCII ranges (``[A-Za-z]``), never
  ``\w``-with-flags, so both engines agree on every byte.
* replacements are written ``$1``-style on the Spark side and
  ``\1``-style in the oracle; non-overlapping left-to-right scan
  semantics are identical in Java regex and RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# A hyphenated line break: word fragment, '-', newline, then a
# LOWERCASE continuation (an uppercase continuation is almost always a
# real compound split across a line, e.g. "Wi-\nFi", and merging those
# is the classic over-eager-dehyphenation bug).
HYPHEN_BREAK_RE = r"([A-Za-z]{2,})-\n([a-z]{2,})"

# A soft wrap: line ends in a letter or clause punctuation, next line
# starts lowercase — a mid-sentence break, not a paragraph boundary
# (paragraphs are "\n\n" and survive because the second "\n" never
# starts a lowercase letter).
SOFT_WRAP_RE = r"([A-Za-z,;])\n([a-z])"


def dehyphenate_col(c: Column) -> Column:
    r"""Merge hyphenated line breaks: ``exam-\nple`` -> ``example``.

    Unconditional local rule (the trafilatura default): any
    ``letter-\nlowercase`` site merges.  For the vocabulary-confirmed
    variant (merge only when the joined word is attested elsewhere in
    the document) see :func:`dehyphenation_report`.
    """
    return F.regexp_replace(c, HYPHEN_BREAK_RE, r"$1$2")


def unwrap_lines_col(c: Column) -> Column:
    r"""Reflow soft line wraps: a ``\n`` between a clause character and
    a lowercase letter becomes a space; ``\n\n`` paragraph breaks and
    sentence-initial capitals are preserved.  One-pass semantics (see
    module docstring)."""
    return F.regexp_replace(c, SOFT_WRAP_RE, r"$1 $2")


def repair_wraps_col(c: Column) -> Column:
    """The standard composition: de-hyphenate FIRST (so a merged word
    never swallows the soft-wrap boundary), then reflow."""
    return unwrap_lines_col(dehyphenate_col(c))


def dehyphenation_report(df: DataFrame, *, text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    r"""Per-site de-hyphenation decisions with in-document vocabulary
    confirmation — one row per ``word-\nword`` site.

    ``confirmed`` is true iff the merged word occurs ELSEWHERE in the
    same document as a standalone whitespace-delimited token (the
    hyphenated site itself can never match: after newline->space
    normalization it reads ``left- right``, not ``leftright``).  This
    is the dictionary-free confirmation rule used by layout repairers
    when no lexicon is shipped: a 10^12-document job cannot broadcast
    a per-language dictionary for every language it meets, but the
    document itself is a fine witness.

    Membership is a substring ``instr`` probe on the same row — the
    whole operator is one zero-shuffle Project + posexplode before the
    presentation sort.  Token contract: whitespace-delimited (the
    documents fixture is space-separated words; punctuation-adjacent
    attestations are out of scope and documented here).
    """
    t = F.col(text_col)
    sites = F.expr(
        f"regexp_extract_all({text_col}, '{HYPHEN_BREAK_RE}', 0)")
    # newline -> space, pad ends so every token has space delimiters
    norm = F.concat(F.lit(" "),
                    F.regexp_replace(t, r"\n", " "),
                    F.lit(" "))
    ex = df.select(
        F.col(id_col),
        norm.alias("__norm"),
        F.posexplode_outer(sites).alias("site_idx", "__m"),
    ).filter(F.col("__m").isNotNull())
    left = F.substring_index(F.col("__m"), "-", 1)
    right = F.substring_index(F.col("__m"), "\n", -1)
    merged = F.concat(left, right)
    return ex.select(
        F.col(id_col),
        F.col("site_idx").cast("long").alias("site_idx"),
        left.alias("left"),
        right.alias("right"),
        merged.alias("merged"),
        (F.instr(F.col("__norm"),
                 F.concat(F.lit(" "), merged, F.lit(" "))) > 0
         ).alias("confirmed"),
    )
