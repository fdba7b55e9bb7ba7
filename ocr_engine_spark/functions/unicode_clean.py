r"""Unicode hygiene for crawled text: NFC normalization and
double-encoded-UTF-8 (mojibake) repair — the ftfy-family cleanup every
web corpus needs between extraction and dedup/tokenization (mixed
crawl encodings split identical strings into distinct fingerprints and
inflate tokenizer vocabularies).

Two operators, deliberately different execution tiers:

  * ``repair_double_utf8_col`` — pure JVM expressions (encode /
    is_valid_utf8 / decode inside a lazily-evaluated CASE), codegen'd,
    zero Python. The classic mojibake is text whose UTF-8 bytes were
    mis-decoded as Latin-1 and re-encoded ("Café" -> "CafÃ©"); the
    repair is the inverse roundtrip, applied only when it is provably
    safe (see below).
  * ``nfc_col`` — Unicode NFC composition. Spark has NO built-in
    normalizer (probed: only is_valid_utf8/make_valid_utf8 exist), so
    this is the sanctioned Arrow-batched pandas-UDF seam — one
    ArrowEvalPython stage, never per-row Python. The DuckDB twin is
    ``nfc_normalize`` (value-agreement spot-checked across composed,
    decomposed, compatibility and multi-mark inputs).

Repair safety: the roundtrip fires only when BOTH
  1. every char is <= U+00FF (the string could have come from a
     Latin-1 mis-decode at all — also what makes ``encode`` safe,
     Spark 4 raises MALFORMED_CHARACTER_CODING on unmappable chars;
     the nested CASE guarantees the encode never sees others), and
  2. the Latin-1 bytes form valid UTF-8 (``is_valid_utf8``).
Genuine Latin-1-range text ("café") fails (2) — 0xE9 is no UTF-8 lead
byte — and survives untouched; pure ASCII passes both but the repair
is the identity there. False positives require genuine text whose
codepoints spell byte-valid UTF-8 multi-byte sequences — the same
residual ambiguity ftfy documents; callers get a ``was_repaired``
flag (``with_unicode_clean``) to audit.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import is_valid_utf8

#: chars <= U+00FF — the precondition for a Latin-1 roundtrip
_LATIN1_RE = "^[\\x00-\\xff]*$"


def repair_double_utf8_col(c: Column) -> Column:
    """Repaired text: ``decode(encode(c, latin-1), utf-8)`` when the
    double-encoding signature holds (see module docstring), else ``c``
    unchanged. All JVM builtins; the outer CASE keeps ``encode`` away
    from non-Latin-1 strings (branch evaluation is lazy, unlike AND,
    whose operand order Spark may rearrange)."""
    b = F.encode(c, "ISO-8859-1")
    return (F.when(~c.rlike(_LATIN1_RE), c)
            .otherwise(F.when(is_valid_utf8(b), F.decode(b, "UTF-8"))
                       .otherwise(c)))


def nfc_col(c: Column) -> Column:
    """NFC-composed text (Arrow-batched pandas UDF — no Spark builtin
    exists; DuckDB oracle twin: ``nfc_normalize``)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _nfc(s: pd.Series) -> pd.Series:
        import unicodedata
        return s.map(lambda x: None if x is None
                     else unicodedata.normalize("NFC", x))

    return _nfc(c)


def with_unicode_clean(df: DataFrame, *, text_col: str = "text",
                       out_col: str = "clean_unicode",
                       nfc: bool = True) -> DataFrame:
    """``out_col`` = NFC(repair(text)) plus a ``was_repaired`` audit
    flag (repair first: mojibake bytes are what they are regardless of
    composition; NFC then canonicalizes the restored codepoints).
    ``nfc=False`` skips the Python stage for JVM-only pipelines."""
    repaired = repair_double_utf8_col(F.col(text_col))
    out = repaired if not nfc else nfc_col(repaired)
    return (df.withColumn(out_col, out)
            .withColumn("was_repaired",
                        repaired != F.col(text_col)))
