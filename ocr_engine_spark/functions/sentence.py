r"""Rule-based sentence segmentation (protect-split-restore).

Sentence boundaries feed chunking (chunk.py), bitext alignment and
per-sentence quality filters; at web scale the segmentation must be a
pure string pipeline — no per-row Python, no model.  The classic
portable recipe (Moses' split-sentences.perl lineage, simplified):

1. PROTECT known abbreviations: ``'Dr. '`` -> ``'Dr.\x02 '`` etc., so
   the boundary rule cannot fire inside them (RE2 has no lookbehind,
   so guards must be literal rewrites, not lookarounds);
2. MARK boundaries: a sentence terminator ``[.!?]`` + space +
   capital letter becomes terminator + ``\x1e`` + capital (the
   boundary survives as one char, never a regex split on the original
   text — consumption chains correctly because the next boundary's
   left context is never inside the previous match);
3. SPLIT on ``\x1e`` and RESTORE the protected abbreviations.

Control chars 0x02/0x1e cannot occur in cleaned text (the clean
pipeline and the portability gate both reject them), which makes the
markers collision-free; the same constants appear verbatim in the
DuckDB oracle twin.

Scale: steps 1-2 are map-side regexp/replace chains inside one
codegen'd Project; the split+posexplode is the only row expansion, no
shuffle until the caller aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: abbreviations whose trailing '. ' is NOT a sentence boundary —
#: deliberately small and fixed (the Moses nonbreaking_prefixes motif);
#: extend per deployment, keeping the oracle list in sync.
ABBREVIATIONS = ("Dr.", "Mr.", "Mrs.", "Ms.", "Prof.", "St.",
                 "e.g.", "i.e.", "etc.", "vs.", "No.", "Fig.")

_PROTECT = "\x02"
_MARK = "\x1e"

#: terminator + space + capital == boundary. ASCII classes only (the
#: portability contract shared with linewrap.py).
BOUNDARY_RE = r"([.!?]) ([A-Z])"


def split_sentences_col(c):
    """Array-of-sentences column for ``c`` (string)."""
    t = c
    for a in ABBREVIATIONS:
        t = F.replace(t, F.lit(a + " "), F.lit(a + _PROTECT + " "))
    t = F.regexp_replace(t, BOUNDARY_RE, "$1" + _MARK + "$2")
    t = F.replace(t, F.lit(_PROTECT), F.lit(""))
    return F.split(t, _MARK)


def sentences(df: DataFrame, *, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """One row per sentence: (id, sent_idx, sentence, n_tokens)."""
    arr = split_sentences_col(F.col(text_col))
    out = df.select(F.col(id_col),
                    F.posexplode(arr).alias("sent_idx", "sentence"))
    return out.select(
        id_col,
        F.col("sent_idx").cast("long").alias("sent_idx"),
        "sentence",
        F.size(F.split(F.col("sentence"), " ")).cast("long")
        .alias("n_tokens"))
