r"""The printable-ASCII PORTABILITY GATE, defined exactly once.

Extracted attribute/text values flow into oracle comparisons where the
DuckDB side sees the payload through a blob ``\xNN`` escape projection.
The gate makes both engines agree byte-for-byte on which values
survive:

* a raw high byte is a Latin-1 char on the Spark side (fails
  printable-ASCII) and a ``\xNN`` escape on the DuckDB side (fails the
  no-backslash test);
* a raw backslash fails on both;
* pure printable-ASCII values — i.e. every standards-valid URL
  reference / attribute token — pass identically on both.

WHY the negated-class form and not ``^[ -~]*$``: in Java regex ``$``
matches BEFORE a final line terminator, and Java's line-terminator set
includes U+0085 (NEL — the ISO-8859-1 decode of byte 0x85), U+2028 and
U+2029 as well as ``\n``/``\r`` — so ``href.rlike(r"^[ -~]*$")``
accepts any value ENDING in one of those, while DuckDB's RE2 ``$``
(end-of-text only) rejects it.  ``rlike(r"[^ -~]")`` is a substring
match with no anchors, so the two engines agree on every input.
(Found by hypothesis: payload ``b"<a href=" + b"\x85"`` — pinned in
tests/test_linkgraph.py.)

Every Spark-side consumer uses :func:`is_portable_ascii` /
:func:`portable_or_null`; every DuckDB oracle twin uses
:data:`SQL_GATE` (or inlines the identical
``NOT regexp_matches(c, '[^ -~]') AND c NOT LIKE '%'||chr(92)||'%'``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: matches any char OUTSIDE printable ASCII (0x20..0x7E). Identical
#: semantics in Java regex and RE2 — no anchors, no line-terminator
#: special cases.
NON_PORTABLE_RE = r"[^ -~]"


def is_portable_ascii(col: Column) -> Column:
    """True iff ``col`` is printable-ASCII with no backslash (NULL in,
    NULL out). The Spark half of the portability gate."""
    return ~col.rlike(NON_PORTABLE_RE) & ~col.contains("\\")


def portable_or_null(col: Column) -> Column:
    """``col`` when it passes the gate, else NULL — the common
    "keep the value only if oracle-portable" projection shape."""
    return F.when(is_portable_ascii(col), col)


#: DuckDB twin of :func:`is_portable_ascii`; format with ``c=<expr>``.
SQL_GATE = ("(NOT regexp_matches({c}, '[^ -~]') "
            "AND {c} NOT LIKE '%' || chr(92) || '%')")


def sql_portable_gate(expr: str) -> str:
    """DuckDB SQL predicate equivalent to :func:`is_portable_ascii`
    applied to ``expr`` (an SQL expression string)."""
    return SQL_GATE.format(c=expr)
