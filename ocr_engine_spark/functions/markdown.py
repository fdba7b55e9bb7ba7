"""Catalyst Markdown-skeleton renderer over extraction spans.

Distributed twin of ``kernels.markdown.render_markdown`` (the mapping
table KIND_PREFIX / BLOCK_SEP is imported from there — one source of
truth). Pure Catalyst expressions: a ``transform`` over the spans
array slicing the already-extracted text by (start, end) and prefixing
by kind, then ``array_join`` — no Python on the hot path, no re-parse
of the payload. The HOF lambda only references cheap inputs (the text
column ref and the span struct fields), so the wer_col PERF-TRAP
(re-evaluated expensive subtrees inside HOFs) does not apply.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ocr_engine_spark.kernels.markdown import BLOCK_SEP, KIND_PREFIX


def markdown_col(text: Column, spans: Column) -> Column:
    """Markdown skeleton of one document: spans sliced out of ``text``
    (1-based substr; span offsets are 0-based code-point offsets, and
    both Spark's UTF8String and Python index by code points, so the
    kernel-written offsets are directly usable), prefixed per
    KIND_PREFIX, joined by BLOCK_SEP. Null text (error rows) -> null.
    """
    def render(s: Column) -> Column:
        piece = text.substr((s["start"] + 1).cast("int"),
                            (s["end"] - s["start"]).cast("int"))
        prefix = F.lit("")
        for kind, pre in KIND_PREFIX.items():
            prefix = F.when(s["kind"] == kind, F.lit(pre)).otherwise(prefix)
        return F.concat(prefix, piece)

    return (F.when(text.isNull(), F.lit(None).cast("string"))
             .otherwise(F.array_join(F.transform(spans, render),
                                     BLOCK_SEP)))
