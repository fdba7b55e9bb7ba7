"""Markdown-skeleton renderer: Catalyst twin == pure-Python twin."""

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, LongType, StringType, StructField,
                               StructType)

from ocr_engine_spark.functions.markdown import markdown_col
from ocr_engine_spark.kernels.markdown import KIND_PREFIX, render_markdown

SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
    StructField("spans", ArrayType(StructType([
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("block_id", LongType()),
        StructField("kind", StringType()),
    ]))),
])


def _spans(*triples):
    return [{"start": s, "end": e, "block_id": i, "kind": k}
            for i, (s, e, k) in enumerate(triples)]


CASES = [
    (0, "Title\nbody text here\nitem one",
     _spans((0, 5, "heading"), (6, 20, "para"), (21, 29, "list"))),
    (1, "no spans at all", _spans()),
    (2, None, _spans()),                                   # error row
    (3, "unicode é世界 block\nplain",
     _spans((0, 22, "heading"), (23, 28, "other"))),
    (4, "tbl", _spans((0, 3, "table"))),                   # unmapped kind
    (5, "overlap overlap", _spans((0, 7, "para"), (0, 15, "list"))),
]


def test_markdown_twins_agree(spark):
    df = spark.createDataFrame([(i, t, sp) for i, t, sp in CASES], SCHEMA)
    got = {r.doc_id: r.md for r in df.select(
        "doc_id", markdown_col(F.col("text"), F.col("spans")).alias("md")
    ).collect()}
    for i, text, spans in CASES:
        assert got[i] == render_markdown(text, spans), f"doc {i}"
    # spot-check the mapping itself, not just twin agreement
    assert got[0] == "## Title\n\nbody text here\n\n- item one"
    assert got[1] == ""
    assert got[2] is None
    assert got[4] == "tbl"


def test_kind_prefix_covers_known_kinds():
    """Every kind either maps to a documented prefix or intentionally
    renders plain; a new kernel kind must be triaged here."""
    known = {"heading", "para", "list", "table", "other", "page"}
    assert set(KIND_PREFIX) <= known
    assert KIND_PREFIX["heading"] == "## "
    assert KIND_PREFIX["list"] == "- "
