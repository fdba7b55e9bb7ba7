"""Document chunking — fixed-size sliding token windows with stride,
the retrieval/embedding prep step (RAG indexing, context-window
packing for encoders) every document corpus runs before embedding.

Semantics: tokens are the corpus-standard lowercase alphanumeric words
(decontam.word_tokens_col — one tokenizer definition repo-wide);
chunk ``k`` covers token positions ``[1 + k*stride, 1 + k*stride +
chunk_tokens)`` (1-based), emitted while the start position is within
the document, so the tail chunk may be short and every token belongs
to >= 1 chunk. ``stride < chunk_tokens`` gives overlapping windows
(the usual retrieval setting); ``stride == chunk_tokens`` partitions.

Scale shape: one projection (tokenize, materialized — HOFs never
codegen) + one explode. No shuffle, no UDF: chunk construction is
``transform(sequence(...))`` over the token array, entirely JVM-side,
and Catalyst pipelines it into the scan stage. At 100 TB this is a
map-only pass whose output partitioning inherits the input's.

Reference parity: the reference repo chunks nothing (per-request OCR);
this belongs to the training/retrieval-data layer the graft adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_engine_spark.functions.decontam import word_tokens_col


def chunk_documents(df: DataFrame, *, chunk_tokens: int, stride: int,
                    id_col: str = "doc_id", text_col: str = "text"
                    ) -> DataFrame:
    """(id, chunk_id, tok_start, n_tokens, chunk_text) — one row per
    sliding window. ``chunk_id`` is 0-based in window order,
    ``tok_start`` the 1-based token position of the window's first
    token, ``chunk_text`` the space-joined window. Token-less
    documents emit nothing."""
    if stride < 1 or chunk_tokens < 1:
        raise ValueError("chunk_tokens and stride must be >= 1")
    toks = df.select(F.col(id_col),
                     word_tokens_col(F.col(text_col)).alias("__t"))
    n = F.size("__t")
    # starts 1, 1+stride, ... <= n  ->  k in [0, (n-1) div stride]
    n_chunks = F.expr(f"(size(__t) - 1) div {int(stride)}") + 1
    chunks = F.when(n >= 1, F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda k: F.struct(
            k.alias("chunk_id"),
            (k * stride + 1).alias("tok_start"),
            F.slice("__t", k * stride + 1, chunk_tokens).alias("w")))
    ).otherwise(F.array().cast(
        "array<struct<chunk_id:int,tok_start:int,w:array<string>>>"))
    return (toks.select(id_col, F.explode(chunks).alias("__c"))
            .select(id_col,
                    F.col("__c.chunk_id").alias("chunk_id"),
                    F.col("__c.tok_start").alias("tok_start"),
                    F.size("__c.w").alias("n_tokens"),
                    F.array_join("__c.w", " ").alias("chunk_text")))
