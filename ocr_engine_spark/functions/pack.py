"""Sequence packing: tokenize documents and pack them, in stable doc
order with EOD separators, into fixed-length training sequences — the
reshape every LLM pre-training pipeline runs between "clean corpus" and
"training batches".

Token ids are deterministic fake-vocab ids (md5 of the BPE pretoken mod
vocab size) so the whole operator — tokenize, offset, slice — is
value-checkable against a DuckDB oracle; swapping in a real tokenizer
changes one expression.

Scale design — the interesting part is the GLOBAL PREFIX SUM of token
counts (every token needs its absolute position in the concatenated
stream):

  * a single ``Window.orderBy(doc_id)`` computes it in ONE partition —
    the classic scale killer. Instead: two-phase prefix sum. Docs are
    grouped into fixed-width id buckets (deterministic — no sampled
    range boundaries); per-bucket token totals (<= n_docs/bucket_size
    rows) come to the driver once, their running sum is broadcast back,
    and the per-doc offset is bucket_offset + a WITHIN-bucket window
    (bounded by bucket_size rows per partition). Same shape as
    distributed scan/prefix algorithms.
  * the only full-data shuffles are the within-bucket window and the
    groupBy(seq_id) reassembly — both inherent to the reshape.
  * the ragged tail (final incomplete sequence) is dropped, the
    standard packing convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ocr_engine_spark.functions.text import BPE_PATTERN, md5_int60_col

EOD_ID = 50256
VOCAB_SIZE = 50000


def token_ids_col(c, vocab_size: int = VOCAB_SIZE):
    """Deterministic fake-vocab ids of the BPE pretokens + trailing EOD
    (portable: DuckDB computes identical ids from the same pattern)."""
    toks = F.regexp_extract_all(c, F.lit(BPE_PATTERN), 0)
    ids = F.transform(toks,
                      lambda t: F.pmod(md5_int60_col(t),
                                       F.lit(vocab_size)))
    return F.concat(ids, F.array(F.lit(EOD_ID).cast("long")))


def pack_sequences(df: DataFrame, seq_len: int, *, id_col: str = "doc_id",
                   text_col: str = "text",
                   bucket_size: int = 64) -> DataFrame:
    """(seq_id, tokens: array<long> of exactly seq_len) — documents
    concatenated in ``id_col`` order with EOD separators, sliced into
    fixed-length sequences; the incomplete tail is dropped."""
    spark = df.sparkSession
    # persisted: phase 1 materializes the full tokenize for the bucket
    # totals and phase 2 reuses it — without the persist the dominant
    # map-side cost (regex + per-token md5) would run twice. Released
    # by ContextCleaner once the returned plan is GC'd.
    d = (df.select(F.col(id_col).alias("__id"),
                   token_ids_col(F.col(text_col)).alias("__ids"))
         .withColumn("__n", F.size("__ids"))
         .withColumn("__bkt", (F.col("__id") / bucket_size).cast("long"))
         .persist())
    # phase 1: per-bucket totals -> driver running sum -> broadcast
    # JOIN (never plan literals: the offset table has n_docs/bucket_size
    # rows). Size bucket_size ~ sqrt(n_docs) so BOTH legs stay bounded
    # (10^12 docs, bucket_size 10^6 -> 10^6 offset rows to the driver
    # and 10^6-row window partitions).
    totals = (d.groupBy("__bkt").agg(F.sum("__n").alias("__t"))
              .orderBy("__bkt").collect())
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__bkt"], acc))
        acc += r["__t"]
    off_df = spark.createDataFrame(offsets, ["__bkt", "__bkt_off"])
    # phase 2: within-bucket prefix (partition bounded by bucket_size)
    w = (Window.partitionBy("__bkt").orderBy("__id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = (d.join(F.broadcast(off_df), "__bkt")
         .withColumn("__start",
                     F.col("__bkt_off") + F.sum("__n").over(w)
                     - F.col("__n")))
    ex = d.select("__start", F.posexplode("__ids").alias("__pos", "__tid"))
    # integer `div`, not `/`: at 10^12-token scale a double division
    # loses exactness past 2^53
    ex = (ex.withColumn("__gpos", F.col("__start") + F.col("__pos"))
          .select(F.expr(f"__gpos div {int(seq_len)}").alias("seq_id"),
                  F.pmod("__gpos", F.lit(seq_len)).alias("__slot"),
                  F.col("__tid")))
    return (ex.groupBy("seq_id")
            .agg(F.count("*").alias("__n_slots"),
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__slot"), F.col("__tid")))),
                     lambda s: s["__tid"]).alias("tokens"))
            .filter(F.col("__n_slots") == seq_len)
            .select("seq_id", "tokens"))
