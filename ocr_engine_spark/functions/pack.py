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
    the classic scale killer. Instead: RANGE-PARTITION prefix sum.
    ``repartitionByRange(doc_id)`` gives ordered, bounded partitions
    with NO assumption about id shape (dense serials, 60-bit hashes and
    arbitrary sortable keys all work — a fixed-width id-bucket scheme
    would put ~1 hashed doc per bucket and ship n_docs rows to the
    driver); per-partition token totals (exactly one row per partition,
    keyed by ``spark_partition_id``) come to the driver once, their
    running sum is broadcast back, and the per-doc offset is
    partition_offset + a WITHIN-partition window. Same shape as
    distributed scan/prefix algorithms.
  * the only full-data shuffles are the range partitioning (inherent:
    it IS the global order) and the groupBy(seq_id) reassembly.
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
                   partitions: int | None = None,
                   tokenizer=None) -> DataFrame:
    """(seq_id, tokens: array<long> of exactly seq_len) — documents
    concatenated in ``id_col`` order with EOD separators, sliced into
    fixed-length sequences; the incomplete tail is dropped.

    ``partitions`` sizes the range partitioning (default: the session's
    shuffle parallelism). Phase 1 ships exactly one total per partition
    to the driver, so at 10^12 docs you size it like any other shuffle
    (~10^5 partitions of ~10^7 docs), never by id arithmetic.

    ``tokenizer`` is THE tokenizer seam: a ``Column -> Column`` mapping
    text to ``array<long>`` token ids (default ``token_ids_col``, the
    oracle-checkable fake vocab). A real tokenizer drops in as a
    Pandas-UDF column — or a precomputed id-array column — with the
    same type; the packing math never changes (test_pack swaps in both
    a char-codepoint tokenizer and the repo's own learned distributed
    BPE, functions/bpe.py, end-to-end).
    """
    ex = _packed_slots(df, seq_len, id_col=id_col, text_col=text_col,
                       partitions=partitions, tokenizer=tokenizer)
    return (ex.groupBy("seq_id")
            .agg(F.count("*").alias("__n_slots"),
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__slot"), F.col("__tid")))),
                     lambda s: s["__tid"]).alias("tokens"))
            .filter(F.col("__n_slots") == seq_len)
            .select("seq_id", "tokens"))


def pack_sequences_with_spans(df: DataFrame, seq_len: int, *,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              partitions: int | None = None,
                              tokenizer=None) -> DataFrame:
    """``pack_sequences`` plus per-sequence document boundaries:
    (seq_id, tokens, doc_spans) where ``doc_spans`` is the
    start-ordered ``array<struct<span_start:int, span_end:int,
    doc_id>>`` of ``[span_start, span_end)`` slot ranges each document
    contributed (its trailing EOD separator included in its span) —
    the boundary information packed pre-training needs to build
    block-diagonal attention masks and reset position ids so tokens
    never attend across document boundaries.

    Invariants: spans tile the sequence exactly (sorted, disjoint,
    covering ``[0, seq_len)``); a document crossing a sequence
    boundary contributes one span to EACH sequence it touches.

    Cost over pack_sequences: one extra (seq_id, doc) aggregation pair
    — a per-sequence fold could derive spans from the sorted token
    structs instead, but immutable-array folds rebuild the accumulator
    per element (O(seq_len^2) per sequence); the extra map-side-
    combined aggregation is the scalable shape. The slot explode is
    evaluated per branch, but the dominant tokenize cost is persisted
    in phase 1 and paid once.
    """
    ex = _packed_slots(df, seq_len, id_col=id_col, text_col=text_col,
                       partitions=partitions, tokenizer=tokenizer)
    seqs = (ex.groupBy("seq_id")
            .agg(F.count("*").alias("__n_slots"),
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__slot"), F.col("__tid")))),
                     lambda s: s["__tid"]).alias("tokens"))
            .filter(F.col("__n_slots") == seq_len)
            .select("seq_id", "tokens"))
    spans = (ex.groupBy("seq_id", "__id")
             .agg(F.min("__slot").cast("int").alias("span_start"),
                  (F.max("__slot") + 1).cast("int").alias("span_end"))
             .groupBy("seq_id")
             .agg(F.array_sort(F.collect_list(F.struct(
                 F.col("span_start"), F.col("span_end"),
                 F.col("__id").alias("doc_id")))).alias("doc_spans")))
    # inner join: the ragged-tail sequence (filtered from seqs) drops
    # its spans too
    return seqs.join(spans, "seq_id").select("seq_id", "tokens",
                                             "doc_spans")


def _stream_offsets(df: DataFrame, *, id_col: str, text_col: str,
                    partitions: int | None, tokenizer) -> DataFrame:
    """(``__id``, ``__ids``, ``__n``, ``__start``): every document's
    token ids, token count and exact global stream offset under the
    range-partition prefix-sum engine (phase 1: one total per
    partition to the driver; phase 2: bounded within-partition
    window). The shared substrate of the packers AND the planning
    sweep — extracted so the offset arithmetic exists once."""
    spark = df.sparkSession
    tokenizer = tokenizer or token_ids_col
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # range partitioning = the global sort order, in bounded pieces; the
    # partition id is captured right after so phases 1 and 2 agree on
    # it. persisted: phase 1 materializes the full tokenize for the
    # partition totals and phase 2 reuses it — without the persist the
    # dominant map-side cost (regex + per-token md5) would run twice
    # (and spark_partition_id would be recomputed, which is only safe
    # because range boundaries are deterministic for the same input).
    # Released by ContextCleaner once the returned plan is GC'd.
    d = (df.select(F.col(id_col).alias("__id"),
                   tokenizer(F.col(text_col)).alias("__ids"))
         .repartitionByRange(partitions, "__id")
         .withColumn("__part", F.spark_partition_id())
         .withColumn("__n", F.size("__ids"))
         .persist())
    # phase 1: per-partition totals -> driver running sum -> broadcast
    # JOIN (never plan literals): exactly one row per non-empty
    # partition reaches the driver, regardless of id density.
    totals = (d.groupBy("__part").agg(F.sum("__n").alias("__t"))
              .orderBy("__part").collect())
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__part"], acc))
        acc += r["__t"]
    off_df = spark.createDataFrame(offsets, "__part int, __part_off long")
    # phase 2: within-partition prefix (bounded by the range partition
    # size; range partitions are ordered, so partition_offset + local
    # prefix IS the global prefix)
    w = (Window.partitionBy("__part").orderBy("__id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.join(F.broadcast(off_df), "__part")
            .withColumn("__start",
                        F.col("__part_off") + F.sum("__n").over(w)
                        - F.col("__n")))


def _packed_slots(df: DataFrame, seq_len: int, *, id_col: str,
                  text_col: str, partitions: int | None,
                  tokenizer) -> DataFrame:
    """Shared packing core: (``__id``, seq_id, ``__slot``, ``__tid``)
    — one row per token of the global EOD-joined stream, tagged with
    its sequence, in-sequence slot and source document. Both public
    variants aggregate from here."""
    d2 = _stream_offsets(df, id_col=id_col, text_col=text_col,
                         partitions=partitions, tokenizer=tokenizer)
    ex = d2.select("__id", "__start",
                   F.posexplode("__ids").alias("__pos", "__tid"))
    # integer `div`, not `/`: at 10^12-token scale a double division
    # loses exactness past 2^53
    return (ex.withColumn("__gpos", F.col("__start") + F.col("__pos"))
            .select("__id",
                    F.expr(f"__gpos div {int(seq_len)}").alias("seq_id"),
                    F.pmod("__gpos", F.lit(seq_len)).alias("__slot"),
                    F.col("__tid")))


def packing_sweep(df: DataFrame, seq_lens: list[int], *,
                  id_col: str = "doc_id", text_col: str = "text",
                  partitions: int | None = None,
                  tokenizer=None) -> DataFrame:
    """Context-length planning table: for each candidate ``seq_len``,
    the EXACT projected packing outcome under pack_sequences'
    contract (EOD-joined stream in id order, fixed slices, ragged
    tail dropped) — (seq_len, n_docs, total_tokens, n_seqs,
    tail_waste, n_docs_split, split_ppm). ``n_docs_split`` counts
    documents crossing at least one sequence boundary — the
    attention-mask fragmentation cost that pack_spans then has to
    carry; sweeping L before packing prices the trade instead of
    re-running the packer per candidate.

    ONE offsets pass (the range-partition prefix engine) serves every
    candidate length: per-L results are aggregate conjunctions over
    (start, n) integer arithmetic, unfolded from the 1-row aggregate
    exactly like funnel.filter_funnel's stages. Nothing explodes to
    token granularity. Duplicate candidate lengths are collapsed
    (each yields one per-L alias column; a repeat would make the
    alias ambiguous)."""
    seq_lens = sorted({int(L) for L in seq_lens})
    d = _stream_offsets(df, id_col=id_col, text_col=text_col,
                        partitions=partitions, tokenizer=tokenizer)
    base = d.select("__id", "__n", "__start")
    aggs = [F.count("*").alias("n_docs"),
            F.sum("__n").alias("total")]
    for L in seq_lens:
        L = int(L)
        split = (F.expr(f"__start div {L}")
                 != F.expr(f"(__start + __n - 1) div {L}"))
        aggs.append(F.sum(split.cast("long")).alias(f"__split_{L}"))
    a = base.agg(*aggs)

    def stage(L: int):
        L = int(L)
        return F.struct(
            F.lit(L).alias("seq_len"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("total").cast("long").alias("total_tokens"),
            F.expr(f"total div {L}").alias("n_seqs"),
            F.expr(f"total % {L}").alias("tail_waste"),
            F.col(f"__split_{L}").cast("long").alias("n_docs_split"),
            F.expr(f"(__split_{L} * 1000000) div n_docs")
            .alias("split_ppm"))

    stages = F.array(*[stage(L) for L in seq_lens])
    return (a.select(F.explode(stages).alias("s")).select("s.*"))
