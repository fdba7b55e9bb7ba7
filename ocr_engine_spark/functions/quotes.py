r"""Cross-document shared-span (quote) detection.

Finds maximal word spans shared verbatim between PAIRS of documents —
the "who quotes whom" layer on top of exact-substring dedup: press
syndication detection, citation mining, contamination forensics
("which training doc contains this eval passage, and how much of
it").  Lee et al. 2022's suffix-array machinery answers "is this span
duplicated anywhere"; this operator answers the pairwise, positional
version: (doc_a, doc_b, a_start, b_start, span_length, text).

Algorithm (all relational, DuckDB-replayable):

1. tokenize ``split(text, ' ')``, posexplode to (doc, pos, word);
2. k-gram keys via a codegen'd window ``lead`` chain (the HOF-cliff
   rule from ``dedup_kgrams``: nested array lambdas run interpreted at
   ~20 us/element), hashed md5->int60 so 8 bytes cross the shuffles,
   never the gram string;
3. postings self-join on the gram key with ``doc_a < doc_b`` — the
   classic n-gram anchor step of plagiarism detectors (Broder's
   shingling, COPS/SCAM lineage);
4. HOT-GRAM GUARD before the join: grams occurring in more than
   ``max_docs_per_gram`` documents are dropped (boilerplate — "all
   rights reserved"-class); without it one viral gram makes the
   self-join quadratic at corpus scale.  The guard is the same move
   as LSH band-bucket caps in ``minhash_dedup_pairs``;
5. anchors on the same pair sharing a DIAGONAL (pos_a - pos_b) merge
   into maximal spans with the islands-and-gaps trick: consecutive
   pos_a minus ``row_number`` is constant within a run.  A shared
   span of L words yields exactly L-k+1 consecutive anchors, so
   ``span_tokens = anchors + k - 1``.

Shuffles: gram argcount, postings join, one (pair, diagonal) window,
final sort — every key has bounded cardinality after the guard.
Within-document repeats produce one span per diagonal, which is the
honest answer (each copy in A matches each copy in B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _gram_key(k: int, wnd) -> F.Column:
    """md5-int60 of the space-joined k-gram starting at this position
    (null past the document tail — concat_ws skips nulls, so the last
    lead gates explicitly)."""
    parts = [F.col("__w")] + [F.lead("__w", j).over(wnd)
                              for j in range(1, k - 1)]
    last = F.lead("__w", k - 1).over(wnd)
    gram = F.concat_ws(" ", *parts, last)
    key = F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
    return F.when(last.isNotNull(), key)


def quote_spans(df: DataFrame, *, k: int = 5,
                min_tokens: int | None = None,
                max_docs_per_gram: int = 50,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Maximal shared word spans between document pairs.

    Returns (doc_a, doc_b, a_start, b_start, n_tokens, quote) sorted
    for presentation; ``quote`` is sliced from doc_a's token array.
    ``min_tokens`` (default k) filters short spans after merging.
    """
    min_tokens = k if min_tokens is None else min_tokens
    toks = df.select(F.col(id_col).alias("__id"),
                     F.split(F.col(text_col), " ").alias("__t"))
    pos = toks.select("__id", F.posexplode("__t").alias("__p", "__w"))
    wnd = Window.partitionBy("__id").orderBy("__p")
    grams = (pos.select("__id", "__p",
                        _gram_key(k, wnd).alias("__g"))
             .filter(F.col("__g").isNotNull()))
    # hot-gram guard: distinct-doc count per gram, map-side combined
    ok = (grams.groupBy("__g")
          .agg(F.count_distinct("__id").alias("__nd"))
          .filter((F.col("__nd") > 1)
                  & (F.col("__nd") <= max_docs_per_gram))
          .select("__g"))
    posting = grams.join(ok, "__g")
    a = posting.select(F.col("__g"), F.col("__id").alias("doc_a"),
                       F.col("__p").alias("__pa"))
    b = posting.select(F.col("__g"), F.col("__id").alias("doc_b"),
                       F.col("__p").alias("__pb"))
    anchors = (a.join(b, "__g")
               .filter(F.col("doc_a") < F.col("doc_b"))
               .select("doc_a", "doc_b", "__pa", "__pb")
               .distinct())
    diag = (F.col("__pa") - F.col("__pb")).alias("__d")
    runw = Window.partitionBy("doc_a", "doc_b", "__d").orderBy("__pa")
    runs = (anchors.select("doc_a", "doc_b", "__pa", "__pb", diag)
            .withColumn("__isl",
                        F.col("__pa") - F.row_number().over(runw)))
    spans = (runs.groupBy("doc_a", "doc_b", "__d", "__isl")
             .agg(F.min("__pa").alias("a_start"),
                  F.min("__pb").alias("b_start"),
                  (F.max("__pa") - F.min("__pa") + k)
                  .cast("long").alias("n_tokens"))
             .filter(F.col("n_tokens") >= min_tokens))
    qa = toks.select(F.col("__id").alias("doc_a"),
                     F.col("__t").alias("__ta"))
    return (spans.join(qa, "doc_a")
            .select("doc_a", "doc_b",
                    F.col("a_start").cast("long").alias("a_start"),
                    F.col("b_start").cast("long").alias("b_start"),
                    "n_tokens",
                    F.array_join(
                        F.slice(F.col("__ta"),
                                F.col("a_start") + 1,
                                F.col("n_tokens")), " ").alias("quote")))
