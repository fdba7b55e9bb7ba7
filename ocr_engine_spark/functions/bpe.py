"""Distributed BPE tokenizer training + encoding as DataFrame ops.

Closes the engine's "tokenizer seam" end to end: `pack.pack_sequences`
ships a documented fake vocab (md5 mod N) behind a `tokenizer=` hook;
this module learns a REAL byte-pair-encoding vocabulary from the corpus
with nothing but `pyspark.sql` aggregates + higher-order functions, and
provides the matching encoder to plug into that hook.

Reference analog: the reference repo has no tokenizer (its unit of work
is a page image, `services/surya/surya_service.py`); this is part of the
training-data-pipeline layer the graft brief adds as first-class.

Algorithm (classic BPE, Sennrich et al. 2016, made distributed):
  1. pre-tokenize: lowercase words of ``[0-9a-z]+`` with corpus counts —
     ONE shuffle; every later step runs on the distinct-WORD table,
     which is orders of magnitude smaller than the corpus (Heaps' law),
     so 100 TB of text trains over a ~1e8-row side table.
  2. per merge round: count adjacent symbol pairs weighted by word
     count (explode + map-side-combinable sum), pick the argmax pair
     with a deterministic (count DESC, p1, p2) tie-break — a ONE-ROW
     driver read, same discipline as the IVF centroid seed — then
     rewrite every word's symbol array with one JVM `aggregate` fold
     (greedy left-to-right, the BPE contract). `localCheckpoint` per
     round truncates the iterative lineage (same pattern as
     functions/cluster.py); without it round k replans rounds 1..k-1.
  3. encoding applies the learned merges IN RANK ORDER to the distinct
     words of the input, then joins tokens back to documents — encode
     cost scales with |vocab(input)|, not corpus size.

Greedy fold correctness: after the fold merges (p1,p2) into p1||p2, the
new tail can never equal p1 again (p1||p2 = p1 would need p2 = ''), so a
left fold with a "merge with tail" rule is exactly regex-style greedy
non-overlapping replacement — the oracle replays the same semantics in
SQL with window functions (islands + parity for the p1=p2 run case).
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

_SYMBOL_OK = re.compile(r"^[0-9a-z]+$")

# words -> single-char symbol arrays; ASCII-only by the pre-tokenizer,
# so substr() char positions == byte positions in both engines
_CHARS_EXPR = "transform(sequence(1, length(word)), i -> substr(word, i, 1))"


def word_table(df: DataFrame, *, text_col: str = "text",
               max_word_len: int = 64) -> DataFrame:
    """(word, wcount, syms) — the distinct-word side table BPE trains on.

    The ``[0-9a-z]+`` pre-tokenizer is deliberately ASCII-only: it keeps
    char-position semantics identical across Spark (UTF-16 substr) and
    any byte-oriented replayer, and makes every learned symbol safe to
    inline as a SQL literal.
    """
    return (df
            .select(F.explode(F.split(F.lower(F.col(text_col)),
                                      "[^0-9a-z]+")).alias("word"))
            .where((F.col("word") != "")
                   & (F.length("word") <= max_word_len))
            .groupBy("word")
            .agg(F.count("*").alias("wcount"))
            .withColumn("syms", F.expr(_CHARS_EXPR)))


def _pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word count. Map-side combinable:
    the explode feeds a partial-aggregating groupBy, so hot pairs ('th',
    'in') arrive at the reducer pre-summed per partition."""
    pair = ("explode(transform(sequence(1, size(syms) - 1), "
            "i -> struct(element_at(syms, i) AS p1, "
            "element_at(syms, i + 1) AS p2)))")
    return (words
            .where(F.size("syms") >= 2)
            .select("wcount", F.expr(pair).alias("p"))
            .groupBy(F.col("p.p1").alias("p1"), F.col("p.p2").alias("p2"))
            .agg(F.sum("wcount").alias("cnt")))


def merge_fold_expr(p1: str, p2: str, syms_col: str = "syms") -> str:
    """SQL expression rewriting ``syms`` with one greedy (p1,p2) merge.

    Literal inlining is safe: symbols are ``[0-9a-z]+`` by construction
    (asserted), so no quoting/escape surface exists.
    """
    if not (_SYMBOL_OK.match(p1) and _SYMBOL_OK.match(p2)):
        raise ValueError(f"non-alnum BPE symbol: {(p1, p2)!r}")
    merged = p1 + p2
    return (
        f"aggregate({syms_col}, CAST(array() AS array<string>), "
        f"(acc, s) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = '{p1}' AND s = '{p2}' "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array('{merged}')) "
        f"ELSE concat(acc, array(s)) END)"
    )


def train_bpe(df: DataFrame, n_merges: int, *, text_col: str = "text",
              min_pair_count: int = 1,
              max_word_len: int = 64) -> list[dict]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns ``[{rank, p1, p2, merged, pair_count}, ...]`` in merge order
    (rank 1-based). Stops early when no adjacent pair reaches
    ``min_pair_count``. Each round is one bounded Spark job over the
    distinct-word table + a one-row driver read of the argmax
    (allowlisted driver access, tests/test_no_driver_loops.py).
    """
    words = word_table(df, text_col=text_col,
                       max_word_len=max_word_len).localCheckpoint()
    merges: list[dict] = []
    for rank in range(1, n_merges + 1):
        best = (_pair_counts(words)
                .orderBy(F.desc("cnt"), F.asc("p1"), F.asc("p2"))
                .first())  # 1-row argmax read, IVF-seed discipline
        if best is None or best["cnt"] < min_pair_count:
            break
        merges.append({"rank": rank, "p1": best["p1"], "p2": best["p2"],
                       "merged": best["p1"] + best["p2"],
                       "pair_count": int(best["cnt"])})
        # lazy checkpoint: the fold materializes inside the NEXT round's
        # argmax job instead of a dedicated one — still truncates the
        # iterative lineage, but runs 12 rounds as 13 jobs, not 25
        # (measured 3.6x on the fixture corpus, identical merges)
        words = (words
                 .withColumn("syms",
                             F.expr(merge_fold_expr(best["p1"], best["p2"])))
                 .localCheckpoint(eager=False))
    return merges


def encode_words(words: DataFrame, merges: list[dict],
                 *, checkpoint_every: int = 8) -> DataFrame:
    """Apply learned merges in rank order to a (word, syms) table.

    Chained fold projections; ``localCheckpoint`` every few merges keeps
    the plan depth bounded (HOF folds never codegen, and k stacked
    lambdas otherwise re-analyze the whole chain per round).
    """
    out = words
    for i, m in enumerate(sorted(merges, key=lambda m: m["rank"]), 1):
        out = out.withColumn("syms", F.expr(merge_fold_expr(m["p1"],
                                                            m["p2"])))
        if i % checkpoint_every == 0:
            out = out.localCheckpoint()
    return out


def encode_bpe(df: DataFrame, merges: list[dict], *,
               id_col: str = "doc_id", text_col: str = "text",
               out_col: str = "tokens",
               max_word_len: int = 64) -> DataFrame:
    """Tokenize documents with a learned merge list.

    Scale shape: merges run over the DISTINCT words of the input (the
    expensive fold never touches the corpus), then a broadcast-eligible
    join maps each document's word sequence to token arrays — encode
    cost is O(|distinct words| x n_merges) + one join, not
    O(corpus x n_merges).
    """
    doc_words = (df
                 .select(id_col,
                         F.posexplode(F.split(F.lower(F.col(text_col)),
                                              "[^0-9a-z]+"))
                         .alias("pos", "word"))
                 .where((F.col("word") != "")
                        & (F.length("word") <= max_word_len)))
    vocab = encode_words(
        doc_words.select("word").distinct()
        .withColumn("syms", F.expr(_CHARS_EXPR)),
        merges)
    # no forced broadcast hint: the distinct-word table is Heaps-law
    # small relative to the corpus but NOT driver-small at 100 TB
    # (~1e8 rows would blow the 8 GB broadcast limit) — AQE broadcasts
    # it automatically whenever it actually fits
    return (doc_words
            .join(vocab, "word")
            .groupBy(id_col)
            .agg(F.flatten(F.array_sort(
                F.collect_list(F.struct("pos", "syms"))).getField("syms"))
                .alias(out_col)))
