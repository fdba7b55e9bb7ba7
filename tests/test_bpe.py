"""Distributed BPE trainer/encoder vs a pure-Python reference.

The reference implements textbook BPE (Sennrich et al. 2016) directly:
word counts, adjacent-pair counts, argmax with (count DESC, pair ASC)
tie-break, greedy left-to-right merge application. The Spark side must
reproduce it merge-for-merge and token-for-token.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from ocr_engine_spark.functions.bpe import (
    encode_bpe, merge_fold_expr, train_bpe, word_table,
)

MAXLEN = 64


def _words(texts):
    c = Counter()
    for t in texts:
        for w in re.split(r"[^0-9a-z]+", t.lower()):
            if w and len(w) <= MAXLEN:
                c[w] += 1
    return c


def _apply(syms, p1, p2):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == p1 and syms[i + 1] == p2:
            out.append(p1 + p2)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_train(texts, k):
    words = _words(texts)
    vocab = {w: list(w) for w in words}
    merges = []
    for rank in range(1, k + 1):
        pc = Counter()
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += words[w]
        if not pc:
            break
        (p1, p2), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append({"rank": rank, "p1": p1, "p2": p2,
                       "merged": p1 + p2, "pair_count": cnt})
        vocab = {w: _apply(s, p1, p2) for w, s in vocab.items()}
    return merges, vocab


CORPUS = [
    "the cat sat on the mat, the cat ate",
    "low lower lowest newer newest widest",
    "banana bandana ananas; the low band played",
    "aaaa aaa aa baaab",          # p1 == p2 greedy-run case
    "Mixed CASE and 123 numbers 123123",
]


def test_train_matches_python_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], ["text"])
    got = train_bpe(df, 10)
    want, _ = _py_train(CORPUS, 10)
    assert got == want


def test_greedy_fold_on_equal_pair_runs(spark):
    # [a,a,a,a,a] with (a,a) must give [aa,aa,a] — greedy non-overlap
    df = spark.createDataFrame([(["a"] * 5,)], ["syms"])
    import pyspark.sql.functions as F
    got = df.select(F.expr(merge_fold_expr("a", "a")).alias("m")).first()
    assert got["m"] == ["aa", "aa", "a"]


def test_merge_fold_rejects_unsafe_symbols():
    with pytest.raises(ValueError):
        merge_fold_expr("a'b", "c")


def test_encode_matches_python_reference(spark):
    df = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges, _ = _py_train(CORPUS, 10)
    got = {r["doc_id"]: r["tokens"]
           for r in encode_bpe(df, merges).collect()}
    words = _words(CORPUS)
    vocab = {w: list(w) for w in words}
    for m in merges:
        vocab = {w: _apply(s, m["p1"], m["p2"]) for w, s in vocab.items()}
    for i, t in enumerate(CORPUS):
        want = []
        for w in re.split(r"[^0-9a-z]+", t.lower()):
            if w and len(w) <= MAXLEN:
                want.extend(vocab[w])
        assert got[i] == want, f"doc {i}"


def test_word_table_counts(spark):
    df = spark.createDataFrame([("the the cat",), ("THE!",)], ["text"])
    got = {r["word"]: (r["wcount"], r["syms"])
           for r in word_table(df).collect()}
    assert got == {"the": (3, ["t", "h", "e"]),
                   "cat": (1, ["c", "a", "t"])}


def test_train_stops_when_pairs_exhaust(spark):
    # single-char words only -> no adjacent pairs -> zero merges
    df = spark.createDataFrame([("a b c a b",)], ["text"])
    assert train_bpe(df, 5) == []


def test_learned_bpe_through_pack_tokenizer_seam(spark):
    """End-to-end: train BPE -> encode docs -> map tokens to ids ->
    feed pack_sequences through its tokenizer seam. The seam contract
    is a Column -> array<long>; with BPE the ids already live on the
    row (encode needs a join, not a scalar expr), so the tokenizer
    just selects that column."""
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.pack import pack_sequences

    df = spark.createDataFrame(list(enumerate(CORPUS)), ["doc_id", "text"])
    merges, _ = _py_train(CORPUS, 10)
    toks = encode_bpe(df, merges)
    # token -> dense id by (count DESC, token) rank over the encoded corpus
    vocab = (toks.select(F.explode("tokens").alias("tok"))
             .groupBy("tok").count()
             .orderBy(F.desc("count"), "tok")
             .select("tok").collect())
    tok_id = {r["tok"]: i for i, r in enumerate(vocab)}
    mapping = F.create_map(*[F.lit(x) for kv in tok_id.items() for x in kv])
    with_ids = (df.join(toks, "doc_id")
                .withColumn("bpe_ids",
                            F.transform("tokens",
                                        lambda t: mapping[t].cast("long"))))
    packed = pack_sequences(with_ids, seq_len=8,
                            tokenizer=lambda c: F.col("bpe_ids"))
    rows = packed.orderBy("seq_id").collect()
    n_tokens = sum(len(r["tokens"]) for r in toks.collect())
    assert len(rows) == n_tokens // 8
    flat = [t for r in rows for t in r["tokens"]]
    # packed stream == documents' ids concatenated in doc_id order
    want = []
    for r in sorted(with_ids.select("doc_id", "bpe_ids").collect(),
                    key=lambda r: r["doc_id"]):
        want.extend(r["bpe_ids"])
    assert flat == want[:len(flat)]
    assert all(0 <= t < len(tok_id) for t in flat)


def test_merge_usage_counts_and_dead_merges(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.bpe import encode_bpe
    merges = [{"rank": 1, "p1": "s", "p2": "m", "merged": "sm"},
              {"rank": 2, "p1": "sm", "p2": "a", "merged": "sma"},
              {"rank": 3, "p1": "q", "p2": "z", "merged": "qz"}]
    docs = spark.createDataFrame(
        [(0, "small smart sm"), (1, "smack")], ["doc_id", "text"])
    toks = encode_bpe(docs, merges)
    used = (toks.select(F.explode("tokens").alias("tok"))
            .groupBy("tok").agg(F.count("*").alias("n")))
    got = {r["tok"]: r["n"] for r in used.collect()}
    # 'sma' consumed all 'sm' except the standalone word "sm"
    assert got.get("sma") == 3          # small, smart, smack
    assert got.get("sm") == 1           # the bare "sm" word
    assert "qz" not in got              # dead merge never fires
