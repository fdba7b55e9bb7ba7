"""dedup_kgrams: keep-first substring-dedup semantics vs a brute-force
python reference, plus the edge shapes (overlap, whole-doc removal,
short docs, within-doc repeats)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocr_engine_spark.functions.dedup import dedup_kgrams


def _brute(docs: dict[int, str], k: int) -> dict[int, tuple[str, int]]:
    """(deduped_text, n_removed) per doc, the spec executed literally."""
    toks = {d: t.split(" ") for d, t in docs.items()}
    first: dict[tuple, tuple] = {}
    occs = []
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - k + 1):
            g = tuple(t[p:p + k])
            occs.append((d, p, g))
            if g not in first:
                first[g] = (d, p)
    counts: dict[tuple, int] = {}
    for _, _, g in occs:
        counts[g] = counts.get(g, 0) + 1
    covered: dict[int, set] = {d: set() for d in toks}
    for d, p, g in occs:
        if counts[g] > 1 and first[g] != (d, p):
            covered[d].update(range(p, p + k))
    out = {}
    for d, t in toks.items():
        kept = [w for i, w in enumerate(t) if i not in covered[d]]
        out[d] = (" ".join(kept), len(t) - len(kept))
    return out


def _run(spark, docs: dict[int, str], k: int):
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    rows = dedup_kgrams(df, k).collect()
    return {r["doc_id"]: (r["deduped_text"], r["n_removed"]) for r in rows}


def test_keep_first_cross_doc(spark):
    docs = {1: "a b c d e", 2: "x a b c y"}
    got = _run(spark, docs, 3)
    # "a b c" first occurs in doc 1 pos 0; doc 2 pos 1 is removed
    assert got[1] == ("a b c d e", 0)
    assert got[2] == ("x y", 3)
    assert got == _brute(docs, 3)


def test_overlapping_duplicates_union(spark):
    # doc 2 repeats a 4-token span -> two overlapping dup trigrams,
    # union of covered positions removed once each
    docs = {1: "p q r s t", 2: "m p q r s n"}
    got = _run(spark, docs, 3)
    assert got == _brute(docs, 3)
    assert got[2][0] == "m n"


def test_within_doc_repeat(spark):
    docs = {5: "u v w z u v w"}
    got = _run(spark, docs, 3)
    assert got == _brute(docs, 3)
    assert got[5] == ("u v w z", 3)


def test_whole_doc_removed_keeps_empty_string(spark):
    docs = {1: "a b c", 2: "a b c"}
    got = _run(spark, docs, 3)
    assert got[1] == ("a b c", 0)
    assert got[2] == ("", 3)


def test_short_docs_untouched(spark):
    docs = {1: "a b", 2: "a b", 3: "a"}
    got = _run(spark, docs, 3)
    assert got == {1: ("a b", 0), 2: ("a b", 0), 3: ("a", 0)}


def test_matches_brute_force_on_colliding_corpus(spark):
    # tiny vocab so trigram collisions are dense
    import random
    rng = random.Random(7)
    vocab = ["w%d" % i for i in range(6)]
    docs = {d: " ".join(rng.choice(vocab) for _ in range(30))
            for d in range(12)}
    assert _run(spark, docs, 3) == _brute(docs, 3)


def test_fingerprint_path_equals_string_path(spark):
    """The Rabin-Karp fingerprint keys (scale default) must reproduce
    the literal-string-key results exactly on a corpus with overlap,
    within-doc repeats and cross-doc duplication."""
    base = " ".join(f"w{i}" for i in range(40))
    dup = " ".join(f"d{i}" for i in range(6))
    docs = {
        0: f"{dup} {base}",
        1: f"intro text {dup} more tail words here",
        2: f"{dup} {dup} unrelated suffix tokens",
        3: "completely unique short doc",
    }
    df = spark.createDataFrame(sorted(docs.items()),
                               "doc_id long, text string")
    cols = ["doc_id", "deduped_text", "n_removed"]
    from ocr_engine_spark.functions.dedup import dedup_kgrams
    fp = {r["doc_id"]: (r["deduped_text"], r["n_removed"])
          for r in dedup_kgrams(df, 6, fingerprint=True)
          .select(cols).collect()}
    st = {r["doc_id"]: (r["deduped_text"], r["n_removed"])
          for r in dedup_kgrams(df, 6, fingerprint=False)
          .select(cols).collect()}
    assert fp == st
    assert _brute(docs, 6) == fp
