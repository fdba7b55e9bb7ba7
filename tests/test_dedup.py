"""Dedup operator tests: exact, n-gram Jaccard, MinHash LSH, SimHash."""

import pyspark.sql.functions as F
import pytest

from ocr_engine_spark.functions.dedup import (
    drop_exact_duplicates, exact_duplicate_groups, jaccard_pairs,
    minhash_candidate_pairs, minhash_dedup_pairs, shingles_col,
    simhash_col, simhash_near_pairs,
)

BASE = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun light")
NEAR = ("the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the evening sun light")
OTHER = ("completely different content about distributed query engines "
         "processing massive datasets with columnar storage formats fast")


@pytest.fixture(scope="module")
def mini(spark):
    rows = [(0, BASE), (1, NEAR), (2, OTHER), (3, BASE),
            (4, "the   QUICK brown fox jumps over the lazy dog while the "
                "cat watches from the warm windowsill in the afternoon "
                "sun light")]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(mini):
    groups = exact_duplicate_groups(mini).collect()
    # 0, 3, 4 are identical after normalization (case + whitespace)
    assert len(groups) == 1
    assert groups[0].n_dups == 3 and groups[0].keep_id == 0
    kept = drop_exact_duplicates(mini)
    assert kept.count() == 3


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], ["t"])
    sh = df.select(shingles_col(F.col("t"), 3).alias("s")).collect()[0].s
    assert sh == ["a b c", "b c d"]
    empty = spark.createDataFrame([("a b",)], ["t"]).select(
        shingles_col(F.col("t"), 3).alias("s")).collect()[0].s
    assert empty == []


def test_jaccard_pairs_finds_near_dup(mini):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in jaccard_pairs(mini, threshold=0.3).collect()}
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0
    assert pairs[(0, 3)] == 1.0
    assert not any({a, b} == {0, 2} for a, b in pairs)


def test_minhash_lsh_recall_vs_exact(mini):
    """LSH candidates must contain every truly-similar pair (recall=1 on
    this corpus) and the verified pipeline must agree with exact Jaccard."""
    exact = {(r.id_a, r.id_b)
             for r in jaccard_pairs(mini, threshold=0.5).collect()}
    cands = {(r.id_a, r.id_b)
             for r in minhash_candidate_pairs(mini).collect()}
    assert exact <= cands
    verified = {(r.id_a, r.id_b): r.jaccard
                for r in minhash_dedup_pairs(mini, threshold=0.5).collect()}
    assert set(verified) == exact


def test_minhash_no_cross_join(mini):
    plan = minhash_candidate_pairs(mini)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_simhash_properties(mini, spark):
    sh = {r.doc_id: r.s for r in mini.select(
        "doc_id", simhash_col(F.col("text")).alias("s")).collect()}
    assert sh[0] == sh[3] == sh[4]  # normalization-equal docs
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in simhash_near_pairs(mini, max_hamming=16).collect()}
    assert pairs.get((0, 3)) == 0
    near = pairs.get((0, 1))
    assert near is not None and near <= 16


def test_simhash_pigeonhole_equals_bruteforce(mini, spark):
    """The (k+1)-segment pigeonhole blocking is EXACT: its output must
    equal the all-pairs hamming filter for every k, and its plan must
    never fall back to a cross join."""
    from ocr_engine_spark.functions.dedup import with_simhash
    d = with_simhash(mini)
    l, r_ = d.alias("l"), d.alias("r")
    all_pairs = (l.join(r_, F.col("l.id") < F.col("r.id"))
                 .select(F.col("l.id").alias("id_a"),
                         F.col("r.id").alias("id_b"),
                         F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
                         .alias("hamming")))
    for k in (0, 3, 16):
        blocked = {(r.id_a, r.id_b): r.hamming
                   for r in simhash_near_pairs(mini, max_hamming=k).collect()}
        brute = {(r.id_a, r.id_b): r.hamming
                 for r in all_pairs.filter(F.col("hamming") <= k).collect()}
        assert blocked == brute
    plan = simhash_near_pairs(mini, max_hamming=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


def test_dedup_on_driver_documents(spark):
    from tests.conftest import TESTDATA_SF001
    import os
    docs = spark.read.parquet(os.path.join(TESTDATA_SF001,
                                           "documents.parquet"))
    # word-salad corpus: no exact dups expected, pipeline must still run
    assert exact_duplicate_groups(docs).count() == 0
    cands = minhash_candidate_pairs(docs.limit(100))
    assert cands.count() >= 0


def test_minhash_index_incremental_dedup(spark, tmp_path):
    """Build-once near-dup index: a new batch dedupes against the
    persisted corpus signatures/shingles without recomputing them —
    every copied document must pair with its corpus original at
    jaccard 1.0, and unrelated docs must not cross the threshold."""
    import os
    from tests.conftest import TESTDATA_SF001
    from ocr_engine_spark.functions.dedup import MinHashIndex
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")).filter(
        F.col("doc_id") < 100)
    idx = MinHashIndex.build(docs, str(tmp_path / "mhidx"))
    batch = (docs.filter(F.col("doc_id") < 20)
             .withColumn("doc_id", F.col("doc_id") + 5000))
    dups = MinHashIndex.load(spark, str(tmp_path / "mhidx")).find_dups(
        batch, threshold=0.9)
    got = {(r.batch_id, r.corpus_id): r.jaccard for r in dups.collect()}
    for i in range(20):
        assert got.get((i + 5000, i)) == 1.0
    # exactness: the incremental result equals the brute-force exact
    # Jaccard between batch and corpus (the corpus contains genuine
    # near-dup families beyond the injected copies — they must appear)
    union = docs.unionByName(batch)
    brute = {(r.id_b, r.id_a): r.jaccard
             for r in jaccard_pairs(union, threshold=0.9).collect()
             if r.id_b >= 5000 and r.id_a < 5000}
    assert got == brute and len(got) > 20


def _ref_mirror_pairs(rows, k=16, min_permille=100, max_fanout=256):
    """Pure-Python replica of mirror_host_pairs' integer pipeline."""
    import hashlib
    import re as _re
    from collections import defaultdict

    def fp45(text):
        norm = _re.sub(r"\s+", " ", text.lower()).strip()
        return int(hashlib.md5(norm.encode()).hexdigest()[:15],
                   16) // 32768

    by_host = defaultdict(set)
    for url, text in rows:
        m = _re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)", url)
        host = m.group(1).lower() if m else ""
        if host:
            by_host[host].add(fp45(text))
    sk = {h: sorted(v)[:k] for h, v in by_host.items()}
    fan = defaultdict(set)
    for h, vals in sk.items():
        for v in vals:
            fan[v].add(h)
    cand = {tuple(sorted((a, b)))
            for v, hs in fan.items() if len(hs) <= max_fanout
            for a in hs for b in hs if a < b}
    out = {}
    for a, b in cand:
        u = sorted(set(sk[a]) | set(sk[b]))[:k]
        shared = len(set(u) & set(sk[a]) & set(sk[b]))
        perm = (shared * 1000) // len(u)
        if perm >= min_permille:
            out[(a, b)] = (shared, len(u), perm)
    return out


def test_mirror_host_pairs(spark):
    from ocr_engine_spark.functions.dedup import mirror_host_pairs

    rows = []
    for i in range(10):
        rows.append((f"https://m1.ex/p{i}", f"content number {i} words"))
        rows.append((f"https://M2.ex/q{i}", f"content number {i} words"))
    for i in range(3):
        rows.append((f"https://h3.ex/r{i}", f"content number {i} words"))
    for i in range(7):
        rows.append((f"https://h3.ex/s{i}", f"other text {i}"))
    for i in range(5):
        rows.append((f"https://h4.ex/t{i}", f"unrelated {i}"))
    pages = spark.createDataFrame(rows, "url string, text string")
    got = {(r.host_a, r.host_b): (r.shared, r.union_size,
                                  r.resemblance_permille)
           for r in mirror_host_pairs(pages, k=16,
                                      min_permille=100).collect()}
    assert got == _ref_mirror_pairs(rows, k=16, min_permille=100)
    # perfect mirror at 1000 permille (host lowercased on both sides)
    assert got[("m1.ex", "m2.ex")] == (10, 10, 1000)
    assert ("h4.ex", "m1.ex") not in got  # no shared content, no pair


def test_mirror_fanout_guard(spark):
    """A fingerprint every host shares is dropped from CANDIDATE
    GENERATION when it exceeds max_fp_fanout (no quadratic hot key),
    but sketches keep it, so pairs found through other values still
    count it in the resemblance read."""
    from ocr_engine_spark.functions.dedup import mirror_host_pairs

    rows = [(f"https://h{i}.ex/common", "the shared boilerplate page")
            for i in range(6)]
    rows += [(f"https://h{i}.ex/u{i}", f"unique {i}") for i in range(6)]
    # h0/h1 also share a second page -> a pair discoverable without
    # the boilerplate fingerprint
    rows += [("https://h0.ex/x", "twin page"), ("https://h1.ex/y",
                                                "twin page")]
    pages = spark.createDataFrame(rows, "url string, text string")
    strict = {(r.host_a, r.host_b): r.resemblance_permille
              for r in mirror_host_pairs(pages, k=16, min_permille=1,
                                         max_fp_fanout=2).collect()}
    assert set(strict) == {("h0.ex", "h1.ex")}
    # 3 fps each (common, unique, twin); shared = {common, twin} = 2
    # of union 4 -> 500 permille: the guarded fp still counted here
    assert strict[("h0.ex", "h1.ex")] == 500
    loose = {(r.host_a, r.host_b)
             for r in mirror_host_pairs(pages, k=16, min_permille=1,
                                        max_fp_fanout=64).collect()}
    assert len(loose) == 15  # all C(6,2) pairs via the boilerplate fp


def test_lsh_quality_audit_counts(spark):
    """Planted truth: exact copy pair must be candidate AND true; a
    disjoint pair neither. P/R micro arithmetic checked by hand."""
    from ocr_engine_spark.functions.dedup import lsh_quality_audit
    rows = [(0, BASE), (1, BASE), (2, OTHER),
            (3, NEAR)]  # (0,1) exact pair; (0,3)/(1,3) near pair
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = lsh_quality_audit(df, threshold=0.5, num_perm=16,
                          bands=8).collect()[0]
    # truth at 0.5: (0,1) J=1.0 and (0,3),(1,3) J~0.87 -> 3 true pairs
    assert r.n_true == 3
    # identical signatures guarantee (0,1) is a candidate
    assert r.n_cand >= 1 and r.n_hit >= 1
    assert r.n_hit <= min(r.n_true, r.n_cand)
    assert r.precision_micro == (r.n_hit * 1_000_000) // r.n_cand
    assert r.recall_micro == (r.n_hit * 1_000_000) // r.n_true


def test_lsh_quality_audit_empty_truth(spark):
    """All-disjoint corpus: zero true pairs, zero hits, recall=0 (the
    0-denominator guard) — and no crash."""
    from ocr_engine_spark.functions.dedup import lsh_quality_audit
    rows = [(0, BASE), (1, OTHER)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = lsh_quality_audit(df, threshold=0.5).collect()[0]
    assert r.n_true == 0 and r.n_hit == 0
    assert r.recall_micro == 0


def test_containment_catches_subset_jaccard_misses(spark):
    """A short excerpt inside a long doc: containment ~1.0, Jaccard
    small — jaccard_pairs at 0.5 misses it, containment_pairs finds
    it with the right direction."""
    from ocr_engine_spark.functions.dedup import containment_pairs
    long_doc = " ".join(f"w{i}" for i in range(200))
    excerpt = " ".join(f"w{i}" for i in range(30))   # first 30 tokens
    df = spark.createDataFrame([(0, long_doc), (1, excerpt),
                                (2, OTHER)], ["doc_id", "text"])
    rows = {(r.id_a, r.id_b): r for r in
            containment_pairs(df, threshold=0.9).collect()}
    assert set(rows) == {(0, 1)}
    r = rows[(0, 1)]
    assert r.cont_b == 1.0                       # excerpt fully inside
    assert r.cont_a < 0.2                        # long doc barely covered
    jac = {(p.id_a, p.id_b)
           for p in jaccard_pairs(df, threshold=0.5).collect()}
    assert (0, 1) not in jac


def test_containment_no_cross_join(spark):
    from ocr_engine_spark.functions.dedup import containment_pairs
    df = spark.createDataFrame([(0, BASE), (1, NEAR)], ["doc_id", "text"])
    plan = (containment_pairs(df)._jdf.queryExecution()
            .executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bbit_estimator_tracks_exact_jaccard(spark):
    # identical docs: full and b-bit estimates must both read 1.0;
    # disjoint docs: full estimate 0, b-bit clamps at 0 after the
    # (4m-1)/3 correction of its ~25% chance collisions.
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.dedup import (
        minhash_sig_from_hashes_col, shingle_hashes_col,
    )
    same = "alpha beta gamma delta epsilon zeta eta theta iota"
    other = "one two three four five six seven eight nine ten"
    df = spark.createDataFrame(
        [(0, same), (1, same), (2, same), (3, other)],
        ["doc_id", "text"])
    sig = df.select("doc_id", F.posexplode(
        minhash_sig_from_hashes_col(
            shingle_hashes_col(F.col("text"), 3, "md5"), 64))
        .alias("perm", "mh"))
    def matches(a, b, mod=None):
        sa = sig.filter(F.col("doc_id") == a) \
            .select("perm", F.col("mh").alias("ma"))
        sb = sig.filter(F.col("doc_id") == b) \
            .select("perm", F.col("mh").alias("mb"))
        j = sa.join(sb, "perm")
        ca = (F.pmod(F.col("ma"), F.lit(mod))
              == F.pmod(F.col("mb"), F.lit(mod))) if mod else \
            (F.col("ma") == F.col("mb"))
        return j.agg(F.sum(ca.cast("long"))).collect()[0][0]
    assert matches(0, 1) == 64
    assert matches(0, 1, 4) == 64
    assert matches(0, 3) == 0
    m2 = matches(0, 3, 4)
    # ~25% random collisions at b=2; clamped estimator reads ~0
    assert m2 < 32
    assert max(0, (4 * (m2 * 1_000_000 // 64) - 1_000_000) // 3) \
        < 350_000
