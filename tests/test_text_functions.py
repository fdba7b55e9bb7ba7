"""Text-analysis column tests (token count, quality, lang-id,
fingerprint) on controlled inputs + the driver documents table."""

import os

import pyspark.sql.functions as F
import pytest

from ocr_engine_spark.functions.text import (
    fingerprint64_col, fingerprint_col, lang_guess_col, quality_score_col,
    token_count_col,
)
from tests.conftest import TESTDATA_SF001


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet"))


def test_token_count(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("  ",), ("one",)], ["t"])
    got = [r[0] for r in df.select(token_count_col(F.col("t"))).collect()]
    assert got == [3, 0, 0, 1]


def test_quality_score_ranges(docs):
    stats = docs.select(quality_score_col(F.col("text")).alias("q")).agg(
        F.min("q"), F.max("q")).collect()[0]
    assert 0.0 <= stats[0] <= stats[1] <= 1.0


def test_quality_prefers_natural_text(spark):
    natural = ("the quick brown fox jumps over the lazy dog and runs to "
               "the forest with a friend of the family for a while")
    junk = "@@@ ### !!! ??? ;;; ::: ,,, ... ((( )))"
    df = spark.createDataFrame([(natural,), (junk,)], ["t"])
    q = [r[0] for r in df.select(quality_score_col(F.col("t"))).collect()]
    assert q[0] > q[1]


def test_lang_guess_on_fixture_corpus(spark, golden_df, pages_df):
    """Language ID over the multilingual synthetic corpus must agree with
    the generator's lang label on a strong majority of clean pages."""
    joined = pages_df.join(golden_df.select("url"), "url")  # clean only
    guessed = joined.select(
        "lang", lang_guess_col(F.col("text")).alias("guess"))
    agg = guessed.agg(
        F.count("*").alias("n"),
        F.sum((F.col("lang") == F.col("guess")).cast("long")).alias("ok"),
    ).collect()[0]
    assert agg.ok / agg.n > 0.9
    # script-based languages must be exact
    hard = guessed.filter(F.col("lang").isin("ar", "zh"))
    bad = hard.filter(F.col("lang") != F.col("guess")).count()
    assert bad == 0


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [("Hello  World",), ("hello world",), ("different",)], ["t"])
    fps = [r[0] for r in df.select(fingerprint_col(F.col("t"))).collect()]
    assert fps[0] == fps[1] != fps[2]
    f64 = [r[0] for r in df.select(fingerprint64_col(F.col("t"))).collect()]
    assert f64[0] == f64[1] != f64[2]
    assert all(isinstance(v, int) for v in f64)


def test_bpe_token_count_examples(spark):
    from ocr_engine_spark.functions.text import bpe_token_count_col
    rows = spark.createDataFrame(
        [("Hello, world!",),       # Hello | , | _world | !
         ("it's 42 degrees",),     # it | 's | _42 | _degrees
         ("",), ("   ",)],         # empty -> 0; spaces -> 1 run
        "text string")
    got = [r.n for r in rows.select(
        bpe_token_count_col(F.col("text")).alias("n")).collect()]
    assert got == [4, 4, 0, 1]


def test_rolling_fingerprints_shift_invariant(spark):
    """Content-defined sampling: prepending text leaves the shared
    suffix's fingerprints intact (alignment-free near-dup signal)."""
    from ocr_engine_spark.functions.text import with_rolling_fingerprints
    base = ("the quick brown fox jumps over the lazy dog while analytics "
            "engines process billions of documents every single day with "
            "careful partitioning and vectorized execution " * 4)
    shifted = "PREPENDED HEADER LINE " + base
    df = spark.createDataFrame([(0, base), (1, shifted)], "doc_id long, text string")
    fps = {r.doc_id: set(r.fingerprints) for r in
           with_rolling_fingerprints(df).collect()}
    assert fps[0], "base doc must yield fingerprints"
    shared = fps[0] & fps[1]
    assert len(shared) / len(fps[0]) > 0.8  # fixed hashes, not positions


def test_rolling_fingerprints_short_doc_empty(spark):
    from ocr_engine_spark.functions.text import with_rolling_fingerprints
    df = spark.createDataFrame([(0, "short"), (1, "")],
                               "doc_id long, text string")
    fps = {r.doc_id: r.fingerprints for r in
           with_rolling_fingerprints(df).collect()}
    assert fps[0] == [] and fps[1] == []


def test_corpus_stats_sketch_within_bound(spark):
    """approx_percentile (the 100 TB path) must stay within the GK rank
    bound of the exact interpolated percentile: with accuracy=10^4 and
    n docs per group, the returned value's RANK error is <= n/10^4 + 1,
    so the exact ranks bracketing the sketch value must sit within that
    window of the target rank."""
    import os
    from ocr_engine_spark.functions.text import corpus_length_stats
    from tests.conftest import TESTDATA_SF001
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet"))
    exact = {r["lang"]: r.asDict() for r in
             corpus_length_stats(docs, sketch=False).collect()}
    sk = {r["lang"]: r.asDict() for r in
          corpus_length_stats(docs, sketch=True).collect()}
    assert exact.keys() == sk.keys()
    lengths = {
        lang: sorted(x["n_chars"] for x in
                     docs.filter(F.col("lang") == lang)
                     .select(F.length("text").cast("long")
                             .alias("n_chars")).collect())
        for lang in exact
    }
    for lang, ex in exact.items():
        # non-percentile columns are exact in both modes
        for c in ("n_docs", "n_sources", "min_chars", "max_chars",
                  "avg_chars"):
            assert sk[lang][c] == ex[c], (lang, c)
        ls = lengths[lang]
        n = len(ls)
        for p, c in ((0.5, "p50_chars"), (0.9, "p90_chars"),
                     (0.99, "p99_chars")):
            got = sk[lang][c]
            # rank window: target +- (n/accuracy + 1)
            slack = int(n / 10_000) + 1
            target = p * (n - 1)
            lo = ls[max(0, int(target) - slack)]
            hi = ls[min(n - 1, int(target) + 1 + slack)]
            assert lo <= got <= hi, (lang, c, got, lo, hi)


def test_tfidf_topk_matches_python(spark):
    """Exact integer TF-IDF ranking equals a transparent Python model,
    including tie-breaks and the idf quantization."""
    import math
    from collections import Counter

    from ocr_engine_spark.functions.text import tfidf_topk
    rows = [(0, "apple banana apple cherry"),
            (1, "banana banana durian"),
            (2, "apple cherry cherry cherry"),
            (3, ""),            # blank: no keywords, still counts in N
            (4, "durian")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = [(r.doc_id, r.rank, r.token, r.tf, r.df, r.score_micro)
           for r in tfidf_topk(df, 3).orderBy("doc_id", "rank").collect()]

    n = len(rows)
    tf = {i: Counter(s.split()) for i, s in rows if s.strip()}
    dfreq = Counter(t for c in tf.values() for t in c)
    want = []
    for i in sorted(tf):
        scored = [(t, c, dfreq[t], c * round(math.log(n / dfreq[t]) * 1e6))
                  for t, c in tf[i].items()]
        scored.sort(key=lambda x: (-x[3], x[0]))
        want += [(i, r + 1, t, c, d, s)
                 for r, (t, c, d, s) in enumerate(scored[:3])]
    assert got == want


def test_collocations_match_python(spark):
    """PMI collocations vs an independent Python reference (same
    quantization contract), including the min_count floor and
    tie-break order."""
    import math
    from collections import Counter
    from ocr_engine_spark.functions.text import collocations_topk

    texts = ["new york is big", "new york city", "in new york today",
             "a big city", "the city is big", "new day", "york pub",
             "new york new york"]
    docs = spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")
    got = [tuple(r) for r in
           collocations_topk(docs, 10, min_count=2).collect()]

    uni, big = Counter(), Counter()
    for t in texts:
        ws = t.split()
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    t_uni = sum(uni.values())
    surviving = {p: c for p, c in big.items() if c >= 2}
    t_bi = sum(surviving.values())
    want = []
    for (a, b), c_ab in surviving.items():
        pmi = round(math.log((c_ab * float(t_uni) * float(t_uni))
                             / (float(t_bi) * uni[a] * uni[b])) * 1e6)
        want.append((f"{a} {b}", c_ab, uni[a], uni[b], pmi))
    want.sort(key=lambda r: (-r[4], r[0]))
    want = [(i + 1, *r) for i, r in enumerate(want[:10])]
    assert got == want
    # 'new york' is the highest-COUNT surviving collocation (pure PMI
    # ranks rarer pairs above it — the known PMI-vs-frequency tension
    # min_count exists to bound)
    assert "new york" in {r[1] for r in got}
    assert max(got, key=lambda r: r[2])[1] == "new york"


def test_readability_profile(spark):
    from ocr_engine_spark.functions.text import readability_profile
    rows = [
        (1, "The cat sat. The dog ran! Did it?"),
        (2, "One unterminated fragment"),
        (3, ""),
        (4, "  \t  "),
        (5, "Word."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r.asDict()
           for r in readability_profile(df).collect()}
    r1 = got[1]
    assert (r1["n_sentences"], r1["n_words"]) == (3, 8)
    assert r1["n_chars"] == len("Thecatsat.Thedogran!Didit?")
    assert r1["wps_micro"] == 8 * 1_000_000 // 3
    assert r1["cpw_micro"] == r1["n_chars"] * 1_000_000 // 8
    assert r1["ari_micro"] == (4710000 * r1["n_chars"] // 8
                               + 500000 * 8 // 3 - 21430000)
    assert got[2]["n_sentences"] == 0 and got[2]["ari_micro"] is None
    assert got[3]["n_words"] == 0 and got[3]["wps_micro"] is None
    assert got[4]["n_words"] == 0
    r5 = got[5]
    assert (r5["n_sentences"], r5["n_words"]) == (1, 1)


def test_source_quality_prior_shrinkage(spark):
    """Bayesian shrinkage algebra: a group's prior sits between its own
    mean and the global mean; big groups dominate their prior, and
    lift sums to ~0 within a group around its unshrunk mean."""
    from ocr_engine_spark.functions.text import source_quality_prior
    good = ("the quick brown fox jumps over the lazy dog and then the "
            "dog is with a fox for a walk in the park on a sunny day, "
            "with many of the usual friends of the dog in tow there.")
    bad = "zxqj!!!! ????"
    rows = ([(i, good, "good_src") for i in range(30)]
            + [(100 + i, bad, "bad_src") for i in range(3)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                       "source string")
    out = {r.doc_id: r for r in
           source_quality_prior(docs, pseudo_count=20).collect()}
    assert len(out) == 33
    g, b = out[0], out[100]
    assert g.n_group == 30 and b.n_group == 3
    # global mean sits between the two group means
    assert b.quality_micro < g.quality_micro
    # priors are shrunk TOWARD the global mean: the small bad group's
    # prior is pulled far above its own (low) member quality, the big
    # good group's stays near its members
    assert b.prior_micro > b.quality_micro
    assert abs(g.prior_micro - g.quality_micro) < \
        abs(b.prior_micro - b.quality_micro)
    # identical docs in one group share quality, prior, lift
    assert all(out[i].prior_micro == g.prior_micro for i in range(30))
    assert all(out[i].lift_micro == g.lift_micro for i in range(30))
    # integer contract
    assert isinstance(g.quality_micro, int) and isinstance(
        g.prior_micro, int)


def test_source_quality_prior_pseudocount_limit(spark):
    """pseudo_count=0 degenerates to the plain group mean."""
    from ocr_engine_spark.functions.text import source_quality_prior
    docs = spark.createDataFrame(
        [(1, "one two three four five six seven", "s"),
         (2, "completely different words here now then", "s")],
        "doc_id long, text string, source string")
    out = source_quality_prior(docs, pseudo_count=0).collect()
    qs = sorted(r.quality_micro for r in out)
    prior = out[0].prior_micro
    assert all(r.prior_micro == prior for r in out)
    assert prior == sum(qs) // 2


def test_vocab_growth_curve(spark):
    from ocr_engine_spark.functions.text import vocab_growth
    df = spark.createDataFrame([
        (0, "a b c"),          # bucket 0: types a,b,c
        (1, "a b d"),          # +d
        (2, "a a a"),          # nothing new
        (3, "e f"),            # bucket 1 (bucket_docs=3): +e,f
        (4, "a e g"),          # +g
    ], "doc_id long, text string")
    rows = {r.bucket: r for r in
            vocab_growth(df, bucket_docs=3).collect()}
    b0, b1 = rows[0], rows[1]
    assert (b0.n_docs, b0.n_tokens, b0.new_types) == (3, 9, 4)
    assert (b0.cum_tokens, b0.cum_types) == (9, 4)
    assert b0.ttr_ppm == 4 * 1_000_000 // 9
    assert (b1.n_docs, b1.n_tokens, b1.new_types) == (2, 5, 3)
    assert (b1.cum_tokens, b1.cum_types) == (14, 7)
    assert b1.ttr_ppm == 7 * 1_000_000 // 14


def test_vocab_growth_first_occurrence_is_positional(spark):
    from ocr_engine_spark.functions.text import vocab_growth
    # 'z' appears in doc 0 AND doc 5 -> charged to bucket 0 only
    df = spark.createDataFrame([
        (0, "z q"), (5, "z r")], "doc_id long, text string")
    rows = {r.bucket: r for r in
            vocab_growth(df, bucket_docs=5).collect()}
    assert rows[0].new_types == 2      # z, q
    assert rows[1].new_types == 1      # r only
    assert rows[1].cum_types == 3


def test_winnowing_guarantee_and_density(spark):
    """Any shared substring of length >= w + k - 1 shares a selected
    fingerprint (the Schleimer et al. guarantee), and density is far
    below 1 fingerprint per gram."""
    from ocr_engine_spark.functions.text import winnow_fingerprints
    import hashlib
    shared = "thequickbrownfoxjumpsoverthelazydogandrunsaway"  # 46 chars
    df = spark.createDataFrame([
        (1, "prefixblah " + shared + " suffixyada"),
        (2, "completely other start " + shared),
    ], "doc_id long, text string")
    k, w = 8, 16
    rows = winnow_fingerprints(df, k=k, w=w).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    common = by_doc[1] & by_doc[2]
    assert common, "shared 46-char substring must share a fingerprint"
    n_grams_1 = len("prefixblah " + shared + " suffixyada") - k + 1
    assert len(by_doc[1]) < n_grams_1 / 3  # density ~2/(w+1)


def test_winnowing_matches_python_reference(spark):
    from ocr_engine_spark.functions.text import winnow_fingerprints
    import hashlib

    def norm(s):
        import re
        return re.sub(r"\s+", " ", s.strip().lower())

    def ref(s, k, w):
        s = norm(s)
        hs = [int(hashlib.md5(s[i:i + k].encode()).hexdigest()[:15], 16)
              for i in range(len(s) - k + 1)]
        out = set()
        for i in range(len(hs) - w + 1):
            win = hs[i:i + w]
            m = min(win)
            p = max(j for j in range(w) if win[j] == m)
            out.add((i + p, hs[i + p]))
        return out

    text = "Winnowing picks rightmost minima. So any match survives!"
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {(r.pos, r.fp) for r in
           winnow_fingerprints(df, k=5, w=4).collect()}
    assert got == ref(text, 5, 4)


def test_zipf_fit_on_exact_zipfian_corpus(spark):
    # freq(rank r) = floor(1200 / r): an exact power-law with slope -1.
    # OLS over ln-ln points must land near slope_micro = -1e6 with an
    # almost-perfect fit; floor() quantization of the counts bends the
    # tail slightly, hence the loose band.
    words = []
    for r in range(1, 41):
        words += [f"w{r:03d}"] * (1200 // r)
    df = spark.createDataFrame([(" ".join(words),)], ["text"])
    from ocr_engine_spark.functions.text import zipf_fit
    row = zipf_fit(df, top_n=40).collect()[0]
    assert row["n_terms"] == 40
    assert -1_060_000 < row["slope_micro"] < -940_000
    assert row["r2_micro"] > 990_000


def test_zipf_fit_flat_corpus_zero_slope(spark):
    # every term equally frequent -> ln(freq) constant -> slope 0 and
    # an undefined r² guarded to NULL when vary = 0 (ANSI mode
    # would throw casting Inf to long otherwise).
    words = [f"t{i}" for i in range(20)] * 5
    df = spark.createDataFrame([(" ".join(words),)], ["text"])
    from ocr_engine_spark.functions.text import zipf_fit
    row = zipf_fit(df, top_n=20).collect()[0]
    assert row["n_terms"] == 20
    assert row["slope_micro"] == 0
    assert row["r2_micro"] is None


def test_tabular_report_flags_tsv_not_prose(spark):
    from ocr_engine_spark.functions.text import tabular_report
    tsv = "a\tb\tc\nd\te\tf\ng\th\ti\nj\tk\tl"
    prose = ("this is a normal paragraph\nwith another line of text\n"
             "and, for variety, one comma")
    ragged = "x,y\nz\nw,v,u,t\ns"
    df = spark.createDataFrame(
        [(0, tsv), (1, prose), (2, ragged)], ["doc_id", "text"])
    got = {r["doc_id"]: r for r in tabular_report(df).collect()}
    assert got[0]["is_tabular"]
    assert got[0]["tab_mode"] == 2
    assert got[0]["tab_agree_ppm"] == 1_000_000
    assert not got[1]["is_tabular"]
    assert not got[2]["is_tabular"]     # ragged commas never agree
