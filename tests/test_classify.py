"""Multinomial Naive Bayes classifier (functions/classify.py).

Covers: (1) the sparse floor/delta score decomposition is EXACTLY the
dense NB log-joint (brute-force recomputation in Python over the same
quantized integers); (2) a planted-vocabulary signal is actually
learned (held-out accuracy, not train accuracy); (3) gram-less
documents fall back to the prior argmax; (4) determinism across
repartitionings.
"""

import math

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.classify import (
    nb_confusion, nb_fit, nb_predict,
)

BUCKETS = 512

SPAM_WORDS = ["win", "free", "prize", "click", "offer", "winner",
              "cash", "bonus", "claim", "urgent", "deal", "lottery"]


def _spam_corpus(spark, n=120):
    """Deterministic two-class corpus: ham rows are plain pseudo-text,
    spam rows carry three planted spam-vocabulary tokens."""
    base = ["the quick brown fox jumps over the lazy dog",
            "spark plans shuffle data across the cluster nodes",
            "a table scan reads columns and filters rows early"]
    rows = []
    for i in range(n):
        text = base[i % 3]
        rows.append((i, text, "ham"))
        # (i + 7k) mod 12 walks ALL twelve words across both id
        # parities — (i*k) mod 12 would plant only even-index words in
        # the even-id (train) half and the signal wouldn't generalize
        w = [SPAM_WORDS[(i + 7 * k) % len(SPAM_WORDS)] for k in (1, 2, 3)]
        rows.append((1_000_000 + i, text + " " + " ".join(w), "spam"))
    return spark.createDataFrame(rows, "doc_id long, text string,"
                                       " label string")


def test_score_decomposition_matches_dense_nb(spark):
    """prior + n*floor + sum(delta) == dense sum of quantized llh over
    every gram — recomputed independently in Python."""
    corpus = _spam_corpus(spark, n=12)
    labels, cond = nb_fit(corpus, buckets=BUCKETS, alpha=1.0)
    lab = {r["label"]: r for r in labels.collect()}
    delta = {(r["label"], r["bucket"]): r["delta_micro"]
             for r in cond.collect()}

    # independent dense model from raw counts
    from ocr_engine_spark.functions.dsir import gram_buckets
    gb = gram_buckets(corpus, buckets=BUCKETS).collect()
    by_label = {}
    id2label = {r["doc_id"]: r["label"] for r in corpus.collect()}
    for r in gb:
        l = id2label[r["doc_id"]]
        by_label.setdefault(l, {})
        by_label[l][r["bucket"]] = by_label[l].get(r["bucket"], 0) + 1
    n_docs = corpus.count()
    n_by_label = {l: sum(1 for v in id2label.values() if v == l)
                  for l in by_label}

    def dense_score(doc_buckets, l):
        t_l = sum(by_label[l].values())
        prior = round(math.log(n_by_label[l] / n_docs) * 1e6)
        s = prior
        for b in doc_buckets:
            c = by_label[l].get(b, 0)
            s += round(math.log((c + 1.0) / (t_l + BUCKETS)) * 1e6)
        return s

    pred = nb_predict(corpus, labels, cond, buckets=BUCKETS)
    got = {r["doc_id"]: r for r in pred.collect()}
    doc_buckets = {}
    for r in gb:
        doc_buckets.setdefault(r["doc_id"], []).append(r["bucket"])
    for did, bl in list(doc_buckets.items())[:40]:
        best = max(sorted(by_label), key=lambda l: (dense_score(bl, l),))
        # replicate the tie-break: highest score, then smallest label
        scores = {l: dense_score(bl, l) for l in by_label}
        mx = max(scores.values())
        best = min(l for l, s in scores.items() if s == mx)
        assert got[did]["pred_label"] == best
        assert got[did]["score_micro"] == scores[best]
    assert lab  # fitted labels table non-empty


def test_heldout_accuracy_on_planted_signal(spark):
    corpus = _spam_corpus(spark, n=120)
    train = corpus.filter(F.col("doc_id") % 2 == 0)
    test = corpus.filter(F.col("doc_id") % 2 == 1)
    labels, cond = nb_fit(train, buckets=BUCKETS)
    pred = nb_predict(test, labels, cond, buckets=BUCKETS)
    conf = nb_confusion(pred, test).collect()
    n_ok = sum(r["n_docs"] for r in conf
               if r["true_label"] == r["pred_label"])
    n_all = sum(r["n_docs"] for r in conf)
    assert n_all == test.count()
    assert n_ok / n_all >= 0.95


def test_gramless_doc_gets_prior_argmax(spark):
    corpus = _spam_corpus(spark, n=30)
    # make priors asymmetric: drop half the spam rows
    corpus = corpus.filter((F.col("label") == "ham")
                           | (F.col("doc_id") % 2 == 0))
    labels, cond = nb_fit(corpus, buckets=BUCKETS)
    empty = spark.createDataFrame([(7, " ")], "doc_id long, text string")
    out = nb_predict(empty, labels, cond, buckets=BUCKETS).collect()
    assert len(out) == 1
    assert out[0]["n_grams"] == 0
    assert out[0]["pred_label"] == "ham"  # majority prior


def test_deterministic_across_partitionings(spark):
    corpus = _spam_corpus(spark, n=60)
    outs = []
    for parts in (1, 7):
        labels, cond = nb_fit(corpus.repartition(parts), buckets=BUCKETS)
        pred = nb_predict(corpus.repartition(parts), labels, cond,
                          buckets=BUCKETS)
        outs.append(sorted(map(tuple, pred.collect())))
    assert outs[0] == outs[1]


@pytest.fixture
def nb_corpus(spark):
    """Held-out split of the planted-signal corpus: (train, test)."""
    corpus = _spam_corpus(spark, n=120)
    train = corpus.filter(F.col("doc_id") % 2 == 0)
    test = corpus.filter(F.col("doc_id") % 2 == 1)
    return train, test


def test_margin_consistent_with_argmax(spark, nb_corpus):
    """margin >= 0 <=> argmax picks the positive class (up to the
    deterministic label tie-break, exact integer scores both sides)."""
    from ocr_engine_spark.functions.classify import (
        nb_fit, nb_margin, nb_predict,
    )
    train, test = nb_corpus
    labels, cond = nb_fit(train, buckets=512)
    pred = nb_predict(test, labels, cond, buckets=512)
    marg = nb_margin(test, labels, cond, pos_label="spam", buckets=512)
    j = {r["doc_id"]: (r["pred_label"], r["margin_micro"])
         for r in pred.join(marg, "doc_id").collect()}
    assert j
    for doc, (pl, m) in j.items():
        if m > 0:
            assert pl == "spam", doc
        elif m < 0:
            assert pl == "ham", doc


def test_pr_sweep_matches_python(spark, nb_corpus):
    from ocr_engine_spark.functions.classify import (
        nb_fit, nb_margin, pr_sweep,
    )
    train, test = nb_corpus
    labels, cond = nb_fit(train, buckets=512)
    marg = nb_margin(test, labels, cond, pos_label="spam", buckets=512)
    ths = [-2_000_000, -500_000, 0, 500_000, 2_000_000]
    got = {r["threshold_micro"]: r.asDict()
           for r in pr_sweep(marg, test, ths, pos_label="spam")
           .collect()}
    rows = [(r["margin_micro"], r["label"] == "spam")
            for r in marg.join(
                test.select("doc_id", "label"), "doc_id").collect()]
    for th in ths:
        tp = sum(1 for m, p in rows if m >= th and p)
        fp = sum(1 for m, p in rows if m >= th and not p)
        fn = sum(1 for m, p in rows if m < th and p)
        tn = sum(1 for m, p in rows if m < th and not p)
        g = got[th]
        assert (g["tp"], g["fp"], g["fn"], g["tn"]) == (tp, fp, fn, tn)
        prec = round(tp / (tp + fp), 6) if tp + fp else 0.0
        rec = round(tp / (tp + fn), 6) if tp + fn else 0.0
        f1 = round(2 * tp / (2 * tp + fp + fn), 6) \
            if 2 * tp + fp + fn else 0.0
        assert g["precision"] == pytest.approx(prec, abs=1e-9)
        assert g["recall"] == pytest.approx(rec, abs=1e-9)
        assert g["f1"] == pytest.approx(f1, abs=1e-9)
    # monotonicity: recall never increases as the threshold rises
    recs = [got[t]["recall"] for t in sorted(ths)]
    assert recs == sorted(recs, reverse=True)


def _py_char_buckets(text, ns=(2, 3), cap=256, buckets=512):
    """Python reference for char_gram_buckets."""
    import hashlib
    t = text[:cap].lower()
    out = []
    for n in ns:
        for i in range(len(t) - n + 1):
            g = t[i:i + n]
            h = int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
            out.append(h % buckets)
    return sorted(out)


def test_char_gram_buckets_matches_python(spark):
    from ocr_engine_spark.functions.classify import char_gram_buckets
    rows = [(0, "abcdef"), (1, "ÜBER Straße"), (2, "数据表格查询"),
            (3, "a"), (4, ""), (5, None), (6, "x" * 400)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in char_gram_buckets(df, buckets=512).collect():
        got.setdefault(r["doc_id"], []).append(r["bucket"])
    for doc_id, text in rows:
        want = _py_char_buckets(text) if text else []
        assert sorted(got.get(doc_id, [])) == want, doc_id
    # the 1-char doc forms no 2-gram; empty/null docs form nothing
    assert 3 not in got and 4 not in got and 5 not in got


def test_char_gram_buckets_is_shuffle_free(spark):
    """The langid feature builder must be map-only: no Exchange, no
    Window, no Python eval anywhere in its plan."""
    from ocr_engine_spark.functions.classify import char_gram_buckets
    df = spark.createDataFrame([(0, "hello world")],
                               "doc_id long, text string")
    plan = char_gram_buckets(df, buckets=512)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan


def test_char_features_learn_language(spark):
    """features='char' through the full NB stack: a planted two-
    orthography corpus is separable by char grams even though every
    WORD is unique per document (word features would see only
    singletons)."""
    rows = []
    for i in range(60):
        # 'language A': CV syllables; 'language B': umlaut-heavy
        a = " ".join(f"tokato{i}{j}mi" for j in range(8))
        b = " ".join(f"schrö{i}{j}üß" for j in range(8))
        rows.append((2 * i, a, "a"))
        rows.append((2 * i + 1, b, "b"))
    df = spark.createDataFrame(rows, "doc_id long, text string, label string")
    train = df.filter(F.col("doc_id") < 80)
    test = df.filter(F.col("doc_id") >= 80)
    labels, cond = nb_fit(train, buckets=BUCKETS, ns=(2, 3),
                          features="char")
    pred = nb_predict(test, labels, cond, buckets=BUCKETS, ns=(2, 3),
                      features="char")
    conf = {(r["true_label"], r["pred_label"]): r["n_docs"]
            for r in nb_confusion(pred, test).collect()}
    n_ok = conf.get(("a", "a"), 0) + conf.get(("b", "b"), 0)
    assert n_ok == sum(conf.values()) == 40   # perfect held-out split


def test_calibration_bins_perfectly_calibrated_synthetic(spark):
    import pyspark.sql.functions as F
    from ocr_engine_spark.functions.classify import calibration_bins
    # synthetic margins whose sigmoid is ~0.25 and ~0.75, with truth
    # drawn to match those rates exactly -> gaps near zero; and an
    # over-confident margin (~0.95) with a 50% truth rate -> big gap
    import math
    m25 = int(round(math.log(0.25 / 0.75) * 1e6))
    m75 = int(round(math.log(0.75 / 0.25) * 1e6))
    m95 = int(round(math.log(0.95 / 0.05) * 1e6))
    rows, truth = [], []
    did = 0
    for _ in range(20):
        for (m, pos) in ((m25, False), (m25, False), (m25, False),
                         (m25, True),
                         (m75, True), (m75, True), (m75, True),
                         (m75, False),
                         (m95, True), (m95, False)):
            rows.append((did, m))
            truth.append((did, "spam" if pos else "ham"))
            did += 1
    margins = spark.createDataFrame(rows, ["doc_id", "margin_micro"])
    t = spark.createDataFrame(truth, ["doc_id", "label"])
    got = {r["bin"]: r for r in
           calibration_bins(margins, t, pos_label="spam").collect()}
    assert got[2]["pos_rate_ppm"] == 250_000       # bin [0.2, 0.3)
    assert got[2]["gap_ppm"] < 2_000
    assert got[7]["pos_rate_ppm"] == 750_000
    assert got[7]["gap_ppm"] < 2_000
    assert got[9]["pos_rate_ppm"] == 500_000       # over-confident
    assert got[9]["gap_ppm"] > 400_000
