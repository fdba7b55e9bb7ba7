"""Evaluation-pipeline tests — mirror of comprehensive_evaluation.py."""

import pyspark.sql.functions as F

from ocr_engine_spark.engine.evaluate import (
    cer_col, evaluate_extractions, summary_metrics, top_k_by_cer,
)


def _evaluated(extractions_df, golden_df, degradations_df):
    return evaluate_extractions(extractions_df, golden_df,
                                degradations_df).cache()


def test_cer_formula_edge_cases(spark):
    df = spark.createDataFrame(
        [("abc", "abc"), ("abc", "axc"), ("", ""), ("", "x"), ("ab  c", "ab c"),
         (None, "x"), ("abcd", None)],
        ["ref", "hyp"])
    got = df.select(F.round(cer_col(F.col("ref"), F.col("hyp")), 4)
                    .alias("cer")).collect()
    vals = [r.cer for r in got]
    # reference semantics (comprehensive_evaluation.py:115-124)
    assert vals[0] == 0.0
    assert abs(vals[1] - 100.0 / 3) < 1e-3  # rounded to 4dp upstream
    assert vals[2] == 0.0
    assert vals[3] == 100.0
    assert vals[4] == 0.0          # whitespace-normalized before distance
    assert vals[5] == 100.0        # empty ref, nonempty hyp
    assert vals[6] == 100.0        # hyp missing -> full error


def test_originals_have_zero_cer(extractions_df, golden_df, degradations_df):
    ev = _evaluated(extractions_df, golden_df, degradations_df)
    originals = ev.filter(F.col("type") == "original")
    assert originals.count() == golden_df.count()
    assert originals.filter(~F.col("byte_identical")).count() == 0
    assert originals.filter(F.col("cer") != 0.0).count() == 0
    assert originals.filter(~F.col("meets_target")).count() == 0


def test_synthetic_rows_join_via_derived_key(extractions_df, golden_df,
                                             degradations_df):
    ev = _evaluated(extractions_df, golden_df, degradations_df)
    synth = ev.filter(F.col("type") == "synthetic")
    n_degr_with_golden = (
        degradations_df.join(golden_df.select(F.col("url").alias("source_url")),
                             "source_url").count())
    assert synth.count() == n_degr_with_golden
    assert synth.filter(F.col("severity").isNull()).count() == 0
    # high-severity degradations must hurt: some nonzero CER exists
    assert synth.filter(F.col("cer") > 0.0).count() > 0


def test_summary_metrics_shape(extractions_df, golden_df, degradations_df):
    ev = _evaluated(extractions_df, golden_df, degradations_df)
    m = {r.scope: r for r in summary_metrics(ev).collect()}
    assert "overall" in m and "type:original" in m
    overall = m["overall"]
    assert overall.n_files == ev.count()
    assert m["type:original"].avg_cer == 0.0
    assert m["type:original"].n_byte_identical == m["type:original"].n_files
    sev_scopes = [s for s in m if s.startswith("severity:")]
    assert sev_scopes, "severity grouping missing"
    assert sum(m[s].n_files for s in sev_scopes) == \
        ev.filter(F.col("type") == "synthetic").count()


def test_top_k(extractions_df, golden_df, degradations_df):
    ev = _evaluated(extractions_df, golden_df, degradations_df)
    top = top_k_by_cer(ev, k=10).collect()
    assert len(top) == 10
    assert all(top[i].cer <= top[i + 1].cer for i in range(len(top) - 1))
    plan = top_k_by_cer(ev, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_golden_join_is_broadcast(extractions_df, golden_df):
    ev = evaluate_extractions(extractions_df, golden_df)
    plan = ev._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_frozen_char_levenshtein_paths():
    """The independent char-level levenshtein used by the flagship
    oracle (fixtures/frozen.py): remapped-byte DuckDB path and the
    pure-Python DP fallback must agree, at character (not byte)
    granularity."""
    import duckdb
    from ocr_engine_spark.fixtures.frozen import _char_levenshtein
    con = duckdb.connect()
    cases = [("kitten", "sitting", 3), ("", "abc", 3), ("abc", "abc", 0),
             ("اب", "b", 2),   # 2 CHARS away, 3 bytes away
             ("café", "cafe", 1)]
    for a, b, want in cases:
        assert _char_levenshtein(a, b, con) == want
        assert _char_levenshtein(a, b, None) == want  # DP fallback


# ---------------------------------------------------------------------------
# CER length-gap gate + WER (round 3)
# ---------------------------------------------------------------------------

def _tok_lev(a, b):
    """Reference token-level Levenshtein (plain Python DP)."""
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[n]


def test_wer_matches_python_dp(spark):
    from ocr_engine_spark.engine.evaluate import wer_col
    import pyspark.sql.functions as F
    cases = [
        ("the quick brown fox", "the quick brown fox", 0.0),
        ("a b c d", "a x c d", 25.0),          # 1 sub / 4
        ("a b c d", "a c d", 25.0),            # 1 del / 4
        ("a b c", "a b c d e", 200.0 / 3),     # 2 ins / 3
        ("", "", 0.0),
        ("", "something here", 100.0),
        ("ref words only", "", 100.0),
        ("naïve café über tokens", "naïve cafe über tokens", 25.0),
    ]
    # plus a >255-joint-vocab pair: exercises codepoints past one byte
    big_ref = " ".join(f"tok{i}" for i in range(300))
    big_hyp = " ".join(f"tok{i}" if i % 7 else f"sub{i}" for i in range(300))
    cases.append((big_ref, big_hyp,
                  _tok_lev(big_ref.split(), big_hyp.split()) / 300 * 100))
    df = spark.createDataFrame([(r, h) for r, h, _ in cases],
                               "ref string, hyp string")
    got = [r["wer"] for r in df.select(
        F.round(wer_col(F.col("ref"), F.col("hyp")), 6).alias("wer"))
        .collect()]
    for (ref, hyp, want), g in zip(cases, got):
        assert abs(g - want) < 1e-6, (ref[:40], hyp[:40], g, want)


def test_wer_null_and_python_dp_agree_on_corpus(spark):
    """WER vs the Python DP on real corpus docs vs their perturbations."""
    import os
    import pyspark.sql.functions as F
    from ocr_engine_spark.engine.evaluate import wer_col
    from tests.conftest import TESTDATA_SF001
    docs = spark.read.parquet(
        os.path.join(TESTDATA_SF001, "documents.parquet")) \
        .filter(F.col("doc_id") < 15)
    hyp = F.regexp_replace(F.col("text"), "the", "thx")
    rows = docs.select(
        "text", hyp.alias("hyp"),
        F.round(wer_col(F.col("text"), hyp), 6).alias("wer")).collect()
    assert rows
    for r in rows:
        want = _tok_lev(r["text"].split(), r["hyp"].split()) \
            / max(len(r["text"].split()), 1) * 100
        assert abs(r["wer"] - want) < 1e-6


def test_meets_cer_target_gate_agrees_with_exact(spark):
    """The length-gap gate must change NOTHING about the decision, only
    skip the DP when the bound already decides it."""
    import pyspark.sql.functions as F
    from ocr_engine_spark.engine.evaluate import (
        cer_col, cer_lower_bound_col, meets_cer_target_col,
    )
    base = "word " * 200
    cases = [
        (base, base),                      # identical -> meets
        (base, base[: len(base) // 2]),    # huge gap -> gate fires, fails
        (base, base + "tail"),             # tiny gap -> DP decides
        (base, base.replace("word", "wrd", 3)),
        ("", ""), ("", "x"), ("ref", ""),
    ]
    df = spark.createDataFrame(cases, "ref string, hyp string")
    rows = df.select(
        (cer_col(F.col("ref"), F.col("hyp")) < 2.0).alias("exact"),
        meets_cer_target_col(F.col("ref"), F.col("hyp"), 2.0).alias("gated"),
        (cer_lower_bound_col(F.col("ref"), F.col("hyp")) >= 2.0)
        .alias("gate_fired")).collect()
    assert [r["exact"] for r in rows] == [r["gated"] for r in rows]
    assert any(r["gate_fired"] for r in rows)      # fixture exercises it
    assert not all(r["gate_fired"] for r in rows)  # ...and the DP path


def test_cer_whitespace_only_reference_rows(spark):
    """Blank pages (whitespace-only text) are routine in OCR; neither
    the CER nor the gate may abort the job under ANSI (round-3
    review finding: the pre-guard expressions divided by zero)."""
    import pyspark.sql.functions as F
    from ocr_engine_spark.engine.evaluate import (
        cer_col, cer_lower_bound_col, meets_cer_target_col,
    )
    rows = [("  ", "   "),      # blank vs blank -> 0, meets
            ("  ", "words"),    # blank ref, real hyp -> 100, fails
            ("\t\n ", ""),      # blank ref, empty hyp -> 0, meets
            ("real text", "  ")]  # real ref, blank hyp -> 100, fails
    df = spark.createDataFrame(rows, "ref string, hyp string")
    got = df.select(
        F.round(cer_col(F.col("ref"), F.col("hyp")), 2).alias("cer"),
        meets_cer_target_col(F.col("ref"), F.col("hyp"), 2.0).alias("m"),
        F.round(cer_lower_bound_col(F.col("ref"), F.col("hyp")), 2)
        .alias("b")).collect()
    assert [(r.cer, r.m) for r in got] == [
        (0.0, True), (100.0, False), (0.0, True), (100.0, False)]
    assert all(r.b <= r.cer for r in got)  # it IS a lower bound


def test_token_prf_multiset_and_edges(spark):
    """token_prf counts tokens as a MULTISET (min of the two counts,
    not set intersection) and follows the SQuAD empty-edge convention:
    both-empty -> 100/100/100, one-empty -> 0/0/0."""
    from ocr_engine_spark.engine.evaluate import token_prf
    rows = [
        (0, "a a b", "a a a b"),   # tp = min(2,3)+min(1,1)=3: p=75 r=100
        (1, "x y z", "x y z"),     # identical -> 100/100/100
        (2, "", ""),               # both empty -> 100/100/100
        (3, "words here", "  "),   # hyp blank -> 0/0/0
        (4, " \t", "leak"),        # ref blank -> 0/0/0
        (5, "p q", "r s"),         # disjoint -> 0/0/0
    ]
    df = spark.createDataFrame(rows, "doc_id long, ref string, hyp string")
    got = {r.doc_id: (r.precision, r.recall, r.f1)
           for r in token_prf(df, "ref", "hyp").collect()}
    assert got[0] == (75.0, 100.0, round(2 * 75 * 100 / 175, 4))
    assert got[1] == (100.0, 100.0, 100.0)
    assert got[2] == (100.0, 100.0, 100.0)
    assert got[3] == (0.0, 0.0, 0.0)
    assert got[4] == (0.0, 0.0, 0.0)
    assert got[5] == (0.0, 0.0, 0.0)
