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
