"""Evaluation pipeline — the DataFrame mirror of the reference's
``test/comprehensive_evaluation.py:230-412``.

scan extractions -> derived-key golden lookup (broadcast) -> CER ->
meets_target -> grouped metrics (overall / type / severity) -> top-k.

All metric math is built-in Catalyst expressions (``F.levenshtein`` — no
UDF, SURVEY.md §2.5 A1-A5); the golden and degradation tables are small
dimension tables and are broadcast (the reference's dict probes,
comprehensive_evaluation.py:139,156-159, were hand-rolled broadcast hash
joins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEGRADED_RE = r"_degraded_\d+$"
CER_TARGET = 2.0  # comprehensive_evaluation.py:180


def normalize_text_col(c: Column) -> Column:
    """comprehensive_evaluation.py:109-112 — collapse whitespace + strip."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def cer_col(reference: Column, hypothesis: Column) -> Column:
    """A1 — Character Error Rate (comprehensive_evaluation.py:115-124):
    ``levenshtein(norm(ref), norm(hyp)) / len(norm(ref)) * 100`` with the
    reference's edge cases: empty ref -> 100.0 if hyp else 0.0."""
    ref = F.coalesce(reference, F.lit(""))
    hyp = F.coalesce(hypothesis, F.lit(""))
    ref_n = normalize_text_col(ref)
    hyp_n = normalize_text_col(hyp)
    return (
        F.when(ref == "", F.when(hyp == "", F.lit(0.0)).otherwise(F.lit(100.0)))
         # equality fast path: levenshtein(x, x) == 0 but still costs
         # O(n*m) in the JVM; most documents pass extraction unchanged
         .when(ref_n == hyp_n, F.lit(0.0))
         .otherwise(F.levenshtein(ref_n, hyp_n) / F.length(ref_n) * 100.0)
    )


def base_url_col(url: Column) -> Column:
    """J3 — the derived-key join: a degraded variant's golden lives under
    its base url (reference: ``name.split('_')[0] + '.png'``,
    comprehensive_evaluation.py:126-135; ours strips the
    ``_degraded_NNN`` suffix). Many-to-one fan-in = the skew motif."""
    return F.regexp_replace(url, DEGRADED_RE, "")


def evaluate_extractions(extractions: DataFrame, golden: DataFrame,
                         degradations: DataFrame | None = None) -> DataFrame:
    """Per-document evaluation rows (comprehensive_evaluation.py:166-183):
    (url, type, byte_identical, cer, meets_target, status [, severity]).

    ``byte_identical`` compares raw extracted text; ``cer`` is computed on
    the post-processed (cleaned) text like the reference
    (apply_postprocessing=True path, comprehensive_evaluation.py:97-99).
    """
    ext = extractions.withColumn("base_url", base_url_col(F.col("url")))
    ext = ext.withColumn(
        "type",
        F.when(F.col("url").rlike(DEGRADED_RE), F.lit("synthetic"))
         .otherwise(F.lit("original")))
    g = golden.select(
        F.col("url").alias("base_url"),
        F.col("raw_text").alias("golden_text"),
        F.col("clean_text").alias("golden_clean"))
    # J1: broadcast hash join on the derived key; F5/J2: rows without a
    # golden are skipped (left join + null filter = semi-join semantics)
    joined = ext.join(F.broadcast(g), "base_url", "left")
    evaluated = joined.filter(F.col("golden_text").isNotNull())
    empty_hyp = F.coalesce(F.col("clean_text"), F.lit("")) == ""
    out = evaluated.select(
        "url", "base_url", "type", "payload_kind", "provider",
        "partition_id",
        # extraction-failed path: cer=100, status='failed' (eval.py:170-176)
        F.when(empty_hyp, F.lit("failed")).otherwise(F.col("status"))
         .alias("status"),
        F.coalesce(F.col("extracted_text") == F.col("golden_text"),
                   F.lit(False)).alias("byte_identical"),
        F.round(
            F.when(empty_hyp, F.lit(100.0))
             .otherwise(cer_col(F.col("golden_clean"), F.col("clean_text"))),
            2).alias("cer"),
    ).withColumn("meets_target", F.col("cer") < F.lit(CER_TARGET))
    if degradations is not None:
        dim = degradations.select("url", "severity")  # S4/J4 dim table
        out = out.join(F.broadcast(dim), "url", "left")
    return out


def summary_metrics(evaluated: DataFrame) -> DataFrame:
    """A3-A5 — the grouped summaries (comprehensive_evaluation.py:295-330),
    as one unioned metrics table with a ``scope`` key (matches the
    expected_metrics fixture shape, FIXTURES.md §5)."""
    success = F.col("status") == "success"
    metric_names = ["n_files", "n_success", "avg_cer", "n_meets_target",
                    "n_byte_identical"]

    def agg_exprs() -> list[Column]:
        return [
            F.count("*").alias("n_files"),
            F.sum(success.cast("long")).alias("n_success"),
            F.round(F.avg(F.when(success, F.col("cer"))), 4).alias("avg_cer"),
            F.sum((F.col("cer") < CER_TARGET).cast("long"))
             .alias("n_meets_target"),
            F.sum(F.col("byte_identical").cast("long"))
             .alias("n_byte_identical"),
        ]

    overall = evaluated.agg(*agg_exprs()).select(
        F.lit("overall").alias("scope"), *metric_names)
    by_type = evaluated.groupBy("type").agg(*agg_exprs()).select(
        F.concat(F.lit("type:"), F.col("type")).alias("scope"), *metric_names)
    parts = [overall, by_type]
    if "severity" in evaluated.columns:
        by_sev = (evaluated.filter(F.col("severity").isNotNull())
                  .groupBy("severity").agg(*agg_exprs())
                  .select(F.concat(F.lit("severity:"), F.col("severity"))
                          .alias("scope"), *metric_names))
        parts.append(by_sev)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def top_k_by_cer(evaluated: DataFrame, k: int = 10,
                 best: bool = True) -> DataFrame:
    """O2/O3 — TakeOrderedAndProject (comprehensive_evaluation.py:344-352).
    Ties broken by url for determinism."""
    order = [F.col("cer").asc() if best else F.col("cer").desc(),
             F.col("url").asc()]
    return evaluated.orderBy(*order).limit(k).select(
        "url", "type", "cer", "meets_target", "status")
