"""Sequential cleaning-funnel report — the per-stage removal table
every web-corpus paper publishes (RefinedWeb, Penedo et al. 2023;
FineWeb, Penedo et al. 2024: "% of documents removed at each step"):
input -> length floor -> quality floor -> exact dedup, each stage
applied to the SURVIVORS of the previous one.

The whole funnel is ONE corpus scan: every stage predicate is an
aggregate sum over the same pass (conjunction of the prefix of
predicates = that stage's survivor count), exact dedup is a distinct
count of survivor fingerprints in the same aggregate, and the stage
rows unfold from the single 1-row result via an explode of a struct
literal — no per-stage job, no driver loop, nothing rescanned.

Thresholds follow the repo's portability discipline: the quality
floor compares ``floor(raw * 1e6 + 0.5)`` micro units (host_risk's
rule — never a second round over the presentation round)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_engine_spark.functions.text import (
    fingerprint_col, quality_score_raw_col, token_count_col,
)


def filter_funnel(docs: DataFrame, *, min_tokens: int = 25,
                  min_quality_micro: int = 350_000,
                  text_col: str = "text") -> DataFrame:
    """(stage_idx, stage, n_in, n_kept, drop_ppm) — 4 rows."""
    t = F.col(text_col)
    p1 = token_count_col(t) >= int(min_tokens)
    q_micro = F.floor(quality_score_raw_col(t) * 1e6 + F.lit(0.5))
    p2 = q_micro >= int(min_quality_micro)
    fp = fingerprint_col(t)
    agg = docs.agg(
        F.count("*").alias("c0"),
        F.sum(p1.cast("long")).alias("c1"),
        F.sum((p1 & p2).cast("long")).alias("c2"),
        F.countDistinct(F.when(p1 & p2, fp)).alias("c3"))

    def stage(idx: int, name: str, n_in, n_kept):
        return F.struct(F.lit(idx).alias("stage_idx"),
                        F.lit(name).alias("stage"),
                        n_in.cast("long").alias("n_in"),
                        n_kept.cast("long").alias("n_kept"))

    stages = F.array(
        stage(0, "input", F.col("c0"), F.col("c0")),
        stage(1, f"min_tokens_{int(min_tokens)}",
              F.col("c0"), F.col("c1")),
        stage(2, f"quality_micro_{int(min_quality_micro)}",
              F.col("c1"), F.col("c2")),
        stage(3, "exact_dedup", F.col("c2"), F.col("c3")))
    return (agg.select(F.explode(stages).alias("s"))
            .select("s.stage_idx", "s.stage", "s.n_in", "s.n_kept",
                    F.when(F.col("s.n_in") > 0,
                           F.expr("((s.n_in - s.n_kept) * 1000000)"
                                  " div s.n_in"))
                    .alias("drop_ppm")))


def threshold_sweep(docs: DataFrame, thresholds_micro: list[int], *,
                    text_col: str = "text") -> DataFrame:
    """Quality-threshold retention curve (the DataComp/DCLM sweep:
    every filtering paper publishes "tokens retained vs threshold"
    before picking the cut): for each candidate micro-unit quality
    floor, documents and tokens retained, in counts and ppm — ONE
    corpus scan, every threshold an aggregate conjunction over the
    same once-computed quality column, rows unfolded funnel-style.
    Returns (threshold_micro, n_docs_kept, docs_ppm, n_tokens_kept,
    tokens_ppm) ordered by threshold. Duplicate threshold values are
    collapsed (each yields one per-threshold alias column; a repeat
    would make the alias ambiguous)."""
    thresholds_micro = sorted({int(t) for t in thresholds_micro})
    t = F.col(text_col)
    q_micro = F.floor(quality_score_raw_col(t) * 1e6 + F.lit(0.5))
    n_tok = token_count_col(t)
    aggs = [F.count("*").alias("__n"),
            F.sum(n_tok).alias("__tok")]
    for th in thresholds_micro:
        th = int(th)
        keep = q_micro >= th
        aggs.append(F.sum(keep.cast("long")).alias(f"__d_{th}"))
        aggs.append(F.sum(F.when(keep, n_tok).otherwise(F.lit(0)))
                    .alias(f"__t_{th}"))
    a = docs.agg(*aggs)

    def stage(th: int):
        th = int(th)
        return F.struct(
            F.lit(th).cast("long").alias("threshold_micro"),
            F.col(f"__d_{th}").cast("long").alias("n_docs_kept"),
            F.expr(f"(__d_{th} * 1000000) div greatest(__n, 1)")
            .alias("docs_ppm"),
            F.col(f"__t_{th}").cast("long").alias("n_tokens_kept"),
            F.expr(f"(__t_{th} * 1000000) div greatest(__tok, 1)")
            .alias("tokens_ppm"))

    stages = F.array(*[stage(th) for th in thresholds_micro])
    return (a.select(F.explode(stages).alias("s")).select("s.*")
            .orderBy("threshold_micro"))
