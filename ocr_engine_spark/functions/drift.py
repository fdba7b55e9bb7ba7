r"""Corpus distribution drift between crawl snapshots.

A 100 TB ingest retrains on every new crawl; the question "did the
corpus move under us?" (language mix, host mix, length profile,
quality-score profile) must be answered BEFORE training, from metrics,
not after, from loss curves. This module compares a categorical
column's distribution across two snapshots and reports per-value and
aggregate divergences.

Scale shape: both snapshots union with a side tag into ONE
groupBy(value) aggregate (map-side combine absorbs hot values), the
1-row totals frame re-enters via a broadcast cross join, and every
divergence term is quantized ONCE to integer micro-nats
(``round(x * 1e6)`` as BIGINT, the dsir.py/lm.py fixed-point
discipline) so the aggregate sums are exact 64-bit arithmetic —
bit-identical across partitioning, parallelism and reduce order, the
property a drift GATE needs (a float sum that flips its comparison
under re-partitioning would make the gate nondeterministic).

Definitions (replayed verbatim by the DuckDB oracle):

* smoothed share ``p = (n + alpha) / (total + alpha * K)`` with ``K``
  = number of distinct values observed across BOTH snapshots (add-
  alpha keeps one-sided values finite);
* ``kl_term = p_new * ln(p_new / p_old)`` — contribution to
  KL(new || old); negative terms are real (KL sums to >= 0, its terms
  do not);
* ``js_term = (p_new*ln(p_new/m) + p_old*ln(p_old/m)) / 2`` with
  ``m = (p_new + p_old) / 2`` — Jensen-Shannon, bounded by ln 2;
* total variation = ``sum(|p_new_micro - p_old_micro|) div 2`` — pure
  integer arithmetic on the quantized shares.

Numeric columns bucket first (e.g. ``F.floor(F.col('n_chars')/100)``)
— drift over a continuous column is drift over its histogram.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MICRO = 1e6


def _micro(c: Column) -> Column:
    return F.round(c * F.lit(MICRO), 0).cast("long")


def distribution_drift(old: DataFrame, new: DataFrame, col: str, *,
                       alpha: float = 0.5) -> DataFrame:
    """Per-value drift table: (value, n_old, n_new, p_old_micro,
    p_new_micro, kl_term_micro, js_term_micro), one row per distinct
    value observed in either snapshot."""
    tagged = (old.select(F.col(col).alias("value"),
                         F.lit(1).alias("__old"), F.lit(0).alias("__new"))
              .unionByName(
                  new.select(F.col(col).alias("value"),
                             F.lit(0).alias("__old"),
                             F.lit(1).alias("__new"))))
    counts = (tagged.groupBy("value")
              .agg(F.sum("__old").cast("long").alias("n_old"),
                   F.sum("__new").cast("long").alias("n_new")))
    totals = counts.agg(F.sum("n_old").alias("__t_old"),
                        F.sum("n_new").alias("__t_new"),
                        F.count("*").alias("__k"))
    j = counts.crossJoin(F.broadcast(totals))
    a = F.lit(float(alpha))
    p_old = (F.col("n_old") + a) / (F.col("__t_old") + a * F.col("__k"))
    p_new = (F.col("n_new") + a) / (F.col("__t_new") + a * F.col("__k"))
    m = (p_old + p_new) / 2
    return j.select(
        "value", "n_old", "n_new",
        _micro(p_old).alias("p_old_micro"),
        _micro(p_new).alias("p_new_micro"),
        _micro(p_new * F.log(p_new / p_old)).alias("kl_term_micro"),
        _micro((p_new * F.log(p_new / m)
                + p_old * F.log(p_old / m)) / 2).alias("js_term_micro"))


def drift_summary(old: DataFrame, new: DataFrame, col: str, *,
                  alpha: float = 0.5) -> DataFrame:
    """One-row gate input: n_values, both totals, KL(new||old), JS and
    total-variation — every divergence an exact integer micro-nat /
    micro-share sum over the per-value table."""
    d = distribution_drift(old, new, col, alpha=alpha)
    return d.agg(
        F.count("*").alias("n_values"),
        F.sum("n_old").alias("total_old"),
        F.sum("n_new").alias("total_new"),
        F.sum("kl_term_micro").alias("kl_micro"),
        F.sum("js_term_micro").alias("js_micro"),
        F.expr("sum(abs(p_new_micro - p_old_micro)) div 2")
         .alias("tv_micro"))
