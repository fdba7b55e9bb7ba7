"""Skew handling: salted repartition + two-phase salted aggregation.

The north_rule calls for explicit salted keys for skewed hosts: a
Common-Crawl corpus clusters by host (the fixture corpus makes one host
~30% of all rows, fixtures/gen_pages.py:40), so any host-keyed shuffle
— per-host aggregation, per-host joins, politeness bucketing — sends a
third of the data to one reducer. The reference shows the miniature of
this motif in its many-to-one derived-key join
(test/comprehensive_evaluation.py:126-135).

Two tools, both pure Catalyst expressions:

  * ``salted_repartition`` — spread a hot key over ``n_salt`` synthetic
    sub-keys for embarrassingly-parallel per-row work downstream.
  * ``salted_agg`` — the classic two-phase aggregate: partial aggregate
    on (key, salt) — ``n_salt`` reducers share each hot key — then
    final combine on key. Works for any algebraic aggregate
    (sum/count/min/max; avg = sum+count combined at the end).

AQE's skew-join splitting (enabled in engine/session.py) covers the
JOIN side of the same problem at runtime; these helpers cover
aggregation and layout, which AQE does not rebalance.

The salt is ``pmod(xxhash64(row-identity), n_salt)`` — deterministic
per row (resume-safe, no rand()), uniform across a hot key's rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_AGGS = {
    "sum": F.sum, "count": F.count, "min": F.min, "max": F.max,
}
_COMBINE = {  # how partial results combine in the final phase
    "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
}


def host_col(url: Column) -> Column:
    """Host part of a url (the natural skew key of a crawl corpus)."""
    return F.parse_url(url, F.lit("HOST"))


def salt_col(identity: Column, n_salt: int) -> Column:
    """Deterministic per-row salt in [0, n_salt)."""
    return F.pmod(F.xxhash64(identity), F.lit(n_salt)).cast("int")


def salted_repartition(df: DataFrame, key: Column, identity: Column,
                       n_partitions: int, n_salt: int = 16) -> DataFrame:
    """Repartition by (key, salt): a key holding 30% of rows lands on
    ~n_salt partitions instead of one. ``identity`` is any per-row
    expression (e.g. the url) that varies within a key."""
    return df.repartition(n_partitions, key, salt_col(identity, n_salt))


def salted_agg(df: DataFrame, key: str, identity: Column,
               aggs: list[tuple[str, str, str]],
               n_salt: int = 16) -> DataFrame:
    """Two-phase skew-safe groupBy.

    ``aggs`` = [(column, fn, alias)] with fn in sum|count|min|max.
    Phase 1 aggregates on (key, salt) — each hot key's load is shared by
    ``n_salt`` reducers; phase 2 combines partials per key. Result is
    row-for-row identical to ``df.groupBy(key).agg(...)`` (asserted in
    tests); the win is the shuffle shape, not the algebra.
    """
    partial = (df
               .withColumn("__salt", salt_col(identity, n_salt))
               .groupBy(key, "__salt")
               .agg(*[_AGGS[fn](c).alias(f"__p_{alias}")
                      for c, fn, alias in aggs]))
    return (partial.groupBy(key)
            .agg(*[_COMBINE[fn](f"__p_{alias}").alias(alias)
                   for _, fn, alias in aggs]))


def key_histogram(df: DataFrame, key: Column, top_k: int = 10) -> DataFrame:
    """Diagnostic: heaviest keys + their share of all rows (drives the
    choice of n_salt; at 10^12 rows run it on a sample). ONE scan: the
    total comes from summing the per-key counts over an empty window,
    not a second df.count() pass."""
    from pyspark.sql import Window
    counts = df.groupBy(key.alias("key")).agg(F.count("*").alias("n_rows"))
    total = F.sum("n_rows").over(Window.partitionBy())
    return (counts
            .withColumn("share", F.round(F.col("n_rows") / total, 4))
            .orderBy(F.col("n_rows").desc(), F.col("key").asc())
            .limit(top_k))
