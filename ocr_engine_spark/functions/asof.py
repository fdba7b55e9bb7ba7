"""As-of (nearest-earlier) join — a custom operator Spark lacks,
implemented as a composition of built-in DataFrame ops (the task-brief
pattern: composition first, Pandas UDFs only when semantics demand).

Semantics (backward as-of, DuckDB/pandas ``merge_asof`` convention):
for every left row, attach the right row with the LARGEST right_ts <=
left_ts within the same key group; null if none.

Plan shape: union the two tagged inputs, ONE shuffle on the key, one
window sort on (ts, tag), carry the last-seen right values forward with
``last(..., ignorenulls=True)``, keep left rows. Cost = one shuffle +
one per-partition sort — same asymptotics as a sort-merge join, no
range-explosion, no cross product. Skewed keys take the same salting
treatment as any hot-key shuffle (functions/skew.py).

Oracle: DuckDB's native ``ASOF LEFT JOIN`` checks the semantics
value-for-value (__spark_entry__.q_asof_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(left: DataFrame, right: DataFrame, *, on: str,
               left_ts: str, right_ts: str,
               value_cols: list[str]) -> DataFrame:
    """Backward as-of join. Right rows tie-sorted BEFORE left rows at
    equal timestamps, so a right row at exactly left_ts is matched
    (the >= convention). Preconditions (divergences from DuckDB ASOF /
    pandas merge_asof if violated):

      * right (key, ts) pairs unique — pre-aggregate duplicates or the
        carried value is sort-ambiguous;
      * right value columns non-null — ``last(ignorenulls=True)`` would
        carry the PREVIOUS quote past a legitimately-null row instead
        of matching it as null;
      * join keys non-null — null keys group together here, whereas
        DuckDB/pandas never match them.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__tag", F.lit(1))
    rt = (right.select(F.col(on),
                       F.col(right_ts).alias("__ts"),
                       *[F.col(c).alias(f"__r_{c}") for c in value_cols])
          .withColumn("__tag", F.lit(0)))
    for c in lt.columns:
        if c not in rt.columns:
            rt = rt.withColumn(c, F.lit(None).cast(lt.schema[c].dataType))
    for c in rt.columns:
        if c not in lt.columns:
            lt = lt.withColumn(c, F.lit(None).cast(rt.schema[c].dataType))
    u = lt.unionByName(rt.select(lt.columns))
    w = (Window.partitionBy(on).orderBy("__ts", "__tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    for c in value_cols:
        u = u.withColumn(c if c not in left.columns else f"{c}_right",
                         F.last(f"__r_{c}", ignorenulls=True).over(w))
    return (u.filter(F.col("__tag") == 1)
            .drop("__ts", "__tag", *[f"__r_{c}" for c in value_cols]))
