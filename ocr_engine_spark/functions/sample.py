"""Deterministic exact-count stratified sampling — the corpus-balancing
step (per-language / per-source quotas) every large-scale training-data
pipeline runs before mixing.

Semantics: within each stratum, keep the ``n`` rows with the smallest
PORTABLE hash rank ``md5(stratum || 0x1f || id)`` — deterministic,
engine-independent (DuckDB computes the identical rank), and unbiased
with respect to any corpus ordering.

Scale design — the naive implementation is
``Window.partitionBy(stratum).orderBy(rank)``: ONE task per stratum, so
a 100-TB corpus with 30 languages sorts 30 multi-TB groups in 30 tasks.
Instead the same two-phase range-partition prefix rank as
``pack.pack_sequences``:

  * ``repartitionByRange((stratum, rank))`` — every stratum occupies a
    contiguous run of bounded partitions, ordered by rank;
  * per-(partition, stratum) counts to the driver — bounded by
    n_partitions + n_strata rows (each partition holds at most one
    partial stratum at each edge), NOT by data size;
  * running per-stratum offsets broadcast back; global rank =
    stratum offset before this partition + within-partition rank, where
    the within-partition window groups on (partition, stratum) — skew
    proof, every window group is bounded by the range-partition size.

The only full-data shuffles are the range partition (it IS the order)
and the window's hash partition on (partition, stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# unit separator — cannot appear in ids/strata, keeps the concat
# collision-free and is expressible in DuckDB as chr(31)
_SEP = "\x1f"


def sample_rank_col(strata_col, id_col):
    """The portable per-row rank key: ``md5(stratum || 0x1f || id)``.
    DuckDB twin: ``md5(stratum || chr(31) || CAST(id AS VARCHAR))``."""
    return F.md5(F.concat_ws(_SEP, strata_col.cast("string"),
                             id_col.cast("string")))


def stratified_sample(df: DataFrame, n_per_stratum: int, *,
                      strata_col: str = "lang", id_col: str = "doc_id",
                      partitions: int | None = None,
                      rank_out: str | None = None) -> DataFrame:
    """Exactly ``min(n_per_stratum, |stratum|)`` rows per stratum —
    the ones with the smallest portable hash rank. Columns of ``df``
    pass through unchanged; ``rank_out`` optionally adds the 1-based
    within-stratum rank.

    Deterministic for a given (strata, id) population regardless of row
    order, partitioning or cluster size — the property that makes a
    sampled corpus reproducible across reruns and engine versions.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (df.withColumn("__rk", sample_rank_col(F.col(strata_col),
                                               F.col(id_col)))
         .repartitionByRange(partitions, strata_col, "__rk", id_col)
         .withColumn("__part", F.spark_partition_id())
         .persist())
    # phase 1: bounded driver read — one row per (partition, stratum)
    # pair that actually co-occurs; ordered running sum per stratum
    counts = (d.groupBy("__part", strata_col).count()
              .orderBy(strata_col, "__part").collect())
    if not counts:
        return df.filter(F.lit(False))
    offsets, acc, cur = [], 0, None
    for r in counts:
        if r[strata_col] != cur:
            cur, acc = r[strata_col], 0
        offsets.append((r["__part"], r[strata_col], acc))
        acc += r["count"]
    # schema inferred from the values so non-string strata keep their
    # type for the equi-join below
    off_df = (spark.createDataFrame(offsets,
                                    ["__part", strata_col, "__off"])
              .withColumn("__part", F.col("__part").cast("int")))
    # phase 2: within-(partition, stratum) rank + broadcast offset.
    # Range partitioning ordered by (stratum, rank) makes
    # offset + local rank the exact global within-stratum rank.
    w = Window.partitionBy("__part", strata_col).orderBy("__rk", id_col)
    out = (d.join(F.broadcast(off_df), ["__part", strata_col])
           .withColumn("__grank", F.col("__off") + F.row_number().over(w))
           .filter(F.col("__grank") <= n_per_stratum))
    if rank_out is not None:
        out = out.withColumn(rank_out, F.col("__grank"))
    return out.drop("__rk", "__part", "__off", "__grank")
