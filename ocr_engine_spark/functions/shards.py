"""Training-shard sink: write packed sequences (functions/pack.py) as
deterministic, size-bounded, individually-checksummed shards — the
hand-off format between a tokenization pipeline and a training job.

What a 100 TB run needs from this sink:

  * DETERMINISTIC shard membership — shard ``s`` holds exactly
    sequences ``[s * seqs_per_shard, (s+1) * seqs_per_shard)``; rerun
    the pipeline and byte-identical shards come out, so a training job
    can resume mid-epoch against re-materialized data;
  * bounded shard size — data-loader memory is sized to
    ``seqs_per_shard * seq_len`` tokens, never to corpus skew;
  * a MANIFEST with per-shard counts and token checksums, written
    through the Spark writer (object-store safe, no driver fs calls),
    so corruption or partial writes are detectable before a training
    job consumes them (``verify_shards`` recomputes and diffs);
  * one file per shard: hash-repartition on shard_id gives each shard
    a single writing task; ``partitionBy(shard_id)`` makes the shard
    the directory unit a loader can fetch independently.

The manifest math (count / token-sum / min-max ids) is pure integer
arithmetic over the oracle-gated pack output, so the ``shard_manifest``
query is value-checked end to end against DuckDB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def with_shard_id(packed: DataFrame, seqs_per_shard: int) -> DataFrame:
    """Packed sequences + ``shard_id = seq_id div seqs_per_shard``
    (integer div — seq_ids are dense longs from pack_sequences)."""
    return packed.withColumn(
        "shard_id", F.expr(f"seq_id div {int(seqs_per_shard)}"))


def shard_manifest(packed: DataFrame, seqs_per_shard: int) -> DataFrame:
    """(shard_id, n_seqs, n_tokens, token_checksum, min_seq, max_seq)
    per shard. The checksum is the plain token-id sum — the same
    portable quantity the pack oracle gates, so a mis-sliced boundary
    or lost sequence shows up as a checksum diff."""
    seq_sum = F.aggregate("tokens", F.lit(0).cast("long"),
                          lambda a, x: a + x)
    return (with_shard_id(packed, seqs_per_shard)
            .groupBy("shard_id")
            .agg(F.count("*").alias("n_seqs"),
                 F.sum(F.size("tokens").cast("long")).alias("n_tokens"),
                 F.sum(seq_sum).alias("token_checksum"),
                 F.min("seq_id").alias("min_seq"),
                 F.max("seq_id").alias("max_seq")))


def write_training_shards(packed: DataFrame, out_dir: str, *,
                          seqs_per_shard: int) -> dict:
    """Write ``out_dir/shards/shard_id=N/`` (one parquet file per
    shard, sequences in seq_id order) and ``out_dir/manifest/``.
    Returns {n_shards, n_seqs}. Everything goes through Spark writers —
    safe on object stores, resumable by overwrite."""
    assigned = with_shard_id(packed, seqs_per_shard)
    (assigned
     .repartition("shard_id")            # one writing task per shard
     .sortWithinPartitions("seq_id")     # deterministic in-file order
     .write.mode("overwrite")
     .partitionBy("shard_id")
     .parquet(os.path.join(out_dir, "shards")))
    manifest = (shard_manifest(packed, seqs_per_shard)
                .withColumn("seqs_per_shard",
                            F.lit(int(seqs_per_shard))))
    manifest.coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(out_dir, "manifest"))
    spark = packed.sparkSession
    m = spark.read.parquet(os.path.join(out_dir, "manifest"))
    row = m.agg(F.count("*").alias("s"),
                F.sum("n_seqs").alias("q")).first()
    return {"n_shards": int(row["s"]), "n_seqs": int(row["q"] or 0)}


def verify_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Recompute every shard's manifest row from the WRITTEN data and
    full-outer-diff it against the stored manifest. Returns the
    mismatch rows (shard_id, status in {'missing_data',
    'missing_manifest', 'checksum_mismatch'}); empty result == the
    shard set is exactly what the manifest promises."""
    stored = spark.read.parquet(os.path.join(out_dir, "manifest"))
    data = spark.read.parquet(os.path.join(out_dir, "shards"))
    sps_row = stored.select("seqs_per_shard").first()
    if sps_row is None:
        raise ValueError(f"empty manifest under {out_dir}")
    recomputed = shard_manifest(data.drop("shard_id"),
                                seqs_per_shard=int(sps_row[0]))
    stored = stored.drop("seqs_per_shard")
    s = stored.select([F.col(c).alias(f"s_{c}") for c in stored.columns])
    r = recomputed.select([F.col(c).alias(f"r_{c}")
                           for c in recomputed.columns])
    joined = s.join(r, s["s_shard_id"] == r["r_shard_id"], "full_outer")
    fields = ["n_seqs", "n_tokens", "token_checksum", "min_seq",
              "max_seq"]
    mismatch = None
    for f_ in fields:
        c = F.col(f"s_{f_}") != F.col(f"r_{f_}")
        mismatch = c if mismatch is None else (mismatch | c)
    status = (F.when(F.col("r_shard_id").isNull(),
                     F.lit("missing_data"))
              .when(F.col("s_shard_id").isNull(),
                    F.lit("missing_manifest"))
              .when(mismatch, F.lit("checksum_mismatch")))
    return (joined
            .withColumn("status", status)
            .filter(F.col("status").isNotNull())
            .select(F.coalesce(F.col("s_shard_id"),
                               F.col("r_shard_id")).alias("shard_id"),
                    "status")
            .orderBy("shard_id"))




# ---------------------------------------------------------------------------
# rendezvous (highest-random-weight) sharding + minimal-movement resharding
# ---------------------------------------------------------------------------


def rendezvous_shard_col(id_col, n_shards: int):
    """Rendezvous / HRW shard assignment (Thaler & Ravishankar 1998):
    ``shard(d) = argmax_s md5(id || ':' || s)`` over the shard ids.

    Why not ``hash(id) mod n``: growing ``n -> n+1`` under mod
    reassigns ~100% of documents (every residue shifts), so an
    incremental corpus refresh rebuilds every shard. Under rendezvous
    exactly the documents whose new shard wins move — 1/(n+1) in
    expectation — so adding capacity to a 100 TB shard store re-writes
    ~1 shard's worth of bytes, not the corpus.

    Map-only: the candidate array is ``n_shards`` md5s per row built
    in one codegen'd Project; argmax is ``array_max`` over (hash,
    shard) structs (lexicographic struct ordering, hash first —
    deterministic tie-break by shard id via the struct's second
    field). Cost is O(n_shards) per row, the standard HRW trade;
    for thousands of shards switch to the two-level variant (HRW over
    shard GROUPS, mod within a group) — documented seam, same column
    contract.
    """
    assert 1 <= int(n_shards) <= 4096, "per-row O(n_shards) cost"
    cands = F.array(*[
        F.struct(
            F.md5(F.concat(id_col.cast("string"), F.lit(f":{s}")))
            .alias("h"),
            F.lit(s).cast("long").alias("s"))
        for s in range(int(n_shards))])
    return F.array_max(cands)["s"]


def reshard_plan(df: DataFrame, *, old_shards: int, new_shards: int,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Movement matrix for growing/shrinking a rendezvous shard store:
    one row per (old_shard, new_shard) cell with doc and token counts,
    plus ``moved`` — the audit a reshard job publishes so operators
    can see exactly 1/(n+1) of bytes relocating (vs ~100% under mod).

    One groupBy on the (old, new) pair — both assignments are map-side
    columns of the same scan."""
    old_c = rendezvous_shard_col(F.col(id_col), old_shards)
    new_c = rendezvous_shard_col(F.col(id_col), new_shards)
    return (df.select(
                old_c.alias("old_shard"), new_c.alias("new_shard"),
                F.size(F.split(F.col(text_col), " ")).cast("long")
                .alias("__n"))
            .groupBy("old_shard", "new_shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("__n").alias("n_tokens"))
            .withColumn("moved",
                        F.col("old_shard") != F.col("new_shard")))
