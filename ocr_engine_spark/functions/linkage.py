"""Record linkage / entity resolution: blocking + edit-distance
scoring + transitive closure, composed from the engine's own parts.

The classic data-curation workload (Fellegi & Sunter 1969 lineage;
the modern "blocking then pairwise then cluster" shape of Dedoop/
Magellan-style systems): find records that are the SAME entity under
dirty variations — truncated re-crawls, near-identical titles,
re-serialized rows. Nothing here is new machinery, which is the
point: blocking is ONE equi-join on a cheap deterministic key,
scoring is the built-in JVM ``levenshtein`` on bounded prefixes, and
cluster resolution is cluster.connected_components' pointer-jumping —
the same pieces the dedup layer runs at corpus scale.

Scale shape at 10^12 rows:
  * the block key is a map-side projection; candidate pairs come from
    ONE equi-join shuffle on the key — never a cross join. Pair count
    is sum of per-block n²/2: pick keys sized so blocks stay small
    (prefix blocking here; a hot-block sub-split guard would be the
    semdedup.max_cell_rows move if a key degenerates);
  * ``levenshtein`` runs JVM-side on ``prefix_chars``-bounded strings
    — per-pair cost capped at prefix², never full-document;
  * components run over the MATCH pairs only (pointer-jumping,
    O(log diameter) rounds), the corpus never joins itself.

Blocking recall is the declared trade (as everywhere in this family):
a variant whose block key moved — e.g. a prepended token — is not a
candidate. The oracle's planted corpus exercises both sides: suffix
truncations must link, prefix-shifted twins must not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ocr_engine_spark.functions.cluster import connected_components


def blocked_link_pairs(df: DataFrame, *, id_col: str = "doc_id",
                       text_col: str = "text", block_chars: int = 16,
                       prefix_chars: int = 64,
                       max_dist: int = 10) -> DataFrame:
    """(id_a, id_b, dist): same-block record pairs whose
    ``prefix_chars``-bounded edit distance is <= ``max_dist``.
    Normalization is trim+lower (the fingerprint family's fold)."""
    norm = F.trim(F.lower(F.col(text_col)))
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.substring(norm, 1, int(block_chars)).alias("__blk"),
        F.substring(norm, 1, int(prefix_chars)).alias("__pfx"))
    a = keyed.select("__blk", F.col("id").alias("id_a"),
                     F.col("__pfx").alias("__pa"))
    b = keyed.select("__blk", F.col("id").alias("id_b"),
                     F.col("__pfx").alias("__pb"))
    return (a.join(b, "__blk")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    F.levenshtein("__pa", "__pb").cast("long")
                    .alias("dist"))
            .filter(F.col("dist") <= int(max_dist)))


def link_report(df: DataFrame, *, id_col: str = "doc_id",
                text_col: str = "text", block_chars: int = 16,
                prefix_chars: int = 64,
                max_dist: int = 10) -> DataFrame:
    """Entity clusters from the match graph: (cluster_id, n_members,
    min_id, max_id) per resolved entity with >= 2 records —
    ``cluster_id`` is the smallest member id (the CC labeling).
    Singletons are absent (connected_components' convention: absent
    == kept as-is)."""
    pairs = blocked_link_pairs(
        df, id_col=id_col, text_col=text_col, block_chars=block_chars,
        prefix_chars=prefix_chars, max_dist=max_dist)
    comp = connected_components(pairs)
    return (comp.groupBy(F.col("component").alias("cluster_id"))
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.min("node").cast("long").alias("min_id"),
                 F.max("node").cast("long").alias("max_id"))
            .orderBy("cluster_id"))
