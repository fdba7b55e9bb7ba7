"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — one scan, one TakeOrderedAndProject,
dot products via zip_with/aggregate (JVM higher-order functions, no
Python). Scale path: IVF-style coarse quantization (centroid assignment
via broadcast join + window argmin) and random-hyperplane LSH bucketing,
so a query probes a small fraction of a 10^12-row table.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, functions as F


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm_col(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vec])


def brute_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: full scan + TakeOrderedAndProject (no shuffle
    of the vectors themselves — only k rows reach the driver side)."""
    q = _vec_lit(query_vec)
    sim = cosine_col(F.col(vec_col).cast("array<double>"), q)
    return (embeddings
            .select(F.col(id_col), F.round(sim, 6).alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
            .limit(k))


# ---------------------------------------------------------------------------
# IVF (coarse quantization) — the scale path
# ---------------------------------------------------------------------------

def ivf_assign(embeddings: DataFrame, centroids: list[tuple[int, list[float]]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid — MAP-ONLY: the
    centroid table is a constant array<struct<cell, unit-centroid>>
    literal and the argmax is one aggregate fold per row. No crossJoin,
    no window, no shuffle: at 10^12 rows assignment is embarrassingly
    parallel and the shuffle (if any) is the caller's bucketed write.

    Centroids are L2-normalized driver-side so per-row score =
    dot(v, unit_centroid); dividing by |v| (common positive factor)
    cannot change the argmax, so cosine order is preserved exactly.
    Ties break to the lowest cell id (centroid array order)."""
    import math
    cstructs = []
    for cid, vec in centroids:
        nrm = math.sqrt(sum(float(x) * float(x) for x in vec)) or 1.0
        cstructs.append(F.struct(
            F.lit(int(cid)).alias("cell"),
            F.array(*[F.lit(float(x) / nrm) for x in vec]).alias("cv")))
    cent_lit = F.array(*cstructs)
    v = F.col(vec_col).cast("array<double>")
    scored = F.transform(
        cent_lit,
        lambda ct: F.struct(ct["cell"].alias("cell"),
                            dot_col(v, ct["cv"]).alias("s")))
    best = F.aggregate(
        scored,
        F.struct(F.lit(-1).alias("cell"),
                 F.lit(float("-inf")).alias("s")),
        lambda acc, x: F.when(x["s"] > acc["s"], x).otherwise(acc))
    return embeddings.withColumn("cell", best["cell"])


def pick_centroids(embeddings: DataFrame, n_centroids: int = 8,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> list[tuple[int, list[float]]]:
    """Deterministic centroid seed: the n lowest-id vectors (k-means init
    analog; good enough for bucketing, and reproducible)."""
    rows = (embeddings.orderBy(F.col(id_col).asc()).limit(n_centroids)
            .select(vec_col).collect())
    return [(i, [float(x) for x in r[0]]) for i, r in enumerate(rows)]


def ivf_topk(embeddings: DataFrame, query_vec: list[float], k: int = 10,
             n_centroids: int = 8, n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[tuple[int, list[float]]] | None = None
             ) -> DataFrame:
    """Approximate top-k: score only vectors in the ``n_probe`` cells
    nearest the query. Recall measured against brute_topk in tests."""
    cents = centroids or pick_centroids(embeddings, n_centroids, id_col,
                                        vec_col)
    import math
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb) if na and nb else 0.0
    probe = sorted(cents, key=lambda c: -cos(c[1], query_vec))[:n_probe]
    probe_ids = [c[0] for c in probe]
    assigned = ivf_assign(embeddings, cents, id_col, vec_col)
    scoped = assigned.filter(F.col("cell").isin(probe_ids))
    return brute_topk(scoped, query_vec, k, id_col, vec_col)


# ---------------------------------------------------------------------------
# random-hyperplane LSH (cosine near-dup pairs)
# ---------------------------------------------------------------------------

def hyperplanes(dim: int, n_planes: int = 12, seed: int = 42
                ) -> list[list[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)]
            for _ in range(n_planes)]


def lsh_bucket_col(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id: bit i = 1 if dot(v, plane_i) > 0."""
    bits = [
        F.when(dot_col(vec_col.cast("array<double>"), _vec_lit(p)) > 0,
               F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        for i, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_recall_estimate(threshold: float, n_bands: int,
                        rows_per_band: int) -> float:
    """Worst-case (boundary) recall of the banded OR-construction: a
    pair at exactly ``cosine = threshold`` collides in one band with
    probability p^r where p = 1 - acos(t)/pi, and is a candidate if ANY
    band collides: 1 - (1 - p^r)^b. Pairs above the threshold do
    strictly better. Used to size (b, r) and asserted in tests."""
    import math
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    return 1.0 - (1.0 - p ** rows_per_band) ** n_bands


def cosine_near_pairs(embeddings: DataFrame, threshold: float = 0.9,
                      n_bands: int = 8, rows_per_band: int = 2,
                      seed: int = 42,
                      id_col: str = "vec_id", vec_col: str = "embedding"
                      ) -> DataFrame:
    """Embedding near-duplicate pairs via BANDED random-hyperplane LSH
    (OR-construction): b independent bands of r sign bits each; a pair
    is a candidate if it agrees on ALL bits of ANY band, then exact
    cosine verifies. A single AND-band (the naive form) has boundary
    recall p^r — e.g. ~4% for 6 planes at threshold 0.25; the banded
    union is 1-(1-p^r)^b (see ``lsh_recall_estimate``; defaults give
    0.96+ at 0.25 and ~1.0 at 0.9).

    Plan shape: ONE shuffle on (band_id, bucket) for candidates (never a
    cross join), then two equi-joins back to the persisted (id, vector)
    projection for the verify — candidates ≪ corpus, so the verify
    joins shuffle only candidate rows. Lower thresholds need smaller r /
    more bands (more candidates — inherent LSH cost); at 10^12 rows run
    near-dup detection at thresholds >= 0.7 where r can grow.

    Cache lifecycle: the persisted projection is released by Spark's
    ContextCleaner once the returned plan is GC'd; call
    ``spark.catalog.clearCache()`` for deterministic release."""
    first = embeddings.select(vec_col).first()
    dim = len(first[0])
    planes = hyperplanes(dim, n_bands * rows_per_band, seed)
    base = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v")).persist()
    bands = []
    for b in range(n_bands):
        sub = planes[b * rows_per_band:(b + 1) * rows_per_band]
        bands.append(F.struct(
            F.lit(b).alias("bi"),
            lsh_bucket_col(F.col("v"), sub).alias("bv")))
    e = (base.select("id", F.explode(F.array(*bands)).alias("b"))
         .select("id", F.col("b.bi").alias("bi"), F.col("b.bv").alias("bv")))
    l, r = e.alias("l"), e.alias("r")
    cands = (l.join(r, ["bi", "bv"])
              .filter(F.col("l.id") < F.col("r.id"))
              .select(F.col("l.id").alias("id_a"),
                      F.col("r.id").alias("id_b"))
              .distinct())
    a = base.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    bb = base.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pair_cos = cosine_col(F.col("va"), F.col("vb"))
    return (cands.join(a, "id_a").join(bb, "id_b")
            .select("id_a", "id_b", F.round(pair_cos, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))
