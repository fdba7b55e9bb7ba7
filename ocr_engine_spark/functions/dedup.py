r"""Deduplication operators for web-scale corpora.

Five families, each scalable-by-construction:

  * exact          — hash groupBy on a normalized fingerprint (1 shuffle)
  * ngram Jaccard  — word-shingle explode + equi-join; exact but
                     quadratic per shingle bucket: the VERIFIER, run on
                     bounded scopes / as ground truth for LSH recall
  * MinHash + LSH  — signature via built-in array ops (xxhash64 +
                     universal hashing), banded bucketing, candidates
                     from same-bucket equi-join: the 100 TB path — cost
                     is O(docs x perms) map-side + one shuffle on
                     (band_id, band_hash)
  * SimHash        — 64-bit sign-aggregated token hashes, hamming via
                     bit_count(xor); entirely built-in expressions
  * embedding cosine near-dup — see functions/similarity.py

No Python UDFs anywhere: signatures/shingles are Catalyst higher-order
array functions (transform/filter/aggregate/zip_with) over JVM types.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ocr_engine_spark.functions.text import (
    fingerprint_col, normalized_col, tokens_col,
)

# universal-hash constants for MinHash permutations (fixed seed story:
# h_i(x) = (a_i * x + b_i) mod p — classic Broder MinHash). p = 2^31-1
# keeps every product under 2^62: no int64 overflow under ANSI mode.
MERSENNE_P = (1 << 31) - 1


def _perm_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    import random
    rng = random.Random(seed)
    return [(rng.randrange(1, MERSENNE_P), rng.randrange(0, MERSENNE_P))
            for _ in range(num_perm)]


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicate_groups(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-equal (normalized) documents: one shuffle on the
    128-bit fingerprint, map-side partial agg for free."""
    return (df
            .select(fingerprint_col(F.col(text_col)).alias("fp"),
                    F.col(id_col))
            .groupBy("fp")
            .agg(F.count("*").alias("n_dups"),
                 F.min(id_col).alias("keep_id"))
            .filter(F.col("n_dups") > 1))


def drop_exact_duplicates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Idempotent keep-one-per-fingerprint (A7 guard for resume)."""
    return df.withColumn("__fp", fingerprint_col(F.col(text_col))) \
             .dropDuplicates(["__fp"]).drop("__fp")


# ---------------------------------------------------------------------------
# word n-gram shingles + exact Jaccard (the verifier)
# ---------------------------------------------------------------------------

def shingles_col(c: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM transform
    over 1-based sequence positions)."""
    toks = tokens_col(F.lower(c))
    n_sh = F.size(toks) - (n - 1)
    # guard: Spark's sequence(1, 0) counts DOWN — short docs need an
    # explicit empty array
    return F.when(n_sh < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), n_sh),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)))))


def jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", n: int = 3,
                  threshold: float = 0.1) -> DataFrame:
    """Exact pairwise n-gram Jaccard via shingle explode + equi-join.
    Output: (id_a, id_b, inter, n_a, n_b, jaccard), id_a < id_b.

    Scale note: exact and shuffle-bound; at 100 TB this runs only inside
    LSH candidate buckets (minhash_candidate_pairs verifies with this).
    """
    sh = df.select(F.col(id_col).alias("id"),
                   F.explode(shingles_col(F.col(text_col), n)).alias("sh"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, "sh")
             .filter(F.col("a.id") < F.col("b.id"))
             .groupBy(F.col("a.id").alias("id_a"),
                      F.col("b.id").alias("id_b"))
             .agg(F.count("*").alias("inter")))
    out = (inter
           .join(sizes.select(F.col("id").alias("id_a"),
                              F.col("n_sh").alias("n_a")), "id_a")
           .join(F.broadcast(sizes.select(F.col("id").alias("id_b"),
                                          F.col("n_sh").alias("n_b"))), "id_b")
           .withColumn("jaccard",
                       F.round(F.col("inter").cast("double")
                               / (F.col("n_a") + F.col("n_b") - F.col("inter")),
                               6))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "inter", "n_a", "n_b", "jaccard"))
    return out


# ---------------------------------------------------------------------------
# MinHash + banded LSH (the scale path)
# ---------------------------------------------------------------------------

def minhash_signature_col(c: Column, num_perm: int = 64,
                          n: int = 3, seed: int = 42) -> Column:
    """MinHash signature as array<long>: shingle -> xxhash64 -> per
    permutation min((a*h+b) mod p). One pass over the shingle array per
    permutation, all inside Catalyst (no Python)."""
    hashes = F.transform(shingles_col(c, n),
                         lambda s: F.pmod(F.xxhash64(s), F.lit(MERSENNE_P)))
    sig = [
        F.coalesce(
            F.array_min(F.transform(
                hashes,
                lambda h: (h * F.lit(a) + F.lit(b)) % MERSENNE_P)),
            F.lit(MERSENNE_P))
        for a, b in _perm_params(num_perm, seed)
    ]
    return F.array(*sig)


def lsh_bands(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", num_perm: int = 64,
              bands: int = 16, n: int = 3, seed: int = 42) -> DataFrame:
    """Banded bucketing: (id, band_id, band_hash). Same-bucket docs are
    near-dup candidates. r = num_perm/bands rows per band."""
    assert num_perm % bands == 0
    r = num_perm // bands
    sig = minhash_signature_col(F.col(text_col), num_perm, n, seed)
    d = df.select(F.col(id_col).alias("id"), sig.alias("sig"))
    band_cols = [
        F.struct(F.lit(bi).alias("band_id"),
                 F.xxhash64(F.concat_ws(
                     ",", *[F.element_at(F.col("sig"), bi * r + j + 1)
                            for j in range(r)])).alias("band_hash"))
        for bi in range(bands)
    ]
    return (d.select("id", F.explode(F.array(*band_cols)).alias("b"))
             .select("id", F.col("b.band_id").alias("band_id"),
                     F.col("b.band_hash").alias("band_hash")))


def minhash_candidate_pairs(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text", num_perm: int = 64,
                            bands: int = 16, n: int = 3,
                            seed: int = 42) -> DataFrame:
    """Distinct candidate pairs from any shared LSH bucket — ONE shuffle
    on (band_id, band_hash); never a full cross join."""
    b = lsh_bands(df, id_col, text_col, num_perm, bands, n, seed)
    l, r_ = b.alias("l"), b.alias("r")
    return (l.join(r_, ["band_id", "band_hash"])
             .filter(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"),
                     F.col("r.id").alias("id_b"))
             .distinct())


def minhash_dedup_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        num_perm: int = 64, bands: int = 16,
                        n: int = 3, seed: int = 42) -> DataFrame:
    """Full near-dup pipeline: LSH candidates -> exact Jaccard verify
    (join back to shingles only for candidate ids)."""
    cands = minhash_candidate_pairs(df, id_col, text_col, num_perm, bands,
                                    n, seed)
    cand_ids = (cands.select(F.col("id_a").alias("id"))
                .union(cands.select("id_b")).distinct())
    scoped = df.join(cand_ids.withColumnRenamed("id", id_col), id_col)
    verified = jaccard_pairs(scoped, id_col, text_col, n, threshold)
    return verified.join(cands, ["id_a", "id_b"])


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_col(c: Column, bits: int = 64) -> Column:
    """SimHash: per token, xxhash64 bit j votes +1/-1; signature bit j is
    the sign of the vote sum. Pure Catalyst expression: one token-hash
    array, then ``bits`` aggregate folds with literal shift amounts
    (shiftright needs a Python int), OR-combined into one 64-bit value
    (bit 63 via its signed two's-complement literal)."""
    hashes = F.transform(tokens_col(F.lower(c)), lambda t: F.xxhash64(t))

    def _vote(j: int):
        # closure factory: higher-order-function lambdas must have exactly
        # 2 params (pyspark inspects arity; default args break it)
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")

    sig = None
    for j in range(bits):
        vote_j = F.aggregate(hashes, F.lit(0).cast("long"), _vote(j))
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        piece = F.when(vote_j > 0, F.lit(bit_val).cast("long")) \
                 .otherwise(F.lit(0).cast("long"))
        sig = piece if sig is None else sig.bitwiseOR(piece)
    return sig


def simhash_hamming_col(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_pairs(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", max_hamming: int = 8,
                       prefix_bits: int = 12) -> DataFrame:
    """Near-dup pairs by SimHash: block on the top ``prefix_bits`` bits
    (the classic rotate-and-block trick, one rotation here), then exact
    hamming filter within blocks — avoids the cross join."""
    d = df.select(F.col(id_col).alias("id"),
                  simhash_col(F.col(text_col)).alias("sh"))
    d = d.withColumn("blk", F.shiftrightunsigned(F.col("sh"),
                                                 64 - prefix_bits))
    l, r = d.alias("l"), d.alias("r")
    return (l.join(r, "blk")
             .filter(F.col("l.id") < F.col("r.id"))
             .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                     simhash_hamming_col(F.col("l.sh"), F.col("r.sh"))
                     .alias("hamming"))
             .filter(F.col("hamming") <= max_hamming))
