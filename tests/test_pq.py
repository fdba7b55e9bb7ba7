"""Product quantization (functions/pq.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


SF_DIR = __import__("os").environ.get("SPARK_GRAFT_SF001",
                                      "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def emb(spark):
    import os
    return spark.read.parquet(os.path.join(SF_DIR,
                                           "embeddings.parquet"))


@pytest.fixture(scope="module")
def books(emb):
    from ocr_engine_spark.functions.pq import train_pq_codebooks
    return train_pq_codebooks(emb, m=8, k=16, iters=1)


def test_codebook_shape_and_grid(books):
    assert len(books) == 8
    for cb in books:
        assert [j for j, _ in cb] == list(range(16))
        for _, v in cb:
            assert len(v) == 8
            # trained means sit on the 10-decimal portability grid
            assert all(x == round(x, 10) for x in v)


def test_encode_is_deterministic_and_bounded(emb, books):
    from ocr_engine_spark.functions.pq import pq_encode
    e1 = pq_encode(emb, books).select(
        "vec_id", *[f"code_{s}" for s in range(8)])
    rows = {r.vec_id: tuple(r)[1:] for r in e1.collect()}
    rows2 = {r.vec_id: tuple(r)[1:] for r in e1.collect()}
    assert rows == rows2
    assert all(0 <= c < 16 for cs in rows.values() for c in cs)


def test_pq_search_recall_vs_exact(emb, books, spark):
    from ocr_engine_spark.functions.pq import pq_search
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    got = {r.vec_id for r in
           pq_search(emb, books, q, 10, shortlist=100).collect()}
    v = F.col("embedding").cast("array<double>")
    qlit = F.array(*[F.lit(x) for x in q])
    d2 = F.aggregate(F.zip_with(v, qlit, lambda a, b: (a - b) * (a - b)),
                     F.lit(0.0), lambda acc, t: acc + t)
    exact = {r.vec_id for r in
             emb.select("vec_id", d2.alias("d"))
                .orderBy(F.col("d").asc(), F.col("vec_id").asc())
                .limit(10).collect()}
    # 20% shortlist + exact re-rank on near-random 64-dim embeddings
    assert len(got & exact) >= 7
    assert 0 in got              # the query vector itself survives PQ


def test_adc_self_distance_is_smallest(emb, books):
    from ocr_engine_spark.functions.pq import pq_adc_topk
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]]
    top = pq_adc_topk(emb, books, q, 1).collect()[0]
    assert top.vec_id == 7


def test_pq_index_build_load_query_matches_pq_search(emb, books, spark,
                                                     tmp_path):
    """The build-once lifecycle must return bit-identical results to
    the one-shot pq_search for the same (books, query, shortlist) —
    and the loaded codebooks must round-trip exactly."""
    import time
    from ocr_engine_spark.functions.pq import PqIndex, pq_search
    path = str(tmp_path / "pqidx")
    idx = PqIndex.build(emb, path, m=8, k=16, iters=1)
    assert idx.books == books  # same training, same grid

    loaded = PqIndex.load(spark, path)
    assert loaded.books == books  # parquet round-trip is exact

    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    t0 = time.monotonic()
    got = [(r.vec_id, r.d2)
           for r in loaded.topk(spark, q, 10, shortlist=100).collect()]
    elapsed = time.monotonic() - t0
    want = [(r.vec_id, r.d2)
            for r in pq_search(emb, books, q, 10,
                               shortlist=100).collect()]
    assert got == want
    # the amortization claim: query without retrain/encode is fast
    assert elapsed < 10.0


def test_pq_index_append_uses_stored_codebooks(emb, spark, tmp_path):
    from ocr_engine_spark.functions.pq import PqIndex, pq_encode
    path = str(tmp_path / "pqidx_app")
    head = emb.filter(F.col("vec_id") < 100)
    tail = emb.filter(F.col("vec_id") >= 100)
    idx = PqIndex.build(head, path, m=8, k=16, iters=1)
    idx.append(tail)
    stored = spark.read.parquet(idx.encoded_path)
    assert stored.count() == emb.count()
    # appended rows carry codes from the HEAD-trained books
    want = pq_encode(tail, idx.books).select("vec_id", "code_0")
    wmap = {r.vec_id: r.code_0 for r in want.collect()}
    gmap = {r.vec_id: r.code_0
            for r in stored.filter(F.col("vec_id") >= 100)
            .select("vec_id", "code_0").collect()}
    assert gmap == wmap
