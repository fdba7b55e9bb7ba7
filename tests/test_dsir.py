"""DSIR importance resampling (functions/dsir.py) — math vs an
independent Python reference, selection properties, and plan shape."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.dsir import (bucket_log_ratios,
                                             dsir_select,
                                             importance_weights)

BUCKETS = 64  # small so the toy corpus exercises bucket collisions


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _grams(text: str) -> list[str]:
    toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t]
    return toks + [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]


def _ref_weights(docs: list[tuple[int, str]], target_ids: set[int],
                 alpha: float = 1.0) -> dict[int, int]:
    """Independent (pure-Python) replay of the DSIR weight math."""
    raw: dict[int, int] = {}
    tgt: dict[int, int] = {}
    per_doc: dict[int, list[int]] = {}
    for did, text in docs:
        bs = [_h60(g) % BUCKETS for g in _grams(text)]
        per_doc[did] = bs
        for b in bs:
            raw[b] = raw.get(b, 0) + 1
            if did in target_ids:
                tgt[b] = tgt.get(b, 0) + 1
    tr, tt = sum(raw.values()), sum(tgt.values())
    ab = alpha * BUCKETS
    lr = {b: round(math.log(((tgt.get(b, 0) + alpha) / (tt + ab))
                            / ((cr + alpha) / (tr + ab))) * 1e6)
          for b, cr in raw.items()}
    return {did: sum(lr[b] for b in bs)
            for did, bs in per_doc.items() if bs}


TOY = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat on the log"),
    (3, "cat mat cat mat cat"),
    (4, "stock market prices fell sharply today"),
    (5, "market prices and stock indexes"),
    (6, "   "),                       # gram-less: must be absent
    (7, "le chat est sur le tapis"),
]
TARGET_IDS = {1, 2, 3}  # the "cat/mat" domain


@pytest.fixture(scope="module")
def toy(spark):
    return spark.createDataFrame(TOY, "doc_id long, text string")


def test_weights_match_python_reference(spark, toy):
    target = toy.filter(F.col("doc_id").isin(*TARGET_IDS))
    ratios = bucket_log_ratios(target, toy, buckets=BUCKETS)
    got = {r.doc_id: r.weight_micro
           for r in importance_weights(toy, ratios,
                                       buckets=BUCKETS).collect()}
    assert got == _ref_weights(TOY, TARGET_IDS)


def test_gramless_doc_absent(spark, toy):
    target = toy.filter(F.col("doc_id").isin(*TARGET_IDS))
    ratios = bucket_log_ratios(target, toy, buckets=BUCKETS)
    ids = {r.doc_id for r in importance_weights(
        toy, ratios, buckets=BUCKETS).collect()}
    assert 6 not in ids and ids == {1, 2, 3, 4, 5, 7}


def test_in_domain_outweighs_out_of_domain(spark, toy):
    """The point of DSIR: target-domain docs score higher than
    out-of-domain ones (per-gram average, to control for length)."""
    target = toy.filter(F.col("doc_id").isin(*TARGET_IDS))
    ratios = bucket_log_ratios(target, toy, buckets=BUCKETS)
    w = {r.doc_id: r.weight_micro / r.n_grams
         for r in importance_weights(toy, ratios,
                                     buckets=BUCKETS).collect()}
    assert min(w[i] for i in (1, 2, 3)) > max(w[i] for i in (4, 5, 7))


def test_select_deterministic_and_seed_sensitive(spark, toy):
    target = toy.filter(F.col("doc_id").isin(*TARGET_IDS))
    a = dsir_select(toy, target, 3, buckets=BUCKETS, seed=42).collect()
    b = dsir_select(toy, target, 3, buckets=BUCKETS, seed=42).collect()
    assert a == b and len(a) == 3
    assert [r.rank for r in a] == [1, 2, 3]
    c = dsir_select(toy, target, 3, buckets=BUCKETS, seed=7).collect()
    assert [r.key_micro for r in a] != [r.key_micro for r in c]


def test_plan_broadcast_scoring_no_cartesian(spark, toy):
    """Scale shape: the ratio table must enter scoring as a broadcast
    build side; nothing may cartesian-join the corpus (the 1-row totals
    cross join is a broadcast nested loop over ONE row, not the
    corpus)."""
    target = toy.filter(F.col("doc_id").isin(*TARGET_IDS))
    out = dsir_select(toy, target, 3, buckets=BUCKETS)
    out.collect()  # AQE: final plan only materializes after an action
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_ess_uniform_weights_equal_n(spark):
    from ocr_engine_spark.functions.dsir import ess_report
    w = spark.createDataFrame(
        [(i, 5, 1000) for i in range(20)],
        ["doc_id", "n_grams", "weight_micro"])
    row = ess_report(w).collect()[0]
    # identical weights: ESS == n exactly
    assert row["n_docs"] == 20
    assert row["ess_milli"] == 20_000
    assert row["ess_frac_ppm"] == 1_000_000


def test_ess_collapses_under_one_dominant_weight(spark):
    from ocr_engine_spark.functions.dsir import ess_report
    rows = [(0, 5, 20_000_000)] + [(i, 5, 0) for i in range(1, 50)]
    w = spark.createDataFrame(rows,
                              ["doc_id", "n_grams", "weight_micro"])
    row = ess_report(w).collect()[0]
    # one doc carries e^20 of the mass: ESS ~ 1
    assert row["n_docs"] == 50
    assert row["ess_milli"] < 1_100
    assert row["ess_frac_ppm"] < 25_000
