"""Distribution drift vs an independent pure-Python model, plus the
fixed-point determinism property the gate depends on."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.drift import distribution_drift, drift_summary

OLD = ["en"] * 60 + ["fr"] * 30 + ["de"] * 10
NEW = ["en"] * 50 + ["fr"] * 20 + ["es"] * 30


def _ref(old, new, alpha=0.5):
    vals = sorted(set(old) | set(new))
    k = len(vals)
    out = {}
    for v in vals:
        no, nn = old.count(v), new.count(v)
        po = (no + alpha) / (len(old) + alpha * k)
        pn = (nn + alpha) / (len(new) + alpha * k)
        m = (po + pn) / 2
        out[v] = {
            "n_old": no, "n_new": nn,
            "p_old_micro": round(po * 1e6),
            "p_new_micro": round(pn * 1e6),
            "kl_term_micro": round(pn * math.log(pn / po) * 1e6),
            "js_term_micro": round((pn * math.log(pn / m)
                                    + po * math.log(po / m)) / 2 * 1e6),
        }
    return out


@pytest.fixture(scope="module")
def frames(spark):
    old = spark.createDataFrame([(v,) for v in OLD], "lang string")
    new = spark.createDataFrame([(v,) for v in NEW], "lang string")
    return old, new


def test_drift_matches_python_reference(frames):
    old, new = frames
    got = {r["value"]: r.asDict()
           for r in distribution_drift(old, new, "lang").collect()}
    want = _ref(OLD, NEW)
    assert set(got) == set(want)
    for v, w in want.items():
        for key, val in w.items():
            assert got[v][key] == val, (v, key, got[v][key], val)


def test_summary_properties(frames):
    old, new = frames
    s = drift_summary(old, new, "lang").collect()[0]
    assert s["n_values"] == 4
    assert s["total_old"] == len(OLD) and s["total_new"] == len(NEW)
    # KL and JS are non-negative in aggregate; JS bounded by ln 2
    assert s["kl_micro"] >= 0
    assert 0 <= s["js_micro"] <= round(math.log(2) * 1e6)
    # TV in [0, 1e6] micro-shares
    assert 0 <= s["tv_micro"] <= 1_000_000
    # identical snapshots -> all three divergences exactly zero
    z = drift_summary(old, old, "lang").collect()[0]
    assert (z["kl_micro"], z["js_micro"], z["tv_micro"]) == (0, 0, 0)


def test_fixed_point_is_partitioning_invariant(frames):
    old, new = frames
    a = drift_summary(old.repartition(7), new.repartition(3), "lang") \
        .collect()[0]
    b = drift_summary(old.coalesce(1), new.repartition(11, "lang"),
                      "lang").collect()[0]
    assert a == b
