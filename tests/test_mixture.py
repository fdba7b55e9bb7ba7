"""Token-budget mixture water-filling (sample.mixture_allocation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocr_engine_spark.functions.sample import (
    mixture_allocation,
    mixture_take,
)


def _docs(spark, spec):
    """spec: {stratum: [token_counts...]} -> documents DataFrame."""
    rows, i = [], 0
    for s, lens in spec.items():
        for n in lens:
            rows.append((i, s, " ".join(f"w{j}" for j in range(n))))
            i += 1
    return spark.createDataFrame(rows,
                                 "doc_id long, source string, text string")


def _alloc(df, weights, num, den):
    rows = mixture_allocation(df, weights, budget_num=num,
                              budget_den=den).collect()
    return {r.stratum: (r.available, r.allocated, r.saturated)
            for r in rows}


def test_scarce_stratum_saturates_and_reflows(spark):
    # a: 10 tokens, weight 1; b: 100 tokens, weight 1.  budget = 55.
    # proportional wants 27/27; a caps at 10, reflow gives b 45.
    df = _docs(spark, {"a": [10], "b": [100]})
    got = _alloc(df, {"a": 1, "b": 1}, 1, 2)
    assert got["a"] == (10, 10, True)
    assert got["b"] == (100, 45, False)


def test_no_saturation_is_pure_proportional(spark):
    df = _docs(spark, {"a": [100], "b": [100]})
    got = _alloc(df, {"a": 1, "b": 3}, 1, 2)  # budget 100
    assert got["a"] == (100, 25, False)
    assert got["b"] == (100, 75, False)


def test_budget_above_capacity_takes_everything(spark):
    df = _docs(spark, {"a": [10], "b": [20]})
    got = _alloc(df, {"a": 5, "b": 1}, 1, 1)  # budget = total
    assert got["a"] == (10, 10, True)
    assert got["b"] == (20, 20, True)


def test_zero_weight_stratum_gets_nothing(spark):
    df = _docs(spark, {"a": [50], "b": [50], "c": [50]})
    got = _alloc(df, {"a": 1, "b": 1}, 2, 3)  # budget 100
    assert got["c"] == (50, 0, False)
    assert got["a"] == (50, 50, True)
    assert got["b"] == (50, 50, True)


def test_chained_saturation(spark):
    # equal weights, capacities 10/20/100, budget 70:
    # water level passes 10 (a sat), then 20 (b sat), c gets 40.
    df = _docs(spark, {"a": [10], "b": [20], "c": [100]})
    got = _alloc(df, {"a": 1, "b": 1, "c": 1}, 70, 130)
    assert got["a"] == (10, 10, True)
    assert got["b"] == (20, 20, True)
    assert got["c"] == (100, 40, False)


def test_never_overshoots_budget_or_capacity(spark):
    df = _docs(spark, {"a": [7, 5], "b": [30], "c": [18, 2]})
    for num, den in [(1, 10), (1, 3), (9, 10), (1, 1)]:
        rows = mixture_allocation(df, {"a": 3, "b": 2, "c": 5},
                                  budget_num=num,
                                  budget_den=den).collect()
        total = sum(r.available for r in rows)
        assert sum(r.allocated for r in rows) <= total * num // den
        assert all(0 <= r.allocated <= r.available for r in rows)


def test_weights_cap_asserted(spark):
    df = _docs(spark, {"a": [10]})
    with pytest.raises(AssertionError):
        mixture_allocation(df, {"a": 20_000})


def test_take_respects_allocation_greedily(spark):
    df = _docs(spark, {"a": [4, 4, 4, 4], "b": [10]})
    # budget 13: a saturates? caps: a=16 w=1, b=10 w=1 -> water 6.5:
    # neither saturates at budget 13 -> a gets 6, b gets 6 (floor)
    rows = {r.stratum: r for r in
            mixture_take(df, {"a": 1, "b": 1},
                         budget_num=13, budget_den=26).collect()}
    # greedy whole-doc: 'a' keeps docs while cum-before < 6 -> 2 docs
    # (8 tokens, overshoot < one doc); 'b' keeps its one 10-token doc
    assert rows["a"].allocated == 6
    assert rows["a"].n_docs == 2 and rows["a"].n_tokens == 8
    assert rows["b"].allocated == 6
    assert rows["b"].n_docs == 1 and rows["b"].n_tokens == 10


def test_epochs_allow_repeated_data(spark):
    # capacity a=10, b=100, equal weights, budget = 1.0x of unique
    # tokens (110).  Without repeats a caps at 10.  With max_epochs=3
    # the water level equalizes at 55/55: a repeats 5.5 epochs > 3 ->
    # a saturates at 30, b takes 80.
    df = _docs(spark, {"a": [10], "b": [100]})
    rows = {r.stratum: r for r in
            mixture_allocation(df, {"a": 1, "b": 1}, budget_num=1,
                               budget_den=1, max_epochs=3).collect()}
    a, b = rows["a"], rows["b"]
    assert (a.available, a.allocated, a.saturated) == (10, 30, True)
    assert a.epochs_ppm == 3_000_000
    assert (b.available, b.allocated, b.saturated) == (100, 80, False)
    assert b.epochs_ppm == 800_000


def test_epochs_default_schema_unchanged(spark):
    df = _docs(spark, {"a": [10]})
    cols = mixture_allocation(df, {"a": 1}).columns
    assert "epochs_ppm" not in cols


def test_curriculum_easy_to_hard_is_rank(spark):
    from ocr_engine_spark.functions.sample import curriculum_order
    df = spark.createDataFrame(
        [(i, (i * 7) % 20) for i in range(20)],
        "doc_id long, score long")
    rows = curriculum_order(df, score_col="score", n_bins=4,
                            interleave=False) \
        .orderBy("curriculum_pos").collect()
    assert [r.score for r in rows] == sorted(r.score for r in rows)
    assert [r.curriculum_pos for r in rows] == list(range(20))
    # 4 even bins of 5
    assert [r.bin for r in rows] == [0]*5 + [1]*5 + [2]*5 + [3]*5


def test_curriculum_interleaved_mixes_bins(spark):
    from ocr_engine_spark.functions.sample import curriculum_order
    df = spark.createDataFrame(
        [(i, i) for i in range(12)], "doc_id long, score long")
    rows = curriculum_order(df, score_col="score", n_bins=3) \
        .orderBy("curriculum_pos").collect()
    # positions are a total order; first 3 entries cover all 3 bins
    pos = [r.curriculum_pos for r in rows]
    assert len(set(pos)) == 12
    assert {r.bin for r in rows[:3]} == {0, 1, 2}
    # within the walk, bins repeat round-robin 0,1,2,0,1,2...
    assert [r.bin for r in rows] == [0, 1, 2] * 4


def test_curriculum_uneven_bins_total_order(spark):
    from ocr_engine_spark.functions.sample import curriculum_order
    df = spark.createDataFrame(
        [(i, i % 5) for i in range(10)], "doc_id long, score long")
    rows = curriculum_order(df, score_col="score", n_bins=3).collect()
    assert len({r.curriculum_pos for r in rows}) == 10
    assert all(0 <= r.bin < 3 for r in rows)
