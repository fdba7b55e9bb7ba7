"""Outer-generate helpers: explode/posexplode WITHOUT the Catalyst
inferred-guard trap.

A non-outer ``Generate`` makes Catalyst infer ``size(arr) > 0 AND
isnotnull(arr)`` on the generator child (InferFiltersFromGenerate) and
then CollapseProject/PushDownPredicate substitute the array's DEFINING
EXPRESSION into that filter — so an expensive array (a shingle
grammar, a k-gram hash HOF, a regexp_extract_all harvest) is evaluated
up to 2 extra times per SCANNED row, in an interpreted Filter, below
the projection where the operator thinks it materialized the array
once. Measured on winnow_fingerprints at sf0.1: 13.4 s -> 0.5 s (27x)
from this change alone, with cost scaling with the full table instead
of the 60 filtered docs (text.py:winnow_fingerprints carries the
incident note).

The outer variants infer nothing. Semantics are identical for the
arrays these operators build: empty or NULL arrays produce one
null-element row which the explicit ``isNotNull`` filter drops (the
same rows a non-outer generate never emits), and none of the builders
(split, transform, regexp_extract_all, array_distinct chains) can put
NULL elements inside an array.

Use these whenever the exploded array is an EXPRESSION. Exploding an
already-persisted/shuffled COLUMN is safe either way — the inferred
guard then references the materialized column, which costs nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def explode_nonull(df: DataFrame, arr: Column, alias: str,
                   *keep) -> DataFrame:
    """``df.select(*keep, explode(arr))`` without the inferred-guard
    re-evaluation of ``arr``. ``keep`` are columns/names to carry."""
    return (df.select(*keep, F.explode_outer(arr).alias(alias))
            .filter(F.col(alias).isNotNull()))


def posexplode_nonull(df: DataFrame, arr: Column, pos_alias: str,
                      val_alias: str, *keep) -> DataFrame:
    """``df.select(*keep, posexplode(arr))`` without the inferred-guard
    re-evaluation of ``arr``."""
    return (df.select(*keep,
                      F.posexplode_outer(arr).alias(pos_alias,
                                                    val_alias))
            .filter(F.col(pos_alias).isNotNull()))
