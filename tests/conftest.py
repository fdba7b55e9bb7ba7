"""Shared fixtures: one SparkSession per test run, one generated corpus."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "..", "fixtures_data", "sf_test")
CORPUS_PAGES = 300
TESTDATA_SF001 = os.environ.get("SPARK_GRAFT_SF001",
                                "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from ocr_engine_spark.engine.session import build_session
    master = os.environ.get("SPARK_GRAFT_TEST_MASTER", "local[4]")
    s = build_session("ocr-engine-spark-tests", master=master,
                      shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir() -> str:
    """Deterministic synthetic pages corpus (generated once per run)."""
    from ocr_engine_spark.fixtures.gen_pages import write
    marker = os.path.join(CORPUS_DIR, "pages.parquet")
    if not os.path.exists(marker):
        write(CORPUS_DIR, n_pages=CORPUS_PAGES, seed=42)
    return CORPUS_DIR


@pytest.fixture(scope="session")
def pages_df(spark, corpus_dir):
    from ocr_engine_spark.engine.extract_job import read_pages
    return read_pages(spark, os.path.join(corpus_dir, "pages.parquet"))


@pytest.fixture(scope="session")
def golden_df(spark, corpus_dir):
    return spark.read.parquet(
        os.path.join(corpus_dir, "golden_extractions.parquet"))


@pytest.fixture(scope="session")
def degradations_df(spark, corpus_dir):
    return spark.read.parquet(
        os.path.join(corpus_dir, "degradations.parquet"))


@pytest.fixture(scope="session")
def golden_fields_df(spark, corpus_dir):
    return spark.read.parquet(
        os.path.join(corpus_dir, "golden_fields.parquet"))


@pytest.fixture(scope="session")
def extractions_df(spark, pages_df):
    """The extraction job output, cached for the whole test session."""
    from ocr_engine_spark.engine.extract_job import extract_pages
    df = extract_pages(pages_df).cache()
    df.count()
    return df
