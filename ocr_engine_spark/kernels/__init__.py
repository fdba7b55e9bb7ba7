"""Pure-Python extraction kernels (no Spark imports).

Each kernel is a deterministic function over plain Python / pandas
values. The Spark layer wraps them in Arrow-batched ``mapInPandas``
stages; unit tests exercise them directly (mirrors the reference's
standalone-usable post-processor, ``test/ocr_postprocessing.py:111-136``).
"""

from ocr_engine_spark.kernels.clean import clean_text, clean_series  # noqa: F401
