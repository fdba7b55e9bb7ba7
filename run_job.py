"""spark-submit entry point (SURVEY.md §7.1.7, north_rule deployment
shape):

    zip -r ocr_engine_spark.zip ocr_engine_spark
    spark-submit --py-files ocr_engine_spark.zip run_job.py extract \
        --input  /data/pages_parquet \
        --output /data/out_catalog   \
        --batches 64

Subcommands:
  extract   resumable extraction into a ManifestCatalog (skips committed
            batches on restart — kill it mid-run and re-submit)
  evaluate  broadcast-join goldens + CER metrics over a catalog's
            extractions table
  stream    continuous/backfill ingest via Structured Streaming

Also runnable without spark-submit: ``python run_job.py ...`` builds a
local session from SPARK_GRAFT_MASTER / SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="run_job")
    sub = ap.add_subparsers(dest="cmd", required=True)

    ex = sub.add_parser("extract", help="resumable extraction job")
    ex.add_argument("--input", required=True, help="pages parquet path")
    ex.add_argument("--output", required=True, help="catalog root dir")
    ex.add_argument("--table", default="extractions")
    ex.add_argument("--batches", type=int, default=8)

    ev = sub.add_parser("evaluate", help="golden-compare + CER metrics")
    ev.add_argument("--catalog", required=True, help="catalog root dir")
    ev.add_argument("--table", default="extractions")
    ev.add_argument("--golden", required=True, help="golden parquet path")
    ev.add_argument("--degradations", default=None)

    st = sub.add_parser("stream", help="streaming ingest")
    st.add_argument("--input", required=True, help="pages directory")
    st.add_argument("--output", required=True)
    st.add_argument("--checkpoint", required=True)
    st.add_argument("--continuous", action="store_true",
                    help="keep running (default: drain available + stop)")

    args = ap.parse_args(argv)

    from ocr_engine_spark.engine.session import build_session
    spark = build_session(f"ocr-engine-spark-{args.cmd}")

    if args.cmd == "extract":
        from ocr_engine_spark.engine.catalog import (
            ManifestCatalog, run_resumable_extract,
        )
        cat = ManifestCatalog(args.output)
        res = run_resumable_extract(spark, args.input, cat,
                                    table=args.table, n_batches=args.batches)
        print(json.dumps(res))
    elif args.cmd == "evaluate":
        from ocr_engine_spark.engine.catalog import ManifestCatalog
        from ocr_engine_spark.engine.evaluate import (
            evaluate_extractions, summary_metrics,
        )
        cat = ManifestCatalog(args.catalog)
        ext = cat.read_table(spark, args.table)
        golden = spark.read.parquet(args.golden)
        degr = (spark.read.parquet(args.degradations)
                if args.degradations else None)
        ev_df = evaluate_extractions(ext, golden, degr)
        summary_metrics(ev_df).orderBy("scope").show(50, truncate=False)
    elif args.cmd == "stream":
        from ocr_engine_spark.streaming.stream_job import (
            read_pages_stream, start_extraction_stream,
        )
        q = start_extraction_stream(
            read_pages_stream(spark, args.input), args.output,
            args.checkpoint, available_now=not args.continuous)
        q.awaitTermination()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
