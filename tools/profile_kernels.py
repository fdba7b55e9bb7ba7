"""Profile the extraction kernels single-threaded on the heavy bench corpus.

Dev tool: finds where per-doc CPU goes (HTML parse vs classify vs clean vs
PDF layout) so kernel micro-optimizations target real hot spots instead of
guesses. No Spark — reads the parquet with pyarrow and loops.

Usage: python tools/profile_kernels.py [n_docs] [--cprofile]
"""
from __future__ import annotations

import cProfile
import pstats
import sys
import time

import pyarrow.parquet as pq

from ocr_engine_spark.kernels.clean import clean_text
from ocr_engine_spark.kernels.html_extract import extract_html
from ocr_engine_spark.kernels.pdf_extract import extract_pdf

CORPUS = "fixtures_data/bench_4000x48/pages.parquet"


def run(rows):
    n_html = n_pdf = 0
    for payload in rows:
        p = bytes(payload)
        if p.startswith(b"%PDF"):
            res = extract_pdf(p)
            n_pdf += 1
        else:
            res = extract_html(p)
            n_html += 1
        if res["text"] is not None:
            clean_text(res["text"])
    return n_html, n_pdf


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 1000
    tbl = pq.read_table(CORPUS, columns=["html"])
    rows = tbl.column("html").to_pylist()[:n]
    total_bytes = sum(len(r) for r in rows)
    if "--cprofile" in sys.argv:
        prof = cProfile.Profile()
        prof.enable()
        n_html, n_pdf = run(rows)
        prof.disable()
        stats = pstats.Stats(prof)
        stats.sort_stats("cumulative").print_stats(25)
    else:
        t0 = time.perf_counter()
        n_html, n_pdf = run(rows)
        dt = time.perf_counter() - t0
        print(f"{len(rows)} docs ({n_html} html, {n_pdf} pdf), "
              f"{total_bytes/1e6:.1f} MB in {dt:.3f}s = "
              f"{len(rows)/dt:.1f} docs/s single-thread")


if __name__ == "__main__":
    main()
