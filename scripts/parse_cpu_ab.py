#!/usr/bin/env python
"""Single-process parse-CPU A/B harness: parse+extract N synthetic
pages in-process and report time.process_time per doc.  This is the
noise-free measure the 2-core bench leg is 91% made of — use it to
grade parser micro-optimizations instead of wall clock.

Usage: python scripts/parse_cpu_ab.py [n_pages] [reps] [--profile]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from crystal_html5_spark.html5x.extract import extract_document  # noqa: E402
from crystal_html5_spark.sparkjob.pages import synth_rows  # noqa: E402


def run(htmls: list[bytes]) -> int:
    total = 0
    for h in htmls:
        total += len(extract_document(h)["main_text"])
    return total


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    htmls = [r[2] for r in synth_rows(n)]
    nbytes = sum(len(h) for h in htmls)
    run(htmls[:100])  # warm-up

    if "--profile" in sys.argv:
        import cProfile
        import pstats
        pr = cProfile.Profile()
        pr.enable()
        run(htmls)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(30)
        return

    best = min
    samples = []
    for _ in range(reps):
        t0 = time.process_time()
        run(htmls)
        samples.append(time.process_time() - t0)
    b = best(samples)
    print(f"n={n} bytes={nbytes} samples={[round(s, 3) for s in samples]}")
    print(f"best={b:.3f}s  {b / n * 1000:.4f} ms/doc  "
          f"{nbytes / b / 1e6:.1f} MB/s")


if __name__ == "__main__":
    main()
