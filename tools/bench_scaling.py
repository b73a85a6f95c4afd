#!/usr/bin/env python
"""Scaling-efficiency evidence for the north rule (BASELINE.json).

No real multi-node cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the IDENTICAL crawl job at two parallelism
levels (default local[8] vs local[32]) on the same parquet pages corpus and
reporting throughput at both plus efficiency:

    eff = (throughput_4N / throughput_N) / (4N / N)

Usage: python tools/bench_scaling.py [n_seeds] [places_per_serp]
Writes/updates the scaling table printed on stdout (markdown) and emits one
JSON line (machine-readable) on the last line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)

N_SEEDS = int(sys.argv[1]) if len(sys.argv) > 1 else 120
PER_SERP = int(sys.argv[2]) if len(sys.argv) > 2 else 40
LEVELS = (8, 32)


def run_at(cpus: int, pages_path: str, workroot: str, seeds: list) -> dict:
    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from google_maps_scraper_spark.session import get_spark

    spark = get_spark(
        app_name=f"gms-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(pages_path)
    pages.count()  # warm the scan before the clock starts

    wd = os.path.join(workroot, f"wd-{cpus}")
    t0 = time.perf_counter()
    eng = CrawlEngine(
        spark, pages, wd,
        CrawlConfig(extract_email=True, max_rounds=16, checkpoint_every=100),
    )
    eng.seed_from_queries(seeds)
    counters = eng.run()
    elapsed = time.perf_counter() - t0
    spark.stop()

    extracted = counters["results"]
    scheduled = sum(
        v for k, v in counters.items()
        if isinstance(v, int) and k.endswith(("_done", "_failed", "_new"))
    )
    return {
        "cpus": cpus,
        "elapsed_sec": round(elapsed, 2),
        "results": extracted,
        "frontier_jobs": scheduled,
        "pages_extracted_per_sec": round(extracted / elapsed, 2),
        "frontier_urls_scheduled_per_sec": round(scheduled / elapsed, 2),
        "counters": {k: v for k, v in counters.items() if isinstance(v, int)},
    }


def main() -> None:
    from google_maps_scraper_spark.session import get_spark
    from google_maps_scraper_spark.sources.corpus import generate_corpus_spark

    workroot = tempfile.mkdtemp(prefix="gms-scaling-")
    pages_path = os.path.join(workroot, "pages")
    spark = get_spark(app_name="gms-scaling-gen", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages, seeds = generate_corpus_spark(spark, N_SEEDS, PER_SERP)
    pages.write.mode("overwrite").parquet(pages_path)
    n_pages = spark.read.parquet(pages_path).count()
    spark.stop()

    runs = [run_at(c, pages_path, workroot, seeds) for c in LEVELS]
    lo, hi = runs[0], runs[-1]
    ratio = hi["cpus"] / lo["cpus"]
    eff_extract = (hi["pages_extracted_per_sec"] / lo["pages_extracted_per_sec"]) / ratio
    eff_sched = (
        hi["frontier_urls_scheduled_per_sec"] / lo["frontier_urls_scheduled_per_sec"]
    ) / ratio

    print(f"\ncorpus: {n_pages} pages ({N_SEEDS} seeds x {PER_SERP} places/serp)\n")
    print("| cores | elapsed s | results | pages-extracted/s | frontier-URLs-scheduled/s |")
    print("|---|---|---|---|---|")
    for r in runs:
        print(
            f"| local[{r['cpus']}] | {r['elapsed_sec']} | {r['results']} "
            f"| {r['pages_extracted_per_sec']} | {r['frontier_urls_scheduled_per_sec']} |"
        )
    print(f"\nscaling efficiency (extract): {eff_extract:.3f}")
    print(f"scaling efficiency (schedule): {eff_sched:.3f}")

    shutil.rmtree(workroot, ignore_errors=True)
    print(json.dumps({
        "n_pages": n_pages,
        "levels": runs,
        "efficiency_extract": round(eff_extract, 3),
        "efficiency_schedule": round(eff_sched, 3),
    }))


if __name__ == "__main__":
    main()
