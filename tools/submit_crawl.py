#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north_rule packaging path).

Build the dependency zip and submit:

    python tools/submit_crawl.py --build-zip /tmp/gms.zip
    $SPARK_HOME/bin/spark-submit --master local[16] \
        --py-files /tmp/gms.zip tools/submit_crawl.py \
        --pages /path/to/pages_parquet --workdir /tmp/crawl-wd \
        --seeds "restaurant in athens" "cafe in berlin" \
        --email --out /tmp/results.csv

On a real cluster, swap ``--master`` for YARN/K8s and point ``--pages`` at
the Iceberg/parquet pages table; nothing else changes — the engine reads its
code from the shipped zip (tests/test_spark_submit.py proves the packaged
path end-to-end with a subprocess spark-submit run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import zipfile


def build_zip(dest: str) -> str:
    """Package google_maps_scraper_spark into a --py-files zip."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "google_maps_scraper_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                zf.write(full, os.path.relpath(full, repo))
    return dest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-zip", metavar="DEST")
    ap.add_argument("--pages")
    ap.add_argument("--workdir")
    ap.add_argument("--seeds", nargs="*", default=[])
    ap.add_argument("--email", action="store_true")
    ap.add_argument("--max-depth", type=int, default=10)
    ap.add_argument("--out", help="single-file CSV destination")
    ap.add_argument("--now-micros", type=int, default=1786838400000000)
    args = ap.parse_args()

    if args.build_zip:
        print(build_zip(args.build_zip))
        return

    if not (args.pages and args.workdir and args.seeds):
        ap.error("--pages, --workdir and --seeds are required to run")

    # Under spark-submit the session already exists; the engine package
    # arrives via --py-files (sys.path gets the zip automatically).
    from pyspark.sql import SparkSession

    from google_maps_scraper_spark.plans.crawl import CrawlConfig, CrawlEngine
    from google_maps_scraper_spark.plans.jobs import write_single_csv

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(args.pages)
    eng = CrawlEngine(
        spark, pages, args.workdir,
        CrawlConfig(
            extract_email=args.email,
            max_depth=args.max_depth,
            now_micros=args.now_micros,
        ),
    )
    eng.seed_from_queries([(q, "") for q in args.seeds])
    counters = eng.run()
    if args.out:
        write_single_csv(eng.results, args.out)
    print("COUNTERS " + json.dumps(counters))


if __name__ == "__main__":
    main()
