#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times individual catalog queries
with the noop sink, N repeats, and optionally dumps .explain("formatted").

NOT the driver contract — bench.py stays frozen; this exists so an
optimization round can isolate one query's cost and plan without paying for
the whole catalog.

Usage:
    python bench_extra.py q1 q2 ...          # time queries, 3 repeats each
    python bench_extra.py --explain q1       # also dump plans to plans/r06/
    python bench_extra.py --repeats 5 q1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--suffix", default="", help="plan filename suffix")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.setdefault("PYSPARK_DRIVER_PYTHON", sys.executable)
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    os.environ.setdefault("SPARK_OFFHEAP_SIZE", "24g")

    from google_maps_scraper_spark.session import get_spark, release_cached

    spark = get_spark(
        app_name="gms-bench-extra",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # same generic warmup as bench.py
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(x):
        return x

    warm = spark.range(10_000).withColumn(
        "rk", F.row_number().over(Window.partitionBy(F.col("id") % 4).orderBy("id"))
    ).withColumn("w", _warm("id"))
    warm.write.format("noop").mode("overwrite").save()

    out: dict[str, list[float]] = {}
    for name in args.names:
        fn = qs[name]
        if args.explain:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                os.path.dirname(os.path.abspath(__file__)),
                "plans", "r06", f"{name}{args.suffix}.txt",
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as fh:
                fh.write(plan)
            release_cached(spark)
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_cached(spark)
        spark.sparkContext.setJobDescription(None)
        out[name] = samples
        print(json.dumps({name: samples}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
