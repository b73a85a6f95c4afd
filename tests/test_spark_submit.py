"""spark-submit --py-files packaging proof (north_rule: 'run via
spark-submit --py-files'): the engine zip + entry script run a real crawl in
a fresh spark-submit subprocess, reading engine code ONLY from the zip."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files(spark, tmp_path):
    from google_maps_scraper_spark.sources.corpus import (
        corpus_to_spark,
        generate_corpus,
    )

    corpus = generate_corpus(n_seeds=2, places_per_serp=4, seed=42)
    pages_path = str(tmp_path / "pages")
    corpus_to_spark(spark, corpus).write.mode("overwrite").parquet(pages_path)
    queries = [s["query"].split(" #!#")[0] for s in corpus.seeds]

    zip_path = str(tmp_path / "gms.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "submit_crawl.py"),
         "--build-zip", zip_path],
        check=True, capture_output=True,
    )
    import pyspark

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    # engine code must come from the zip: run from a neutral cwd
    out_csv = str(tmp_path / "results.csv")
    proc = subprocess.run(
        [spark_submit, "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path,
         os.path.join(REPO, "tools", "submit_crawl.py"),
         "--pages", pages_path, "--workdir", str(tmp_path / "wd"),
         "--seeds", *queries, "--email", "--out", out_csv],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("COUNTERS ")]
    assert line, proc.stdout[-2000:]
    counters = json.loads(line[-1].removeprefix("COUNTERS "))
    assert counters["results"] > 0
    assert counters.get("search_done") == 2
    head = open(out_csv).readline()
    assert head.startswith("input_id,link,title,")
