"""Semantic tests for the corpus-statistics catalog additions: global
vocabulary top-k (sequential Counter oracle + deterministic tie cut),
within-document word-repetition stats (per-doc Python oracle), and int8
symmetric embedding quantization (numpy oracle + saturation invariants)."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
from pyspark.sql import functions as F

from google_maps_scraper_spark.operators.analytics import (
    docs_vocab_topk,
    docs_word_rep_stats,
    load,
)
from google_maps_scraper_spark.operators.similarity import emb_int8_quantize

SF = "/root/testdata/sf0.001"


def _doc_texts(spark):
    return {
        r["doc_id"]: r["text"]
        for r in load(spark, SF, "documents").select("doc_id", "text").collect()
    }


# =============================================================================
# docs_vocab_topk
# =============================================================================


def test_vocab_topk_matches_counter_oracle(spark):
    texts = _doc_texts(spark)
    counts = Counter()
    for t in texts.values():
        counts.update(w for w in re.split(r"\s+", t.strip()) if w)
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["token"], r["n_occurrences"])
        for r in docs_vocab_topk(spark, SF).collect()
    ]
    assert got == want


def test_vocab_topk_is_deterministic_under_ties(spark):
    # two runs must cut the k boundary identically (count desc, token asc)
    a = [tuple(r) for r in docs_vocab_topk(spark, SF).collect()]
    b = [tuple(r) for r in docs_vocab_topk(spark, SF).collect()]
    assert a == b
    # ordering invariant holds within the returned page
    for (t1, n1), (t2, n2) in zip(a, a[1:]):
        assert (-n1, t1) <= (-n2, t2)


# =============================================================================
# docs_word_rep_stats
# =============================================================================


def test_word_rep_stats_matches_python_oracle(spark):
    texts = _doc_texts(spark)
    got = {
        r["doc_id"]: (r["n_words"], r["n_distinct_words"], r["dup_words"])
        for r in docs_word_rep_stats(spark, SF).collect()
    }
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        toks = re.split(r"\s+", text.strip())
        want = (len(toks), len(set(toks)), len(toks) - len(set(toks)))
        assert got[doc_id] == want, doc_id
    # a word-soup corpus repeats heavily: the signal must be non-vacuous
    assert any(d > 0 for _, _, d in got.values())


# =============================================================================
# emb_int8_quantize
# =============================================================================


def test_int8_quantize_matches_numpy_oracle(spark):
    emb = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in load(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    }
    got = {
        r["vec_id"]: (r["q_l1"], r["n_saturated"])
        for r in emb_int8_quantize(spark, SF).collect()
    }
    assert set(got) == set(emb)
    for vid, v in emb.items():
        mx = float(np.max(np.abs(v)))
        if mx == 0:
            want = (0, 0)
        else:
            # round half away from zero, exactly like Spark/DuckDB round()
            q = np.abs(np.floor(np.abs(v / (mx / 127.0)) + 0.5))
            want = (int(q.sum()), int((q == 127.0).sum()))
        assert got[vid] == want, vid


def test_int8_quantize_invariants(spark):
    rows = emb_int8_quantize(spark, SF).collect()
    dim = int(
        load(spark, SF, "embeddings").select(F.size("embedding").alias("d")).head()["d"]
    )
    for r in rows:
        # the max-|x| element quantizes to exactly 127 -> always >=1 saturated
        assert r["n_saturated"] >= 1
        # every |q_i| <= 127 -> L1 bounded by 127 * dim
        assert 0 <= r["q_l1"] <= 127 * dim
