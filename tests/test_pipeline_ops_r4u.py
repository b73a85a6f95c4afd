"""Semantic tests for the round-4 wave-u operators — keyword-taxonomy
topic assignment, the quality-filter funnel, the language-ID confusion
matrix, and per-dimension embedding variance — against independent Python
oracles (Counter token counts, staged-filter replay, numpy-free integer
moments)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from google_maps_scraper_spark.operators.analytics import (
    _FUNNEL_LANGS,
    _GOPHER_MIN_WORDS,
    _REP_MAX_SHARE,
    _TAXONOMY,
    _TOPIC_MIN_HITS,
    docs_lang_id_confusion,
    docs_quality_funnel,
    docs_taxonomy_topic_assign,
    load,
)
from google_maps_scraper_spark.operators.similarity import (
    _DIM_VAR_TOPK,
    emb_dim_variance_topk,
)

SF = "/root/testdata/sf0.001"

_STOPS = ("the", "a", "and", "of", "to", "in")


def test_taxonomy_topic_assign_matches_python(spark):
    docs = load(spark, SF, "documents").select("doc_id", "text").collect()
    expect = {}
    for r in docs:
        words = re.split(r"\s+", r["text"].lower().strip())
        cnt = Counter(words)
        hits = {
            t: sum(cnt[k] for k in kws) for t, kws in _TAXONOMY.items()
        }
        assigned = sorted(t for t, h in hits.items() if h >= _TOPIC_MIN_HITS)
        top_hits = max(hits.values())
        top = (
            "none"
            if top_hits == 0
            else min(t for t, h in hits.items() if h == top_hits)
        )
        expect[r["doc_id"]] = (
            "|".join(assigned),
            len(assigned),
            top,
            top_hits,
        )
    rows = {
        r["doc_id"]: (r["topics"], r["n_topics"], r["top_topic"], r["top_hits"])
        for r in docs_taxonomy_topic_assign(spark, SF).collect()
    }
    assert rows == expect
    # the threshold and the argmax are both exercised
    assert any(v[1] > 0 for v in expect.values())
    assert len({v[2] for v in expect.values()}) > 1


def _funnel_flags(r):
    text = r["text"]
    words = re.split(r"\s+", text.strip())
    lwords = re.split(r"\s+", text.lower().strip())
    nw = len(words)
    sc = len(re.sub(r"\s", "", text))
    st = len(re.findall(r"\b(?:%s)\b" % "|".join(_STOPS), text.lower()))
    aw = sum(1 for w in words if re.fullmatch(r"[A-Za-z]+", w))
    mr = max(Counter(lwords).values())
    f1 = r["lang"] in _FUNNEL_LANGS
    f2 = (
        nw >= _GOPHER_MIN_WORDS
        and 3 * nw <= sc <= 10 * nw
        and st >= 2
        and 5 * aw >= 4 * nw
    )
    f4 = mr * _REP_MAX_SHARE <= nw
    return f1, f2, f4


def test_quality_funnel_matches_python(spark):
    docs = (
        load(spark, SF, "documents")
        .select("doc_id", "lang", "text")
        .collect()
    )
    fp_min = {}
    for r in docs:
        fp = hashlib.md5(
            re.sub(r"\s+", "", r["text"].lower()).encode()
        ).hexdigest()
        fp_min[fp] = min(fp_min.get(fp, r["doc_id"]), r["doc_id"])
    n0 = len(docs)
    k1 = k2 = k3 = k4 = 0
    for r in docs:
        f1, f2, f4 = _funnel_flags(r)
        fp = hashlib.md5(
            re.sub(r"\s+", "", r["text"].lower()).encode()
        ).hexdigest()
        f3 = fp_min[fp] == r["doc_id"]
        k1 += f1
        k2 += f1 and f2
        k3 += f1 and f2 and f3
        k4 += f1 and f2 and f3 and f4
    rows = docs_quality_funnel(spark, SF).collect()
    got = [
        (r["stage_idx"], r["stage"], r["n_in"], r["n_kept"], r["n_dropped"])
        for r in rows
    ]
    assert got == [
        (1, "lang_allowlist", n0, k1, n0 - k1),
        (2, "gopher_rules", k1, k2, k1 - k2),
        (3, "exact_dedup", k2, k3, k2 - k3),
        (4, "max_word_rep", k3, k4, k3 - k4),
    ]
    # the funnel actually filters on this corpus
    assert k4 < n0 and k4 > 0


def test_lang_id_confusion_matches_python(spark):
    docs = load(spark, SF, "documents").select("lang", "text").collect()
    cm = Counter()
    for r in docs:
        pred = (
            "en"
            if len(re.findall(r"\b(?:the|and|of|is)\b", r["text"].lower()))
            >= 3
            else r["lang"]
        )
        cm[(r["lang"], pred)] += 1
    rows = docs_lang_id_confusion(spark, SF).collect()
    got = {(r["lang_true"], r["lang_pred"]): (r["n_docs"], r["correct"]) for r in rows}
    assert got == {k: (v, k[0] == k[1]) for k, v in cm.items()}
    # the heuristic actually mislabels some non-English docs here
    assert any(t != p for t, p in cm)


def test_emb_dim_variance_matches_python(spark):
    vecs = load(spark, SF, "embeddings").select("embedding").collect()
    moments = defaultdict(lambda: [0, 0, 0])  # dim -> [n, sum, sumsq]
    for r in vecs:
        for i, x in enumerate(r["embedding"]):
            m = int(round(float(x) * 1000))
            # Python round is banker's; replicate round-half-away-from-zero
            v = float(x) * 1000
            frac = v - int(v)
            if abs(frac) == 0.5:
                m = int(v) + (1 if v > 0 else -1)
            acc = moments[i]
            acc[0] += 1
            acc[1] += m
            acc[2] += m * m
    scored = sorted(
        (
            (n * ss - s * s, dim, n, s)
            for dim, (n, s, ss) in moments.items()
        ),
        key=lambda t: (-t[0], t[1]),
    )
    rows = emb_dim_variance_topk(spark, SF).collect()
    assert len(rows) == min(_DIM_VAR_TOPK, len(moments))
    for rk, (r, (var, dim, n, s)) in enumerate(zip(rows, scored), start=1):
        assert (r["dim"], r["n_vecs"], r["sum_milli"], r["var_scaled"], r["rk"]) == (
            dim,
            n,
            s,
            var,
            rk,
        )
    assert rows[0]["var_scaled"] > 0
