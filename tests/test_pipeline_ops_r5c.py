"""Round-5 wave C: BM25 ranked retrieval + distributed k-means (2 Lloyd
iterations).  DuckDB value oracles cover exactness (ORACLES_r05.log /
check_oracles); these tests pin the SEMANTIC properties the hash alone
would not explain."""

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bm25(spark):
    from google_maps_scraper_spark.operators.analytics import docs_bm25_topk

    return docs_bm25_topk(spark, SF).collect()


@pytest.fixture(scope="module")
def km(spark):
    from google_maps_scraper_spark.operators.similarity import emb_kmeans_2iter

    return emb_kmeans_2iter(spark, SF).collect()


def test_bm25_shape_and_rank_contiguity(bm25):
    from google_maps_scraper_spark.operators.analytics import (
        _BM25_K,
        _BM25_TERMS,
    )

    by_term = {}
    for r in bm25:
        by_term.setdefault(r["term"], []).append(r)
    assert set(by_term) == set(_BM25_TERMS)
    for rows in by_term.values():
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= _BM25_K


def test_bm25_score_monotone_in_tf_and_dl(bm25):
    """BM25's tf-saturation: at fixed dl higher tf scores higher; at fixed
    tf longer docs score lower; scores never increase down the ranking."""
    by_term = {}
    for r in bm25:
        by_term.setdefault(r["term"], []).append(r)
    for rows in by_term.values():
        scores = [r["score_r3"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        for a in rows:
            for b in rows:
                if a["dl"] == b["dl"] and a["tf"] > b["tf"]:
                    assert a["score_r3"] >= b["score_r3"]
                if a["tf"] == b["tf"] and a["dl"] < b["dl"]:
                    assert a["score_r3"] >= b["score_r3"]


def test_bm25_df_constant_per_term(bm25):
    by_term = {}
    for r in bm25:
        by_term.setdefault(r["term"], set()).add(r["df"])
    for dfs in by_term.values():
        assert len(dfs) == 1


def test_kmeans_assignments_valid_and_seed_cells_nonempty(km):
    from google_maps_scraper_spark.operators.similarity import N_CELLS

    cells_a = {r["cell_a"] for r in km}
    for r in km:
        assert 1 <= r["cell_a"] <= N_CELLS
        assert 1 <= r["cell_b"] <= N_CELLS
        assert r["moved"] == (r["cell_a"] != r["cell_b"])
    # iteration 1: every seed cell captured at least its own seed row
    assert cells_a == set(range(1, N_CELLS + 1))


def test_kmeans_update_reduces_movement_vs_random(km):
    """Lloyd's step must produce substantial stability: most points keep
    their cell after one centroid update (a random re-assignment would move
    ~15/16 of them)."""
    moved = sum(1 for r in km if r["moved"])
    assert moved / len(km) < 0.5


def test_kmeans_seed_rows_stay_home_iter1(spark):
    """Each seed centroid row (vec_id 1..K) is assigned to its own cell in
    iteration 1 — cosine with itself is maximal and ties break low."""
    from google_maps_scraper_spark.operators.similarity import (
        N_CELLS,
        emb_kmeans_2iter,
    )

    rows = {
        r["vec_id"]: r
        for r in emb_kmeans_2iter(spark, SF).collect()
        if 1 <= r["vec_id"] <= N_CELLS
    }
    for vid, r in rows.items():
        assert r["cell_a"] == vid
