"""BM25 retrieval and 2-D skyline (operators/ranking.py). Registered
queries `bm25_topk` / `skyline_parts` are oracle-checked by the
driver; these tests pin the math on hand-computed corpora and the
skyline against a quadratic reference."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators import ranking


def _corpus(spark):
    return spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "b b b c")],
        "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame([("q1", "a"), ("q1", "b")],
                                 "query_id string, term string")


def test_bm25_hand_computed_scores(spark):
    out = ranking.bm25_topk(_corpus(spark), _queries(spark), 10)
    rows = {r.doc_id: (r.score, r.rank) for r in out.collect()}
    # N=3, avgdl=3, df(a)=df(b)=2 -> idf = ln((3-2+0.5)/2.5 + 1) = ln(1.6)
    idf = math.log(1.6)
    # d1: tf(a)=2,tf(b)=1,dl=3 -> 2*2.2/(2+1.2) + 1*2.2/(1+1.2)
    exp1 = idf * (4.4 / 3.2) + idf * (2.2 / 2.2)
    # d2: tf(a)=1,dl=2 -> 2.2/(1+1.2*(0.25+0.75*2/3))
    exp2 = idf * 2.2 / (1 + 1.2 * (0.25 + 0.75 * 2 / 3))
    # d3: tf(b)=3,dl=4 -> 3*2.2/(3+1.2*(0.25+0.75*4/3))
    exp3 = idf * 3 * 2.2 / (3 + 1.2 * (0.25 + 0.75 * 4 / 3))
    assert rows[1][0] == pytest.approx(exp1, abs=1e-6)
    assert rows[2][0] == pytest.approx(exp2, abs=1e-6)
    assert rows[3][0] == pytest.approx(exp3, abs=1e-6)
    assert [rows[d][1] for d in (1, 3, 2)] == [1, 2, 3]


def test_bm25_k_truncates_and_ties_break_by_doc_id(spark):
    out = ranking.bm25_topk(_corpus(spark), _queries(spark), 1)
    got = out.collect()
    assert len(got) == 1 and got[0].doc_id == 1 and got[0].rank == 1
    # identical docs tie -> lower doc_id first
    dup = spark.createDataFrame([(7, "z z"), (5, "z z")],
                                "doc_id long, text string")
    q = spark.createDataFrame([("q", "z")], "query_id string, term string")
    ranked = [r.doc_id for r in ranking.bm25_topk(dup, q, 2)
              .orderBy("rank").collect()]
    assert ranked == [5, 7]


def test_bm25_no_match_means_no_row(spark):
    q = spark.createDataFrame([("q", "zzz")], "query_id string, term string")
    assert ranking.bm25_topk(_corpus(spark), q, 5).count() == 0


def _brute_skyline(pts):
    return sorted(
        p for p in pts
        if not any(o[0] <= p[0] and o[1] <= p[1] and o != p for o in pts))


def test_skyline_hand_case(spark):
    pts = [(1, 5), (2, 3), (2, 6), (3, 4), (4, 1), (5, 0)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = sorted((r.x, r.y) for r in ranking.skyline_2d(df, "x", "y")
                 .collect())
    assert got == [(1, 5), (2, 3), (4, 1), (5, 0)]
    assert got == _brute_skyline(pts)


def test_skyline_nulls_dropped_and_reserved_names_rejected(spark):
    df = spark.createDataFrame([(1, None), (None, 1), (2, 2)],
                               "x long, y long")
    assert [(r.x, r.y) for r in ranking.skyline_2d(df, "x", "y")
            .collect()] == [(2, 2)]
    bad = spark.createDataFrame([(1, 2, 3)], "x long, y long, __pm long")
    with pytest.raises(ValueError, match="reserved"):
        ranking.skyline_2d(bad, "x", "y")


def test_skyline_matches_quadratic_reference_on_grids(spark):
    """Deterministic sweep standing in for a property test: several
    seeds of hash-scattered unique points, two-phase result == the
    quadratic NOT-EXISTS reference, across bucket counts (including
    buckets=1, which collapses phase 1 into phase 2's exact rule)."""
    for seed in range(5):
        pts = sorted({(((i * 2654435761 + seed) >> 3) % 50,
                       ((i * 40503 + 7 * seed) >> 2) % 50)
                      for i in range(60)})
        df = spark.createDataFrame(pts, "x long, y long")
        for buckets in (1, 4, 32):
            got = sorted((r.x, r.y)
                         for r in ranking.skyline_2d(df, "x", "y",
                                                     buckets=buckets)
                         .collect())
            assert got == _brute_skyline(pts), (seed, buckets)


def test_skyline_phase1_prunes_before_global_window(spark):
    """The unpartitioned exact pass must sit ABOVE the bucketed pass in
    the plan (two Window nodes; the bucketed one below), so the global
    single-partition sort only ever sees local survivors."""
    df = spark.createDataFrame([(i, 100 - i) for i in range(100)],
                               "x long, y long")
    plan = (ranking.skyline_2d(df, "x", "y")
            ._jdf.queryExecution().executedPlan().toString())
    assert plan.count("Window") >= 2
    assert "__bucket" in plan


def test_bm25_plan_semi_joins_vocab_before_wide_shuffle(spark):
    """The docstring's scale claims, pinned: the query vocabulary
    reaches the token stream as a broadcast LEFT-SEMI join (never a
    shuffled one — the corpus-side explosion must be pruned in the
    scan stage), and the per-query top-k window carries a
    WindowGroupLimit partial."""
    plan = (ranking.bm25_topk(_corpus(spark), _queries(spark), 10)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "WindowGroupLimit" in plan


def test_skyline_nan_coordinates_dropped(spark):
    """NaN must behave like null: untreated it rides Spark's
    sort-last ordering into the frontier (a NaN-y first-in-order point
    gets the null initial frame; a NaN-x point sorts last and wins on
    y alone) — both confirmed before the guard existed."""
    rows = [(1.0, 5.0), (2.0, 3.0), (float("nan"), 1.0),
            (0.5, float("nan"))]
    df = spark.createDataFrame(rows, "x double, y double")
    got = sorted((r.x, r.y) for r in ranking.skyline_2d(df, "x", "y")
                 .collect())
    assert got == [(1.0, 5.0), (2.0, 3.0)]
