"""Deterministic weighted sampling (operators/sampling.py). The
registered `weighted_sample` query is oracle-checked by the driver;
these tests pin the A-Res math against a Python reference and the
operator's contracts."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators import sampling


def _key(doc_id, w):
    h = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
    return math.log((h + 1) / 4294967296.0) / w


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, grp string, w long")


def test_matches_python_reference_ranking(spark):
    rows = [(i, "g", 1 + (i * 37) % 500) for i in range(200)]
    exp = [d for d, _, _ in sorted(
        rows, key=lambda r: (-_key(r[0], r[2]), r[0]))][:10]
    out = sampling.weighted_sample_topk(_df(spark, rows), "doc_id", "w",
                                        10, group_cols=["grp"])
    got = [r.doc_id for r in out.orderBy("sample_rank").collect()]
    assert got == exp


def test_deterministic_across_runs_and_partitionings(spark):
    rows = [(i, "g%d" % (i % 3), 10 + i) for i in range(100)]
    df = _df(spark, rows)
    a = sorted(map(tuple, sampling.weighted_sample_topk(
        df, "doc_id", "w", 5, group_cols=["grp"]).collect()))
    b = sorted(map(tuple, sampling.weighted_sample_topk(
        df.repartition(13), "doc_id", "w", 5, group_cols=["grp"])
        .collect()))
    assert a == b and len(a) == 15


def test_nonpositive_and_null_weights_excluded(spark):
    df = spark.createDataFrame(
        [(1, "g", 5), (2, "g", 0), (3, "g", -1), (4, "g", None)],
        "doc_id long, grp string, w long")
    got = [r.doc_id for r in sampling.weighted_sample_topk(
        df, "doc_id", "w", 10, group_cols=["grp"]).collect()]
    assert got == [1]


def test_global_sample_without_groups_and_guards(spark):
    rows = [(i, "g", 1 + i) for i in range(20)]
    out = sampling.weighted_sample_topk(_df(spark, rows), "doc_id", "w", 7)
    assert out.count() == 7
    with pytest.raises(ValueError, match="k must be"):
        sampling.weighted_sample_topk(_df(spark, rows), "doc_id", "w", 0)
    bad = spark.createDataFrame([(1, 2, 3)], "doc_id long, w long, __u long")
    with pytest.raises(ValueError, match="reserved"):
        sampling.weighted_sample_topk(bad, "doc_id", "w", 1)


def test_heavier_weights_dominate_in_aggregate(spark):
    """A-Res sanity: with weights 1000 vs 1, nearly all of a top-50
    from a 50/50 population should be heavy rows (the probability any
    single light row beats a heavy one is ~w_l/(w_l+w_h))."""
    rows = ([(i, "g", 1000) for i in range(500)]
            + [(i + 500, "g", 1) for i in range(500)])
    out = sampling.weighted_sample_topk(_df(spark, rows), "doc_id", "w",
                                        50, group_cols=["grp"])
    heavy = sum(1 for r in out.collect() if r.doc_id < 500)
    assert heavy >= 45


def test_sample_window_carries_group_limit_partial(spark):
    """Scale pin: the per-group top-k must plan a WindowGroupLimit
    (map-side partial top-k), so a group spanning the corpus never
    concentrates more than each task's local k into the final sort."""
    rows = [(i, "g%d" % (i % 3), 10 + i) for i in range(100)]
    plan = (sampling.weighted_sample_topk(_df(spark, rows), "doc_id",
                                          "w", 5, group_cols=["grp"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "WindowGroupLimit" in plan


def test_global_sample_plans_distributed_topk(spark):
    """Scale pin for the UNGROUPED path: Catalyst's rank-limit
    pushdown turns the global row_number window into
    TakeOrderedAndProject — per-partition top-k plus a k-row merge,
    so even a corpus-wide sample never single-partitions the data."""
    rows = [(i, 1 + i) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    plan = (sampling.weighted_sample_topk(df, "doc_id", "w", 5)
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan


def test_global_form_equals_ungrouped_topk(spark):
    """weighted_sample_global and the ungrouped weighted_sample_topk
    share one _ares_key definition and MUST pick the identical row
    set with identical keys and ranks — the invariant the r11
    deduplication exists to protect."""
    rows = [(i, 1 + (i * 7) % 13) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = sorted(map(tuple, sampling.weighted_sample_global(
        df, "doc_id", "w", 9)
        .select("doc_id", "sample_key", "sample_rank").collect()))
    b = sorted(map(tuple, sampling.weighted_sample_topk(
        df, "doc_id", "w", 9)
        .select("doc_id", "sample_key", "sample_rank").collect()))
    assert a == b


def test_global_form_guards(spark):
    df = spark.createDataFrame([(1, 2)], "doc_id long, w long")
    with pytest.raises(ValueError, match="k must be"):
        sampling.weighted_sample_global(df, "doc_id", "w", 0)
    with pytest.raises(ValueError, match="reserved"):
        sampling.weighted_sample_global(
            df.withColumn("sample_key", F.lit(1)), "doc_id", "w", 1)
