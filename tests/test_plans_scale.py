"""Physical-plan assertions — the 100 TB posture checks (SURVEY.md §4):
filters and projections must reach the parquet scan, dimension joins
must broadcast, pair joins must never degrade to cartesian products.
These are the properties that decide whether a plan survives a 1000x
scale-up, so they're pinned as tests, not left to eyeballing .explain().
"""

from __future__ import annotations

from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators import dedup
from unilever_scraping_etl_spark.plans.registry import QUERIES
from unilever_scraping_etl_spark.schemas import load_table

from .conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    df = (li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
            .select("l_orderkey", "l_extendedprice"))
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_column_pruning_reaches_parquet_scan(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    plan = _plan(li.select("l_orderkey", "l_quantity"))
    # ReadSchema must carry only the projected columns
    read = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read and "l_comment" not in read


def test_dim_join_is_broadcast(spark):
    plan = _plan(QUERIES["join_broadcast"].spark(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_flagship_agg_is_partial_final_codegen(spark):
    df = QUERIES["agg_price_stats"].spark(spark, SF_SMOKE)
    df.collect()  # finalize the AQE plan before inspecting codegen spans
    plan = _plan(df)
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_sum" in plan          # map-side combine
    assert final.count("HashAggregate") >= 2   # partial + final
    assert "*(" in final                  # whole-stage-codegen span markers


def test_sort_limit_is_take_ordered(spark):
    # A global top-N must not materialize a full sort at scale.
    plan = _plan(QUERIES["sort_limit"].spark(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_minhash_candidates_no_cartesian(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(dedup.minhash_candidates(docs, "doc_id", "text"))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_no_cartesian(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    plan = _plan(dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5))
    assert "CartesianProduct" not in plan


def test_topk_window_group_limit_pushdown(spark):
    # Spark >=3.5 pushes a per-partition top-k below the window shuffle.
    plan = _plan(QUERIES["topk_per_group"].spark(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
