"""PageRank (operators/graph.py): hand-computed fixed points, the
uniform-on-regular-graphs invariant, a python-reference property
sweep, and the lineage-truncation path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _reference(pairs, iterations, d=0.85):
    nodes = sorted({u for u, _ in pairs} | {v for _, v in pairs})
    n = len(nodes)
    outdeg = {}
    for u, _ in pairs:
        outdeg[u] = outdeg.get(u, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        contrib = {v: 0.0 for v in nodes}
        for u, v in pairs:
            contrib[v] += rank[u] / outdeg[u]
        rank = {v: (1 - d) / n + d * contrib[v] for v in nodes}
    return rank


def test_cycle_stays_uniform(spark):
    """On a directed cycle every node has in=out=1, so the uniform
    start 1/N is the exact fixed point at every iteration."""
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    out = graph.pagerank(_edges(spark, pairs), "src", "dst",
                         iterations=7).collect()
    assert len(out) == 5
    for r in out:
        assert r["rank"] == pytest.approx(0.2, abs=1e-12)


def test_sink_heavy_star_matches_hand_computation(spark):
    """3 -> 0, 1 -> 0, 2 -> 0 plus 0 -> 3: node 0 accumulates; one
    iteration from uniform is directly checkable by hand."""
    pairs = [(1, 0), (2, 0), (3, 0), (0, 3)]
    out = {r["node"]: r["rank"]
           for r in graph.pagerank(_edges(spark, pairs), "src", "dst",
                                   iterations=1).collect()}
    # base = 0.15/4; contrib(0) = r1 + r2 + r3 = 0.75; contrib(3) = r0
    assert out[0] == pytest.approx(0.15 / 4 + 0.85 * 0.75)
    assert out[3] == pytest.approx(0.15 / 4 + 0.85 * 0.25)
    assert out[1] == out[2] == pytest.approx(0.15 / 4)


def test_ranks_sum_to_one_without_dangling_nodes(spark):
    """With no dangling nodes, total mass is conserved exactly (up to
    float noise) at every K."""
    pairs = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1)]
    out = graph.pagerank(_edges(spark, pairs), "src", "dst",
                         iterations=6)
    total = out.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, abs=1e-9)


def test_checkpointing_changes_nothing_but_lineage(spark):
    pairs = [(i, (i * 3 + 1) % 7) for i in range(7)] + [(2, 5), (6, 1)]
    plain = graph.pagerank(_edges(spark, pairs), "src", "dst",
                           iterations=6, rank_digits=10)
    ck = graph.pagerank(_edges(spark, pairs), "src", "dst",
                        iterations=6, rank_digits=10,
                        checkpoint_every=2)
    assert sorted(map(tuple, plain.collect())) == \
        sorted(map(tuple, ck.collect()))
    # the checkpointed plan must NOT contain the full 6-iteration tree
    depth = ck._jdf.queryExecution().executedPlan().toString()
    assert depth.count("HashAggregate") < 6


def test_null_keyed_edges_are_dropped_not_phantom_nodes(spark):
    pairs = [(0, 1), (1, 0), (None, 1), (0, None)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = graph.pagerank(df, "src", "dst", iterations=2).collect()
    assert {r["node"] for r in out} == {0, 1}


def test_empty_and_all_null_edge_lists_return_empty_frame(spark):
    for rows in ([], [(None, 1), (2, None)]):
        df = spark.createDataFrame(rows, "src long, dst long")
        out = graph.pagerank(df, "src", "dst", iterations=3)
        assert out.columns == ["node", "rank"]
        assert out.count() == 0


def test_validation(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="iterations"):
        graph.pagerank(e, "src", "dst", iterations=0)
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank(e, "src", "dst", damping=1.0)
    with pytest.raises(ValueError, match="reserved"):
        graph.pagerank(e.withColumn("rank", F.lit(1)), "src", "dst")


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _pair = st.tuples(st.integers(0, 5), st.integers(0, 5))

    @settings(max_examples=10, deadline=None)
    @given(st.lists(_pair, min_size=1, max_size=15))
    def test_pagerank_matches_python_reference(pairs):
        spark = _hyp_spark[0]
        exp = _reference(pairs, iterations=4)
        out = {r["node"]: r["rank"]
               for r in graph.pagerank(_edges(spark, pairs),
                                       "src", "dst",
                                       iterations=4).collect()}
        assert set(out) == set(exp)
        for v, r in exp.items():
            assert out[v] == pytest.approx(r, abs=1e-10)

    _hyp_spark = [None]

    @pytest.fixture(autouse=True)
    def _capture_spark(spark):
        _hyp_spark[0] = spark
        yield

except ImportError:
    pass
