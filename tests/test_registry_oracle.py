"""Mini-driver: runs every registered query on Spark AND its DuckDB
oracle on the same parquet tables, then compares row count, column
names, and an order-insensitive value representation — the same gate
the external driver applies at sf0.01 (SURVEY.md §5.3). Catching a
mismatch here costs seconds; catching it in the driver costs a round.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from unilever_scraping_etl_spark.plans.registry import QUERIES
from unilever_scraping_etl_spark.schemas import TEST_TABLES

from .conftest import SF_SMOKE

SF = SF_SMOKE  # sf0.001 keeps the full sweep fast; semantics identical


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TEST_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # full precision: per-row float exprs must match bit-for-bit
        return repr(v)
    return str(v)


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


ORACLE_QUERIES = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(name, spark, duck):
    spec = QUERIES[name]
    sdf = spec.spark(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    # fetchall() returns HUGEINT as Python int, hiding a divergence the
    # external driver (pandas path: HUGEINT -> float64) sees as a
    # per-row 1.0-vs-1 hash mismatch — this kept sessionize_events red
    # r02-r04. DuckDB types integer SUMs as HUGEINT, so oracles must
    # CAST them before emitting.
    bad = [c for c, t in zip(rel.columns, rel.types)
           if str(t) in ("HUGEINT", "UHUGEINT")]
    assert not bad, \
        f"{name}: oracle emits HUGEINT column(s) {bad}; CAST them (the " \
        "driver's pandas conversion narrows HUGEINT to float64)"
    res = duck.execute(spec.oracle)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), \
        f"{name}: column names differ: spark={scols} duck={dcols}"
    assert len(srows) == len(drows), \
        f"{name}: row count differs: spark={len(srows)} duck={len(drows)}"
    sc, dc = _canon(srows, scols), _canon(drows, dcols)
    mismatches = [(a, b) for a, b in zip(sc, dc) if a != b]
    assert not mismatches, \
        f"{name}: {len(mismatches)} value mismatches; first: {mismatches[0]}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name].spark(spark, SF)
    assert df.count() >= 0
    assert len(df.columns) > 0
