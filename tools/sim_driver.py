"""Local simulation of the external correctness driver.

Runs registered queries on Spark (plain local[32] session) AND their
DuckDB oracles at sf0.01, converting BOTH results through pandas (the
driver's path — this is what narrows HUGEINT to float64 and surfaces
cross-engine value drift that fetchall() hides), then compares row
count, sorted column names, and an order-insensitive full-precision
value hash. Usage:

    python tools/sim_driver.py [N | name1 name2 ...]

With an integer N, checks the first N queries in export order (the
driver checks the first 50). Default: 50.
"""

from __future__ import annotations

import math
import pathlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Default matches the external driver (sf0.01); override to fuzz the
# same oracle compare at another scale, e.g.
# SPARK_GRAFT_SIM_SF=/root/testdata/sf0.1 python tools/sim_driver.py
import os
SF = os.environ.get("SPARK_GRAFT_SIM_SF", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if v is None or v is pd.NaT:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, bool):
        return "T" if v else "F"
    return str(v)


def canon(pdf: pd.DataFrame) -> list[str]:
    pdf = pdf[sorted(pdf.columns)]
    rows = ["|".join(_norm(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)]
    return sorted(rows)


def main() -> None:
    from pyspark.sql import SparkSession

    from unilever_scraping_etl_spark.plans.registry import QUERIES, _ordered

    names = list(_ordered())
    args = sys.argv[1:]
    if len(args) == 1 and args[0].isdigit():
        names = names[: int(args[0])]
    elif args:
        names = args
    else:
        names = names[:50]

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "16g")
             .appName("sim-driver").getOrCreate())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    n_fail = 0
    for name in names:
        spec = QUERIES[name]
        try:
            sdf = spec.spark(spark, SF).toPandas()
            if spec.oracle is None:
                print(f"{name}: rows_only spark_rows={len(sdf)} "
                      f"{'OK' if len(sdf) > 0 else 'EMPTY'}")
                continue
            ddf = con.execute(spec.oracle).fetchdf()
            rows = len(sdf) == len(ddf)
            schema = sorted(sdf.columns) == sorted(ddf.columns)
            s_can, d_can = canon(sdf), canon(ddf)
            hashm = s_can == d_can
            status = "OK" if (rows and schema and hashm) else "FAIL"
            if status == "FAIL":
                n_fail += 1
                print(f"{name}: {status} rows={rows}({len(sdf)}/{len(ddf)}) "
                      f"schema={schema} hash={hashm}")
                if rows and schema and not hashm:
                    diff = [(a, b) for a, b in zip(s_can, d_can) if a != b]
                    for a, b in diff[:3]:
                        print(f"   spark: {a}\n   duck : {b}")
            else:
                print(f"{name}: OK ({len(sdf)} rows)")
        except Exception as e:  # noqa: BLE001 — sim must report, not die
            n_fail += 1
            print(f"{name}: ERROR {type(e).__name__}: {e}")
    print(f"\n{len(names)} queries, {n_fail} failures")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
