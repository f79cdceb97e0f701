"""HyperBall page-scale stress (round-12): run the sketch on the same
2M-node / 10M-edge hash-spread digraph as the round-11 PageRank
shuffle-path stress — the regime HyperBall exists for (state is
O(nodes × 2^p) register rows, independent of ball size; the exact
pair expansion would be O(Σ|ball|) ≈ 300M+ pairs here and the
registered host-graph queries never touch graphs this shape).

Measures radius-1/2/3 walls at p=8 (each radius is a fresh run — the
per-round increments are the differences), then spot-checks accuracy
against EXACT ground truth for a 40-node sample computed with
harmonic_centrality(targets=...) — the backward pair expansion whose
pair table is O(sample × ball), feasible where the full expansion is
not.

Usage: python tools/stress_hyperball.py [n_nodes] (default 2_000_000)
Prints one summary block; paste the numbers into BASELINE.md.
"""

from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from unilever_scraping_etl_spark.operators import centrality  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
DEG = 5
P = 8
SAMPLE = 40


def main() -> None:
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.driver.memory", "48g")
             .config("spark.local.dir", "/tmp/spark-hyperball")
             .appName("stress-hyperball").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # 5 hash-spread out-edges per node, self-loops dropped — the
    # round-11 PageRank stress graph shape
    base = spark.range(N).select(F.col("id").alias("src"))
    edges = (base
             .select("src", F.explode(F.sequence(F.lit(0), F.lit(DEG - 1)))
                     .alias("k"))
             .select("src", F.pmod(F.xxhash64("src", "k"), F.lit(N))
                     .alias("dst"))
             .filter(F.col("src") != F.col("dst"))
             .localCheckpoint())
    n_edges = edges.count()
    print(f"graph: {N} nodes, {n_edges} edges (deg {DEG})", flush=True)

    walls = {}
    for radius in (1, 2, 3):
        t0 = time.perf_counter()
        est = centrality.harmonic_centrality_sketch(
            edges, "src", "dst", radius=radius, p=P)
        n_out = est.count()
        walls[radius] = time.perf_counter() - t0
        print(f"radius={radius}: wall={walls[radius]:.1f}s "
              f"rows={n_out}", flush=True)

    # accuracy spot-check: exact truth for a spread 40-node sample via
    # the targeted backward expansion
    ids = [k * (N // SAMPLE) + 7 for k in range(SAMPLE)]
    tgt = spark.createDataFrame([(i,) for i in ids], "node long")
    t0 = time.perf_counter()
    exact = {r["node"]: r["harmonic"]
             for r in centrality.harmonic_centrality(
                 edges, "src", "dst", radius=3, targets=tgt).collect()}
    t_exact = time.perf_counter() - t0
    est3 = centrality.harmonic_centrality_sketch(
        edges, "src", "dst", radius=3, p=P)
    got = {r["node"]: r["harmonic_est"]
           for r in est3.join(tgt, est3["node"] == tgt["node"])
           .select(est3["node"], "harmonic_est").collect()}
    rels = [abs(got[i] - exact[i]) / exact[i]
            for i in ids if exact.get(i, 0) > 0]
    tot_e = sum(exact.values())
    tot_g = sum(got[i] for i in ids if i in got)
    print(f"targeted-exact wall={t_exact:.1f}s for {SAMPLE} nodes",
          flush=True)
    print(f"accuracy p={P}: mean|rel|={sum(rels) / len(rels):.4f} "
          f"max|rel|={max(rels):.4f} "
          f"sample-total ratio={tot_g / tot_e:.4f} "
          f"({len(rels)} nodes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
