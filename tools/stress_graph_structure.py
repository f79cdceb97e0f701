"""Round-13/14 stress: the structural graph operators — label
propagation, co-citation, triangle count, k-core, HITS, full core
decomposition — at the r12/r13 ranking-stress scale (200k nodes /
~1M edges on local[32]), so BASELINE.md records measured walls for
the structural family next to the iterative-ranking one.

Graph: the same deterministic xxhash64 edge list with the web-shaped
preferential low-id destination skew as tools/stress_pagerank_variants
(dst ∝ u² — heavy authority head, long flat tail). That skew is the
hard case for all of them: LPA floods toward the head labels, the head
nodes dominate co-citation pair generation (exactly what
max_linker_degree caps), and the head forms the deep cores.

Usage: python tools/stress_graph_structure.py [nodes] [edges]
                                              [--no-broadcast]
                                              [--ops=lpa,cocitation,...]
                                              [--k=N]

``--no-broadcast`` forces the r14 bounded-probe gate OFF for the whole
family — the >1M page-scale plan shape (shuffle joins, AQE decides) —
so the gated-on vs gated-off cost can be A/B'd at a scale where both
are feasible (at 200k the auto gate keeps the broadcast, which is the
point of the probe).

``--ops`` (names: lpa, cocitation, triangles, kcore, hits, coreness,
salsa) runs a subset — the r14 2M-scale runs measured single legs
with reduced iteration counts rather than the whole family at the
200k defaults. ``--k`` overrides the iteration count of the iterative
trio (lpa/hits/salsa; default 5)."""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from unilever_scraping_etl_spark.operators import graph  # noqa: E402
from unilever_scraping_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bcast = None if "--no-broadcast" not in sys.argv else False
    ops = {"lpa", "cocitation", "triangles", "kcore", "hits",
           "coreness", "salsa"}
    k_iter = 5
    for a in sys.argv[1:]:
        if a.startswith("--ops="):
            ops = set(a.split("=", 1)[1].split(","))
        elif a.startswith("--k="):
            k_iter = int(a.split("=", 1)[1])
    n = int(args[0]) if len(args) > 0 else 200_000
    m = int(args[1]) if len(args) > 1 else 1_000_000
    spark = get_session()
    print(f"broadcast gate: {'auto (n-probe)' if bcast is None else bcast}")
    u = F.pmod(F.xxhash64(F.col("id") + m), 1_000_000) / 1_000_000.0
    edges = (spark.range(m).select(
        F.pmod(F.xxhash64(F.col("id")), n).alias("src"),
        F.floor(F.pow(u, 2.0) * n).cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .localCheckpoint())
    print(f"graph: {edges.count()} edges, target {n} nodes")

    if "lpa" in ops:
        t = time.perf_counter()
        lpa = graph.label_propagation(edges, "src", "dst",
                                      iterations=k_iter,
                                      broadcast_labels=bcast)
        comms = lpa.select("community").distinct().count()
        print(f"label_propagation K={k_iter} : "
              f"{time.perf_counter() - t:.1f} s, "
              f"{comms} communities", flush=True)

    if "cocitation" in ops:
        t = time.perf_counter()
        cc = graph.cocitation(edges, "src", "dst", min_common=3,
                              max_linker_degree=64,
                              broadcast_degrees=bcast)
        pairs = cc.count()
        print(f"cocitation cap=64     : "
              f"{time.perf_counter() - t:.1f} s, "
              f"{pairs} pairs (min_common=3)", flush=True)

    if "triangles" in ops:
        t = time.perf_counter()
        tc = graph.triangle_count(edges, "src", "dst",
                                  broadcast_degrees=bcast)
        tri = tc.agg(F.sum("triangles")).first()[0]
        print(f"triangle_count        : "
              f"{time.perf_counter() - t:.1f} s, "
              f"{tri} corner-counts", flush=True)

    if "kcore" in ops:
        for k in (4, 16):
            t = time.perf_counter()
            core = graph.k_core(edges, "src", "dst", k=k, rounds=64,
                                until_stable=True,
                                broadcast_survivors=bcast)
            nodes = core.count()
            print(f"k_core k={k:<2} stable   : "
                  f"{time.perf_counter() - t:.1f} s, "
                  f"{nodes} nodes in core", flush=True)

    if "hits" in ops:
        t = time.perf_counter()
        h = graph.hits(edges, "src", "dst", iterations=k_iter,
                       broadcast_scores=bcast)
        nh = h.count()
        print(f"hits K={k_iter}              : "
              f"{time.perf_counter() - t:.1f} s, "
              f"{nh} nodes", flush=True)

    if "coreness" in ops:
        t = time.perf_counter()
        cn = graph.core_number(edges, "src", "dst", rounds=64,
                               until_stable=True,
                               broadcast_values=bcast)
        mx = cn.agg(F.max("core")).first()[0]
        print(f"core_number stable    : "
              f"{time.perf_counter() - t:.1f} s, "
              f"max core {mx}", flush=True)

    if "salsa" in ops:
        t = time.perf_counter()
        sa = graph.salsa(edges, "src", "dst", iterations=k_iter,
                         broadcast_scores=bcast)
        ns = sa.count()
        print(f"salsa K={k_iter}             : "
              f"{time.perf_counter() - t:.1f} s, "
              f"{ns} nodes", flush=True)


if __name__ == "__main__":
    main()
