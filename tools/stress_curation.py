"""Round-16 stress: the curation family (DSIR, bigram-LM perplexity,
SemDeDup) at corpus scales far past the sf0.1 fixtures, on local[32].

Corpus: deterministic xxhash64 synthetic documents — N docs of L
tokens drawn from a V-word vocabulary with a zipf-ish pow() skew; a
~15% "target" slice draws from a shifted exponent so the DSIR
log-ratios are non-trivial (the fixture's en-vs-rest situation at
scale). Text is assembled JVM-side (transform + element_at +
concat_ws over a broadcast vocab literal): no Python row path even
in the GENERATOR, so the measured walls are the operators'.

Embeddings for the SemDeDup leg: dim-16 center+noise vectors with
N/400 deterministic centers, so near-duplicate mass exists by
construction (random high-dim vectors are near-orthogonal and would
measure an empty prune). The published cost model is pairs ~ N²/k;
the leg prints the realized in-cluster pair count next to the wall
so the measured point can be placed on that curve.

Usage: python tools/stress_curation.py [n_docs] [tokens_per_doc]
                                       [--ops dsir,ppl,sem]
                                       [--buckets B] [--seeds K]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from unilever_scraping_etl_spark.operators import curation  # noqa: E402
from unilever_scraping_etl_spark.session import get_session  # noqa: E402

V = 1000  # vocabulary size


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 200_000
    length = int(args[1]) if len(args) > 1 else 100
    ops = ("dsir", "ppl", "sem")
    n_buckets, n_seeds = 65536, 256
    for i, a in enumerate(sys.argv):
        if a == "--ops":
            ops = tuple(sys.argv[i + 1].split(","))
        if a == "--buckets":
            n_buckets = int(sys.argv[i + 1])
        if a == "--seeds":
            n_seeds = int(sys.argv[i + 1])
    spark = get_session()

    # per-(doc, position) uniform; target slice uses a softer exponent
    # so its word distribution genuinely differs from the raw pool's.
    # The whole text builds inside ONE row (transform over a sequence,
    # no explode/groupBy) — deterministic and generator-cost-free.
    vocab_sql = "array(" + ",".join(f"'w{i}'" for i in range(V)) + ")"
    tgt = F.pmod(F.xxhash64(F.col("id") + 7), 100) < 15
    text = F.expr(
        f"concat_ws(' ', transform(sequence(1, {length}), i -> "
        f"element_at({vocab_sql}, cast(floor(pow("
        f"pmod(xxhash64(id * {length} + i), 1000000) / 1000000.0, "
        f"CASE WHEN is_tgt THEN 2.0 ELSE 3.0 END) * {V}) + 1 AS int))))")
    docs = (spark.range(n)
            .withColumn("is_tgt", tgt)
            .select(F.col("id").alias("doc_id"), "is_tgt",
                    text.alias("text"))
            .localCheckpoint())
    print(f"corpus: {docs.count()} docs x {length} tokens, "
          f"vocab {V}, target slice "
          f"{docs.filter('is_tgt').count()}")

    if "dsir" in ops:
        t = time.perf_counter()
        wts = curation.dsir_hashed_ngram_weights(
            docs, "doc_id", "text", "is_tgt",
            n_buckets=n_buckets, alpha=1.0)
        sel = curation.gumbel_topk(wts, "doc_id", "dsir_logweight", 100)
        rows = sel.collect()
        wall = time.perf_counter() - t
        print(f"dsir: B={n_buckets} top-100 selected, "
              f"logw range [{min(r[1] for r in rows):.3f}, "
              f"{max(r[1] for r in rows):.3f}], wall {wall:.1f}s")

    if "ppl" in ops:
        t = time.perf_counter()
        scored = curation.bigram_lm_bits(
            docs.withColumn("g", F.lit("all")), "doc_id", "text", "g",
            "is_tgt", alpha=0.5)
        out = curation.tercile_buckets(scored, "g", "bits_per_token")
        cnt = (out.groupBy("ppl_bucket").count()
                  .orderBy("ppl_bucket").collect())
        wall = time.perf_counter() - t
        print(f"ppl: buckets {[(r[0], r[1]) for r in cnt]}, "
              f"wall {wall:.1f}s")

    if "sem" in ops:
        dim, centers = 16, max(n // 400, 1)
        c = F.pmod(F.xxhash64(F.col("id")), centers)
        vec = F.expr(
            f"transform(sequence(0, {dim - 1}), j -> "
            f"(pmod(xxhash64(c * {dim} + j), 1000) / 1000.0 - 0.5) "
            f"+ (pmod(xxhash64(id * {dim} + j + 13), 1000) / 10000.0))")
        emb = (spark.range(n).withColumn("c", c)
               .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
               .localCheckpoint())
        t = time.perf_counter()
        out = curation.semdedup(emb, "vec_id", "embedding",
                                n_seeds=n_seeds, threshold=0.9)
        removed = out.filter("removed").count()
        wall = time.perf_counter() - t
        # realized in-cluster pair count (the N^2/k term)
        sizes = (out.groupBy("cluster_id").count()
                    .agg(F.sum(F.col("count") * (F.col("count") - 1))
                          .alias("p")).first()["p"])
        print(f"sem: k={n_seeds} centers={centers} removed={removed} "
              f"of {n}, in-cluster ordered pairs ~{sizes:,}, "
              f"wall {wall:.1f}s")

    spark.stop()


if __name__ == "__main__":
    main()
