"""Corpus ranking operators: BM25 retrieval and Pareto-frontier
(skyline) selection (SURVEY.md §2.10 L3/L4 extensions).

``bm25_topk`` is the classical lexical first-stage retriever — the
usual partner of the dense stage in ``operators/similarity`` and the
input producer for ``operators/rerank``: BM25 over-fetches k lexical
candidates per query, the cross-scorer re-ranks them. The reference
repo has no retrieval stage at all (scrape-only); this serves the
LLM-data-pipeline brief.

``skyline_2d`` selects the 2-D Pareto frontier (all rows not dominated
on a minimize/minimize pair) — the standard multi-criteria pick
("cheapest AND smallest") the reference's price/discount checks gesture
at but never compute.

100 TB posture:
- BM25 never builds the full inverted index: the query vocabulary
  (tiny) broadcast-semi-joins the exploded token stream FIRST, so the
  only wide shuffles are the per-doc length aggregate and the per
  (doc, term) term-frequency aggregate over matching tokens only.
  Document frequency and the corpus scalars (N, avgdl) are one-row /
  per-term broadcasts. The final per-query top-k is a row_number
  window partitioned by query — WindowGroupLimit plans a map-side
  partial top-k, so a hot query that matches half the corpus doesn't
  single-task.
- skyline is the textbook two-phase reduction: a per-bucket cumulative
  min window prunes every locally-dominated point (each bucket's
  frontier is a superset member-wise of the global frontier members it
  holds), then the exact single-pass window runs on the survivors —
  the global stage sees only the union of local frontiers, not the
  input. Worst case (perfectly anti-correlated dims) the frontier IS
  the data and no algorithm shrinks it; typical data collapses
  orders of magnitude in phase 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._contracts import require_free_columns

_RESERVED = ("__bucket", "__pm")


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int, *,
              doc_id: str = "doc_id", text_col: str = "text",
              query_id: str = "query_id", term_col: str = "term",
              k1: float = 1.2, b: float = 0.75,
              round_digits: int = 6) -> DataFrame:
    """Okapi BM25 top-``k`` documents per query.

    ``queries`` is the exploded query-term table (query_id, term), one
    row per term occurrence wanted in the match (duplicate terms in a
    query weight that term twice, as in the classical formulation).
    Tokenization matches the engine's corpus recipe (``vocab_topk``):
    lowercase, split on single spaces, empty tokens dropped. Corpus
    statistics (N, avgdl) are computed over documents with at least
    one token.

    Scoring: ``idf(t) * tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))`` with
    ``idf = ln((N-df+0.5)/(df+0.5) + 1)`` (the Lucene non-negative
    variant). The per-(query, doc) sum over matched terms is rounded
    to ``round_digits`` BEFORE ranking (few-addend float sum — the
    round absorbs engine-order noise; ranking ties break by doc id).

    Returns (query_id, doc_id, score, rank), rank 1..k per query.
    """
    toks = (docs.select(F.col(doc_id).alias("__did"),
                        F.explode(F.split(F.lower(F.col(text_col)), " "))
                         .alias("__t"))
                .filter(F.col("__t") != ""))
    dl = toks.groupBy("__did").agg(F.count(F.lit(1)).alias("__dl"))
    stats = dl.agg(F.count(F.lit(1)).cast("double").alias("__n"),
                   F.avg("__dl").alias("__avgdl"))

    vocab = queries.select(F.col(term_col).alias("__t")).distinct()
    qtoks = toks.join(F.broadcast(vocab), "__t", "left_semi")
    tf = (qtoks.groupBy("__did", "__t")
               .agg(F.count(F.lit(1)).cast("double").alias("__tf")))
    df_t = tf.groupBy("__t").agg(F.count(F.lit(1)).cast("double")
                                 .alias("__df"))

    idf = F.log((F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5) + 1.0)
    norm = (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl")
                                  / F.col("__avgdl")))
    term_score = (idf * F.col("__tf") * (k1 + 1.0) / norm).alias("__s")

    scored = (tf.join(F.broadcast(df_t), "__t")
                .join(dl, "__did")
                .crossJoin(F.broadcast(stats))
                .select("__did", "__t", term_score))
    qterms = queries.select(F.col(query_id).alias("__qid"),
                            F.col(term_col).alias("__t"))
    per_q = (scored.join(F.broadcast(qterms), "__t")
             .groupBy("__qid", "__did")
             .agg(F.round(F.sum("__s"), round_digits).alias("score")))
    w = Window.partitionBy("__qid").orderBy(F.col("score").desc(),
                                            F.col("__did"))
    return (per_q.withColumn("rank", F.row_number().over(w))
                 .filter(F.col("rank") <= k)
                 .select(F.col("__qid").alias(query_id),
                         F.col("__did").alias(doc_id), "score", "rank"))


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               buckets: int = 32) -> DataFrame:
    """2-D Pareto frontier, both dimensions minimized: keep every row
    no other row dominates (``x' <= x AND y' <= y`` with at least one
    strict). Rows must be UNIQUE on (x, y) — pre-aggregate duplicates
    (equal points never dominate each other, so a representative-per-
    point reduction is semantics-preserving); nulls and NaNs in
    either dimension are dropped (neither dominates nor survives —
    untreated, a NaN coordinate rides Spark's sort-last ordering into
    the output claiming frontier membership with an undefined value).

    Single-pass rule: ordered by (x asc, y asc), a point is on the
    frontier iff its y is strictly below the running min of all
    preceding points' y. Preceding points have x' < x (any y) or
    x' = x with y' < y — exactly the dominators under uniqueness; a
    non-strict tie in y with smaller x is strict dominance in x and is
    correctly dropped by the non-strict comparison.

    Phase 1 applies that rule per hash bucket (prunes everything a
    bucket-mate dominates); phase 2 applies it exactly on the
    survivors. The phase-2 window is intentionally unpartitioned —
    it runs on the union of local frontiers, which is what makes it
    safe; ``buckets`` sizes phase-1 parallelism.
    """
    require_free_columns("skyline_2d", df.columns, _RESERVED)
    keep = F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    dtypes = dict(df.dtypes)
    for c in (x_col, y_col):
        if dtypes.get(c) in ("float", "double"):
            keep = keep & ~F.isnan(F.col(c))
    pts = df.filter(keep)

    def prune(d: DataFrame, w: Window) -> DataFrame:
        pm = F.min(y_col).over(
            w.rowsBetween(Window.unboundedPreceding, -1))
        return (d.withColumn("__pm", pm)
                 .filter(F.col("__pm").isNull()
                         | (F.col(y_col) < F.col("__pm")))
                 .drop("__pm"))

    local = prune(
        pts.withColumn("__bucket",
                       F.pmod(F.xxhash64(F.col(x_col), F.col(y_col)),
                              F.lit(buckets))),
        Window.partitionBy("__bucket").orderBy(F.col(x_col),
                                               F.col(y_col)),
    ).drop("__bucket")
    return prune(local, Window.orderBy(F.col(x_col), F.col(y_col)))
