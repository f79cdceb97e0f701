"""Span-level (token n-gram) duplicate detection — the dedup
granularity between exact (whole-doc hash, ``dedup.dedup_exact``) and
near-dup (whole-doc minhash/simhash): mark runs of ``span_len`` tokens
that appear in MORE THAN ONE document, so boilerplate (license
headers, navigation chrome, templated paragraphs) can be masked out of
training data without dropping the documents that carry it. Public
design: Lee et al. 2022, "Deduplicating Training Data Makes Language
Models Better" (they use a suffix array on one machine; the
distributed re-expression is a rolling span-hash equi self-join —
SURVEY.md §7.5 runway item 1).

The reference pipeline has no dedup at all (it truncate+loads each
scrape, `scrap_tokopedia.py`); this is engine-addendum surface like
the rest of §2.10.

Scale posture (the interesting part at 100 TB):
- ``span_occurrences`` is a NARROW map: tokens, the rolling windows,
  and the 64-bit span hashes are all built per-row with higher-order
  functions (sequence/transform/slice) — one explode, zero shuffles,
  and the shuffle that follows carries an 8-byte hash per span, never
  the ~300-byte span text.
- ``duplicate_spans`` shuffles twice on ``span_hash`` (the group-count
  and the join back), both plain equi operations — AQE's skew split
  applies to a hot boilerplate span the same way it does to a hot
  interval bin. Group outputs are LINEAR in occurrences (this operator
  never emits pairs, so a span shared by 100k docs costs 100k rows,
  not 10^10). The corpus is scanned TWICE (once per occ reference) —
  deliberate: the single-scan alternative (collect_set(doc) window
  over span_hash) buffers every distinct doc id of a hot span in one
  window state, exactly the skew this operator must survive, and
  caching the occurrence set means materializing something larger
  than the corpus. Two cheap columnar scans beat both.
- hash collisions: spans are compared by xxhash64, so two distinct
  span texts collide with probability ~2^-64 — the standard trade
  for not shuffling span text; callers needing certainty re-verify
  survivors against the text (same posture as ``dedup_near``'s
  verify stage).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators._contracts import (
    require_free_columns,
)

_WORKING = ("__toks", "__occ", "__rep", "__starts")


def span_occurrences(docs: DataFrame, id_col: str, text_col: str,
                     span_len: int, stride: int = 1) -> DataFrame:
    """Every rolling ``span_len``-token window of every document, as
    ``(id_col, span_start, span_hash)`` — ``span_start`` is the
    0-based token offset, ``span_hash`` the xxhash64 of the
    space-joined window. ``stride`` > 1 samples every stride-th start
    (recall trades against cost; stride=1 is exact). Documents shorter
    than ``span_len`` tokens emit nothing.

    One narrow projection + one explode — no shuffle; the hash is
    computed BEFORE the explode leaves the row, so nothing downstream
    ever carries span text."""
    if span_len < 2:
        raise ValueError("span_len must be >= 2")
    if stride < 1:
        raise ValueError("stride must be >= 1")
    require_free_columns("span_occurrences", docs.columns, _WORKING)
    require_free_columns("span_occurrences", docs.columns,
                         ("span_start", "span_hash"), kind="output")
    toks = F.split(F.lower(F.col(text_col)), " ")
    occ = F.explode(F.transform(
        F.sequence(F.lit(0), F.size(F.col("__toks")) - span_len,
                   F.lit(stride)),
        lambda i: F.struct(
            i.cast("long").alias("span_start"),
            F.xxhash64(F.concat_ws(
                " ", F.slice(F.col("__toks"), i + 1, span_len))
            ).alias("span_hash"))))
    return (docs.select(F.col(id_col), toks.alias("__toks"))
            .filter(F.size(F.col("__toks")) >= span_len)
            .select(id_col, occ.alias("__occ"))
            .select(id_col, F.col("__occ.span_start"),
                    F.col("__occ.span_hash")))


def duplicate_spans(docs: DataFrame, id_col: str, text_col: str,
                    span_len: int = 50, stride: int = 1,
                    min_docs: int = 2) -> DataFrame:
    """Mark every occurrence of a span shared by >= ``min_docs``
    DISTINCT documents: ``(id_col, span_start, n_docs)`` — one row per
    duplicated occurrence, where ``n_docs`` is how many documents
    carry that span. Downstream masks or drops the flagged token
    ranges (``mask_duplicate_spans`` is the composed form).

    Two ``span_hash`` shuffles (partial-aggregable count + the join
    back); output linear in occurrences. At 100 TB the hot-boilerplate
    span is the skew case — it lands on AQE's skew-join split because
    both shuffles are plain equi-joins on the hash."""
    if min_docs < 2:
        raise ValueError("min_docs must be >= 2 (1 would flag "
                         "every span)")
    occ = span_occurrences(docs, id_col, text_col, span_len,
                           stride=stride)
    groups = (occ.groupBy("span_hash")
              .agg(F.count_distinct(F.col(id_col)).alias("n_docs"))
              .filter(F.col("n_docs") >= min_docs))
    return occ.join(groups, "span_hash").select(
        id_col, "span_start", "n_docs")


def duplicate_span_islands(docs: DataFrame, id_col: str, text_col: str,
                           span_len: int = 50, stride: int = 1,
                           min_docs: int = 2) -> DataFrame:
    """Maximal duplicated REGIONS per document — Lee et al.'s output
    shape: overlapping/adjacent duplicated windows merged into islands
    ``(id_col, island_start, island_end, n_windows)`` with
    ``island_end`` exclusive. A 60-token boilerplate block shared by
    two docs shows up as 45 separate 16-token duplicate windows in
    ``duplicate_spans``; here it is ONE [start, start+60) island —
    the unit a curation pipeline actually cuts.

    Classic gaps-and-islands: a window opens a new island when its
    start lies past the running max covered end. Both windows and the
    final aggregate partition by the doc id, so the merge costs one
    exchange after the duplicate join — and island width is bounded
    by the document's own token count, so the per-key window state
    never exceeds one doc's spans."""
    dups = duplicate_spans(docs, id_col, text_col, span_len,
                           stride=stride, min_docs=min_docs)
    w = Window.partitionBy(id_col).orderBy("span_start")
    prev_end = F.max(F.col("span_start") + span_len).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = dups.withColumn(
        "__new", F.when(prev_end.isNull()
                        | (F.col("span_start") > prev_end),
                        1).otherwise(0))
    isl = flagged.withColumn(
        "__isl", F.sum("__new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    return (isl.groupBy(id_col, "__isl")
            .agg(F.min("span_start").alias("island_start"),
                 (F.max("span_start") + span_len).alias("island_end"),
                 F.count(F.lit(1)).alias("n_windows"))
            .select(id_col, "island_start", "island_end", "n_windows"))


def mask_duplicate_spans(docs: DataFrame, id_col: str, text_col: str,
                         span_len: int = 50, stride: int = 1,
                         mask_token: str = "<dup>") -> DataFrame:
    """Keep-first span dedup (Lee et al. 2022 §4: drop all but one
    occurrence of each duplicated span): the lexicographically first
    occurrence ``(id, span_start)`` of each span survives; every token
    covered by any OTHER occurrence is replaced with ``mask_token``.
    Output: the input columns with ``text_col`` rewritten.

    The representative is a struct-min per span_hash (partial-
    aggregable, one shuffle); the per-doc mask positions come back as
    ONE collect_set row per document (bounded by the doc's own span
    count), and the rewrite is a narrow higher-order map — no Python
    in the row path."""
    require_free_columns("mask_duplicate_spans", docs.columns, _WORKING)
    occ = span_occurrences(docs, id_col, text_col, span_len,
                           stride=stride)
    groups = (occ.groupBy("span_hash")
              .agg(F.count_distinct(F.col(id_col)).alias("__nd"),
                   F.min(F.struct(F.col(id_col).alias("i"),
                                  F.col("span_start").alias("s"))
                         ).alias("__rep"))
              .filter(F.col("__nd") >= 2))
    extras = (occ.join(groups, "span_hash")
              .filter(~((F.col(id_col) == F.col("__rep.i"))
                        & (F.col("span_start") == F.col("__rep.s"))))
              .groupBy(id_col)
              .agg(F.collect_set("span_start").alias("__starts")))
    # rebuild from the ORIGINAL-case tokens (hashing lowercases, the
    # rewrite must not) — positions align because the split is the same
    toks = F.split(F.col(text_col), " ")
    covered = lambda pos: F.exists(  # noqa: E731 — inline HOF helper
        F.col("__starts"),
        lambda s: (pos >= s) & (pos < s + span_len))
    masked = F.concat_ws(" ", F.transform(
        toks, lambda t, i: F.when(covered(i.cast("long")),
                                  F.lit(mask_token)).otherwise(t)))
    out_text = (F.when(F.col("__starts").isNull(), F.col(text_col))
                .otherwise(masked))
    # preserve the input schema ORDER, not just its columns — callers
    # union/append the masked output against unmasked slices
    cols = [out_text.alias(c) if c == text_col else F.col(c)
            for c in docs.columns]
    return docs.join(extras, id_col, "left").select(*cols)
