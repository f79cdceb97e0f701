"""Corpus layout operators for training-data pipelines: sequence
packing, shard assignment, context-window chunking, and per-group
deterministic sampling (SURVEY.md §2 addendum — beyond-reference ops a
large-scale LLM data pipeline needs; no analog in the reference, which
stops at per-page scrape rows).

Every operator here is a pure function of stable keys (md5 of the id) —
no RNG, no driver state — so assignments are reproducible across runs,
engines, partitionings, and cluster sizes, and every one is expressible
as ANSI SQL for the external oracle gate.

Scale posture: packing and sampling use ranking windows whose partitions
are bounded by construction (a hash-prefix subdivides each group into
independent streams), so no window ever sees more than ~1/16 of a group
and the plan holds at 100 TB where a single global ORDER BY would not.
Chunking is a narrow map (explode of a per-row sequence) — no shuffle at
all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text


def _key(id_col: Column) -> Column:
    """Deterministic order/placement key: md5 hex of the stable id.
    Identical bytes in Spark and DuckDB, so oracles reproduce it."""
    return F.md5(id_col.cast("string"))


def pack_sequences(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", group_col: str = "lang",
                   budget: int = 512) -> DataFrame:
    """Greedy sequence packing: concatenate documents (in deterministic
    hash order) and cut the stream every ``budget`` tokens; a document
    belongs to the pack its first token lands in, so packs can overrun
    by at most one document's tail — the standard streaming-friendly
    approximation (exact bin packing is inherently sequential).

    Each ``group_col`` value is subdivided into 16 independent streams
    by the first hex char of the key, so the running-sum window is
    bounded at ~1/16 of a group per partition and packing parallelizes;
    at 100 TB you'd raise the prefix width, not the algorithm.

    Returns one row per (group, stream, pack_id) with n_docs and
    pack_tokens — integer sums only, bit-stable in any engine.
    """
    h = _key(F.col(id_col))
    n_tok = text.token_count(F.col(text_col))
    w = (Window.partitionBy(group_col, "stream").orderBy("h", id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    staged = docs.select(
        F.col(group_col), F.col(id_col), h.alias("h"),
        F.substring(h, 1, 1).alias("stream"), n_tok.alias("n_tok"))
    packed = staged.withColumn(
        "start", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    ).withColumn(
        "pack_id", F.floor(F.col("start") / F.lit(float(budget))))
    return (packed.groupBy(group_col, "stream", "pack_id")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tok").alias("pack_tokens")))


def hex_val(c: Column) -> Column:
    """Value 0-15 of one lowercase hex char — via its position in the
    hex alphabet, NOT its ASCII code: ``ascii('a') % 16`` style tricks
    leave buckets 10-15 permanently empty and double-load 1-6, because
    hex chars' ASCII codes (48-57, 97-102) don't cover Z/16."""
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def assign_shards(docs: DataFrame, id_col: str = "doc_id",
                  n_shards: int = 16) -> DataFrame:
    """Deterministic global shuffle + sharding for training order:
    shard = hash-bucket of the id, position = rank of the hash within
    the shard. Reading shards in position order yields a reproducible
    corpus-wide permutation with no RNG and no global sort — each
    shard's ranking window is an independent ~1/n_shards slice. The
    bucket is the VALUE of the first four hex chars of md5 — uniform
    over 0-65535 — so shard counts that divide 65536 get exactly
    balanced load and any other n_shards <= 256 carries modulo bias
    below 1/4096 of a shard (two hex chars gave n_shards=100 buckets
    up to 50% extra load; r4 advice).
    """
    h = _key(F.col(id_col))
    v16 = (((hex_val(F.substring(h, 1, 1)) * 16
             + hex_val(F.substring(h, 2, 1))) * 16
            + hex_val(F.substring(h, 3, 1))) * 16
           + hex_val(F.substring(h, 4, 1)))
    shard = v16 % n_shards
    w = Window.partitionBy("shard_id").orderBy("h", id_col)
    return (docs.select(F.col(id_col), h.alias("h"),
                        shard.cast("long").alias("shard_id"))
            .withColumn("pos", F.row_number().over(w).cast("long"))
            .drop("h"))


def chunk_documents(docs: DataFrame, id_col: str = "doc_id",
                    n_chars_col: str = "n_chars",
                    chunk_size: int = 500) -> DataFrame:
    """Context-window chunking: split each document into fixed-size
    character windows (the training-context analog of the reference's
    page pagination). Pure narrow map — a per-row sequence explode, no
    shuffle — so it scans once at any scale. Empty documents produce no
    chunks."""
    n = F.col(n_chars_col)
    n_chunks = ((n + (chunk_size - 1)) / chunk_size).cast("long")
    return (docs.filter(n > 0)
            .select(F.col(id_col), n.alias("_n"),
                    F.explode(F.sequence(F.lit(0).cast("long"),
                                         n_chunks - 1)).alias("chunk_id"))
            .select(F.col(id_col), "chunk_id",
                    F.least(F.lit(chunk_size).cast("long"),
                            F.col("_n") - F.col("chunk_id")
                            * chunk_size).alias("chunk_len")))


def sample_per_group(df: DataFrame, group_col: str, id_col: str,
                     k: int) -> DataFrame:
    """Deterministic per-group sample: the k smallest hash keys per
    group — the eval-set carving primitive (same docs chosen on every
    run/engine/cluster, unlike rand()-based sampling). Spark plans the
    rank filter as WindowGroupLimit, pushing a per-partition top-k
    below the shuffle, so the full group is never materialized on one
    task."""
    h = _key(F.col(id_col))
    w = Window.partitionBy(group_col).orderBy("h", id_col)
    return (df.select(F.col(group_col), F.col(id_col), h.alias("h"))
            .withColumn("rn", F.row_number().over(w).cast("long"))
            .filter(F.col("rn") <= k)
            .drop("h"))
