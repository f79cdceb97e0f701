"""Windowed event-time operators (SURVEY.md §2.8, ST1-ST5).

Each builder takes a DataFrame that may be a batch frame OR a streaming
frame (``readStream``) — Structured Streaming's unified model means the
same plan serves both; batch mode is what the DuckDB oracle checks, and
the streaming tests drive the same builders with a file source +
``availableNow`` trigger.

Window starts are returned as formatted strings (UTC session) so
results are engine-portable; watermarking bounds state at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(events: DataFrame, width: str = "10 minutes",
                    ts_col: str = "ts") -> DataFrame:
    """ST1 — tumbling window count+sum per event_type. The sum runs on
    per-row floor(value*1e6) integers (floor of a double is a pure IEEE
    op — bit-identical in any engine — and integer addition is exact and
    commutative, so the result is stable under any partial-agg merge
    order) and surfaces as double micros."""
    return (events
            .groupBy(F.window(ts_col, width).alias("w"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(F.floor(F.col("value") * 1000000)
                         .cast("decimal(38,0)"))
                   .cast("double") / F.lit(1000000.0)).alias("sum_value"))
            .select(F.date_format("w.start", TS_FMT).alias("window_start"),
                    "event_type", "n_events", "sum_value"))


def static_enrich_counts(events: DataFrame, dim: DataFrame,
                         width: str = "10 minutes",
                         ts_col: str = "ts") -> DataFrame:
    """ST6 — stream-static enrichment join + tumbling agg. The static
    (dimension) side of a stream-static equi join is STATELESS: Spark
    re-evaluates the static relation per micro-batch with no watermark
    and no state store, and the broadcast hint keeps every micro-batch
    join shuffle-free — the canonical shape for enriching a high-volume
    event stream with a dimension table at 100 TB/day. The identical
    plan serves batch; sums follow the floor(value*1e6) integer
    discipline so stream and batch agree bit-for-bit."""
    enriched = events.join(F.broadcast(dim), "user_id")
    return (enriched
            .groupBy(F.window(ts_col, width).alias("w"), F.col("segment"))
            .agg(F.count(F.lit(1)).alias("n_events"),
                 (F.sum(F.floor(F.col("value") * 1000000)
                         .cast("decimal(38,0)"))
                   .cast("double") / F.lit(1000000.0)).alias("sum_value"))
            .select(F.date_format("w.start", TS_FMT).alias("window_start"),
                    "segment", "n_events", "sum_value"))


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes", ts_col: str = "ts") -> DataFrame:
    """ST2 — sliding window: each event lands in width/slide windows."""
    return (events
            .groupBy(F.window(ts_col, width, slide).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.date_format("w.start", TS_FMT).alias("window_start"),
                    "n_events"))


def session_counts(events: DataFrame, gap: str = "5 minutes",
                   key_col: str = "user_id", ts_col: str = "ts") -> DataFrame:
    """ST3 — session windows per user with a fixed inactivity gap.
    Batch-mode semantics match the classic gaps-and-islands SQL (session
    start = first event; a gap > ``gap`` starts a new session), which is
    exactly what the oracle computes."""
    return (events
            .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col(key_col),
                    F.date_format("w.start", TS_FMT).alias("session_start"),
                    "n_events"))


def watermarked_tumbling(events: DataFrame, width: str = "10 minutes",
                         watermark: str = "10 minutes",
                         ts_col: str = "ts") -> DataFrame:
    """ST4 — watermark + tumbling agg: late data beyond the watermark is
    dropped and state is bounded; in batch mode withWatermark is a no-op
    so the oracle still applies."""
    return (events.withWatermark(ts_col, watermark)
            .groupBy(F.window(ts_col, width).alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.date_format("w.start", TS_FMT).alias("window_start"),
                    "n_events"))


def clicks_to_purchases(events: DataFrame, horizon: str = "10 minutes",
                        watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream interval join: click followed by a purchase by the
    same user within ``horizon``. In streaming mode both sides carry
    watermarks so join state is bounded (Spark buffers only the horizon
    window); in batch mode the identical plan is a plain interval join,
    which is what the oracle checks. Returns one row per (click,
    purchase) pair."""
    clicks = (events.filter(F.col("event_type") == "click")
              .select(F.col("user_id").alias("c_user"),
                      F.col("event_id").alias("click_id"),
                      F.col("ts").alias("c_ts")))
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("event_id").alias("purchase_id"),
                         F.col("ts").alias("p_ts")))
    if events.isStreaming:
        clicks = clicks.withWatermark("c_ts", watermark)
        purchases = purchases.withWatermark("p_ts", watermark)
    cond = ((F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts") + F.expr(f"INTERVAL {horizon}")))
    return (clicks.join(purchases, cond)
            .select(F.col("c_user").alias("user_id"), "click_id", "purchase_id"))


def stateful_dedup(events: DataFrame, keys: list[str],
                   watermark: str = "10 minutes",
                   ts_col: str = "ts") -> DataFrame:
    """ST5 — stateful streaming dedup: drop repeats of the key within
    the watermark horizon (state auto-expires). Batch mode falls back to
    dropDuplicates on the same keys."""
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark) \
                     .dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)
