"""Deterministic weighted sampling (SURVEY.md §2.10 L4 extension).

Corpus mixing wants MORE than the per-source rate sampling of
``corpus_mix`` (a row either passes its source's hash gate or not):
training-data curation weights INDIVIDUAL documents — sample k docs
per language with probability proportional to a quality weight.

``weighted_sample_topk`` is the Efraimidis–Spirakis A-Res scheme
(Inf. Process. Lett. 97(5), 2006): draw u ~ Uniform(0,1] per row, rank
by ``u^(1/w)`` descending, keep the top k — a weighted sample WITHOUT
replacement, computed as an ordinary top-k. Two house twists:

- u is NOT random: it is a hash-uniform (md5 of the stable id, first
  8 hex digits as a 32-bit integer, +1, /2^32), so the sample is a
  pure function of the data — reproducible across runs, engines, and
  partitionings, exactly like ``split_train_test``'s md5 gate. (The
  engine bans nondeterministic rand() in registered queries — the
  driver hash-compares against DuckDB.)
- the rank key is ``ln(u)/w`` (monotone in ``u^(1/w)``, avoids pow)
  rounded before ranking with an id tiebreak, the registry's standard
  float-ranking discipline.

100 TB posture: one narrow map (hash, ln) + the per-group top-k
row_number window — WindowGroupLimit plans map-side partial top-k, so
a group spanning the whole corpus still never concentrates more than
each task's local k rows into the final sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ._contracts import require_free_columns

_RESERVED = ("__u", "__wkey")


def _ares_key(id_col: str, weight_col: str, round_digits: int):
    """Efraimidis–Spirakis A-Res rank key, RNG-free: u is a
    hash-uniform of the (unique) id — md5's first 8 hex digits over
    2^32, exact in any engine (power-of-two divisor) — and the key
    orders by ln(u)/w; ln's last-ulp engine disagreement is absorbed
    by the rounding. ONE definition shared by the grouped and global
    forms (the copy-paste-drift lesson of _contracts.py)."""
    u = ((F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                 16, 10).cast("bigint") + 1) / F.lit(4294967296.0))
    return F.round(F.log(u) / F.col(weight_col), round_digits)


def weighted_sample_topk(df: DataFrame, id_col: str, weight_col: str,
                         k: int, group_cols: list[str] | None = None,
                         round_digits: int = 12) -> DataFrame:
    """Deterministic weight-proportional sample of ``k`` rows (per
    group when ``group_cols`` given, else global): A-Res keys from a
    hash-uniform of ``id_col``. Rows with NULL or non-positive weight
    are excluded (zero weight means "never sample"; A-Res divides by
    w). Output: the input columns plus ``sample_key`` (the rounded
    rank key) and ``sample_rank`` (1..k, deterministic id tiebreak).

    ``id_col`` must be unique — it seeds the per-row uniform, and a
    duplicated id would give both rows the same draw (correlated, not
    a fresh coin). Uniqueness is the caller's contract, same as
    ``dedup_exact``'s survivor id."""
    require_free_columns("weighted_sample_topk", df.columns, _RESERVED)
    require_free_columns("weighted_sample_topk", df.columns,
                         ("sample_key", "sample_rank"), kind="output")
    if k < 1:
        raise ValueError("k must be >= 1")
    out = (df.filter(F.col(weight_col).isNotNull()
                     & (F.col(weight_col) > 0))
             .withColumn("__wkey",
                         _ares_key(id_col, weight_col, round_digits)))
    w = (Window.partitionBy(*group_cols) if group_cols
         else Window.partitionBy())
    w = w.orderBy(F.col("__wkey").desc(), F.col(id_col))
    return (out.withColumn("sample_rank", F.row_number().over(w))
               .filter(F.col("sample_rank") <= k)
               .withColumnRenamed("__wkey", "sample_key"))


def weighted_sample_global(df: DataFrame, id_col: str, weight_col: str,
                           k: int,
                           round_digits: int = 12) -> DataFrame:
    """Global (ungrouped) A-Res top-k — same sampling semantics and
    key construction as ``weighted_sample_topk`` with no groups, but
    the scale-correct plan: ``orderBy(key).limit(k)`` plans
    TakeOrderedAndProject (each task keeps its local top-k, the
    driver merges k·P rows), where the window form would funnel the
    WHOLE input through one Exchange SinglePartition. ``sample_rank``
    is then assigned by a window over the k-row result — bounded by
    construction. Same contracts as the grouped form: unique
    ``id_col``, NULL/non-positive weights excluded, deterministic
    doc-id tiebreak."""
    require_free_columns("weighted_sample_global", df.columns,
                         ("sample_key", "sample_rank"), kind="output")
    if k < 1:
        raise ValueError("k must be >= 1")
    out = (df.filter(F.col(weight_col).isNotNull()
                     & (F.col(weight_col) > 0))
             .withColumn("sample_key",
                         _ares_key(id_col, weight_col, round_digits))
             .orderBy(F.col("sample_key").desc(), F.col(id_col))
             .limit(k))
    w = Window.orderBy(F.col("sample_key").desc(), F.col(id_col))
    return out.withColumn("sample_rank", F.row_number().over(w))
