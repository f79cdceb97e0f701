"""Quarantine split — the engine's replacement for the reference's
row-level error tolerance (SURVEY.md §4: the reference logs-and-drops
bad rows at every level — scrap_tokopedia.py:268-277,293-297 — so a bad
product page can silently vanish). We make the drop explicit: one pass
splits rows into (valid, quarantined) with a reason column, and both
sides are observable/persistable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quarantine_split(df: DataFrame,
                     rules: dict[str, Column]) -> tuple[DataFrame, DataFrame]:
    """``rules`` maps reason-label -> "row is BAD when this predicate is
    true". Returns (valid, quarantined); quarantined rows carry a
    ``quarantine_reason`` array of every rule they tripped.

    Single projection + filter — Catalyst evaluates the predicates once
    per row; no shuffle. At 100 TB both branches write out from the same
    scan (persist the tagged frame if both sides are consumed)."""
    reason = F.array_compact(F.array(*[
        F.when(pred, F.lit(label)).otherwise(F.lit(None))
        for label, pred in rules.items()
    ]))
    tagged = df.withColumn("quarantine_reason", reason)
    valid = tagged.filter(F.size("quarantine_reason") == 0).drop("quarantine_reason")
    quarantined = tagged.filter(F.size("quarantine_reason") > 0)
    return valid, quarantined


def required_fields_rules(*cols: str) -> dict[str, Column]:
    """The reference's implicit NOT NULL contract: missing name/price
    raises AttributeError and drops the row (scrap_tokopedia.py:251,256,
    268-277)."""
    return {f"missing_{c}": F.col(c).isNull() for c in cols}
