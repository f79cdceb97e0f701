"""Text-analysis column functions for the LLM-data-pipeline surface
(SURVEY.md §2.10 L4; driver north star: language-ID, quality scoring,
token counting, document fingerprinting over the ``documents`` table).

Everything here is a JVM-side Column expression built from higher-order
array functions — no Python UDFs — so the hot path stays inside
whole-stage codegen and scales linearly with executors at 100 TB.
All semantics are intentionally expressible in portable ANSI-ish SQL so
the DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny, deterministic marker-word sets for the n-gram/stopword language
# heuristic. (A real deployment would swap in fastText/CLD3 via a Pandas
# UDF; the heuristic keeps the operator oracle-checkable.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "das", "und", "ist"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that",
)


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), " ")


def token_count(text: Column) -> Column:
    """Whitespace token count (documents are single-space separated)."""
    return F.size(tokens(text)).cast("long")


def bpe_token_estimate(n_chars: Column) -> Column:
    """BPE-ish token-count estimate: ~4 chars/token (public rule of
    thumb for byte-pair-encoded English)."""
    return F.ceil(n_chars.cast("double") / 4.0).cast("long")


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """How many tokens of ``text`` are in the marker set (JVM-side
    higher-order filter; no shuffle, no Python)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t))).cast("long")


def lang_id(text: Column) -> Column:
    """Marker-word language classifier: argmax of marker hits with a
    deterministic preference order (en > es > de > 'und' for unknown)."""
    en = marker_hits(text, LANG_MARKERS["en"])
    es = marker_hits(text, LANG_MARKERS["es"])
    de = marker_hits(text, LANG_MARKERS["de"])
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def stopword_ratio(text: Column) -> Column:
    return marker_hits(text, STOPWORDS).cast("double") / token_count(text).cast("double")


def mean_word_length(text: Column) -> Column:
    """Mean token length in characters — one of the Gopher document-
    quality signals (Rae et al. 2021, Appendix A: pages whose mean
    word length falls outside [3, 10] are mostly boilerplate, tables,
    or garbled encodings). JVM-side: sum of per-token lengths over
    the token count, exact-integer numerator so only the final
    division is float (IEEE-identical across engines)."""
    toks = tokens(text)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return total.cast("double") / F.size(toks).cast("double")


def distinct_marker_hits(text: Column,
                         markers: tuple[str, ...]) -> Column:
    """How many DISTINCT members of the marker set occur in ``text``
    — the Gopher stop-word rule counts distinct required words (a
    page repeating 'the' fifty times passes the occurrence count but
    not the vocabulary check). array_intersect returns the distinct
    common elements, so its size is exactly that count."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.array_intersect(tokens(text), arr)).cast("long")


def quality_score(text: Column, n_chars: Column) -> Column:
    """Deterministic heuristic quality in [0,1]: a length component
    (saturating at 500 chars) averaged with a stopword-presence
    component. Pure per-row double arithmetic — IEEE-identical across
    engines, so the oracle compares unrounded."""
    length_component = F.least(F.lit(1.0), n_chars.cast("double") / 500.0)
    stop_component = F.least(F.lit(1.0), stopword_ratio(text) * 5.0)
    return (length_component + stop_component) / 2.0


def fingerprint(text: Column, prefix_len: int = 64) -> Column:
    """Order-sensitive document fingerprint: sum(codepoint(c_i) * i)
    over the first ``prefix_len`` chars. Exact int64 arithmetic (max
    value ~ 64*0x10FFFF*64 << 2^63) and a *commutative* reduction, so
    any evaluation order yields the same value — portable across
    engines, unlike built-in hash()/xxhash64 whose seeds differ."""
    chars = F.split(F.substring(text, 1, prefix_len), "")
    weighted = F.transform(
        chars, lambda c, i: F.ascii(c).cast("long") * (i.cast("long") + F.lit(1).cast("long"))
    )
    return F.aggregate(weighted, F.lit(0).cast("long"), lambda acc, x: acc + x)
