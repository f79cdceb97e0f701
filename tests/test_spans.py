"""Span-level duplicate detection (operators/spans.py). Registered
query `duplicate_spans` is oracle-checked by the driver; these tests
pin the operator semantics on hand-computed inputs plus a property
sweep against a per-doc python reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unilever_scraping_etl_spark.operators import spans


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_flagged_at_both_occurrences(spark):
    df = _docs(spark, [
        (1, "a b c d e"),
        (2, "x a b c y"),
        (3, "q w e r t"),
    ])
    out = spans.duplicate_spans(df, "doc_id", "text", span_len=3)
    got = {(r.doc_id, r.span_start, r.n_docs) for r in out.collect()}
    assert got == {(1, 0, 2), (2, 1, 2)}  # "a b c" at doc1@0, doc2@1


def test_within_doc_repeat_is_not_cross_doc_duplicate(spark):
    """min_docs counts DISTINCT documents: a span repeated twice
    inside ONE doc is not boilerplate across the corpus."""
    df = _docs(spark, [(1, "a b c z a b c"), (2, "q w e r t")])
    out = spans.duplicate_spans(df, "doc_id", "text", span_len=3)
    assert out.count() == 0


def test_short_docs_emit_nothing_and_stride_samples(spark):
    df = _docs(spark, [(1, "a b"), (2, "a b c d e f")])
    occ = spans.span_occurrences(df, "doc_id", "text", span_len=3)
    assert occ.filter(F.col("doc_id") == 1).count() == 0
    assert occ.filter(F.col("doc_id") == 2).count() == 4  # starts 0..3
    occ2 = spans.span_occurrences(df, "doc_id", "text", span_len=3,
                                  stride=2)
    starts = sorted(r.span_start for r in
                    occ2.filter(F.col("doc_id") == 2).collect())
    assert starts == [0, 2]


def test_hashing_is_case_insensitive(spark):
    df = _docs(spark, [(1, "A B C d"), (2, "a b c e")])
    out = spans.duplicate_spans(df, "doc_id", "text", span_len=3)
    assert {(r.doc_id, r.span_start) for r in out.collect()} == {
        (1, 0), (2, 0)}


def test_mask_keeps_first_occurrence_and_original_case(spark):
    df = _docs(spark, [
        (1, "A b c d e"),      # representative (lowest doc_id)
        (2, "x a B c y"),      # masked at tokens 1..3
        (3, "q w e r t"),      # untouched
    ])
    out = spans.mask_duplicate_spans(df, "doc_id", "text", span_len=3)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "A b c d e"
    assert got[2] == "x <dup> <dup> <dup> y"
    assert got[3] == "q w e r t"
    assert set(out.columns) == {"doc_id", "text"}


def test_mask_overlapping_spans_union_their_token_ranges(spark):
    """Two duplicated spans overlapping in one doc mask the UNION of
    their ranges (exists() over all starts, not per-span rewrites)."""
    df = _docs(spark, [
        (1, "a b c d e f"),
        (2, "a b c z z z"),    # shares "a b c" -> rep is doc1@0
        (3, "z d e f z z"),    # shares "d e f" -> rep is doc1@3
        (4, "a b c d e f z"),  # shares BOTH; doc1 is rep for both
    ])
    out = spans.mask_duplicate_spans(df, "doc_id", "text", span_len=3)
    got = {r.doc_id: r.text for r in out.collect()}
    assert got[1] == "a b c d e f"  # representative of both spans
    assert got[4].split(" ")[:6] == ["<dup>"] * 6


def test_islands_merge_overlapping_and_adjacent_windows(spark):
    """A 5-token block shared by two docs = three overlapping 3-token
    duplicate windows -> ONE island covering the block; a separate
    shared window later in the doc opens a second island."""
    df = _docs(spark, [
        (1, "a b c d e x x y y q w e"),   # block @0..4, "q w e" @9
        (2, "z z a b c d e z z z z z"),   # block @2..6
        (3, "q w e m m m m m m m m m"),   # "q w e" @0
    ])
    out = spans.duplicate_span_islands(df, "doc_id", "text", span_len=3)
    got = {(r.doc_id, r.island_start, r.island_end, r.n_windows)
           for r in out.collect()}
    assert got == {
        (1, 0, 5, 3),   # windows @0,1,2 merged: tokens [0,5)
        (1, 9, 12, 1),  # the lone "q w e" window
        (2, 2, 7, 3),
        (3, 0, 3, 1),
    }


def test_islands_split_on_a_gap(spark):
    """Windows whose coverage does not touch stay separate islands
    (start strictly past the running covered end)."""
    df = _docs(spark, [
        (1, "a b c n1 n2 n3 n4 a b c"),
        (2, "a b c m1 m2 m3 m4 a b c"),
    ])
    out = spans.duplicate_span_islands(df, "doc_id", "text", span_len=3)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.doc_id, set()).add(
            (r.island_start, r.island_end))
    assert per_doc[1] == {(0, 3), (7, 10)}
    assert per_doc[2] == {(0, 3), (7, 10)}


def test_reserved_and_arg_validation(spark):
    df = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="reserved"):
        spans.span_occurrences(df.withColumn("span_start", F.lit(1)),
                               "doc_id", "text", span_len=3)
    with pytest.raises(ValueError, match="reserved"):
        spans.mask_duplicate_spans(df.withColumn("__starts", F.lit(1)),
                                   "doc_id", "text", span_len=3)
    with pytest.raises(ValueError, match="span_len"):
        spans.span_occurrences(df, "doc_id", "text", span_len=1)
    with pytest.raises(ValueError, match="stride"):
        spans.span_occurrences(df, "doc_id", "text", span_len=2, stride=0)
    with pytest.raises(ValueError, match="min_docs"):
        spans.duplicate_spans(df, "doc_id", "text", span_len=2,
                              min_docs=1)


def test_occurrence_stage_is_narrow_and_jvm_only(spark):
    """The scale claims, pinned: span_occurrences plans ZERO exchanges
    (pure scan -> project -> explode) and no Python eval node; the
    full duplicate_spans plan shuffles only on the 8-byte hash."""
    df = _docs(spark, [(1, "a b c d e")])
    occ_plan = (spans.span_occurrences(df, "doc_id", "text", 3)
                ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in occ_plan
    full_plan = (spans.duplicate_spans(df, "doc_id", "text", 3)
                 ._jdf.queryExecution().executedPlan().toString())
    for p in (occ_plan, full_plan):
        assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _tok = st.sampled_from(list("abcd"))
    _doc = st.lists(_tok, min_size=0, max_size=12).map(" ".join)

    @settings(max_examples=15, deadline=None)
    @given(st.lists(_doc, min_size=1, max_size=6))
    def test_duplicate_spans_matches_python_reference(texts):
        spark = _hyp_spark[0]
        L = 3
        rows = [(i, t) for i, t in enumerate(texts)]
        # python reference: span -> set of (doc, start)
        occs = {}
        for i, t in rows:
            toks = t.split(" ") if t else [""]
            for s in range(len(toks) - L + 1):
                occs.setdefault(" ".join(toks[s:s + L]),
                                []).append((i, s))
        exp = set()
        for span, lst in occs.items():
            nd = len({d for d, _ in lst})
            if nd >= 2:
                exp |= {(d, s, nd) for d, s in lst}
        df = _docs(spark, rows)
        out = spans.duplicate_spans(df, "doc_id", "text", span_len=L)
        got = {(r.doc_id, r.span_start, r.n_docs) for r in out.collect()}
        assert got == exp

    @settings(max_examples=10, deadline=None)
    @given(st.lists(_doc, min_size=1, max_size=6))
    def test_islands_match_python_reference(texts):
        """Islands == greedy merge of the duplicate-window starts: the
        same per-doc fold a single-node implementation would run."""
        spark = _hyp_spark[0]
        L = 3
        rows = [(i, t) for i, t in enumerate(texts)]
        occs = {}
        for i, t in rows:
            toks = t.split(" ") if t else [""]
            for s in range(len(toks) - L + 1):
                occs.setdefault(" ".join(toks[s:s + L]),
                                []).append((i, s))
        starts = {}
        for lst in occs.values():
            if len({d for d, _ in lst}) >= 2:
                for d, s in lst:
                    starts.setdefault(d, []).append(s)
        exp = set()
        for d, ss in starts.items():
            ss.sort()
            cur_start, cur_end, n = ss[0], ss[0] + L, 1
            for s in ss[1:]:
                if s > cur_end:
                    exp.add((d, cur_start, cur_end, n))
                    cur_start, cur_end, n = s, s + L, 1
                else:
                    cur_end, n = max(cur_end, s + L), n + 1
            exp.add((d, cur_start, cur_end, n))
        out = spans.duplicate_span_islands(_docs(spark, rows),
                                           "doc_id", "text", span_len=L)
        got = {(r.doc_id, r.island_start, r.island_end, r.n_windows)
               for r in out.collect()}
        assert got == exp

    _hyp_spark = [None]

    @pytest.fixture(autouse=True)
    def _capture_spark(spark):
        _hyp_spark[0] = spark
        yield

except ImportError:
    pass
