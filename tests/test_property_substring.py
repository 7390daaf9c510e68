"""Property-based test (SURVEY §5.5): the distributed ExactSubstr
pipeline (sliding-window digests + partial-agg survivor +
gaps-and-islands coalescing) must agree with a direct single-process
reference implementation of the Lee-et-al semantics on arbitrary
corpora — including the degenerate shapes hypothesis loves (all-equal
words, single-word docs, whole-corpus duplication).

Each example is one small corpus evaluated in one Spark job; example
counts are capped because a Spark round-trip is ~0.3 s.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from multichannel_commerce_data_pipeline_spark.operators import dedup as D

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary forces genuine duplicated windows
corpora = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=14).map(" ".join),
    min_size=1,
    max_size=8,
)

L = 3  # small window so short random docs can still collide


def _reference_spans(texts: list[str], min_words: int) -> set[tuple]:
    """Single-process reference: mark every non-first occurrence of a
    duplicated min_words-window, merge overlapping/adjacent intervals,
    emit (doc, start, end, n, text) with 1-based inclusive bounds."""
    grams: dict[str, list[tuple[int, int]]] = {}
    words = [t.split(" ") for t in texts]
    for doc, ws in enumerate(words):
        for pos in range(1, len(ws) - min_words + 2):
            g = " ".join(ws[pos - 1 : pos - 1 + min_words])
            grams.setdefault(g, []).append((doc, pos))
    marked: dict[int, list[int]] = {}
    for occs in grams.values():
        if len(occs) >= 2:
            for doc, pos in sorted(occs)[1:]:
                marked.setdefault(doc, []).append(pos)
    out = set()
    for doc, starts in marked.items():
        starts = sorted(set(starts))
        lo = prev = starts[0]
        runs = []
        for p in starts[1:]:
            if p - prev <= min_words:
                prev = p
            else:
                runs.append((lo, prev))
                lo = prev = p
        runs.append((lo, prev))
        for lo, hi in runs:
            end = hi + min_words - 1
            out.add(
                (
                    doc,
                    lo,
                    end,
                    end - lo + 1,
                    " ".join(words[doc][lo - 1 : end]),
                )
            )
    return out


@SET
@given(corpora)
def test_substring_spans_match_reference(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    words = D.doc_words(df, "doc_id", "text")
    got = {
        (r.doc, r.span_start, r.span_end, r.span_words, r.span_text)
        for r in D.substring_dedup_spans(
            D.substring_grams(words, L), words, L
        ).collect()
    }
    assert got == _reference_spans(texts, L)


@SET
@given(corpora)
def test_substring_rewrite_matches_reference_cut(spark, texts):
    """The rewrite removes exactly the reference spans' positions and
    keeps every row (total over the corpus)."""
    ref = _reference_spans(texts, L)
    cut: dict[int, set[int]] = {}
    for doc, lo, hi, _, _ in ref:
        cut.setdefault(doc, set()).update(range(lo, hi + 1))
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    words = D.doc_words(df, "doc_id", "text")
    bounds = D.substring_span_bounds(D.substring_grams(words, L), L)
    got = {r.doc: r for r in D.substring_dedup_rewrite(bounds, words).collect()}
    assert len(got) == len(texts)
    for doc, text in enumerate(texts):
        ws = text.split(" ")
        removed = cut.get(doc, set())
        want = " ".join(w for i, w in enumerate(ws, 1) if i not in removed)
        assert got[doc].clean_text == want
        assert got[doc].n_removed == len(removed)
        assert got[doc].n_words == len(ws)


def _reference_boilerplate(texts: list[str], lw: int, thr: int) -> dict:
    """Single-process reference for boilerplate_lines: chunk each doc
    into lw-word lines, df = per-doc-distinct document frequency,
    remove every line with df > thr everywhere, rebuild."""
    lines = []
    for t in texts:
        ws = t.split(" ")
        n = -(-len(ws) // lw)
        lines.append([" ".join(ws[k * lw : k * lw + lw]) for k in range(n)])
    df: dict[str, set[int]] = {}
    for doc, ls in enumerate(lines):
        for line in ls:
            df.setdefault(line, set()).add(doc)
    hot = {line for line, docs in df.items() if len(docs) > thr}
    out = {}
    for doc, ls in enumerate(lines):
        kept = [line for line in ls if line not in hot]
        out[doc] = (len(ls), len(kept), len(ls) - len(kept), " ".join(kept))
    return out


@SET
@given(corpora)
def test_boilerplate_lines_match_reference(spark, texts):
    """The df-threshold removal must agree with the direct reference on
    arbitrary corpora — including all-equal docs (everything over
    threshold, everything emptied) and single-word docs."""
    lw, thr = 3, 1  # small line + low threshold so tiny corpora trigger
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_lines, r.n_kept, r.n_removed, r.clean_text)
        for r in D.boilerplate_lines(
            df, "doc_id", "text", line_words=lw, df_threshold=thr
        ).collect()
    }
    assert got == _reference_boilerplate(texts, lw, thr)
