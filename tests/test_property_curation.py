"""Property-based tests for the r12/r13 curation and maintenance
operators: the in-plan best-fit-decreasing fold, the per-domain cap,
the Unicode normalizer, and the join-view delta identity must agree
with direct single-process references (or the algebraic identity) on
arbitrary inputs — including the degenerate shapes hypothesis loves
(all-equal sizes, oversized docs, single-member domains, strings that
are pure control characters, empty deltas, dangling foreign keys).

Each example is one small frame evaluated in one Spark job; example
counts are capped because a Spark round-trip is ~0.3 s.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.operators import (
    training_prep as TP,
)
from multichannel_commerce_data_pipeline_spark.operators.text import (
    normalize_text,
)

SET = settings(
    max_examples=8,
    deadline=None,
    # derandomize: the example set is FIXED across runs. The domain-cap
    # reference below compares the prefiltered sample against the
    # unprefiltered top-cap ranking, which the 8x-oversampled prefilter
    # matches with overwhelming but not unit probability — a roaming
    # example generator could eventually mint the Binomial-shortfall
    # id set and fail legitimately; a fixed set either contains it
    # (caught on day one) or never will (no latent flake).
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BUDGET = 20


def _reference_bfd(sizes: list[int], budget: int) -> dict[int, tuple]:
    """Single-process BFD: largest first (ties by doc id), into the
    open pack with least remaining room that fits (ties lowest pack),
    else a new pack. Returns doc -> (pack_id, pack_offset)."""
    out: dict[int, tuple] = {}
    loads: list[int] = []
    for doc, n in sorted(enumerate(sizes), key=lambda t: (-t[1], t[0])):
        fits = [(budget - l - n, k) for k, l in enumerate(loads) if l + n <= budget]
        if fits:
            _, k = min(fits)
        else:
            k = len(loads)
            loads.append(0)
        out[doc] = (k, loads[k])
        loads[k] += n
    return out


@given(st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=12))
@SET
def test_bfd_fold_matches_reference(spark, sizes):
    """The in-plan aggregate fold reproduces the sequential reference
    placement exactly — pack ids, offsets, and ties — for arbitrary
    size mixes including oversized (> budget) and zero-token docs."""
    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.pack_id, r.pack_offset)
        for r in TP.assign_packs_bfd(
            df, F.col("n_tokens"), budget=BUDGET, n_shards=1
        ).collect()
    }
    assert got == _reference_bfd(sizes, BUDGET)


@given(
    st.lists(
        st.tuples(st.integers(0, 500), st.sampled_from("xyz")),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=5),
)
@SET
def test_domain_cap_reference(spark, rows, cap):
    """For arbitrary (id, domain) data and caps: every domain keeps
    min(cap, size) rows, kept ids are the domain's smallest-hash
    members (checked against a full-ranking reference without the
    prefilter — the prefilter may only ever drop rows ranked past the
    cap), and domain_docs reports the pre-cap size."""
    from multichannel_commerce_data_pipeline_spark.functions import (
        portable_hash64,
    )

    df = spark.createDataFrame(rows, "doc_id long, domain string")
    got: dict[str, list] = {}
    for r in TP.domain_cap_sample(df, "domain", cap=cap).collect():
        got.setdefault(r.domain, []).append(r)
    # reference: full ranking by (hash, id) per domain, no prefilter
    hashed = df.select(
        "doc_id",
        "domain",
        portable_hash64(F.col("doc_id").cast("string"), 43).alias("h"),
    ).collect()
    ref: dict[str, list] = {}
    for r in sorted(hashed, key=lambda r: (r.h, r.doc_id)):
        ref.setdefault(r.domain, []).append(r.doc_id)
    sizes = {d: len(ids) for d, ids in ref.items()}
    for dom, ids in ref.items():
        kept = sorted(x.doc_id for x in got.get(dom, []))
        assert kept == sorted(ids[:cap])
        assert all(x.domain_docs == sizes[dom] for x in got.get(dom, []))


_texts = st.text(
    alphabet=st.sampled_from(
        list("ab c") + ["\x00", "\x07", "\x0b", "\t", "​", "­", " ", "‏"]
    ),
    max_size=20,
)


def _reference_normalize(s: str) -> str:
    out = []
    for ch in s:
        o = ord(ch)
        if (o <= 0x08) or (0x0B <= o <= 0x1F) or (0x7F <= o <= 0x9F):
            continue
        if ch in "​‌‍﻿­‎‏":
            continue
        out.append(" " if ch in "  " else ch)
    import re

    return re.sub(r"\s+", " ", "".join(out)).strip()


@given(st.lists(_texts, min_size=1, max_size=6))
@SET
def test_normalize_matches_reference_and_is_idempotent(spark, texts):
    """normalize_text agrees with a direct character-walk reference on
    arbitrary dirty strings, and is IDEMPOTENT — normalizing an
    already-normalized string changes nothing (the property that makes
    it safe to run defensively at every pipeline stage)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    once = df.select(
        "i", normalize_text(F.col("t")).alias("c1")
    ).withColumn("c2", normalize_text(F.col("c1")))
    for r in once.collect():
        assert r.c1 == _reference_normalize(texts[r.i])
        assert r.c2 == r.c1


@given(
    st.lists(  # orders: (key, month 1..4)
        st.tuples(st.integers(0, 20), st.integers(1, 4)),
        min_size=1,
        max_size=15,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # lineitems: (orderkey 0..25 — some dangling, cents, month)
        st.tuples(st.integers(0, 25), st.integers(0, 10_000), st.integers(1, 4)),
        min_size=1,
        max_size=25,
    ),
    st.integers(1, 4),  # order-side cutover month
    st.integers(1, 4),  # lineitem-side cutover month
)
@SET
def test_join_view_delta_identity(spark, orders, lines, o_cut, l_cut):
    """The IVM identity behind mv_join_delta_merge, on arbitrary data
    and cutovers: state(old⋈old) ∪ Δ(A)⋈B_old ∪ A_old⋈Δ(B) ∪ Δ(A)⋈Δ(B),
    merged, equals the full-join aggregate exactly — including empty
    deltas, empty history, dangling foreign keys, and duplicate join
    keys on the many side."""
    from multichannel_commerce_data_pipeline_spark.queries.warehouse_queries import (
        _mvj_month_agg,
    )

    o = spark.createDataFrame(
        [(k, f"2001-0{m}-15 00:00:00") for k, m in orders],
        "o_orderkey long, d string",
    ).select("o_orderkey", F.col("d").cast("timestamp").alias("o_orderdate"))
    li = spark.createDataFrame(
        [(k, c / 100.0, m) for k, c, m in lines],
        "l_orderkey long, l_extendedprice double, lm int",
    ).withColumn("l_discount", F.lit(0.0))
    o_old = o.filter(F.month("o_orderdate") < o_cut)
    o_new = o.filter(F.month("o_orderdate") >= o_cut)
    l_old = li.filter(F.col("lm") < l_cut)
    l_new = li.filter(F.col("lm") >= l_cut)

    def j(a, b):
        return _mvj_month_agg(a.join(b, a.o_orderkey == b.l_orderkey))

    merged = {
        (r.order_month, r.cnt, r.rsum)
        for r in j(o_old, l_old)
        .unionByName(j(o_new, l_old))
        .unionByName(j(o_old, l_new))
        .unionByName(j(o_new, l_new))
        .groupBy("order_month")
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            F.sum("rsum").cast("decimal(38,4)").alias("rsum"),
        )
        .collect()
    }
    full = {(r.order_month, r.cnt, r.rsum) for r in j(o, li).collect()}
    assert merged == full
