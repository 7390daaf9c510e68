"""Property-based tests for the r15 operator wave: the guarantees
(weighted-sample stability/monotonicity, skyline dominance laws, CUSUM
shift equivariance) must hold for ARBITRARY inputs, not just the
fixture layouts. Example counts are capped per the sketch-suite
convention (a Spark round-trip per example is ~0.3 s); pure-arithmetic
properties run example-rich in plain Python against the same formulas
the engine compiles.
"""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
PURE = settings(max_examples=200, deadline=None)


def _xi(i: int, w: float, seed: int = 99) -> float:
    h = int(hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:15], 16)
    return (h / float(1 << 60)) / w


@given(
    n_base=st.integers(min_value=5, max_value=60),
    n_new=st.integers(min_value=0, max_value=20),
)
@PURE
def test_weighted_sample_membership_stable_under_growth(n_base, n_new):
    """Sequential Poisson keys are per-row independent: appending new
    rows can evict an existing member only by BEATING its key, never
    by perturbing it — the already-sampled keys are bit-identical
    before and after growth (the corpus-growth stability the md5-hash
    family exists for)."""
    k = 5
    base = {i: 1.0 + (i * 7) % 50 for i in range(n_base)}
    grown = dict(base)
    grown.update(
        {10_000 + i: 1.0 + (i * 3) % 40 for i in range(n_new)}
    )
    keys_base = {i: _xi(i, w) for i, w in base.items()}
    keys_grown = {i: _xi(i, w) for i, w in grown.items()}
    for i in base:
        assert keys_base[i] == keys_grown[i]
    top_base = set(sorted(base, key=lambda i: (keys_base[i], i))[:k])
    top_grown = set(sorted(grown, key=lambda i: (keys_grown[i], i))[:k])
    # survivors of growth are exactly the old members not outranked by
    # a NEW smaller key — no reshuffling among the old cohort
    evicted = top_base - top_grown
    for i in evicted:
        assert any(
            j >= 10_000 and keys_grown[j] < keys_grown[i] for j in top_grown
        )


@given(bump=st.floats(min_value=0.01, max_value=100.0))
@PURE
def test_weighted_sample_rank_monotone_in_weight(bump):
    """Raising one row's weight strictly lowers its xi key (u fixed,
    xi = u / w), so its rank can only improve — the
    probability-proportional-to-size contract in deterministic form."""
    i, w = 42, 3.0
    assert _xi(i, w + bump) < _xi(i, w)


points = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),  # price (small grid to force ties)
        st.integers(min_value=0, max_value=20),  # size
    ),
    min_size=1,
    max_size=40,
)


def _frontier_brute(pts):
    out = set()
    for idx, (p, s) in enumerate(pts):
        dom = any(
            (q <= p and t >= s and (q < p or t > s)) for q, t in pts
        )
        if not dom:
            out.add(idx)
    return out


def _frontier_sweep(spark, pts):
    # frame twin of queries/windows.py skyline_pareto's sweep (the
    # query is bound to the part table; this replays the identical
    # group -> running-max -> join-back -> survivor-rule plan on a
    # generated frame)
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [(i, "b", float(p), s) for i, (p, s) in enumerate(pts)],
        "id long, brand string, price double, size int",
    )
    g = df.groupBy("brand", "price").agg(F.max("size").alias("mx"))
    w = (
        Window.partitionBy("brand")
        .orderBy("price")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    swept = g.select("brand", "price", "mx", F.max("mx").over(w).alias("m_lt"))
    j = df.join(swept, ["brand", "price"])
    dominated = (
        F.col("m_lt").isNotNull() & (F.col("m_lt") >= F.col("size"))
    ) | (F.col("mx") > F.col("size"))
    return {r.id for r in j.filter(~dominated).collect()}


@given(pts=points)
@SET
def test_skyline_sweep_equals_bruteforce_on_arbitrary_points(spark, pts):
    """The running-max sweep must equal the O(n^2) dominance definition
    on arbitrary integer point sets — the tie-dense grid forces the
    equal-price and duplicate-point branches constantly."""
    assert _frontier_sweep(spark, pts) == _frontier_brute(pts)


@given(
    xs=st.lists(
        st.integers(min_value=-500, max_value=500), min_size=2, max_size=60
    ),
    shift=st.integers(min_value=-1000, max_value=1000),
)
@PURE
def test_cusum_closed_form_shift_equivariant(xs, shift):
    """The CUSUM statistic depends only on deviations from the
    reference: adding a constant to every point AND the reference
    leaves S_t bit-identical (integer arithmetic), and the closed
    form P_t - min(0, min P_j) equals the recursion for arbitrary
    integer series."""

    def closed(dvs):
        out, p, mn = [], 0, 0
        for dv in dvs:
            p += dv
            mn = min(mn, p)
            out.append(p - min(0, mn))
        return out

    def recur(dvs):
        out, s = [], 0
        for dv in dvs:
            s = max(0, s + dv)
            out.append(s)
        return out

    def closed_down(dvs):
        out, p, mx = [], 0, 0
        for dv in dvs:
            p += dv
            mx = max(mx, p)
            out.append(max(0, mx) - p)
        return out

    def recur_down(dvs):
        out, s = [], 0
        for dv in dvs:
            s = max(0, s - dv)
            out.append(s)
        return out

    assert closed(xs) == recur(xs)
    # the r16 mirrored (downward) statistic: closed form
    # max(0, max P_j) - P_t equals ITS recursion, and mirroring the
    # data swaps the two sides exactly
    assert closed_down(xs) == recur_down(xs)
    assert closed_down([-x for x in xs]) == closed(xs)
    shifted = [x + shift for x in xs]
    # reference shifts with the data -> identical deviations, BOTH
    # directions (shift may be negative — a collapse, not a ramp)
    assert closed([x - shift for x in shifted]) == closed(xs)
    assert closed_down([x - shift for x in shifted]) == closed_down(xs)
