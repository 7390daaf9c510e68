"""Property-based tests for the X12 bounded-state sketch family: the
guarantees (MG never over, CM never under, min-hash registers merge by
MIN) must hold for ARBITRARY key multisets and partitionings, not just
the fixture layouts the unit tests pin. Each hypothesis example runs
one Spark job over a generated key list; example counts are capped
because a Spark round-trip is ~0.3 s (test_property_cleaning's
convention).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.operators.frequency import (
    cm_estimate,
    cm_sketch,
    heavy_hitter_estimates,
    minhash_distinct_sketch,
)

SET = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# skewed multisets: a few hot keys plus a varying tail
key_lists = st.lists(
    st.one_of(
        st.sampled_from(["hot-a", "hot-b", "hot-c"]),
        st.integers(min_value=0, max_value=5000).map(str),
    ),
    min_size=1,
    max_size=400,
)


def _df(spark, keys):
    return spark.createDataFrame(
        [(k,) for k in keys], "key string"
    ).repartition(4)


@given(keys=key_lists)
@SET
def test_cm_never_underestimates_any_multiset(spark, keys):
    df = _df(spark, keys)
    sk = cm_sketch(df, F.col("key"), w=32, d=3, seed=7)
    est = {
        r.key: r.est_count
        for r in cm_estimate(sk, df.distinct(), "key", w=32, d=3, seed=7).collect()
    }
    exact: dict[str, int] = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    assert set(est) == set(exact)
    for k, n in exact.items():
        assert est[k] >= n, (k, est[k], n)
    # each grid row counts every input exactly once
    per_row: dict[int, int] = {}
    for r in sk.collect():
        per_row[r.j] = per_row.get(r.j, 0) + r.cell
    assert per_row == {j: len(keys) for j in range(3)}


@given(keys=key_lists)
@SET
def test_mg_never_overestimates_any_multiset(spark, keys):
    k_cap = 4
    est = {
        r.key: r.est
        for r in heavy_hitter_estimates(
            _df(spark, keys), F.col("key"), k=k_cap
        ).collect()
    }
    exact: dict[str, int] = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    slack = len(keys) / (k_cap + 1)
    for k, n in exact.items():
        e = est.get(k, 0)
        assert e <= n, (k, e, n)
        assert n - e <= slack, (k, e, n, slack)
        if n > slack:
            assert k in est


@given(keys=key_lists, pivot=st.integers(min_value=0, max_value=400))
@SET
def test_minhash_registers_merge_by_min(spark, keys, pivot):
    m = 16
    whole = {
        r.bucket: r.min_h
        for r in minhash_distinct_sketch(
            _df(spark, keys), F.col("key"), m=m
        ).collect()
    }
    a, b = keys[:pivot], keys[pivot:]
    parts = []
    for part in (a, b):
        if part:
            parts.append(
                {
                    r.bucket: r.min_h
                    for r in minhash_distinct_sketch(
                        _df(spark, part), F.col("key"), m=m
                    ).collect()
                }
            )
        else:
            parts.append({})
    merged = {
        bkt: min(p.get(bkt, 1 << 62) for p in parts)
        for bkt in set(parts[0]) | set(parts[1])
    }
    assert merged == whole
