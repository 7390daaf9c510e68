"""t2-style correctness: every registered query matches its DuckDB
oracle at sf0.001 (the driver runs the same protocol at sf0.01)."""

from __future__ import annotations

import pytest

from multichannel_commerce_data_pipeline_spark.queries import load_registry
from multichannel_commerce_data_pipeline_spark.testing import compare

REGISTRY = load_registry()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, sf_dir, oracle_con):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    # Registry-wide scale invariant (r9 audit: zero hits across all 215
    # plans): an unconditioned CartesianProduct is quadratic in the
    # corpus and never acceptable — a 1-row model broadcast plans as
    # BroadcastNestedLoopJoin, which is the allowed shape.
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    assert "CartesianProduct" not in df._jdf.queryExecution().explainString(
        mode
    ), f"{name}: cartesian product in physical plan"
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker path
        assert df.count() >= 0
        return
    problems = compare(df, oracle_con, q.oracle)
    assert not problems, f"{name}: {problems}"


def test_registry_is_wired_to_driver_contract():
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(REGISTRY)
    assert "exec_daily_kpi" in qs


def test_entry_returns_flagship(spark):
    import __spark_entry__ as entrymod

    df = entrymod.entry(spark)
    assert df.columns == [
        "date_key",
        "channel",
        "country",
        "region",
        "revenue",
        "cm2",
        "orders",
        "aov",
        "margin_pct",
    ]
    assert df.count() > 0


def test_approx_sketches_assert_their_bounds(spark, sf_dir):
    """The approx queries validate their sketches in-query (estimate
    within documented error of the exact value computed in the same
    aggregate); every bound column must come back TRUE."""
    from multichannel_commerce_data_pipeline_spark.queries import load_registry

    r = load_registry()
    for name in ("approx_percentile_summary", "approx_distinct_kpi"):
        for row in r[name].fn(spark, sf_dir).collect():
            d = row.asDict()
            flags = {k: v for k, v in d.items() if k.endswith("_within_tol")}
            assert flags and all(flags.values()), f"{name}: {d}"
