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


def test_approx_percentile_within_tolerance(spark, sf_dir):
    """approx_percentile (no oracle: sketch output is accuracy-bounded,
    not bit-defined) must land within 2% of the exact quantiles."""
    from multichannel_commerce_data_pipeline_spark.queries import load_registry

    r = load_registry()
    exact = {
        row.l_returnflag: row
        for row in r["percentile_summary"].fn(spark, sf_dir).collect()
    }
    approx = {
        row.l_returnflag: row
        for row in r["approx_percentile_summary"].fn(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for flag, e in exact.items():
        a = approx[flag]
        assert abs(a.median_price - e.median_price) / e.median_price < 0.02
        assert abs(a.p90_price - e.p90_price) / e.p90_price < 0.02
