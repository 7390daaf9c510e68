"""Driver-contract regression tests: round 1 scored zero because
__spark_entry__.py was left unwired — this suite fails loudly if that
ever regresses.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry_mod  # noqa: E402


def test_queries_and_oracles_align(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 100
    # every oracle key belongs to a registered query
    assert set(oracles) <= set(qs)
    # non-SQL-expressible ops are the only permitted gaps
    assert len(qs) - len(oracles) <= 5
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_entry_runs_with_stable_schema(spark):
    df = entry_mod.entry(spark)
    assert df.columns == [
        "date_key", "channel", "country", "region",
        "revenue", "cm2", "orders", "aov", "margin_pct",
    ]
    assert df.count() > 0


def test_every_registered_query_is_callable(spark, sf_dir):
    """Spot-construct (no execution) every query's DataFrame — catches
    import errors, missing columns, and analysis failures without the
    cost of running all 100."""
    failures = []
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, sf_dir)
            df.schema  # forces analysis
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)
