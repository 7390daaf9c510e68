"""Medallion pipeline engine: bronze JSON → silver conformance → gold
CM1/CM2 → exec_daily_kpi, re-expressing the reference's two Spark batch
jobs (bronze_to_silver_all_sources.py, scripts/ingestion/silver_to_gold.py)
and its one analytics view (scripts/sql/.sql:3-26) as pure
DataFrame→DataFrame functions over an explicit-schema bronze layout.
"""
