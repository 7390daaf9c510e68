"""External sources/sinks beyond the parquet/JSON lake: JDBC scan and
sinks (S3-S5) and the thin REST-style serving reader (S12).
"""
