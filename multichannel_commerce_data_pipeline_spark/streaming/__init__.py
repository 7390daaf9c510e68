"""Structured Streaming path — the principled replacement for the
reference's polling loops (SURVEY.md §2.9): checkpointed incremental
ingest (T2) instead of a high-watermark file, watermarks for late data
(T3), stateful dedup (T5), micro-batch cadence via triggers (T1), and a
date-partitioned stream-to-table landing (T6/S9).
"""
