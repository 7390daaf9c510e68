"""X5: Python UDTF — the table-function shape of the Python surface
(one input row → N output rows), completing the scalar pandas_udf /
GROUPED_AGG UDAF / applyInPandas / mapInPandas family in
operators/pandas_ops.py.

A UDTF is the right Python escape hatch when the expansion logic is
genuinely imperative (stateful parsers, ML sentence segmenters); for
anything a regex can express, ``explode(split(...))`` stays JVM-side
and beats it — the query pairing this kernel proves equivalence against
exactly that declarative form via the DuckDB oracle.

Scale contract: evaluated per input row on executors (Arrow-optimized
transport), zero shuffle — the expansion inherits the scan's
partitioning, so output skew follows input-document length, not key
distribution.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_SENT_SPLIT = re.compile(r"[.!?]+\s+")


@udtf(returnType="sent_idx: int, sentence: string", useArrow=True)
class SplitSentences:
    """Lateral table function: text → (1-based sentence index,
    fragment). Fragments are the ``[.!?]+\\s+`` splits with empties
    filtered AFTER enumeration, so indexes are reproducible in any
    engine with the same regex semantics (the paired oracle enumerates
    DuckDB's regexp_split_to_array the same way)."""

    def eval(self, text: str):  # noqa: ANN201 — UDTF protocol
        if text is None:
            return
        for i, frag in enumerate(_SENT_SPLIT.split(text), start=1):
            if frag.strip():
                yield i, frag
