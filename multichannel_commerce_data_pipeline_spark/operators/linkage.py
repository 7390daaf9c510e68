"""Probabilistic record linkage — Fellegi-Sunter log-odds scoring.

Entity resolution's deterministic half (blocking + edit distance,
``operators/dedup.py``) answers "are these two strings almost equal";
the Fellegi-Sunter model (JASA 1969, the foundation of every serious
linkage system — Splink, dedupe.io, census linkage) answers "how much
EVIDENCE does each field comparison carry". Every field ``i`` has an
m-probability (P(agree | same entity)) and a u-probability
(P(agree | different entities)); an agreement contributes
``ln(m/u)`` (positive, rare-to-collide fields contribute more) and a
disagreement ``ln((1-m)/(1-u))`` (negative); the pair's match score is
the sum, thresholded into link / possible / non-link.

This module keeps m/u as CALLER-SUPPLIED constants (folded to double
literals driver-side), so scoring is pure Column arithmetic — the EM
fitting loop that estimates m/u from unlabeled pairs is a deployment
swap that only changes the constants, never the scoring plan.

Scale shape: candidate pairs come from blocking (never all-pairs); the
score is map-side arithmetic on the pair frame — no additional shuffle
beyond the blocking join itself.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement weight, disagreement weight) = (ln(m/u),
    ln((1-m)/(1-u))). Computed in Python so both engines see the same
    double literal — no cross-engine ln() at query time."""
    return math.log(m / u), math.log((1.0 - m) / (1.0 - u))


def fs_score(agreements: list[tuple[Column, float, float]]) -> Column:
    """Σ_i (agree_i ? ln(m_i/u_i) : ln((1-m_i)/(1-u_i))) as one Column,
    folded left-to-right in the caller's field order (mirror the same
    order in an oracle for bit-identical sums). ``agreements`` is
    [(boolean Column, m, u), ...]."""
    out = F.lit(0.0)
    for agree, m, u in agreements:
        w_a, w_d = fs_weights(m, u)
        out = out + F.when(agree, F.lit(w_a)).otherwise(F.lit(w_d))
    return out


def oracle_fs_score(agreements: list[tuple[str, float, float]]) -> str:
    """DuckDB twin of :func:`fs_score`: same weights (Python-formatted
    double literals), same left-to-right fold order."""
    terms = ["0.0"]
    for agree_sql, m, u in agreements:
        w_a, w_d = fs_weights(m, u)
        terms.append(f"CASE WHEN {agree_sql} THEN {w_a!r} ELSE {w_d!r} END")
    return "(" + " + ".join(terms) + ")"
