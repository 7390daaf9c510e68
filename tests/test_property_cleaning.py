"""Property-based tests (SURVEY §5.5): the conformance layer must be
TOTAL — never throw, never break its null-default invariants — on
arbitrary messy cells, and each Spark cleaning expression must agree
with its DuckDB oracle twin on the same inputs (the twins are what the
pipeline oracle queries are built from, so any divergence here would
eventually surface as a flaky correctness gate).

Each hypothesis example is a LIST of cells evaluated in one Spark job
(batching keeps the suite fast); example counts are capped because a
Spark round-trip is ~0.3 s, not ~0.3 µs.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.pipeline import silver

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

money_cells = st.lists(
    st.text(alphabet="0123456789.$, ", max_size=18), min_size=1, max_size=50
)
percent_cells = st.lists(
    st.text(alphabet="0123456789.% ", max_size=18), min_size=1, max_size=50
)
weight_cells = st.lists(
    st.builds(
        lambda n, unit: f"{n} {unit}".strip(),
        st.text(alphabet="0123456789.", max_size=10),
        st.sampled_from(["kg", "lbs", "", "oz", "k g"]),
    ),
    min_size=1,
    max_size=50,
)
ts_cells = st.lists(
    st.builds(
        lambda d, suf: d + suf,
        st.one_of(
            st.datetimes().map(lambda t: t.isoformat()),
            st.text(alphabet="0123456789-:TZ+. ", max_size=25),
        ),
        st.sampled_from(["", "Z", "+00:00"]),
    ),
    min_size=1,
    max_size=40,
)


def _twin(spark, cells, spark_expr, oracle_expr):
    """Evaluate a Spark Column and its DuckDB twin over the same cells;
    return the two value lists (order preserved)."""
    sdf = spark.createDataFrame([(i, c) for i, c in enumerate(cells)], "i INT, c STRING")
    got = [
        r.v for r in sdf.select("i", spark_expr(F.col("c")).alias("v")).orderBy("i").collect()
    ]
    pdf = pd.DataFrame({"i": range(len(cells)), "c": cells})
    con = duckdb.connect()
    con.register("t", pdf)
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {oracle_expr('c')} FROM t ORDER BY i"
        ).fetchall()
    ]
    return got, want


@SET
@given(cells=money_cells)
def test_money_twin_agrees_and_is_total(spark, cells):
    got, want = _twin(spark, cells, silver.money, silver.oracle_money)
    assert got == want
    assert all(v is not None for v in got)  # coalesced to 0.0, never null


@SET
@given(cells=percent_cells)
def test_percent_twin_agrees(spark, cells):
    got, want = _twin(spark, cells, silver.percent, silver.oracle_percent)
    assert got == want


@SET
@given(cells=weight_cells)
def test_weight_twin_agrees(spark, cells):
    got, want = _twin(spark, cells, silver.weight_kg, silver.oracle_weight_kg)
    assert got == want


@SET
@given(cells=ts_cells)
def test_iso_ts_twin_agrees(spark, cells):
    got, want = _twin(
        spark,
        cells,
        silver.iso_ts,
        silver.oracle_iso_ts,
    )
    assert got == want


@SET
@given(
    rows=st.lists(
        st.tuples(
            st.one_of(st.none(), st.text(max_size=12)),  # customer
            st.text(alphabet="0123456789.$, abc", max_size=15),  # price
            st.one_of(st.none(), st.integers(-1000, 1000)),  # quantity
            st.sampled_from(["USD", "usd", "$", "EUR", ""]),  # currency
            st.text(alphabet="0123456789-:TZ+", max_size=25),  # date
        ),
        min_size=1,
        max_size=30,
    )
)
def test_conform_joor_is_total(spark, rows):
    """The full conformer never throws and keeps its invariants on
    arbitrary input: buyer_name/quantity/unit_price never null,
    currency upper-cased with '$' folded to USD."""
    df = spark.createDataFrame(
        [("J-%d" % i, c, p, q, cur, d, "2025-06-01T00:00:00") for i, (c, p, q, cur, d) in enumerate(rows)],
        "order_id STRING, customer STRING, price STRING, quantity INT, "
        "currency STRING, date STRING, bronze_timestamp STRING",
    )
    out = silver.conform_joor(df.withColumn("sku", F.lit("SKU-1"))).collect()
    assert len(out) == len(rows)
    for r in out:
        assert r.buyer_name is not None
        assert r.quantity is not None
        assert r.unit_price is not None
        assert r.currency is None or r.currency == r.currency.upper()
        assert r.currency != "$"


vectors = st.lists(
    st.lists(
        st.floats(
            min_value=-100.0,
            max_value=100.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=2,
        max_size=16,
    ),
    min_size=1,
    max_size=20,
)


@SET
@given(vecs=vectors)
def test_quantize_int8_properties(spark, vecs):
    """Property: for ANY float vector — including the all-zero one —
    int8 quantization keeps codes in [-127, 127], maps the max-|x|
    component to ±127 (zero-scale rows pin to all-zero codes with a
    NULL dequant_cos instead of NaN), and never throws — the totality
    the compression path needs before it runs over a 100 TB corpus it
    has not seen."""
    from multichannel_commerce_data_pipeline_spark.operators.similarity import (
        quantize_int8,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id LONG, embedding ARRAY<FLOAT>"
    )
    rows = quantize_int8(df).select(
        "scale",
        "dequant_cos",
        F.array_min("q").alias("lo"),
        F.array_max("q").alias("hi"),
    ).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        assert -127 <= r["lo"] <= r["hi"] <= 127
        if r["scale"] == 0.0:
            assert r["lo"] == r["hi"] == 0
            assert r["dequant_cos"] is None
        else:
            assert r["hi"] == 127 or r["lo"] == -127
            assert r["dequant_cos"] is not None


# ---- merge_upsert model check ------------------------------------------
# Random base/update batches vs a three-line Python reference model:
# updates override base per key, deletes drop the key, new keys insert.

_keys = st.integers(min_value=0, max_value=9)
_base_rows = st.dictionaries(_keys, st.integers(0, 100), max_size=8)
_update_rows = st.dictionaries(
    _keys, st.tuples(st.integers(0, 100), st.booleans()), max_size=8
)


@SET
@given(base=_base_rows, updates=_update_rows)
def test_merge_upsert_matches_reference_model(spark, base, updates):
    from multichannel_commerce_data_pipeline_spark.operators.merge import (
        merge_upsert,
    )

    expected = dict(base)
    for k, (v, dele) in updates.items():
        if dele:
            expected.pop(k, None)
        else:
            expected[k] = v

    b = spark.createDataFrame(
        [(k, v) for k, v in base.items()] or [(None, None)], "k int, v int"
    ).filter(F.col("k").isNotNull())
    u = spark.createDataFrame(
        [(k, v, d) for k, (v, d) in updates.items()] or [(None, None, None)],
        "k int, v int, del boolean",
    ).filter(F.col("k").isNotNull())
    got = {r.k: r.v for r in merge_upsert(b, u, ["k"], "del").collect()}
    assert got == expected


# ---- scd2_history model check ------------------------------------------
# Random observation streams vs a direct Python run-length model.

_obs_streams = st.lists(
    st.tuples(
        st.integers(0, 3),                        # key
        st.integers(0, 20),                       # ts
        st.sampled_from(["a", "b", None]),        # attr (incl. NULL runs)
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: (r[0], r[1]),             # total order per key
)


@SET
@given(obs=_obs_streams)
def test_scd2_history_matches_reference_model(spark, obs):
    from multichannel_commerce_data_pipeline_spark.operators.scd import (
        scd2_history,
    )

    expected = {}
    by_key = {}
    for k, t, a in sorted(obs):
        by_key.setdefault(k, []).append((t, a))
    for k, seq in by_key.items():
        runs = []
        for t, a in seq:
            if runs and runs[-1]["a"] == a:
                runs[-1]["n"] += 1
            else:
                runs.append({"a": a, "from": t, "n": 1})
        for v, r in enumerate(runs, start=1):
            eff_to = runs[v]["from"] if v < len(runs) else None
            expected[(k, v)] = (r["a"], r["from"], eff_to, eff_to is None, r["n"])

    df = spark.createDataFrame(obs, "k int, t int, a string")
    got = {
        (r.k, r.version): (r.a, r.effective_from, r.effective_to,
                           r.is_current, r.n_obs)
        for r in scd2_history(df, "k", "a", "t").collect()
    }
    assert got == expected


# ---- BPE trainer vs pure-Python reference --------------------------------

_bpe_words = st.lists(
    st.tuples(
        st.text(alphabet="abcde", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=20),
    ),
    min_size=1,
    max_size=12,
)


def _py_bpe(word_counts: list[tuple[str, int]], n_merges: int):
    """Reference BPE trainer: straightforward dict/tuple implementation
    with the engine's exact semantics — pair counts weighted by word
    frequency (every adjacency, including overlaps), argmax with
    lexicographic tie-break on the space-joined pair, greedy
    left-to-right merge application."""
    state = [(tuple(w), c) for w, c in word_counts]
    merges = []
    for step in range(n_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, c in state:
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + c
        if not counts:
            break
        # tie-break: highest count, then lexicographically SMALLEST
        # space-joined pair STRING (exactly what the engine orders by)
        top = max(counts.values())
        a, b = min(
            (p for p, c in counts.items() if c == top),
            key=lambda p: f"{p[0]} {p[1]}",
        )
        merges.append((step, f"{a} {b}", a + b))
        new_state = []
        for syms, c in state:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state.append((tuple(out), c))
        state = new_state
    return merges


@given(words=_bpe_words)
@SET
def test_bpe_train_matches_python_reference(spark, words):
    """The in-engine trainer must produce EXACTLY the reference merges
    on arbitrary small vocabularies — same argmax, same lexicographic
    tie-break, same greedy overlap handling ('aaa' + merge (a,a) ->
    (aa, a))."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        bpe_train,
    )

    # aggregate duplicate words (the engine trains on a distinct-word
    # frequency frame)
    agg: dict[str, int] = {}
    for w, c in words:
        agg[w] = agg.get(w, 0) + c
    wl = sorted(agg.items())
    df = spark.createDataFrame(wl, "w string, cnt long")
    got = bpe_train(df, "w", "cnt", 3)
    want = _py_bpe(wl, 3)
    assert got == want, (wl, got, want)
