"""Operator invariants for training-set preparation
(operators/training_prep.py): packing coverage and boundary semantics,
split determinism, oversampling counts, shard-layout contiguity — plus
the plan shapes the 100 TB design claims (map-side epoch expansion,
single-exchange packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.operators import training_prep as TP
from multichannel_commerce_data_pipeline_spark.tables import load


def _docs(spark, sf_dir):
    return load(spark, sf_dir, "documents")


def test_assign_packs_matches_reference_impl(spark, sf_dir):
    """Every doc assigned exactly once; pack_id/pack_offset equal a
    driver-side greedy reference over the same shard/order."""
    d = _docs(spark, sf_dir).select("doc_id", F.length("text").alias("n"))
    out = TP.assign_packs(d, F.col("n"), budget=100, n_shards=4).collect()
    src = {r["doc_id"]: r["n"] for r in d.collect()}
    assert len(out) == len(src)

    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in shard_rows:
            assert r["pack_id"] == cum // 100
            assert r["pack_offset"] == cum % 100
            assert 0 <= r["pack_offset"] < 100
            cum += src[r["doc_id"]]


def test_assign_packs_single_exchange(spark, sf_dir):
    """One hash exchange on shard — the whole packing is a per-shard
    window; no global sort anywhere in the plan."""
    d = _docs(spark, sf_dir)
    df = TP.assign_packs(d, F.size(F.split("text", r"\s+")), budget=256, n_shards=8)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = df._jdf.queryExecution().explainString(mode)
    # one shuffle exchange; rangepartitioning would mean a global sort
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(shard" in plan
    assert "rangepartitioning" not in plan


def test_split_assign_proportions_and_stability(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = TP.split_assign(d).collect()
    n = len(out)
    frac = {s: sum(1 for r in out if r["split"] == s) / n for s in ("train", "val", "test")}
    assert 0.7 < frac["train"] < 0.9
    assert 0.04 < frac["val"] < 0.16
    assert 0.04 < frac["test"] < 0.16
    # membership is a pure function of the id: a filtered re-run agrees
    sub = TP.split_assign(d.filter(F.col("doc_id") % 3 == 0)).collect()
    full = {r["doc_id"]: r["split"] for r in out}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)


def test_epoch_expand_counts_and_no_shuffle(spark, sf_dir):
    d = _docs(spark, sf_dir)
    epochs = {"src0": 3, "src1": 2}
    out = TP.epoch_expand(d, epochs)
    per_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    base = {
        r["source"]: r["n"]
        for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for s, n in base.items():
        assert per_src[s] == n * epochs.get(s, 1)
    # epoch indexes are 1..k per doc
    k = out.filter(F.col("source") == "src0").groupBy("doc_id").agg(
        F.count("*").alias("c"), F.min("epoch").alias("lo"), F.max("epoch").alias("hi")
    )
    bad = k.filter((F.col("c") != 3) | (F.col("lo") != 1) | (F.col("hi") != 3)).count()
    assert bad == 0
    # the expansion is map-side: broadcast join + explode, no exchange
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = out._jdf.queryExecution().explainString(mode)
    assert "Exchange hashpartitioning" not in plan
    assert "BroadcastHashJoin" in plan


def test_shard_layout_positions_contiguous(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = TP.shard_layout(d, n_shards=4)
    assert out.count() == d.count()
    per_shard = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi"))
        .collect()
    )
    for r in per_shard:
        assert r["lo"] == 1 and r["hi"] == r["n"]
    # deterministic: same layout on re-run
    again = TP.shard_layout(d, n_shards=4)
    assert out.exceptAll(again).count() == 0


def test_write_training_shards_roundtrip_preserves_order(spark, sf_dir, tmp_path):
    """The materialized shard layout must read back complete, and a
    sequential read of each shard directory must already be in training
    order (pos ascending) — the contract loaders rely on instead of
    sorting."""
    d = _docs(spark, sf_dir)
    layout = TP.shard_layout(d, n_shards=4)
    out = str(tmp_path / "shards")
    TP.write_training_shards(layout, out)

    back = spark.read.parquet(out)
    assert back.count() == layout.count()
    assert back.exceptAll(layout.select(back.columns)).count() == 0
    # per shard: the file's physical row order IS pos order
    import glob

    for shard_dir in sorted(glob.glob(f"{out}/shard=*")):
        import pandas as pd
        import pyarrow.parquet as pq

        files = glob.glob(f"{shard_dir}/*.parquet")
        assert len(files) == 1  # one task wrote the whole shard
        pdf = pq.read_table(files[0]).to_pandas()
        assert list(pdf["pos"]) == sorted(pdf["pos"])


def test_bpe_train_learns_textbook_merges(spark):
    """The canonical BPE example (hug/pug/pun/bun/hugs with frequencies)
    must learn exactly (u g) -> (u n) -> (h ug), with greedy
    application feeding each later round."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        bpe_train,
    )

    words = spark.createDataFrame(
        [("hug", 10), ("pug", 5), ("pun", 12), ("bun", 4), ("hugs", 5)],
        "w string, cnt long",
    )
    merges = bpe_train(words, "w", "cnt", 3)
    assert merges == [(0, "u g", "ug"), (1, "u n", "un"), (2, "h ug", "hug")]


def test_token_budget_select_threshold_and_boundary(spark):
    """The histogram-threshold path must reproduce the naive global
    prefix exactly: whole high-quality buckets kept map-side, the
    boundary bucket truncated by the residual budget with (q DESC,
    doc ASC) tie-breaks, everything below dropped."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        token_budget_select,
    )

    rows = [
        # (doc, q, n_tokens) — distinct quality buckets by construction
        (1, 0.9, 40),
        (2, 0.9, 40),   # same bucket+q as doc 1: doc order decides
        (3, 0.9, 40),
        (4, 0.5, 30),
        (5, 0.1, 100),
    ]
    df = spark.createDataFrame(rows, "doc long, q double, n_tokens long")

    def picked(budget):
        out = token_budget_select(df, budget)
        assert out.columns == ["doc", "q", "n_tokens"]
        return sorted(r.doc for r in out.collect())

    assert picked(100) == [1, 2]        # boundary cuts inside the 0.9 bucket
    assert picked(120) == [1, 2, 3]     # exact fit keeps the whole bucket
    assert picked(150) == [1, 2, 3, 4]  # next bucket fits whole
    assert picked(39) == []             # budget below the first doc
    assert picked(10_000) == [1, 2, 3, 4, 5]  # everything fits: early out


def test_mixture_quota_sample_matches_target_shares(spark):
    """The quota fit must pick the LARGEST feasible total (bounded by
    the scarcest class relative to its share), keep exactly
    floor(share*T) per class, drop classes without a share, and be
    deterministic (same hash seed -> same members)."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        mixture_quota_sample,
    )

    rows = [(i, "a") for i in range(100)] + [(i + 100, "b") for i in range(10)]
    rows += [(900, "junk")]  # no share: dropped entirely
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    # b is scarce: T = min(100/0.8, 10/0.2) = 50 -> a: 40, b: 10
    out = mixture_quota_sample(df, "cls", {"a": 0.8, "b": 0.2}, id_col="doc_id")
    got = out.groupBy("cls").count().collect()
    assert {r.cls: r["count"] for r in got} == {"a": 40, "b": 10}
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(
        r.doc_id
        for r in mixture_quota_sample(
            df, "cls", {"a": 0.8, "b": 0.2}, id_col="doc_id"
        ).collect()
    )
    assert ids1 == ids2  # deterministic membership
    assert all(i < 900 for i in ids1)  # junk class never sampled


def test_temperature_mix_upweights_tail_classes(spark):
    """count^0.5 smoothing must land BETWEEN raw proportions and hard
    balance: the head class keeps more than an equal split but less
    than its raw share, and every class's kept count respects its
    sqrt-derived quota exactly."""
    import math

    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        temperature_mix_sample,
    )

    rows = [(i, "head") for i in range(400)] + [
        (i + 1000, "tail") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, cls string")
    out = temperature_mix_sample(df, "cls", alpha=0.5)
    got = {r.cls: r["count"] for r in out.groupBy("cls").count().collect()}
    # shares: sqrt(400)=20, sqrt(25)=5 -> 0.8 / 0.2; T = min(400/.8,
    # 25/.2) = 125 -> head 100, tail 25
    assert got == {"head": 100, "tail": 25}
    raw_head, eq_head = 400 / 425, 0.5
    smoothed_head = got["head"] / sum(got.values())
    assert eq_head < smoothed_head < raw_head
    assert math.isclose(smoothed_head, 0.8)


def test_token_budget_recursion_splits_degenerate_bucket(spark):
    """The worst case for a single-level fit: ALL mass in one coarse
    quality bucket (every q in [0.5, 0.501)), so level 1 alone would
    window the entire corpus. The recursive fit must re-histogram the
    boundary bucket 1000x finer, keep the high sub-buckets map-side,
    and still reproduce the naive (q DESC, doc ASC) prefix exactly —
    including when scores are IDENTICAL to full precision and only the
    doc tie-break can rank (recursion stops early; the window decides)."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        token_budget_apply,
        token_budget_fit,
        token_budget_select,
    )

    # distinct at the 1e6 scale: recursion separates them
    # (recurse_min_tokens=0 forces the recursion at toy size; the
    # default gate skips it when one windowed bucket is trivially
    # cheap — the bench-scale behavior)
    rows = [(d, 0.5 + d * 1e-5, 10) for d in range(1, 60)]
    df = spark.createDataFrame(rows, "doc long, q double, n_tokens long")
    assert len(token_budget_fit(df, 100)[0]) == 1  # gated: level 1 only
    fit = token_budget_fit(df, 100, recurse_min_tokens=0)
    levels, residual = fit
    assert len(levels) == 2 and levels[0][0] == 1000 and levels[1][0] == 1_000_000
    got = sorted(r.doc for r in token_budget_apply(df, fit).collect())
    # naive prefix: q DESC == doc DESC here, so the 10 highest docs fit
    assert got == list(range(50, 60))

    # identical scores to full precision: unrankable except by doc —
    # recursion gains nothing (single finer bucket, early stop) and the
    # boundary window's doc tie-break still cuts the exact prefix
    flat = spark.createDataFrame(
        [(d, 0.5, 10) for d in range(1, 30)], "doc long, q double, n_tokens long"
    )
    got_flat = sorted(r.doc for r in token_budget_select(flat, 95).collect())
    assert got_flat == list(range(1, 10))  # 9 docs * 10 tokens <= 95


def test_token_budget_early_stop_is_exact_not_bucket_inferred(spark):
    """ADVICE r11: a single bucket at the current scale does NOT mean
    the scores are unrankable — they may differ beyond 1/scale and
    split one level deeper. The fit must (a) stop IMMEDIATELY on truly
    identical scores (min == max probe, no wasted second pass), and
    (b) keep recursing through single-bucket levels when the scores do
    still differ."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        token_budget_apply,
        token_budget_fit,
    )

    # (a) identical scores: one level, not two — the probe proves
    # unrankability without re-histogramming
    flat = spark.createDataFrame(
        [(d, 0.5, 10) for d in range(1, 30)], "doc long, q double, n_tokens long"
    )
    levels, _ = token_budget_fit(flat, 95, recurse_min_tokens=0)
    assert len(levels) == 1

    # (b) scores differ only at the 1e-8 digit: levels 1 AND 2 are both
    # single-bucket, but level 3 separates them — the old
    # len(hist)==1 inference abandoned recursion at level 2
    rows = [(d, 0.5 + d * 1e-8, 10) for d in range(1, 60)]
    df = spark.createDataFrame(rows, "doc long, q double, n_tokens long")
    fit = token_budget_fit(df, 100, max_levels=3, recurse_min_tokens=0)
    levels, _ = fit
    assert [s for s, _ in levels] == [1000, 1_000_000, 1_000_000_000]
    got = sorted(r.doc for r in token_budget_apply(df, fit).collect())
    assert got == list(range(50, 60))  # q DESC == doc DESC prefix


def test_domain_cap_keeps_small_domains_whole(spark):
    """The cap is one-sided: a domain under the cap passes through
    WHOLE (every doc kept), an over-cap domain keeps exactly `cap`
    smallest-hash members, and membership is deterministic across
    invocations (stable under re-runs/corpus growth)."""
    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        domain_cap_sample,
    )

    rows = [(i, "mirror.example") for i in range(500)] + [
        (i + 1000, "small.example") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    out = domain_cap_sample(df, "domain", cap=25).collect()
    by_dom: dict[str, list] = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r)
    assert len(by_dom["mirror.example"]) == 25  # capped
    assert sorted(r.doc_id for r in by_dom["small.example"]) == [
        1000 + i for i in range(7)
    ]  # under-cap: complete
    assert all(r.domain_docs == 500 for r in by_dom["mirror.example"])
    again = sorted(
        r.doc_id for r in domain_cap_sample(df, "domain", cap=25).collect()
    )
    assert again == sorted(r.doc_id for r in out)


def test_bfd_packing_beats_first_fit_on_skewed_lengths(spark):
    """BFD invariants on a skewed length mix: every pack's load <=
    budget unless it is an oversized singleton, pack_offset equals the
    sum of the tokens inserted before the doc, every doc is assigned
    exactly once — and BFD opens no more (here strictly fewer) packs
    than atomic first-fit-in-decreasing-order needs on the same mix,
    the utilization claim that justifies the operator."""
    from pyspark.sql import functions as F

    from multichannel_commerce_data_pipeline_spark.operators.training_prep import (
        assign_packs_bfd,
    )

    # budget 50: first-fit-decreasing burns pack A's slack on the 13
    # (35+13=48) and strands the 3 in a third pack; best-fit instead
    # packs 19+17+13=49 tight and closes 35+12+3=50 — 2 packs vs 3
    budget, sizes = 50, [35, 19, 17, 13, 12, 3]
    rows = [(i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = assign_packs_bfd(
        df, F.col("n_tokens"), budget=budget, n_shards=1
    ).collect()
    assert sorted(r.doc_id for r in out) == list(range(len(sizes)))
    packs: dict[tuple, list] = {}
    for r in out:
        packs.setdefault((r.shard, r.pack_id), []).append(r)
    for members in packs.values():
        load = sum(r.n_tokens for r in members)
        assert load <= budget or len(members) == 1
        # offsets replay the insertion order exactly
        cum = 0
        for r in sorted(members, key=lambda r: r.pack_offset):
            assert r.pack_offset == cum
            cum += r.n_tokens

    # first-fit over the same decreasing order (atomic packs)
    order = sorted(rows, key=lambda t: (-t[1], t[0]))
    ff_loads: list[int] = []
    for _, n in order:
        for k, l in enumerate(ff_loads):
            if l + n <= budget:
                ff_loads[k] = l + n
                break
        else:
            ff_loads.append(n)
    assert len(packs) < len(ff_loads)  # BFD strictly wins this mix
    assert len(packs) == 2 and len(ff_loads) == 3

    # the accumulator's id type follows the input (string ids pack too
    # — the assign_packs contract); same mix, same 2-pack assignment
    sdf = spark.createDataFrame(
        [(f"d{i}", n) for i, n in rows], "doc_id string, n_tokens long"
    )
    sout = assign_packs_bfd(
        sdf, F.col("n_tokens"), budget=budget, n_shards=1
    ).collect()
    assert len({(r.shard, r.pack_id) for r in sout}) == 2
    assert sorted(r.doc_id for r in sout) == sorted(f"d{i}" for i, _ in rows)
