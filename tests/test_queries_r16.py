"""Behavior tests for the r16 wave: IVF rebalance execution (layout
membership partition + retrieval recall), NDV state reuse, and the
metrics/erasure streaming closures added this round.
"""

from __future__ import annotations

import math


def _src(cell: int) -> int:
    from multichannel_commerce_data_pipeline_spark.queries.similarity import (
        _REB_SUB_BASE,
    )

    return cell // _REB_SUB_BASE if cell % _REB_SUB_BASE in (1, 2) else cell


def test_ivf_rebalance_partitions_members_exactly(spark, sf_dir):
    """The rebalanced layout must hold EXACTLY the original members:
    per source list, the union of its sub-lists equals the original
    member set (no loss, no duplication, no stale partition left
    behind), split lists land in >= 2 strictly smaller sub-lists, and
    untouched lists are bit-identical member sets."""
    from multichannel_commerce_data_pipeline_spark.queries.similarity import (
        _REB_TOP,
        ensure_ivf_list_layouts,
    )

    lists_dir, reb_dir = ensure_ivf_list_layouts(spark, sf_dir)
    orig: dict[int, set[int]] = {}
    for r in spark.read.parquet(lists_dir).select("cell", "vid").collect():
        orig.setdefault(int(r["cell"]), set()).add(int(r["vid"]))
    reb: dict[int, set[int]] = {}
    for r in spark.read.parquet(reb_dir).select("cell", "vid").collect():
        reb.setdefault(int(r["cell"]), set()).add(int(r["vid"]))

    by_src: dict[int, dict[int, set[int]]] = {}
    for c, vids in reb.items():
        by_src.setdefault(_src(c), {})[c] = vids
    assert set(by_src) == set(orig)
    n_split = 0
    for s, subs in by_src.items():
        merged: set[int] = set()
        total = 0
        for vids in subs.values():
            merged |= vids
            total += len(vids)
        assert merged == orig[s]  # no member lost or invented
        assert total == len(orig[s])  # sub-lists are DISJOINT
        if len(subs) > 1:
            n_split += 1
            assert all(c != s for c in subs)  # source dir removed
            assert max(len(v) for v in subs.values()) < len(orig[s])
        else:
            assert set(subs) == {s}  # untouched list kept its identity
    assert n_split == _REB_TOP


def test_ivf_rebalance_improves_recall_per_scanned_candidate(spark, sf_dir):
    """Retrieval must survive the rebalance — the ann_ivfpq-style
    recall gate applied to the rewritten index: probing the
    rebalanced layout (sub-list routing vectors = the sub-list member
    means, i.e. the coarse centroids a store would register for the
    new lists; one extra probe since the cycle split the two biggest
    lists into four smaller ones) reaches recall@10 at least as high
    as the original layout's while scanning NO MORE candidates — the
    finer partitioning buys recall per scanned vector, which is the
    point of rebalancing."""
    import numpy as np

    from multichannel_commerce_data_pipeline_spark.queries.similarity import (
        _REB_SUB_BASE,
        ensure_ivf_list_layouts,
    )

    lists_dir, reb_dir = ensure_ivf_list_layouts(spark, sf_dir)
    rows_o = spark.read.parquet(lists_dir).select("cell", "vid", "v").collect()
    rows_r = spark.read.parquet(reb_dir).select("cell", "vid").collect()
    emb = {int(r["vid"]): np.array(r["v"], dtype=float) for r in rows_o}

    def unit(x):
        return x / (np.linalg.norm(x) or 1.0)

    def layout(rows):
        members: dict[int, list[int]] = {}
        for r in rows:
            members.setdefault(int(r["cell"]), []).append(int(r["vid"]))
        route = {
            c: (
                np.mean([emb[v] for v in vids], axis=0)
                if c % _REB_SUB_BASE in (1, 2)
                else emb[c]
            )
            for c, vids in members.items()
        }
        return members, route

    def recall(members, route, n_probe) -> tuple[float, int]:
        hits, total, scanned = 0, 0, 0
        for q in range(8):
            qv = unit(emb[q])
            truth = sorted(
                (v for v in emb if v != q),
                key=lambda v: (-float(qv @ unit(emb[v])), v),
            )[:10]
            probed = sorted(
                route, key=lambda c: (-float(qv @ unit(route[c])), c)
            )[:n_probe]
            cand = [v for c in probed for v in members[c] if v != q]
            scanned += len(cand)
            got = sorted(
                cand, key=lambda v: (-float(qv @ unit(emb[v])), v)
            )[:10]
            hits += len(set(truth) & set(got))
            total += 10
        return hits / total, scanned

    mo, ro = layout(rows_o)
    mr, rr = layout(rows_r)
    r_orig, c_orig = recall(mo, ro, 4)
    r_reb, c_reb = recall(mr, rr, 5)
    assert r_orig > 0.3  # the gate is meaningful, not vacuous
    assert c_reb <= c_orig  # matched (actually smaller) scan budget
    assert r_reb >= r_orig - 1e-9


def test_ndv_state_reused_and_memoized(spark, sf_dir):
    """The NDV state artifact must build once per corpus version
    (same path, no rebuild on the second call) and the full-corpus
    validation harness must be session-memoized — the fit-once
    economics the quantile consumer established."""
    from pathlib import Path

    from multichannel_commerce_data_pipeline_spark.queries.warehouse_queries import (
        _ndv_full_fit,
        ensure_ndv_state,
    )

    p1 = ensure_ndv_state(spark, sf_dir)
    stamp = max(f.stat().st_mtime_ns for f in Path(p1).rglob("*") if f.is_file())
    p2 = ensure_ndv_state(spark, sf_dir)
    assert p2 == p1
    assert (
        max(f.stat().st_mtime_ns for f in Path(p1).rglob("*") if f.is_file())
        == stamp
    )
    f1 = _ndv_full_fit(spark, sf_dir)
    f2 = _ndv_full_fit(spark, sf_dir)
    assert f1 is f2
    regs, exact = f1
    assert 0 < len(regs) <= 128 and exact > 0
    est = 128.0 * 128.0 / sum(v / float(1 << 60) for v in regs.values()) - 128
    assert abs(est - exact) / exact < 0.5  # ~1/sqrt(m) accuracy band
