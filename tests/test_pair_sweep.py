"""Route parity for the fused (t_a, t_b) pair-grid sweep
(operators/pair_sweep.py) against the distributed membership-join
plan: the two must agree on every metric at every grid point, since
both feed metrics_from_stats / metrics_from_cells expressions."""

from __future__ import annotations

import math

import pytest

from entityframe_spark.operators.collection import Collection
from entityframe_spark.operators.entityframe import EntityFrame, col

METRICS = [
    "precision", "recall", "f1", "ari", "nmi",
    "v_measure", "bcubed_precision", "bcubed_recall", "agreement",
]


def _edges(seed: int, n: int = 40):
    # deterministic pseudo-random weighted edges over a shared key set:
    # chain + extra edges so components of every size appear across the
    # sweep grid
    out = []
    for i in range(n - 1):
        w = ((i * 2654435761 + seed * 97) % 1000) / 1000.0
        out.append((f"r{i}", f"r{i+1}", w))
    for i in range(0, n, 3):
        j = (i * 7 + seed) % n
        if j != i:
            w = ((i * 40503 + seed * 131) % 1000) / 1000.0
            out.append((f"r{i}", f"r{j}", w))
    return out


def _frame(spark, seed_a: int, seed_b: int) -> EntityFrame:
    ef = EntityFrame()
    ef.add_collection("a", Collection.from_edges(spark, _edges(seed_a)))
    ef.add_collection("b", Collection.from_edges(spark, _edges(seed_b)))
    return ef


def _rows(df):
    ka, kb = df.columns[0], df.columns[1]  # *_threshold[, _2] come first
    out = {}
    for r in df.collect():
        d = r.asDict()
        key = (round(d.pop(ka), 9), round(d.pop(kb), 9))
        out[key] = d
    return out


@pytest.mark.parametrize("seed_a,seed_b", [(1, 2), (3, 3)])
def test_fused_matches_shuffle_route(spark, seed_a, seed_b):
    ef = _frame(spark, seed_a, seed_b)
    ga = col("a").sweep(0.1, 0.9, 0.2)
    gb = col("b").sweep(0.0, 1.0, 0.25)
    fused = _rows(ef.analyse_df(ga, gb, metrics=METRICS))
    ef.fused_pair_sweep = False
    shuffled = _rows(ef.analyse_df(ga, gb, metrics=METRICS))
    assert set(fused) == set(shuffled) and len(fused) == 25
    for key, frow in fused.items():
        srow = shuffled[key]
        for m in METRICS:
            assert math.isclose(frow[m], srow[m], rel_tol=0, abs_tol=2e-9), (
                key, m, frow[m], srow[m],
            )


def test_fused_same_collection_both_axes(spark):
    # a collection against itself: the diagonal must be a perfect match
    ef = EntityFrame()
    ef.add_collection("a", Collection.from_edges(spark, _edges(5)))
    g = col("a").sweep(0.2, 0.8, 0.3)
    rows = _rows(ef.analyse_df(g, g, metrics=["f1", "ari", "nmi"]))
    for (ta, tb), r in rows.items():
        if ta == tb:
            assert r["f1"] == 1.0 and r["ari"] == 1.0 and r["nmi"] == 1.0


def test_fused_gate_falls_back(spark):
    # force the gate shut: pair_sweep_stats returns None above the
    # collect bound, so _pair_df must keep the shuffle plan and still
    # produce the same grid
    from entityframe_spark.operators import pair_sweep

    ef = _frame(spark, 1, 2)
    ga = col("a").sweep(0.3, 0.7, 0.2)
    gb = col("b").at(0.5)
    assert (
        pair_sweep.pair_sweep_stats(
            ef.records.select("record_id"),
            ef.collections["a"].merge_edges,
            ef.collections["b"].merge_edges,
            [300000, 500000, 700000],
            [500000],
            max_collect_rows=1,
        )
        is None
    )
    assert len(_rows(ef.analyse_df(ga, gb))) == 3


def test_single_sweep_incremental_route_matches(spark):
    # EntityFrame._single_df routes big grids through the O(m+|grid|)
    # merge-delta path; force it with a tiny cell gate and pin equality
    # with the membership route, including frame-space isolates (the
    # extra records that only collection b introduced must count as
    # singletons in a's sweep on BOTH routes)
    ef = _frame(spark, 1, 2)
    ef.add_collection(
        "c", Collection.from_edges(spark, [("iso1", "iso2", 0.4)])
    )
    g = col("a").sweep(0.1, 0.9, 0.2)
    base = {
        round(r[0], 9): (r[1], r[2])
        for r in ef.analyse_df(g, metrics=["entity_count", "entropy"]).collect()
    }
    ef.single_sweep_max_cells = 1
    inc = {
        round(r[0], 9): (r[1], r[2])
        for r in ef.analyse_df(g, metrics=["entity_count", "entropy"]).collect()
    }
    assert set(base) == set(inc) and len(base) == 5
    for t in base:
        assert base[t][0] == inc[t][0], (t, base[t], inc[t])
        assert math.isclose(base[t][1], inc[t][1], rel_tol=0, abs_tol=2e-9)


def test_fused_no_merges_above_grid(spark):
    # every edge below the grid: both sides are all singletons at all
    # grid points -> identical partitions, perfect metrics
    ef = EntityFrame()
    ef.add_collection(
        "a", Collection.from_edges(spark, [("x", "y", 0.1), ("y", "z", 0.2)])
    )
    ef.add_collection(
        "b", Collection.from_edges(spark, [("x", "y", 0.15), ("x", "z", 0.05)])
    )
    rows = _rows(
        ef.analyse_df(
            col("a").sweep(0.5, 0.9, 0.2),
            col("b").at(0.9),
            metrics=METRICS,
        )
    )
    assert len(rows) == 3
    for r in rows.values():
        # identical all-singleton partitions: agreement/ari/nmi are 1,
        # while pairwise f1 is 0 by convention (TP=PP=AP=0 — same
        # degenerate-case behavior as the shuffle route)
        assert r["agreement"] == 1.0 and r["ari"] == 1.0 and r["nmi"] == 1.0
        assert r["f1"] == 0.0


def test_side_cells_gate_bounds_label_matrix_memory(spark):
    """r6 (ADVICE r5 medium): an asymmetric grid can pass the collect
    and total-cells gates while |grid_b| x n alone would blow one
    task's label-matrix allocation. The max_side_cells gate must send
    such inputs back to the shuffle route (None)."""
    from entityframe_spark.operators import pair_sweep

    ef = _frame(spark, 1, 2)
    recs = ef.records.select("record_id")
    me_a = ef.collections["a"].merge_edges
    me_b = ef.collections["b"].merge_edges
    big_gb = list(range(1000, 1000 + 400))  # 400 t_b points
    # passes default collect/total gates at this tiny n, but the
    # b-side matrix (|gb| x n) exceeds the tightened side gate
    assert (
        pair_sweep.pair_sweep_stats(
            recs, me_a, me_b, [500000], big_gb, max_side_cells=100
        )
        is None
    )
    # symmetric check on the a-side slice bound
    assert (
        pair_sweep.pair_sweep_stats(
            recs, me_a, me_b, big_gb, [500000], max_side_cells=100
        )
        is None
    )
    # and with a permissive bound the same call goes fused
    assert (
        pair_sweep.pair_sweep_stats(
            recs, me_a, me_b, [500000], [500000], max_side_cells=10**9
        )
        is not None
    )
