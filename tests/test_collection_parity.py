"""Reference-parity goldens: every behavioural assertion from
/root/reference/src/tests/test_collection_basic.py and the hierarchy
unit tests (builder.rs:331-639), re-expressed at DataFrame level.

Spark-job overhead dominates at this scale, so assertions are grouped
onto a handful of shared collections and whole threshold grids are
fetched in one action (grid_sets)."""

import pytest

from entityframe_spark.operators.collection import Collection
from tests.conftest import clusters_as_sets, grid_sets


@pytest.fixture(scope="module")
def kitchen_sink(spark):
    """One collection exercising: single edge, n-way equal-threshold
    chain, disconnected components, duplicates/reversed edges, empty
    string keys, mixed key types, large ints, weight-1.0 edges,
    boundary weights."""
    big = 2**31 - 1
    bigger = 2**32
    edges = [
        ("a", "b", 0.8),  # plain pair
        ("c", "d", 0.6),  # second component
        ("e", "f", 0.7),
        ("f", "g", 0.7),
        ("g", "h", 0.7),  # 4-way chain at equal threshold
        ("a", "b", 0.8),
        ("b", "a", 0.8),  # duplicate + reversed
        ("", "non-empty", 0.8),  # empty-string key
        (1, 2, 0.9),  # int keys
        (big, big + 1, 0.8),
        (bigger, bigger + 1, 0.7),  # large ints
        ("w1", "w2", 1.0),  # weight exactly 1.0
        ("p", "q", 0.5),  # boundary probe
        ("hi", "lo", 0.9),
        ("lo", "mid", 0.5),  # chain across thresholds
    ]
    return Collection.from_edges(spark, edges), frozenset(
        {
            "a", "b", "c", "d", "e", "f", "g", "h", "", "non-empty",
            "1", "2", str(big), str(big + 1), str(bigger), str(bigger + 1),
            "w1", "w2", "p", "q", "hi", "lo", "mid",
        }
    )


@pytest.fixture(scope="module")
def sink_grid(kitchen_sink):
    coll, _ = kitchen_sink
    return grid_sets(
        coll, [1.0, 0.9, 0.8, 0.7, 0.6, 0.50001, 0.5, 0.49999, 0.0]
    )


def test_all_singletons_above_max(kitchen_sink, sink_grid):
    _, all_keys = kitchen_sink
    g = sink_grid
    # at 1.0 everything except the weight-1.0 pair is singleton
    assert frozenset({"w1", "w2"}) in g[1.0]
    assert len(g[1.0]) == len(all_keys) - 1
    non_single = [s for s in g[1.0] if len(s) > 1]
    assert non_single == [frozenset({"w1", "w2"})]


def test_single_edge_merge_and_inclusive_boundary(sink_grid):
    g = sink_grid
    assert frozenset({"a"}) in g[0.9] and frozenset({"b"}) in g[0.9]
    assert frozenset({"a", "b"}) in g[0.8]  # merged at exactly w (>= semantics)
    assert frozenset({"a", "b"}) in g[0.5]


def test_nway_equal_threshold_chain(sink_grid):
    g = sink_grid
    assert frozenset({"e", "f", "g", "h"}) in g[0.7]
    for k in "efgh":
        assert frozenset({k}) in g[0.8]


def test_disconnected_components_intermediate_cut(sink_grid):
    g = sink_grid
    assert frozenset({"c"}) in g[0.7] and frozenset({"d"}) in g[0.7]
    assert frozenset({"c", "d"}) in g[0.6]
    assert frozenset({"c", "d"}) in g[0.0]
    assert frozenset({"a", "b"}) in g[0.0]  # components stay separate at 0


def test_duplicate_reversed_and_empty_string_keys(sink_grid):
    g = sink_grid
    assert frozenset({"", "non-empty"}) in g[0.8]


def test_key_type_canonicalisation(sink_grid):
    g = sink_grid
    assert frozenset({"1", "2"}) in g[0.9]


def test_large_integer_keys(sink_grid):
    big = 2**31 - 1
    bigger = 2**32
    g = sink_grid
    assert frozenset({str(big), str(big + 1)}) in g[0.8]
    assert frozenset({str(bigger), str(bigger + 1)}) in g[0.7]


def test_threshold_boundary_semantics(sink_grid):
    g = sink_grid
    assert frozenset({"p", "q"}) in g[0.5]  # merged at exactly t
    assert frozenset({"p"}) in g[0.50001]  # split just above
    assert frozenset({"p", "q"}) in g[0.49999]  # merged just below


def test_chain_merge_order(sink_grid):
    g = sink_grid
    assert frozenset({"hi", "lo"}) in g[0.9]
    assert frozenset({"mid"}) in g[0.9]
    assert frozenset({"hi", "lo", "mid"}) in g[0.5]


def test_empty_collection(spark):
    coll = Collection.from_edges(spark, [])
    assert coll.at(0.5).count() == 0


def test_isolates_with_explicit_record_space(spark):
    """Records with no edges appear as singletons at every threshold
    (builder.rs:555-587); quantise=2 coarsens 0.123456789 to 0.12
    (builder.rs:438-451)."""
    from entityframe_spark.core.records import intern_records

    recs = intern_records(
        spark.createDataFrame(
            [("default", k) for k in ["a", "b", "lonely"]],
            "source string, key string",
        )
    )
    coll = Collection.from_edges(
        spark.createDataFrame(
            [("a", "b", 0.123456789)], "src string, dst string, weight double"
        ),
        records=recs,
        quantise=2,
    )
    g = grid_sets(coll, [0.13, 0.12, 0.5])
    assert g[0.12] == {frozenset({"a", "b"}), frozenset({"lonely"})}
    assert g[0.13] == {frozenset({"a"}), frozenset({"b"}), frozenset({"lonely"})}
    assert g[0.5] == g[0.13]


def test_quantise6_rounding(spark):
    coll6 = Collection.from_edges(spark, [("a", "b", 0.123456789)], quantise=6)
    g6 = grid_sets(coll6, [0.123457, 0.123458])
    assert len(g6[0.123457]) == 1  # rounds up at 6dp
    assert len(g6[0.123458]) == 2


def test_threshold_validation(spark):
    coll = Collection.from_edges(spark, [])
    with pytest.raises(ValueError):
        coll.at(1.5)
    with pytest.raises(ValueError):
        coll.at(-0.1)
    with pytest.raises(ValueError):
        Collection.from_edges(spark, [("a", "b", 0.5)], quantise=0)


def test_merge_thresholds_entities_count(spark):
    coll = Collection.from_edges(
        spark, [("a", "b", 0.8), ("b", "c", 0.6), ("x", "y", 0.8)]
    )
    assert coll.merge_thresholds() == [0.8, 0.6]
    ents = {tuple(r["members"]) for r in coll.entities(0.7).collect()}
    assert ents == {("a", "b"), ("c",), ("x", "y")}
    assert coll.entity_count(0.7) == 3


def test_from_memberships(spark):
    m = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 200)], "record_id long, cluster_id long"
    )
    coll = Collection.from_memberships(m)
    g = grid_sets(coll, [1.0, 0.5], by_key=False)
    assert g[1.0] == {frozenset({1, 2}), frozenset({3})}
    assert g[0.5] == {frozenset({1, 2}), frozenset({3})}


def test_at_matches_grid(kitchen_sink, sink_grid):
    """at() (filter + CC path) must agree with the cogrouped local
    reconstruction (test_threshold_caching_consistency analogue)."""
    coll, _ = kitchen_sink
    for t in [0.7, 1.0]:
        got = clusters_as_sets(coll.at(t), coll.records)
        assert got == sink_grid[t], f"at({t}) mismatch"
    got2 = clusters_as_sets(coll.at(0.7), coll.records)
    assert got2 == sink_grid[0.7]


def test_sweep_fast_path_matches_membership_path(kitchen_sink):
    """The O(m) incremental merge-delta sweep must agree with the
    membership-materialising sweep on counts exactly and on entropy to
    float tolerance (max_cells=0 forces the fast route)."""
    coll, _ = kitchen_sink
    slow = {
        round(r["threshold"], 9): (r["entity_count"], r["entropy"])
        for r in coll.sweep(0.4, 1.0, 0.05).collect()
    }
    fast = {
        round(r["threshold"], 9): (r["entity_count"], r["entropy"])
        for r in coll.sweep(0.4, 1.0, 0.05, max_cells=0).collect()
    }
    assert slow.keys() == fast.keys()
    for t in slow:
        assert slow[t][0] == fast[t][0], (t, slow[t], fast[t])
        assert abs(slow[t][1] - fast[t][1]) < 1e-8, (t, slow[t], fast[t])
