"""Giant-component guard + intern scale-path tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_build_merge_edges_guard_raises_on_giant_component(spark):
    from entityframe_spark.operators.hierarchy import build_merge_edges

    # one chain component of 5k edges
    edges = spark.range(5000).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        (F.col("id") % 100 * 10000).alias("w_fp"),
    )
    with pytest.raises(ValueError, match="max_component_edges"):
        build_merge_edges(edges, max_component_edges=1000)


def test_build_merge_edges_completes_under_cap_100k(spark):
    """VERDICT item 4: a 100k-edge single component must complete when
    the cap allows it (default cap is 10M)."""
    from entityframe_spark.operators.hierarchy import build_merge_edges

    n = 100_000
    edges = spark.range(n).select(
        F.col("id").alias("src"),
        (F.col("id") + 1).alias("dst"),
        ((F.col("id") * 37) % 1000 * 1000).alias("w_fp"),
    )
    me = build_merge_edges(edges)
    # a chain of n edges produces exactly n merge events
    assert me.count() == n


def test_intern_records_dense_two_phase_matches_global_rank(spark):
    """Dense ids must equal ROW_NUMBER() OVER (ORDER BY source, key) - 1
    with no single-task global Window in the plan."""
    from entityframe_spark.core.records import intern_records

    df = spark.range(997).select(
        F.when(F.col("id") % 3 == 0, "src_a").otherwise("src_b").alias("source"),
        F.concat(F.lit("k"), (F.col("id") * 7919 % 1000).cast("string")).alias("key"),
    )
    out = intern_records(df).collect()
    rows = sorted(((r["source"], r["key"]) for r in out))
    got = {(r["source"], r["key"]): r["record_id"] for r in out}
    for rank, sk in enumerate(rows):
        assert got[sk] == rank
    # ids dense 0..n-1
    ids = sorted(got.values())
    assert ids == list(range(len(ids)))


def test_intern_records_dense_no_single_partition_exchange(spark):
    from entityframe_spark.core.records import intern_records

    df = spark.range(100).select(
        F.lit("s").alias("source"), F.col("id").cast("string").alias("key")
    )
    plan = intern_records(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_partitioned_sweep_matches_fused(spark):
    """The component-partitioned mapInPandas sweep (distributed route,
    many small partitions) must emit EXACTLY the fused single-task
    path's merge events — same content-based tie order, components
    batched per task without interaction. Graph: 40 clusters of 6
    nodes with duplicate weights (tie-order stress) + isolates."""
    from entityframe_spark.operators.hierarchy import (
        build_merge_edges,
        build_merge_edges_sized,
    )

    edges = spark.range(600).select(
        (F.col("id") % 40 * 6 + F.col("id") % 5).alias("src"),
        (F.col("id") % 40 * 6 + (F.col("id") * 7 + 1) % 6).alias("dst"),
        ((F.col("id") * 13) % 7 * 100_000 + 100_000).alias("w_fp"),
    ).where(F.col("src") != F.col("dst"))

    fused = build_merge_edges(edges).collect()
    dist = build_merge_edges(
        edges, local_threshold=0, cc_local_threshold=0, edges_per_task=50
    ).collect()
    key = lambda r: (r["threshold_fp"], r["child"], r["parent"])
    assert sorted(map(key, fused)) == sorted(map(key, dist))

    fused_s = build_merge_edges_sized(edges).collect()
    dist_s = build_merge_edges_sized(
        edges, local_threshold=0, cc_local_threshold=0, edges_per_task=50
    ).collect()
    key_s = lambda r: tuple(r[c] for c in
                            ("threshold_fp", "child", "parent", "left_size", "right_size"))
    assert sorted(map(key_s, fused_s)) == sorted(map(key_s, dist_s))


def test_bucketed_grid_memberships_match_local(spark):
    """The hash-bucketed distributed grid reconstruction must emit the
    same (threshold, record, cluster) cells as the fused local route,
    including isolates, across several buckets."""
    from entityframe_spark.operators.hierarchy import (
        build_merge_edges,
        memberships_for_grid,
    )

    edges = spark.range(300).select(
        (F.col("id") % 30 * 8 + F.col("id") % 7).alias("src"),
        (F.col("id") % 30 * 8 + (F.col("id") * 3 + 1) % 8).alias("dst"),
        ((F.col("id") * 11) % 9 * 100_000 + 50_000).alias("w_fp"),
    ).where(F.col("src") != F.col("dst"))
    records = spark.range(30 * 8 + 5).select(F.col("id").alias("record_id"))
    me = build_merge_edges(edges).localCheckpoint(eager=True)
    grid = [200_000, 500_000, 800_000]

    local = memberships_for_grid(me, records, grid).collect()
    dist = memberships_for_grid(
        me, records, grid, local_threshold=0, max_local_cells=100
    ).collect()
    key = lambda r: (r["threshold_fp"], r["record_id"], r["cluster_id"])
    assert sorted(map(key, local)) == sorted(map(key, dist))
    assert len(local) == len(grid) * (30 * 8 + 5)


def _me_rows(df):
    return sorted(
        (r["threshold_fp"], r["child"], r["parent"]) for r in df.collect()
    )


def test_msf_filter_route_matches_fused(spark):
    """Above-threshold trusted inputs route through the Kruskal-filter
    cascade (_msf_filter_cascade); its merge events must be IDENTICAL
    to the fused single-task sweep on the same edges — including
    equal-threshold tie order, which the canonical (-w, src, dst)
    total order pins. Mixed shape: several mid-size clusters plus one
    chain, redundant parallel paths so the filter actually drops
    edges."""
    from pyspark.sql import functions as F

    from entityframe_spark.operators.hierarchy import build_merge_edges

    edges = (
        spark.range(4000)
        .select(
            (F.col("id") % 40 * 25 + (F.col("id") * 7) % 25).alias("src"),
            (F.col("id") % 40 * 25 + (F.col("id") * 13 + 1) % 25).alias("dst"),
            ((F.col("id") * 31) % 11 * 90_000 + 10_000).alias("w_fp"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    baseline = build_merge_edges(edges)  # 4k edges < default threshold: fused
    # local_threshold=300 forces the MSF cascade; forest (~1k tree
    # edges over 1k nodes) exceeds 300 so this ALSO exercises the
    # stall -> CC-over-filtered fallback; then threshold=2000 exercises
    # the cascade-finishes -> fused-over-filtered exit
    for lt in (300, 2000):
        routed = build_merge_edges(
            edges, max_component_edges=None, local_threshold=lt
        )
        assert _me_rows(routed) == _me_rows(baseline), lt


def test_msf_filter_route_sized_matches(spark):
    """Sized variant through the MSF route: (left_size, right_size)
    come from the merge sequence, which filtering must not change."""
    from pyspark.sql import functions as F

    from entityframe_spark.operators.hierarchy import build_merge_edges_sized

    edges = (
        spark.range(1500)
        .select(
            ((F.col("id") * 17) % 120).alias("src"),
            ((F.col("id") * 29 + 3) % 120).alias("dst"),
            ((F.col("id") * 41) % 13 * 70_000 + 30_000).alias("w_fp"),
        )
        .where(F.col("src") != F.col("dst"))
        .localCheckpoint(eager=True)
    )
    key = lambda r: (
        r["threshold_fp"], r["child"], r["parent"], r["left_size"], r["right_size"]
    )
    baseline = sorted(map(key, build_merge_edges_sized(edges).collect()))
    routed = sorted(
        map(
            key,
            build_merge_edges_sized(
                edges, max_component_edges=None, local_threshold=200
            ).collect(),
        )
    )
    assert routed == baseline
