"""C5 staged (hierarchical) resolution: resolve within sources first,
then link stage-1 entities as super-nodes across sources, composing a
single final partition.

Parity target: the reference's hierarchical-resolution workflow
(docs/design/interface.md:731-763) and ``from_entities`` expansion
(docs/design/algorithms.md:164-210): pre-resolved entities become
merge structure at threshold 1.0, cross-entity edges merge at their
own weights, and the final collection's ``at(t)`` yields the composed
partition.

Spark-first deviation (documented): the reference expands each entity
into O(|entity|^2) pairwise edges at weight 1.0 (algorithms.md:
188-210). Under connected components a STAR (member -> min-member
rep, weight 1.0) yields the identical partition with O(|entity|)
edges — at 10^12 records the quadratic expansion is not viable, the
star is one groupBy + one join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.core.quantize import quantize_weights
from entityframe_spark.operators import hierarchy
from entityframe_spark.operators.collection import Collection


def entity_reps(memberships: DataFrame) -> DataFrame:
    """(cluster_id, rep): rep = min record_id of the entity — the
    super-node standing for the stage-1 entity in stage 2."""
    return memberships.groupBy("cluster_id").agg(F.min("record_id").alias("rep"))


def staged_collection(
    stage1_memberships: DataFrame,
    cross_cluster_edges: DataFrame,
    records: DataFrame | None = None,
    quantise: int = 6,
) -> Collection:
    """Compose stage-1 entities with stage-2 cross-entity links into
    one Collection over RECORD ids.

    stage1_memberships: (record_id long, cluster_id long) — the union
        of every source's stage-1 partition (cluster ids globally
        distinct; record spaces disjoint across sources).
    cross_cluster_edges: (src_cluster long, dst_cluster long,
        weight double) — stage-2 similarity edges between ENTITIES
        (scored over their super-node reps).

    The result's ``at(1.0)`` reproduces exactly the stage-1 entities
    (plus any cross links at weight 1.0); lower thresholds merge
    entities along cross edges — the reference's composed-partition
    semantics (interface.md:731-763).
    """
    mem = stage1_memberships.select("record_id", "cluster_id")
    reps = entity_reps(mem).localCheckpoint(eager=False)
    # entity expansion: star member -> rep at weight 1.0
    star = (
        mem.join(reps, "cluster_id")
        .where(F.col("record_id") != F.col("rep"))
        .select(
            F.col("record_id").alias("src"),
            F.col("rep").alias("dst"),
            F.lit(1.0).alias("weight"),
        )
    )
    # cross-entity edges land on the reps
    cross = (
        cross_cluster_edges.join(
            reps.withColumnsRenamed({"cluster_id": "src_cluster", "rep": "_sr"}),
            "src_cluster",
        )
        .join(
            reps.withColumnsRenamed({"cluster_id": "dst_cluster", "rep": "_dr"}),
            "dst_cluster",
        )
        .select(
            F.col("_sr").alias("src"),
            F.col("_dr").alias("dst"),
            F.col("weight").cast("double").alias("weight"),
        )
    )
    edges = star.unionByName(cross)
    edges_fp = edges.select("src", "dst", quantize_weights(F.col("weight"), quantise))
    merge_edges = hierarchy.build_merge_edges(edges_fp)
    if records is None:
        records = mem.select(
            F.col("record_id"),
            F.lit("staged").alias("source"),
            F.col("record_id").cast("string").alias("key"),
        ).dropDuplicates(["record_id"])
    return Collection(records, merge_edges)


def link_entities_exact(
    stage1_memberships: DataFrame,
    record_keys: DataFrame,
    key_col: str = "link_key",
    weight: float = 1.0,
) -> DataFrame:
    """Stage-2 candidate links by exact blocking-key equality between
    entity REPS (the degenerate-but-common stage-2 scorer: equal
    canonical key => weight 1.0). record_keys: (record_id, <key_col>).
    Returns (src_cluster, dst_cluster, weight) with src < dst.

    For fuzzy stage-2 scoring, feed the reps' texts through
    pipeline.blocking + pipeline.scoring instead and pass the scored
    rep pairs to ``staged_collection`` as cross_cluster_edges.

    Scale note: emits a STAR per key (cluster -> min cluster sharing
    the key), not all pairs — the composed CC partition is identical
    and a hot key stays O(k) instead of O(k^2).
    """
    reps = entity_reps(stage1_memberships)
    keyed = reps.join(
        record_keys.withColumnRenamed("record_id", "rep"), "rep"
    ).select("cluster_id", F.col(key_col).alias("_k"))
    mins = keyed.groupBy("_k").agg(F.min("cluster_id").alias("_mc"))
    return (
        keyed.join(mins, "_k")
        .where(F.col("cluster_id") != F.col("_mc"))
        .select(
            F.col("_mc").alias("src_cluster"),
            F.col("cluster_id").alias("dst_cluster"),
            F.lit(float(weight)).alias("weight"),
        )
        .distinct()
    )
