"""U4 garbage compaction tests (reference algorithms.md:621-668)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _clusters(coll, t):
    rows = coll.at(t).collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["cluster_id"], set()).add(r["record_id"])
    return {frozenset(v) for v in out.values()}


def test_drop_then_compact_reclaims_orphans(spark):
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame()
    ef.add_collection("keep", Collection.from_edges(spark, [("a", "b", 0.9), ("c", "d", 0.8)]))
    ef.add_collection("gone", Collection.from_edges(spark, [("x", "y", 0.9), ("a", "z", 0.7)]))
    assert ef.records.count() == 7  # a b c d x y z
    ef.drop("gone")
    ef.compact()
    keys = {r["key"] for r in ef.records.collect()}
    assert keys == {"a", "b", "c", "d"}  # x, y, z reclaimed
    # surviving collection's partitions unchanged over its records
    parts = _clusters(ef.collections["keep"], 0.75)
    sizes = sorted(len(p) for p in parts)
    assert sizes == [2, 2]


def test_compact_reindex_preserves_partitions(spark):
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame()
    ef.add_collection("keep", Collection.from_edges(spark, [("m", "n", 0.9), ("p", "q", 0.6)]))
    ef.add_collection("gone", Collection.from_edges(spark, [("r", "s", 0.9)]))
    before = {
        tuple(sorted(row["members"]))
        for row in ef.collections["keep"].entities(0.5).collect()
    }
    ef.drop("gone").compact(reindex=True)
    # dense ids 0..n-1 over survivors
    ids = sorted(r["record_id"] for r in ef.records.collect())
    assert ids == list(range(len(ids)))
    after = {
        tuple(sorted(row["members"]))
        for row in ef.collections["keep"].entities(0.5).collect()
    }
    assert before == after
