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
    """Pinned semantics (reference algorithms.md:621-668): live =
    union of surviving collections' OWN record spaces (isolates
    included). Records that entered the frame only via a since-dropped
    collection are reclaimed — even though surviving collections
    transiently showed them as singletons while the shared space held
    them — and the surviving collection's intrinsic partition (as
    built, before the frame space grew) is restored exactly."""
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame()
    ef.add_collection("keep", Collection.from_edges(spark, [("m", "n", 0.9), ("p", "q", 0.6)]))
    intrinsic = {
        tuple(sorted(row["members"]))
        for row in ef.collections["keep"].entities(0.5).collect()
    }
    assert intrinsic == {("m", "n"), ("p", "q")}
    ef.add_collection("gone", Collection.from_edges(spark, [("r", "s", 0.9)]))
    # shared-space view: keep transiently sees gone's records as
    # singletons (reference shared-DataContext behaviour)
    shared = {
        tuple(sorted(row["members"]))
        for row in ef.collections["keep"].entities(0.5).collect()
    }
    assert shared == intrinsic | {("r",), ("s",)}
    ef.drop("gone").compact(reindex=True)
    # dense ids 0..n-1 over survivors
    ids = sorted(r["record_id"] for r in ef.records.collect())
    assert ids == list(range(len(ids)))
    after = {
        tuple(sorted(row["members"]))
        for row in ef.collections["keep"].entities(0.5).collect()
    }
    assert after == intrinsic


def test_compact_keeps_isolates_of_surviving_collections(spark):
    """A surviving collection's edge-less records (true isolates in
    its OWN space) must survive compact — the r2 bug reclaimed them."""
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    memberships = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 3)], "record_id long, cluster_id long"
    )
    ef = EntityFrame()
    ef.add_collection("keep", Collection.from_memberships(memberships))
    ef.add_collection(
        "gone", Collection.from_edges(spark, [("90", "91", 0.9)])
    )
    ef.drop("gone").compact()
    # records 2 and 3 are edge-less singletons of "keep": still live
    ids = sorted(r["record_id"] for r in ef.records.collect())
    assert ids == [0, 1, 2, 3]
    parts = _clusters(ef.collections["keep"], 1.0)
    assert {frozenset(p) for p in parts} == {
        frozenset({0, 1}),
        frozenset({2}),
        frozenset({3}),
    }


def test_compact_after_frame_store_round_trip(spark, tmp_path):
    """ADVICE r3: base_ids must survive save/load — a loaded frame that
    defaults every collection's base_ids to the whole frame space makes
    drop()+compact() reclaim nothing and diverges from the in-memory
    intrinsic-partition semantics."""
    from entityframe_spark.io.frame_store import load_frame, save_frame
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame()
    ef.add_collection(
        "keep", Collection.from_edges(spark, [("a", "b", 0.9), ("c", "d", 0.8)])
    )
    ef.add_collection(
        "gone", Collection.from_edges(spark, [("x", "y", 0.9), ("a", "z", 0.7)])
    )
    path = str(tmp_path / "frame")
    save_frame(ef, path)

    ef2 = load_frame(spark, path)
    # base_ids restored per collection, not defaulted to the frame space
    keep_keys = {
        r["key"]
        for r in ef2.collections["keep"]
        .base_ids.join(ef2.records, "record_id")
        .collect()
    }
    assert keep_keys == {"a", "b", "c", "d"}
    ef2.drop("gone").compact()
    keys = {r["key"] for r in ef2.records.collect()}
    assert keys == {"a", "b", "c", "d"}  # x, y, z reclaimed post-load
    parts = _clusters(ef2.collections["keep"], 0.75)
    assert sorted(len(p) for p in parts) == [2, 2]


def test_zero_collection_frame_save_load_and_arrow(spark, tmp_path):
    """ADVICE r4: a records-only frame (no collections yet) must save,
    load, and Arrow-round-trip instead of crashing on None tables."""
    from entityframe_spark.io.arrow_transport import frame_from_arrow, frame_to_arrow
    from entityframe_spark.io.frame_store import load_frame, save_frame
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame.from_records(
        "src", [{"key": "a"}, {"key": "b"}], key_column="key", spark=spark
    )
    path = str(tmp_path / "frame0")
    save_frame(ef, path)
    back = load_frame(spark, path)
    assert back.collections == {}
    assert {r["key"] for r in back.records.collect()} == {"a", "b"}

    buf = frame_to_arrow(ef)
    back2 = frame_from_arrow(spark, buf)
    assert back2.collections == {}
    assert {r["key"] for r in back2.records.collect()} == {"a", "b"}
