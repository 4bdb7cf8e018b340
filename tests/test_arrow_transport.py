"""In-memory Arrow round-trip (reference interface.md:253-273
to_arrow/from_arrow): partitions identical at every threshold,
dictionary encoding applied on export, size guard enforced."""

from __future__ import annotations

import itertools

import pyarrow as pa
import pytest


def _parts(frame, name, t):
    coll = frame.collections[name]
    rows = coll.at(t).collect()
    key_by_id = {r["record_id"]: r["key"] for r in frame.records.collect()}
    clusters: dict = {}
    for r in rows:
        clusters.setdefault(r["cluster_id"], set()).add(key_by_id[r["record_id"]])
    return {frozenset(v) for v in clusters.values()}


def test_arrow_round_trip(spark):
    from entityframe_spark.io.arrow_transport import frame_from_arrow, frame_to_arrow
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame()
    ef.add_collection(
        "main",
        Collection.from_edges(
            spark,
            [("a", "b", 0.9), ("b", "c", 0.7), ("d", "e", 0.8), ("c", "d", 0.4)],
            source="s",
        ),
    )
    ef.add_collection(
        "alt",
        Collection.from_edges(spark, [("a", "c", 0.6), ("d", "e", 0.95)], source="s"),
    )

    tables = frame_to_arrow(ef)
    # all tables are in-memory Arrow; dictionary encoding applied
    assert isinstance(tables["records"], pa.Table)
    src_field = tables["records"].schema.field("source")
    assert pa.types.is_dictionary(src_field.type)

    ef2 = frame_from_arrow(spark, tables)
    assert sorted(ef2.collections) == ["alt", "main"]
    for name, t in itertools.product(("main", "alt"), (0.95, 0.75, 0.5)):
        assert _parts(ef, name, t) == _parts(ef2, name, t), (name, t)

    # base_ids travel through the Arrow transport too
    keys = {
        r["key"]
        for r in ef2.collections["alt"].base_ids.join(ef2.records, "record_id").collect()
    }
    assert keys == {"a", "c", "d", "e"}


def test_arrow_size_guard(spark):
    from entityframe_spark.io.arrow_transport import frame_to_arrow
    from entityframe_spark.operators.collection import Collection
    from entityframe_spark.operators.entityframe import EntityFrame

    ef = EntityFrame()
    ef.add_collection("c", Collection.from_edges(spark, [("a", "b", 0.9)]))
    with pytest.raises(ValueError, match="max_rows"):
        frame_to_arrow(ef, max_rows=1)
