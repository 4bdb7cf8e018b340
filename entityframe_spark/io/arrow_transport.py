"""In-memory Arrow IPC transport for EntityFrames (SURVEY.md S8).

The reference specifies an in-memory Arrow Table round-trip with
dictionary encoding (docs/design/interface.md:253-273: ``to_arrow`` /
``from_arrow``) for interop with pandas/polars/duckdb without touching
disk. The parquet frame store (io/frame_store.py) is the durable
Spark-native equivalent; this module closes the in-memory API hole:
the SAME relational decomposition, materialised as ``pyarrow.Table``s.

SCALE CONTRACT — driver-memory only, by design: ``frame_to_arrow``
collects every table to the driver, which is exactly what an
in-process Arrow interchange means. It is for dimension-sized frames
(exports to notebooks, handoff to the reference ecosystem, test
fixtures). A guard refuses frames above ``max_rows`` records so a
100 TB frame cannot be collected by accident — use save_frame
(parquet IS the Arrow-compatible durable format) for anything big.

Round-trip: frame_from_arrow(spark, frame_to_arrow(ef)) reconstructs
identical partitions at every threshold (tests/test_arrow_transport.py).
"""

from __future__ import annotations

import pyarrow as pa

from pyspark.sql import SparkSession

from entityframe_spark.io.frame_store import TABLES, assemble_frame, frame_tables
from entityframe_spark.operators.entityframe import EntityFrame

# string columns worth dictionary-encoding on export (low cardinality
# by construction — interface.md:253-273's dictionary-encoding note)
_DICT_COLS = {
    "records": ("source",),
    "merge_events": (),
    "merge_groups": ("merge_id",),
    "merge_group_records": ("group_id",),
    "collections": (),
    "collection_records": (),
}


def frame_to_arrow(
    ef: EntityFrame,
    dictionary_encode: bool = True,
    max_rows: int = 10_000_000,
) -> dict[str, pa.Table]:
    """Export a (dimension-sized) EntityFrame as in-memory Arrow
    tables, one per relational-decomposition table.

    Raises ValueError when the frame's record table exceeds
    ``max_rows`` — in-process Arrow interchange is a driver-side
    operation; large frames go through save_frame instead."""
    n = ef.records.count() if ef.records is not None else 0
    if n > max_rows:
        raise ValueError(
            f"frame has {n} records (> max_rows={max_rows}); frame_to_arrow "
            "collects to the driver and is for dimension-sized frames only — "
            "use io.frame_store.save_frame (parquet is Arrow-compatible) "
            "for large frames"
        )
    out: dict[str, pa.Table] = {}
    for name, df in frame_tables(ef).items():
        tbl = df.toArrow()
        if dictionary_encode:
            for col in _DICT_COLS.get(name, ()):
                i = tbl.schema.get_field_index(col)
                if i >= 0:
                    tbl = tbl.set_column(
                        i, col, tbl.column(i).combine_chunks().dictionary_encode()
                    )
        out[name] = tbl
    return out


def frame_from_arrow(spark: SparkSession, tables: dict[str, pa.Table]) -> EntityFrame:
    """Rebuild an EntityFrame from frame_to_arrow output (or any
    Arrow tables with the same schemas — e.g. produced by the
    reference's exporter). Dictionary-encoded columns are decoded
    before handing to Spark."""
    missing = [t for t in TABLES if t != "collection_records" and t not in tables]
    if missing:
        raise ValueError(f"missing frame tables: {missing}")
    dfs = {}
    for name, tbl in tables.items():
        cols = []
        changed = False
        for i, field in enumerate(tbl.schema):
            col = tbl.column(i)
            if pa.types.is_dictionary(field.type):
                col = col.combine_chunks().dictionary_decode()
                changed = True
            cols.append(col)
        if changed:
            tbl = pa.Table.from_arrays(cols, names=tbl.schema.names)
        dfs[name] = spark.createDataFrame(tbl)
    return assemble_frame(dfs)
