"""Record interning: (source, key) -> dense stable record ids.

Reference: DataContext.ensure_record deduplicates records and assigns
dense u32 ids in first-insertion order
(src/rust/starlings-core/src/core/data_context.rs:26-78). In Spark the
append-only arena becomes a ``records`` dimension DataFrame; dense ids
come from a row_number over a stable sort (deterministic across runs),
or — shuffle-free at scale — a 64-bit xxhash64 surrogate.

Identity is (source, key): the same key in two sources is two records
(data_context.rs tests :116-137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SOURCE = "default"  # starlings-py/src/lib.rs:135


def intern_records(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "key",
    dense_ids: bool = True,
) -> DataFrame:
    """Dedup (source, key) pairs and assign record ids.

    dense_ids=True  -> global rank over (source, key): dense and
                       deterministic, computed scale-safely as a
                       TWO-PHASE rank — range-repartition on the sort
                       key, per-partition row_number (parallel), plus a
                       broadcast per-partition offset. No single-task
                       global Window.
    dense_ids=False -> xxhash64(source, key): shuffle-free surrogate
                       for the 100 TB path; ids are stable but sparse.

    Returns DataFrame(record_id long, source string, key string).
    """
    base = (
        df.select(
            F.coalesce(F.col(source_col).cast("string"), F.lit(DEFAULT_SOURCE)).alias(
                "source"
            ),
            F.col(key_col).cast("string").alias("key"),
        )
        .where(F.col("key").isNotNull())
        .dropDuplicates(["source", "key"])
    )
    if not dense_ids:
        return base.withColumn("record_id", F.xxhash64("source", "key")).select(
            "record_id", "source", "key"
        )
    return dense_rank_ids(base, ["source", "key"]).select(
        "record_id", "source", "key"
    )


def dense_rank_ids(
    base: DataFrame, order_cols: list[str], offset: int = 0
) -> DataFrame:
    """Scale-safe global dense rank: adds ``record_id`` = offset +
    rank over ``order_cols`` (which must be unique per row).

    Two-phase: rangeExchange orders partitions globally; the id is
    offset(partition) + local row_number - 1 — identical to a global
    ROW_NUMBER() OVER (ORDER BY order_cols) - 1 + offset but with NO
    single-task global Window. The per-partition offsets table is one
    small collect (n_partitions rows).
    """
    ranged = base.repartitionByRange(*order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets, acc = {}, int(offset)
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    off_df = base.sparkSession.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "record_id",
            (F.col("_off") + F.row_number().over(w) - F.lit(1)).cast("long"),
        )
        .drop("_pid", "_off")
    )


def get_record(records: DataFrame, record_id: int) -> DataFrame:
    """S3: point lookup by id (reference DataContext.get_record,
    data_context.rs:80-86). A trivial filter, exposed for API parity;
    at scale this is a partition-pruned scan when records are written
    bucketed/sorted by record_id."""
    return records.where(F.col("record_id") == int(record_id))


def records_by_source(records: DataFrame, source: str) -> DataFrame:
    """S4: scan records of one source (reference source_index,
    data_context.rs:88-94). Filter pushdown reaches the parquet scan
    when records are persisted partitioned by source."""
    return records.where(F.col("source") == F.lit(source))


def attrs_signature(attrs_col) -> "F.Column":
    """Deterministic canonical string for a map<string,string> attrs
    column: JSON of the entries sorted by key. Two records with the
    same attrs in different insertion order get the same signature —
    matching the reference's interned-attr identity semantics
    (data_context.rs:47-78, where HashMap equality is order-free)."""
    return F.coalesce(
        F.to_json(F.map_from_entries(F.array_sort(F.map_entries(attrs_col)))),
        F.lit("{}"),
    )


def intern_records_with_attributes(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "key",
    attrs_col: str = "attrs",
    dense_ids: bool = True,
) -> DataFrame:
    """S2/S6: identity = (source, key, attrs) — the same (source, key)
    with DIFFERENT attributes is a different record, exactly the
    reference's ensure_record_with_attributes
    (data_context.rs:47-78, parity tests :111-204).

    ``attrs_col`` is a map<string,string> column (missing/null -> {}).
    Returns DataFrame(record_id long, source string, key string,
    attrs map<string,string>, attr_sig string). Dense ids use the same
    two-phase global rank as intern_records, ordered by
    (source, key, attr_sig) for determinism.
    """
    cols = {c.lower() for c in df.columns}
    attrs = (
        F.col(attrs_col)
        if attrs_col.lower() in cols
        else F.lit(None).cast("map<string,string>")
    )
    base = (
        df.select(
            F.coalesce(F.col(source_col).cast("string"), F.lit(DEFAULT_SOURCE)).alias(
                "source"
            ),
            F.col(key_col).cast("string").alias("key"),
            attrs.alias("attrs"),
        )
        .where(F.col("key").isNotNull())
        .withColumn("attr_sig", attrs_signature(F.col("attrs")))
        .dropDuplicates(["source", "key", "attr_sig"])
    )
    if not dense_ids:
        return base.withColumn(
            "record_id", F.xxhash64("source", "key", "attr_sig")
        ).select("record_id", "source", "key", "attrs", "attr_sig")
    return dense_rank_ids(base, ["source", "key", "attr_sig"]).select(
        "record_id", "source", "key", "attrs", "attr_sig"
    )


def resolve_edge_keys(
    edges: DataFrame,
    records: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    source: str = DEFAULT_SOURCE,
) -> DataFrame:
    """J1: replace (source, key) with record ids in an edge list via two
    broadcast hash joins (reference does per-edge hash lookups,
    starlings-py/src/lib.rs:139-149).

    Returns DataFrame(src long, dst long, <other edge columns>).
    """
    dim = records.where(F.col("source") == F.lit(source)).select(
        F.col("key"), F.col("record_id")
    )
    others = [c for c in edges.columns if c not in (src_col, dst_col)]
    out = (
        edges.withColumn("_sk", F.col(src_col).cast("string"))
        .withColumn("_dk", F.col(dst_col).cast("string"))
        .drop(src_col, dst_col)
        .join(F.broadcast(dim.withColumnRenamed("key", "_sk")), "_sk")
        .withColumnRenamed("record_id", "src")
        .join(F.broadcast(dim.withColumnRenamed("key", "_dk")), "_dk")
        .withColumnRenamed("record_id", "dst")
    )
    return out.select("src", "dst", *others)
