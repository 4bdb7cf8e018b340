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
    # two-phase dense rank: rangeExchange orders partitions globally;
    # the id is offset(partition) + local row_number - 1, identical to a
    # global ROW_NUMBER() OVER (ORDER BY source, key) - 1 because
    # (source, key) is unique after the dedup above. The offsets table
    # is one small collect (n_partitions rows).
    ranged = base.repartitionByRange("source", "key").withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.localCheckpoint(eager=False)
    counts = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n")).collect()
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_pid"]):
        offsets[row["_pid"]] = acc
        acc += row["_n"]
    spark = base.sparkSession
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _off long"
    )
    w = Window.partitionBy("_pid").orderBy("source", "key")
    return (
        ranged.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "record_id",
            (F.col("_off") + F.row_number().over(w) - F.lit(1)).cast("long"),
        )
        .select("record_id", "source", "key")
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
