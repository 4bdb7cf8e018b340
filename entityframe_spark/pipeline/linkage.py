"""End-to-end record-linkage pipeline over transcripts (north rule).

collapse -> block -> score -> cluster -> evaluate, each stage an
idempotent checkpoint table via StageRunner. The clustering core is
the entityframe-equivalent engine (Collection / connected
components); evaluation reuses the metrics layer, so the pipeline
ends exactly where the reference begins — with two comparable
resolutions over one record space.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from entityframe_spark.core.quantize import quantize_weights, threshold_to_fp
from entityframe_spark.operators.components import connected_components
from entityframe_spark.operators import metrics as M
from entityframe_spark.pipeline.blocking import build_candidate_pairs
from entityframe_spark.pipeline.checkpoint import StageRunner
from entityframe_spark.pipeline.scoring import (
    attach_pair_texts,
    prepare_record_features,
    score_pairs,
)
from entityframe_spark.pipeline.transcripts import collapse_conversations


def assign_record_ids(collapsed: DataFrame) -> DataFrame:
    """Stable 64-bit ids from conv_id (shuffle-free; SURVEY.md S1 scale
    path). Collision probability over even 10^10 records is ~1e-7
    per Birthday bound on 64-bit — acceptable; dense row_number ids
    remain available for exact small-scale parity."""
    return collapsed.withColumn("record_id", F.xxhash64("conv_id"))


def cluster_edges(
    scored: DataFrame, match_threshold: float, quantise: int = 6
) -> DataFrame:
    """Transitive closure over match edges (weight >= threshold).

    Inclusive >= in fixed point, matching the reference's partition
    semantics (builder.rs:291). Returns (record_id, cluster_id) for
    records that appear in any candidate pair; callers left-join the
    full record space for isolates."""
    t_fp = threshold_to_fp(match_threshold)
    edges = scored.select(
        F.col("left_id").alias("src"),
        F.col("right_id").alias("dst"),
        quantize_weights(F.col("weight"), quantise),
    ).where(F.col("w_fp") >= F.lit(t_fp))
    return connected_components(edges, "src", "dst").withColumnsRenamed(
        {"node": "record_id", "component": "cluster_id"}
    )


def full_partition(records: DataFrame, clusters: DataFrame) -> DataFrame:
    """Every record gets a cluster; isolates become singletons."""
    return records.select("record_id").join(clusters, "record_id", "left").select(
        "record_id", F.coalesce("cluster_id", "record_id").alias("cluster_id")
    )


def labeled_pairs_from_truth(
    pairs: DataFrame, ids_with_truth: DataFrame
) -> DataFrame:
    """FIXTURES.md §5 labeled_pairs: candidate pairs labeled by truth
    clusters (is_match). These are 'labeled same-block pairs' — the
    F1>=0.99 gate population."""
    t = ids_with_truth.select("record_id", "truth_cluster")
    return (
        pairs.join(t.withColumnsRenamed({"record_id": "left_id", "truth_cluster": "tl"}), "left_id")
        .join(t.withColumnsRenamed({"record_id": "right_id", "truth_cluster": "tr"}), "right_id")
        .select(
            "left_id",
            "right_id",
            "block_key",
            (F.col("tl") == F.col("tr")).alias("is_match"),
        )
    )


def pairwise_f1_on_labeled_pairs(
    labeled: DataFrame, partition: DataFrame
) -> DataFrame:
    """Pairwise precision/recall/F1 of a predicted partition against
    labeled pairs (the north-rule acceptance metric). One row:
    (tp, fp, fn, precision, recall, f1)."""
    p = partition.select("record_id", "cluster_id")
    joined = (
        labeled.join(
            p.withColumnsRenamed({"record_id": "left_id", "cluster_id": "cl"}),
            "left_id",
        )
        .join(
            p.withColumnsRenamed({"record_id": "right_id", "cluster_id": "cr"}),
            "right_id",
        )
        .select("is_match", (F.col("cl") == F.col("cr")).alias("pred_match"))
    )
    agg = joined.agg(
        F.sum(F.when(F.col("is_match") & F.col("pred_match"), 1).otherwise(0)).alias(
            "tp"
        ),
        F.sum(
            F.when(~F.col("is_match") & F.col("pred_match"), 1).otherwise(0)
        ).alias("fp"),
        F.sum(
            F.when(F.col("is_match") & ~F.col("pred_match"), 1).otherwise(0)
        ).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(
            F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(0.0), 9
        ).alias("precision"),
        F.round(
            F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(0.0), 9
        ).alias("recall"),
        F.round(
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2.0 * F.col("tp") / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ).otherwise(0.0),
            9,
        ).alias("f1"),
    )


def run_pipeline(
    spark: SparkSession,
    transcripts: DataFrame,
    workdir: str,
    truth: DataFrame | None = None,
    match_threshold: float = 0.5,
    max_block_size: int = 64,
    resume: bool = True,
    run_id: str = "run0",
) -> dict:
    """The flagship end-to-end job. Returns a dict of DataFrames:
    collapsed, pairs, scored, clusters, plus (with truth) labeled
    pairs and the evaluation row."""
    runner = StageRunner(spark, workdir, run_id=run_id, resume=resume)

    collapsed = runner.stage(
        "collapse",
        # feature arrays (tokens/bigrams) are computed here, ONCE per
        # record, and land in the checkpoint table — pair scoring then
        # reads physical arrays (see scoring.py scale note)
        lambda: prepare_record_features(
            assign_record_ids(collapse_conversations(transcripts))
        ),
    )
    pairs = runner.stage(
        "pairs", lambda: build_candidate_pairs(collapsed, max_block_size)
    )
    scored = runner.stage(
        "scored", lambda: score_pairs(attach_pair_texts(pairs, collapsed))
    )
    clusters = runner.stage(
        "clusters",
        lambda: full_partition(collapsed, cluster_edges(scored, match_threshold)),
    )

    out = {
        "collapsed": collapsed,
        "pairs": pairs,
        "scored": scored,
        "clusters": clusters,
        "runner": runner,
    }
    if truth is not None:
        ids_truth = collapsed.select("record_id", "conv_id").join(truth, "conv_id")
        labeled = runner.stage(
            "labeled_pairs", lambda: labeled_pairs_from_truth(pairs, ids_truth)
        )
        evaluation = pairwise_f1_on_labeled_pairs(labeled, clusters)
        out["labeled_pairs"] = labeled
        out["evaluation"] = evaluation
        # reference-style whole-partition comparison: pipeline clusters
        # vs truth clusters as two resolutions over one record space
        truth_partition = ids_truth.select(
            "record_id", F.col("truth_cluster").alias("cluster_id")
        )
        out["comparison"] = M.compare_partitions(clusters, truth_partition)
    return out
