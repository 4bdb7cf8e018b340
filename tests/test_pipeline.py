"""North-rule pipeline: collapse -> block -> score -> cluster ->
evaluate on deterministic synthetic transcripts. Gate: pairwise F1
>= 0.99 on labeled same-block pairs; resumability; collapse
invariants."""

import shutil

import pytest
from pyspark.sql import functions as F

from entityframe_spark.pipeline.linkage import run_pipeline
from entityframe_spark.pipeline.transcripts import (
    collapse_conversations,
    synthesize_transcripts,
)


@pytest.fixture(scope="module")
def synth(spark):
    return synthesize_transcripts(spark, n_conversations=150, seed=42)


@pytest.fixture(scope="module")
def pipeline_result(spark, synth, tmp_path_factory):
    transcripts, truth = synth
    workdir = str(tmp_path_factory.mktemp("pipeline"))
    return run_pipeline(
        spark, transcripts, workdir, truth=truth, resume=False, run_id="t1"
    ), workdir


def test_collapse_preserves_turn_order_and_text(spark, synth):
    transcripts, _ = synth
    collapsed = collapse_conversations(transcripts)
    # per-turn text equality under stable turn ordering: rebuild one
    # conversation by hand and compare
    conv = "conv000000"
    turns = (
        transcripts.where(F.col("conv_id") == conv)
        .orderBy("turn_idx")
        .select("text")
        .collect()
    )
    want = "\n".join(r["text"] for r in turns)
    got = collapsed.where(F.col("conv_id") == conv).collect()[0]["full_text"]
    assert got == want
    # conversation count preserved
    assert collapsed.count() == transcripts.select("conv_id").distinct().count()


def test_pipeline_f1_gate(pipeline_result):
    result, _ = pipeline_result
    row = result["evaluation"].collect()[0]
    assert row["recall"] >= 0.99, f"recall too low: {row}"
    assert row["precision"] >= 0.99, f"precision too low: {row}"
    assert row["f1"] >= 0.99, f"F1 gate failed: {row}"


def test_blocking_recall(pipeline_result, synth):
    """Every true duplicate pair must be covered by some block."""
    result, _ = pipeline_result
    _, truth = synth
    labeled = result["labeled_pairs"]
    n_true_pairs_labeled = labeled.where("is_match").count()
    # true pairs from truth clusters: sum C(n,2)
    sizes = truth.groupBy("truth_cluster").count().collect()
    n_true_pairs = sum(r["count"] * (r["count"] - 1) // 2 for r in sizes)
    assert n_true_pairs > 0
    assert n_true_pairs_labeled >= 0.99 * n_true_pairs, (
        f"blocking missed true pairs: {n_true_pairs_labeled}/{n_true_pairs}"
    )


def test_whole_partition_comparison(pipeline_result):
    result, _ = pipeline_result
    row = result["comparison"].collect()[0]
    assert row["f1"] >= 0.95, row
    assert row["ari"] >= 0.9, row


def test_resume_skips_completed_stages(spark, synth, pipeline_result):
    transcripts, truth = synth
    _, workdir = pipeline_result
    result2 = run_pipeline(
        spark, transcripts, workdir, truth=truth, resume=True, run_id="t2"
    )
    log = result2["runner"].stage_log
    assert all(s["skipped"] for s in log), log
    row = result2["evaluation"].collect()[0]
    assert row["f1"] >= 0.99


def test_metrics_rows_written(pipeline_result):
    result, _ = pipeline_result
    m = result["runner"].metrics()
    stages = {r["stage"] for r in m.collect()}
    assert {"collapse", "pairs", "scored", "clusters"} <= stages


def test_lineage_rows_per_partition(spark, synth, pipeline_result):
    """North rule: per-PARTITION lineage rows. For each stage the
    lineage rows must sum to the stage's metrics row count, carry the
    backing data file, and not be re-appended on a resumed (skipped)
    run."""
    result, workdir = pipeline_result
    runner = result["runner"]
    lin = runner.lineage().collect()
    met = {r["stage"]: r["rows"] for r in runner.metrics().collect()}
    by_stage = {}
    for r in lin:
        by_stage.setdefault(r["stage"], []).append(r)
    for stage in ("collapse", "pairs", "scored", "clusters"):
        rows = by_stage[stage]
        assert sum(r["rows"] for r in rows) == met[stage], stage
        assert all(r["file"].startswith("file:") for r in rows), stage
        assert len({r["partition_id"] for r in rows}) == len(rows), stage
    n_before = len(lin)
    transcripts, truth = synth
    run_pipeline(spark, transcripts, workdir, truth=truth, resume=True, run_id="t3")
    assert runner.lineage().count() == n_before
