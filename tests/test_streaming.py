"""Streaming collapse: file-source -> session-window ordered concat ->
parquet sink, with availableNow trigger; output must match the batch
collapse per-turn text equality."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from entityframe_spark.streaming.collapse import (
    FLUSH_CONV_ID,
    TURN_SCHEMA,
    collapse_turn_stream,
    drain_turns_to_table,
)


@pytest.fixture(scope="module")
def turn_files(spark, tmp_path_factory):
    """A directory of parquet turn files (out-of-order within convs)."""
    base = datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for c in range(8):
        for t in range(4):
            rows.append(
                (
                    f"conv{c}",
                    t,
                    ["user", "assistant"][t % 2],
                    f"text c{c} turn {t}",
                    "",
                    base + timedelta(minutes=c, seconds=t),
                )
            )
    # shuffle deterministically: reverse order arrival
    rows = rows[::-1]
    path = str(tmp_path_factory.mktemp("turns"))
    spark.createDataFrame(pd.DataFrame(rows, columns=[
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ]), schema=TURN_SCHEMA).coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_stream_collapse_matches_batch(spark, turn_files, tmp_path):
    from entityframe_spark.pipeline.transcripts import collapse_conversations

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drain_turns_to_table(
        spark, turn_files, out, ckpt, watermark="1 minute", session_gap="5 minutes"
    )

    got = spark.read.parquet(out)
    batch = collapse_conversations(
        spark.read.parquet(turn_files).where(F.col("conv_id") != FLUSH_CONV_ID)
    ).select("conv_id", "n_turns", "full_text", "role_sig")

    g = {r["conv_id"]: r for r in got.collect()}
    b = {r["conv_id"]: r for r in batch.collect()}
    assert set(g) == set(b)
    for cid in b:
        assert g[cid]["n_turns"] == b[cid]["n_turns"]
        assert g[cid]["full_text"] == b[cid]["full_text"], cid  # per-turn text equality
        assert g[cid]["role_sig"] == b[cid]["role_sig"]


def test_stream_collapse_is_streaming_plan(spark, turn_files):
    stream = spark.readStream.schema(TURN_SCHEMA).parquet(turn_files)
    collapsed = collapse_turn_stream(stream)
    assert collapsed.isStreaming
