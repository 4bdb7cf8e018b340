"""Structured Streaming ingest for transcript turns (SURVEY.md §2.5
streaming row; the reference is batch-only — this is the Spark-native
extension the 10^12-turn pipeline needs for continuous arrival).

Turns arrive unordered on a stream; a watermark bounds lateness and a
session window closes a conversation after ``gap`` of inactivity.
The collapse itself is the SAME ordered-concat semantics as the batch
``collapse_conversations`` (stable (ts, turn_idx) ordering preserving
per-turn text equality), so a conversation collapsed on the stream
hashes identically to the batch result — verified in
tests/test_streaming.py.

Everything is built-in stateful aggregation (watermark +
session_window + collect_list): no applyInPandasWithState needed
because ordered-concat is expressible as an aggregate over the closed
session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one conversation turn on the wire (matches the north-rule input hint)
TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def collapse_turn_stream(
    turns: DataFrame,
    watermark: str = "10 minutes",
    session_gap: str = "30 minutes",
) -> DataFrame:
    """Streaming conversation collapse.

    turns: a STREAMING DataFrame with TURN_SCHEMA columns.
    Returns a streaming DataFrame (conv_id, n_turns, full_text,
    role_sig, session_start, session_end) that emits one row per
    (conversation, session) once the watermark passes the session gap
    (append mode compatible).

    Ordering and signature are IDENTICAL to the batch
    collapse_conversations: turns sort by turn_idx (stable turn
    ordering) and role_sig is the sorted distinct set of "role:tool"
    strings — a conversation fully contained in one session collapses
    to the same row as the batch path.
    """
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", "text", "role", "tool"))
    )
    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id", F.session_window("ts", session_gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_turns"),
            F.concat_ws("\n", ordered.getField("text")).alias("full_text"),
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_set(F.concat_ws(":", F.col("role"), F.col("tool")))
                ),
            ).alias("role_sig"),
        )
        .select(
            "conv_id",
            "n_turns",
            "full_text",
            "role_sig",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
        )
    )


def run_stream_to_table(
    turns_stream: DataFrame,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
    session_gap: str = "30 minutes",
    trigger_available_now: bool = True,
):
    """Drive the streaming collapse into a parquet table with exactly-
    once sink semantics (checkpointed offsets + commits). With
    trigger_available_now the query drains what is currently available
    and stops — the batch-compatible ingest mode the tests use; leave
    False for a continuously-running micro-batch query."""
    collapsed = collapse_turn_stream(turns_stream, watermark, session_gap)
    writer = (
        collapsed.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
