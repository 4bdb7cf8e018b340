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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one conversation turn on the wire (matches the north-rule input hint)
TURN_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

# sentinel conversation used by drain_turns_to_table to push the
# watermark past every real session; filtered out of the output
FLUSH_CONV_ID = "__efs_flush__"


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
            # flush-sentinel marker as an AGGREGATE output: a predicate
            # on the grouping key itself would be pushed below the
            # aggregation AND the EventTimeWatermark node (verified:
            # the sentinel then never advances the watermark); a
            # predicate on an aggregate column stays above.
            F.first(F.col("conv_id") == F.lit(FLUSH_CONV_ID)).alias("_is_flush"),
        )
        .where(~F.col("_is_flush"))
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
    once sink semantics (checkpointed offsets + commits).

    WATERMARK CONTRACT: append-mode session aggregation only emits a
    session once the watermark (max event time - ``watermark``) passes
    its close. With trigger_available_now the query drains the
    currently-available files and stops — sessions newer than the
    final watermark REMAIN IN STATE (they emit on a later run over the
    same checkpoint once newer events advance the watermark). For a
    finite corpus that must flush completely, use
    ``drain_turns_to_table``, which appends a far-future flush
    sentinel so every real session passes the watermark. Leave
    trigger_available_now False for a continuously-running micro-batch
    query."""
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


def drain_turns_to_table(
    spark: SparkSession,
    source_path: str,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "10 minutes",
    session_gap: str = "30 minutes",
    timeout_sec: int = 300,
) -> None:
    """Fully drain a FINITE parquet directory of turns into the
    collapsed table: every conversation emits, matching the batch
    collapse exactly (parity test in tests/test_streaming.py).

    Mechanics: append-mode session state only flushes when the
    watermark passes a session's close, and the watermark trails the
    max observed event time — so the newest sessions of a finite
    corpus would stay in state forever. This helper writes ONE flush
    sentinel turn (conv_id=FLUSH_CONV_ID) timestamped far past
    max(ts)+watermark+gap into ``source_path`` before starting the
    availableNow query; the final no-data micro-batch then evicts and
    emits every real session. The sentinel is filtered from the output
    by collapse_turn_stream and is idempotent across re-drains (same
    conv, later ts each time).

    The sentinel file is written INTO source_path (the file stream
    source lists one directory) — callers who can't tolerate an extra
    file in the input dir should copy input to a staging dir first.
    """
    batch = spark.read.schema(TURN_SCHEMA).parquet(source_path)
    max_ts = batch.agg(F.max("ts").alias("m")).collect()[0]["m"]

    def _write_sentinel(extra_hours: int) -> None:
        sentinel_ts = (
            F.lit(max_ts).cast("timestamp")
            + F.expr(f"INTERVAL {watermark}")
            + F.expr(f"INTERVAL {session_gap}")
            + F.expr(f"INTERVAL {extra_hours} HOUR")
        )
        spark.range(1).select(
            F.lit(FLUSH_CONV_ID).alias("conv_id"),
            F.lit(0).cast("int").alias("turn_idx"),
            F.lit("system").alias("role"),
            F.lit("flush").alias("text"),
            F.lit("").alias("tool"),
            sentinel_ts.alias("ts"),
        ).coalesce(1).write.mode("append").parquet(source_path)

    # TWO availableNow passes over the SAME checkpoint, each preceded
    # by a fresh sentinel (later ts each time). A sentinel advances the
    # watermark only at the END of the batch that reads it, and an
    # availableNow run with no new files executes no batch at all
    # (verified against the commit log) — so pass 1 commits the
    # advanced watermark and pass 2's sentinel forces the batch that
    # evicts + emits every real session now older than it.
    for i in range(2):
        if max_ts is not None:
            _write_sentinel(extra_hours=i + 1)
        stream = spark.readStream.schema(TURN_SCHEMA).parquet(source_path)
        q = run_stream_to_table(
            stream,
            out_path,
            checkpoint_path,
            watermark=watermark,
            session_gap=session_gap,
            trigger_available_now=True,
        )
        # ADVICE r3: awaitTermination(timeout) returns False on timeout
        # with the query STILL RUNNING — starting pass 2 then conflicts
        # on the shared checkpoint dir. Stop and raise instead.
        if not q.awaitTermination(timeout_sec):
            q.stop()
            raise TimeoutError(
                f"streaming drain pass {i + 1} did not finish within "
                f"{timeout_sec}s; query stopped (checkpoint remains valid "
                "for a re-drain)"
            )
