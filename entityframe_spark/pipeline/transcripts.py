"""Transcript input: deterministic synthesis + conversation collapse.

Input shape per BASELINE.json input_hint: Iceberg/Parquet table
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). The synthesiser plants exact + near-duplicate
conversations with a known truth clustering, plus a hot role-tool
signature covering ~20% of conversations to exercise skew handling.

Collapse: window-ordered turn concatenation under stable turn_idx
ordering — the per-row invariant is per-turn text equality, so the
collapsed form is a loss-free ordered join of the raw turn texts.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_VOCAB = (
    "please run the query check status deploy service restart log error retry "
    "update config cluster node job batch stream table join filter group sort "
    "merge window agree confirm cancel schedule report metric alert user data"
).split()

_TOOLS = ["search", "calculator", "browser", "db_query", "code_exec", ""]

_SYNONYMS = {
    "please": "kindly",
    "run": "execute",
    "check": "verify",
    "error": "failure",
    "update": "refresh",
    "report": "summary",
}


def synthesize_transcripts(
    spark: SparkSession,
    n_conversations: int = 200,
    seed: int = 42,
    dup_fraction: float = 0.4,
    hot_signature_fraction: float = 0.2,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic transcripts + truth.

    Returns (transcripts, truth) where transcripts matches
    TRANSCRIPT_SCHEMA and truth is (conv_id string, truth_cluster
    long). Near-duplicate variants (synonym swap / whitespace /
    truncated tail) and exact copies share the base's truth cluster.
    """
    rng = random.Random(seed)
    base_ts = datetime(2024, 1, 1)
    rows: list[tuple] = []
    truth: list[tuple[str, int]] = []

    hot_pattern = [("user", ""), ("assistant", "db_query"), ("assistant", "")]

    for i in range(n_conversations):
        conv_id = f"conv{i:06d}"
        n_turns = rng.randint(2, 6)
        hot = rng.random() < hot_signature_fraction
        turns = []
        for t in range(n_turns):
            if hot:
                role, tool = hot_pattern[t % len(hot_pattern)]
            else:
                role = ["user", "assistant", "tool"][t % 3]
                tool = rng.choice(_TOOLS) if role != "user" else ""
            text = " ".join(rng.choice(_VOCAB) for _ in range(rng.randint(5, 14)))
            turns.append((t, role, text, tool))
        truth_id = len(truth)
        truth.append((conv_id, truth_id))
        for t, role, text, tool in turns:
            rows.append(
                (conv_id, t, role, text, tool, base_ts + timedelta(minutes=i, seconds=t))
            )

        if rng.random() < dup_fraction:
            n_variants = rng.randint(1, 2)
            for v in range(n_variants):
                vid = f"{conv_id}_v{v}"
                truth.append((vid, truth_id))
                kind = rng.choice(["exact", "synonym", "whitespace", "truncate"])
                vturns = list(turns)
                if kind == "truncate" and len(vturns) > 2:
                    vturns = vturns[:-1]
                for t, role, text, tool in vturns:
                    vtext = text
                    if kind == "synonym":
                        toks = vtext.split()
                        for k, tok in enumerate(toks):
                            if tok in _SYNONYMS and rng.random() < 0.5:
                                toks[k] = _SYNONYMS[tok]
                        vtext = " ".join(toks)
                    elif kind == "whitespace":
                        vtext = "  ".join(vtext.split(" "))
                    rows.append(
                        (
                            vid,
                            t,
                            role,
                            vtext,
                            tool,
                            base_ts + timedelta(minutes=i, seconds=60 + t),
                        )
                    )

    transcripts = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        ),
        schema=TRANSCRIPT_SCHEMA,
    )
    truth_df = spark.createDataFrame(
        pd.DataFrame(truth, columns=["conv_id", "truth_cluster"]),
        schema="conv_id string, truth_cluster long",
    )
    return transcripts, truth_df


def collapse_conversations(transcripts: DataFrame) -> DataFrame:
    """Window-ordered turn concatenation (SURVEY.md §2.5): one row per
    conversation with the full ordered text, plus the role-tool
    signature columns blocking uses.

    Implemented as a single groupBy (map-side combinable) — the
    sort_array(collect_list(struct(turn_idx, ...))) idiom gives stable
    turn ordering without a window shuffle per row. Per-turn text is
    embedded verbatim (per-row invariant: per-turn text equality).
    Returns (conv_id, n_turns, full_text, role_sig, first_ts).
    """
    ordered = F.array_sort(
        F.collect_list(F.struct("turn_idx", "text", "role", "tool"))
    )
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.concat_ws("\n", ordered.getField("text")).alias("full_text"),
        # signature: distinct sorted role:tool pairs — robust to
        # truncated-tail near-dupes, cheap equi-join blocking key
        F.concat_ws(
            "|",
            F.array_sort(
                F.collect_set(F.concat_ws(":", F.col("role"), F.col("tool")))
            ),
        ).alias("role_sig"),
        F.min("ts").alias("first_ts"),
    )
