"""Vectorized pairwise scoring of candidate pairs (SURVEY.md J5/F6).

Each candidate pair gets both records' texts attached via two hash
joins, then similarity features computed with JVM built-ins
(token-Jaccard, normalised Levenshtein) plus an Arrow-batched
Jaro-Winkler on a short prefix. The combined weight is a fixed convex
blend in [0,1] feeding the edge-based clustering core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.functions.similarity import (
    bigram_containment,
    bigram_jaccard,
    jaro_winkler_sim,
    levenshtein_sim,
    token_jaccard,
)

# bigram containment dominates: near-dupes (synonym swaps, whitespace,
# truncated tails) keep almost all bigrams of the shorter side, while
# unrelated texts sharing vocabulary do not share word ORDER
DEFAULT_WEIGHTS = {
    "bigram_containment": 0.35,
    "bigram_jaccard": 0.2,
    "token_jaccard": 0.15,
    "levenshtein": 0.15,
    "jaro_winkler": 0.15,
}


def attach_pair_texts(pairs: DataFrame, collapsed_with_ids: DataFrame) -> DataFrame:
    """Two equi-joins to pull both sides' full_text onto each pair."""
    txt = collapsed_with_ids.select("record_id", "full_text")
    return (
        pairs.join(
            txt.withColumnsRenamed({"record_id": "left_id", "full_text": "left_text"}),
            "left_id",
        )
        .join(
            txt.withColumnsRenamed(
                {"record_id": "right_id", "full_text": "right_text"}
            ),
            "right_id",
        )
    )


def score_pairs(
    pairs_with_texts: DataFrame,
    feature_weights: dict[str, float] | None = None,
    lev_max_len: int = 512,
    jw_max_len: int = 128,
) -> DataFrame:
    """-> (left_id, right_id, block_key, token_jaccard, levenshtein,
    jaro_winkler, weight). All features in [0,1]; weight is their
    convex combination."""
    w = feature_weights or DEFAULT_WEIGHTS
    lt, rt = F.col("left_text"), F.col("right_text")
    scored = pairs_with_texts.select(
        "left_id",
        "right_id",
        "block_key",
        F.round(bigram_containment(lt, rt), 6).alias("bigram_containment"),
        F.round(bigram_jaccard(lt, rt), 6).alias("bigram_jaccard"),
        F.round(token_jaccard(lt, rt), 6).alias("token_jaccard"),
        F.round(levenshtein_sim(lt, rt, lev_max_len), 6).alias("levenshtein"),
        F.round(jaro_winkler_sim(lt, rt, jw_max_len), 6).alias("jaro_winkler"),
    )
    total = sum(w.values())
    weight = None
    for name, coef in w.items():
        term = F.col(name) * F.lit(coef / total)
        weight = term if weight is None else weight + term
    return scored.withColumn("weight", F.round(weight, 6))
