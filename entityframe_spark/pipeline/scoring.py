"""Vectorized pairwise scoring of candidate pairs (SURVEY.md J5/F6).

Scale-critical design: token/bigram arrays are materialized ONCE PER
RECORD (prepare_record_features, checkpointed by the collapse stage),
then each candidate pair gets both sides' arrays via two hash joins
and scores with array intersections only. Deriving arrays inside the
per-pair expressions is a trap: Catalyst inlines the split() into
every lambda element, turning an O(tokens) feature into O(tokens^2)
string parsing per pair (measured: 20 pairs/sec vs >10k pairs/sec).

Features (all in [0,1]):
- bigram_containment / bigram_jaccard: word-order-aware, containment
  robust to truncated variants;
- token_jaccard;
- levenshtein on a bounded prefix (JVM built-in);
- Jaro-Winkler on a short prefix (Arrow-batched pandas UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.functions.similarity import (
    TOKEN_SPLIT,
    jaro_winkler_sim,
    levenshtein_sim,
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

FEATURE_COLS = ["record_id", "full_text", "toks", "grams"]


def prepare_record_features(collapsed: DataFrame, text_col: str = "full_text") -> DataFrame:
    """Add materialized token + bigram arrays per record. MUST be
    checkpointed/written before pair scoring so the arrays are
    physical, not re-derived per pair."""
    toks_raw = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    out = collapsed.withColumn("_toks_raw", toks_raw)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(F.col("_toks_raw")) - 2, F.lit(0))),
            lambda i: F.concat_ws(
                " ",
                F.element_at(F.col("_toks_raw"), i + 1),
                F.element_at(F.col("_toks_raw"), i + 2),
            ),
        )
    )
    return (
        out.withColumn("toks", F.array_distinct(F.col("_toks_raw")))
        .withColumn("grams", grams)
        .drop("_toks_raw")
    )


def attach_pair_texts(pairs: DataFrame, features: DataFrame) -> DataFrame:
    """Two equi-joins pulling both sides' text + arrays onto each pair.

    ``features`` must carry FEATURE_COLS (from
    prepare_record_features); if the array columns are missing they
    are derived here (small-input convenience path).
    """
    if "toks" not in features.columns:
        features = prepare_record_features(features).localCheckpoint(eager=False)
    sel = features.select(*FEATURE_COLS)
    left = sel.select(
        F.col("record_id").alias("left_id"),
        F.col("full_text").alias("left_text"),
        F.col("toks").alias("ltoks"),
        F.col("grams").alias("lgrams"),
    )
    right = sel.select(
        F.col("record_id").alias("right_id"),
        F.col("full_text").alias("right_text"),
        F.col("toks").alias("rtoks"),
        F.col("grams").alias("rgrams"),
    )
    return pairs.join(left, "left_id").join(right, "right_id")


def _jaccard(a, b):
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def _containment(a, b):
    inter = F.size(F.array_intersect(a, b))
    denom = F.least(F.size(a), F.size(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(inter / denom)


def score_pairs(
    pairs_with_texts: DataFrame,
    feature_weights: dict[str, float] | None = None,
    # O(len^2) DP: 256-char prefixes are 4x cheaper than 512 and the
    # feature carries only 0.15 of the weight — measured 24s -> 6s on
    # 10k pairs of ~1.1KB texts
    lev_max_len: int = 256,
    jw_max_len: int = 128,
) -> DataFrame:
    """-> (left_id, right_id, block_key, <features>, weight).
    weight = convex combination of the features."""
    w = feature_weights or DEFAULT_WEIGHTS
    lt, rt = F.col("left_text"), F.col("right_text")
    scored = pairs_with_texts.select(
        "left_id",
        "right_id",
        "block_key",
        F.round(_containment(F.col("lgrams"), F.col("rgrams")), 6).alias(
            "bigram_containment"
        ),
        F.round(_jaccard(F.col("lgrams"), F.col("rgrams")), 6).alias("bigram_jaccard"),
        F.round(_jaccard(F.col("ltoks"), F.col("rtoks")), 6).alias("token_jaccard"),
        F.round(levenshtein_sim(lt, rt, lev_max_len), 6).alias("levenshtein"),
        F.round(jaro_winkler_sim(lt, rt, jw_max_len), 6).alias("jaro_winkler"),
    )
    total = sum(w.values())
    weight = None
    for name, coef in w.items():
        term = F.col(name) * F.lit(coef / total)
        weight = term if weight is None else weight + term
    return scored.withColumn("weight", F.round(weight, 6))
