"""Blocking: candidate-pair generation without the O(n^2) cross join.

Two complementary blocking sources (upstream stage the reference
assumes, docs/design/principles.md:427-433; J4 in SURVEY.md):

1. role-tool signature keys — exact equi-join blocks, with hot-key
   salting: blocks above ``max_block_size`` are sub-split by a salt
   derived from a stable hash of the record, capping the quadratic
   pair blowup of skewed signatures (the 10^12-turn scale concern);
2. MinHash/LSH bands over collapsed-text shingles — catches
   near-duplicates whose structure differs (truncated tails), all
   JVM-side (xxhash64 + array ops; no Python in the path).

Candidate pairs = union of same-block pairs from both sources,
deduplicated on the canonical (min_id, max_id) ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.functions.similarity import make_lsh_band_keys_udf


def signature_block_keys(
    collapsed: DataFrame,
    max_block_size: int = 64,
) -> DataFrame:
    """(record_id, block_key) from role-tool signatures, salted.

    Salting: records in a block get a deterministic salt
    xxhash64(conv_id) % n_salts where n_salts = ceil(block_size /
    max_block_size); pairs are then generated within (sig, salt)
    sub-blocks. This caps per-block pair counts at roughly
    max_block_size^2 / 2 while keeping recall for blocks under the
    cap (n_salts == 1). Hot-block recall is delegated to the LSH
    source, which keys on content rather than structure.
    """
    sizes = collapsed.groupBy("role_sig").agg(F.count(F.lit(1)).alias("_bsz"))
    return (
        collapsed.join(F.broadcast(sizes), "role_sig")
        .select(
            "record_id",
            F.concat_ws(
                "#",
                F.lit("sig"),
                F.col("role_sig"),
                (
                    F.pmod(
                        F.xxhash64("conv_id"),
                        F.greatest(
                            F.ceil(F.col("_bsz") / F.lit(max_block_size)), F.lit(1)
                        ),
                    )
                ).cast("string"),
            ).alias("block_key"),
        )
    )


def lsh_block_keys(
    collapsed: DataFrame,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    max_band_size: int = 256,
) -> DataFrame:
    """(record_id, block_key) from MinHash LSH bands over full_text,
    via one Arrow-batched pandas UDF (shingle -> minhash -> band).

    Hot bands (> max_band_size members) are DROPPED, the LSH analogue
    of stop words: a bucket shared by thousands of records carries no
    discriminative signal and would emit O(n^2) pairs (measured: 1M
    pairs from 1.5k near-uniform records without the cap). True
    near-dupes still meet in one of the other bands with high
    probability (16 bands at 2 rows/band)."""
    udf = make_lsh_band_keys_udf(shingle_k, num_hashes, bands)
    keys = collapsed.select(
        "record_id", F.explode(udf(F.col("full_text"))).alias("block_key")
    )
    # three consumers (sizes agg + both self-join sides): checkpoint so
    # the pandas UDF evaluates once, not three times
    keys = keys.localCheckpoint(eager=False)
    # no broadcast hint: the distinct-band table scales with the data
    # (most bands are small); AQE picks the strategy
    sizes = keys.groupBy("block_key").agg(F.count(F.lit(1)).alias("_bsz"))
    return (
        keys.join(sizes.where(F.col("_bsz") <= max_band_size), "block_key")
        .select("record_id", "block_key")
    )


def candidate_pairs(block_keys: DataFrame) -> DataFrame:
    """Self-join within block keys -> distinct canonical pairs
    (left_id < right_id). One shuffle on block_key; AQE skew-join
    handles residual imbalance. Returns (left_id, right_id,
    block_key) keeping ONE witness block per pair."""
    l = block_keys.alias("l")
    r = block_keys.alias("r")
    pairs = (
        l.join(r, "block_key")
        .where(F.col("l.record_id") < F.col("r.record_id"))
        .select(
            F.col("l.record_id").alias("left_id"),
            F.col("r.record_id").alias("right_id"),
            F.col("block_key"),
        )
    )
    return pairs.groupBy("left_id", "right_id").agg(
        F.min("block_key").alias("block_key")
    )


def build_candidate_pairs(
    collapsed_with_ids: DataFrame,
    max_block_size: int = 64,
    use_lsh: bool = True,
    use_signature: bool = True,
) -> DataFrame:
    """Union of both blocking sources -> deduped candidate pairs.

    collapsed_with_ids must carry (record_id, conv_id, full_text,
    role_sig)."""
    sources = []
    if use_signature:
        sources.append(signature_block_keys(collapsed_with_ids, max_block_size))
    if use_lsh:
        sources.append(lsh_block_keys(collapsed_with_ids))
    keys = sources[0]
    for s in sources[1:]:
        keys = keys.unionByName(s)
    return candidate_pairs(keys)
