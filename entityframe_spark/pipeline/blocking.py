"""Blocking: candidate-pair generation without the O(n^2) cross join.

Two complementary blocking sources (upstream stage the reference
assumes, docs/design/principles.md:427-433; J4 in SURVEY.md):

1. role-tool signature keys — exact equi-join blocks, with hot-key
   salting: blocks above ``max_block_size`` are sub-split by a salt
   derived from a stable hash of the record, capping the quadratic
   pair blowup of skewed signatures (the 10^12-turn scale concern);
2. MinHash/LSH bands over collapsed-text shingles — catches
   near-duplicates whose structure differs (truncated tails), all
   JVM-side after one Arrow-batched band-keys UDF.

Candidate pairs = union of same-block pairs from both sources,
deduplicated on the canonical (min_id, max_id) ordering.

r6 plan shape (guide §2.4): pair generation is ONE groupBy(block_key)
collecting each block's member ids, a WHERE on size(ids) for the
per-source hot-block cap, and an explode of the in-JVM pair
combinations — replacing the old self-join of the keys table, which
evaluated the band-keys UDF subtree once per join side and needed a
separate per-block count aggregation broadcast back for the cap.
Same pair set, one UDF evaluation, two exchanges total.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from entityframe_spark.functions.similarity import make_lsh_band_keys_udf


def pair_combinations(sorted_ids: Column) -> Column:
    """All (x, y) combinations with x before y from an ASCENDING-sorted
    array — array<struct<left_id, right_id>>, pure JVM expressions.
    Per-row output is bounded by the caller's block-size cap
    (~cap^2/2 structs for the largest surviving block)."""
    return F.flatten(
        F.transform(
            sorted_ids,
            lambda x, i: F.transform(
                F.slice(sorted_ids, i + 2, F.size(sorted_ids)),
                lambda y: F.struct(x.alias("left_id"), y.alias("right_id")),
            ),
        )
    )


def signature_block_keys(
    collapsed: DataFrame,
    max_block_size: int = 64,
) -> DataFrame:
    """(record_id, block_key, _cap=NULL) from role-tool signatures,
    salted.

    Salting: records in a block get a deterministic salt
    xxhash64(conv_id) % n_salts where n_salts = ceil(block_size /
    max_block_size); pairs are then generated within (sig, salt)
    sub-blocks. This caps per-block pair counts at roughly
    max_block_size^2 / 2 while keeping recall for blocks under the
    cap (n_salts == 1). Hot-block recall is delegated to the LSH
    source, which keys on content rather than structure. _cap is NULL:
    salted signature blocks are never dropped outright.
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
            F.lit(None).cast("int").alias("_cap"),
        )
    )


def lsh_block_keys(
    collapsed: DataFrame,
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    max_band_size: int = 256,
) -> DataFrame:
    """(record_id, block_key, _cap) from MinHash LSH bands over
    full_text, via one Arrow-batched pandas UDF (shingle -> minhash ->
    band).

    Hot bands (> max_band_size members) are DROPPED — the cap rides
    along as the _cap column and candidate_pairs applies it on the
    grouped block (WHERE size(ids) <= cap), the LSH analogue of stop
    words: a bucket shared by thousands of records carries no
    discriminative signal and would emit O(n^2) pairs (measured: 1M
    pairs from 1.5k near-uniform records without the cap). True
    near-dupes still meet in one of the other bands with high
    probability (16 bands at 2 rows/band)."""
    udf = make_lsh_band_keys_udf(shingle_k, num_hashes, bands)
    return collapsed.select(
        "record_id",
        F.explode(udf(F.col("full_text"))).alias("block_key"),
        F.lit(int(max_band_size)).alias("_cap"),
    )


def candidate_pairs(block_keys: DataFrame) -> DataFrame:
    """Distinct canonical pairs (left_id < right_id) of records sharing
    a block key, keeping ONE witness block per pair (min block_key).

    One groupBy(block_key) collects each block's sorted member ids;
    blocks above their source's _cap (NULL = uncapped) are dropped;
    pairs explode from the in-JVM combination expression. Two
    exchanges total (block group + pair dedup) and exactly ONE
    evaluation of whatever subtree produced the keys. AQE handles
    residual imbalance; per-task memory is bounded by the caps.
    """
    if "_cap" not in block_keys.columns:
        block_keys = block_keys.withColumn("_cap", F.lit(None).cast("int"))
    grouped = block_keys.groupBy("block_key").agg(
        F.array_sort(F.collect_list("record_id")).alias("_ids"),
        F.min("_cap").alias("_cap"),
    )
    kept = grouped.where(
        F.col("_cap").isNull() | (F.size("_ids") <= F.col("_cap"))
    )
    pairs = (
        kept.select("block_key", F.explode(pair_combinations(F.col("_ids"))).alias("_p"))
        .select(F.col("_p.left_id"), F.col("_p.right_id"), "block_key")
        .where(F.col("left_id") < F.col("right_id"))
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
