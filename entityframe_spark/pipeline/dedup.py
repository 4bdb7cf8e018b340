"""Document deduplication at training-data scale.

Exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard and
embedding-cosine near-dup — first-class operators for the 100 TB
pipeline this engine feeds. Everything returns DataFrames; near-dup
detectors emit candidate pairs (left/right doc ids + score) so the
clustering core (connected components) can fold them into dedup
groups.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StringType

from entityframe_spark.functions.similarity import make_lsh_band_keys_udf
from entityframe_spark.operators.components import connected_components


def _ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the input arrives in fewer
    partitions than the cluster has slots (guide §2.5 input-skew fix:
    one small/unsplittable file otherwise serialises the whole
    Arrow-UDF stage into one task — measured 1.3s single-task vs
    ~0.3s spread for the 5k-doc band-keys pass). No-op (and no
    shuffle) for healthily partitioned inputs."""
    par = df.sparkSession.sparkContext.defaultParallelism
    try:
        n_in = df.rdd.getNumPartitions()
    except Exception:
        return df
    return df.repartition(par) if n_in < par else df


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup via content hash: one hash + one groupBy, fully
    JVM-side. Returns (text_hash, dup_count, doc_ids sorted,
    keep_id=min) for groups with >1 member."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.count(F.lit(1)).alias("dup_count"),
            F.array_sort(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("dup_count") > 1)
    )


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 5,
    num_hashes: int = 64,
    bands: int = 8,
    max_band_size: int = 256,
) -> DataFrame:
    """Near-dup candidate pairs via MinHash/LSH banding (the scale
    path: |bands| keys per doc, self-join per band — no O(n^2)).
    Returns (left_id, right_id) distinct canonical pairs.

    Hot bands (> max_band_size members) are DROPPED, same as
    blocking.lsh_block_keys: a band bucket shared by hundreds of docs
    carries no near-dup signal and emits O(band^2) pairs (measured:
    one 492-member band -> 121k pairs from 5k docs). True near-dups
    still collide in another of the ``bands`` bands w.h.p.

    Default banding is 8 bands x 8 rows: near-DUPLICATES have shingle
    jaccard >= ~0.85, where recall is >99%, while j=0.5 impostors
    collide <3% (measured: 4-row bands emitted 283k candidates from
    5k docs of which 256 verified — 1000x false-positive work)."""
    from entityframe_spark.pipeline.blocking import pair_combinations

    udf = make_lsh_band_keys_udf(shingle_k, num_hashes, bands)
    docs = _ensure_parallelism(docs)
    keys = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(udf(F.col(text_col))).alias("block_key"),
    )
    # r6 (guide §2.4): group each band to one row, apply the hot-band
    # cap as WHERE size(ids) <= cap, and explode the in-JVM pair
    # combinations — replacing the keys self-join, which evaluated the
    # band-keys UDF subtree once per join side (plus once for the size
    # aggregation) and re-ran the whole chain concurrently inside the
    # first job that materialised it (measured: bench q4 8.9s -> 0.8s).
    # Same pair set; ONE UDF evaluation; no checkpoint needed.
    grouped = keys.groupBy("block_key").agg(
        F.array_sort(F.collect_list("doc_id")).alias("_ids")
    )
    return (
        grouped.where(F.size("_ids") <= F.lit(int(max_band_size)))
        .select(F.explode(pair_combinations(F.col("_ids"))).alias("_p"))
        .select(F.col("_p.left_id"), F.col("_p.right_id"))
        .where(F.col("left_id") < F.col("right_id"))
        .distinct()
    )


def make_simhash_udf(bits: int = 64, seed: int = 42):
    """SimHash over whitespace tokens as an Arrow-batched pandas UDF.

    Token base hash = crc32 (process-stable); each token votes its
    bit pattern weighted +1/-1; the signature is the sign vector
    packed into a long. Near-dups differ in few bits (hamming)."""

    bit_idx = np.arange(bits, dtype=np.uint64)

    @F.pandas_udf(LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text.fillna("")):
            toks = t.lower().split()
            if not toks:
                continue
            # crc32 per token (C-speed); all bit math vectorized:
            # (n_tok x bits) bit matrix -> per-bit vote sum -> sign pack
            h = np.fromiter(
                (
                    zlib.crc32(tok.encode())
                    | (zlib.crc32((tok + "#").encode()) << 32)
                    for tok in toks
                ),
                dtype=np.uint64,
                count=len(toks),
            )
            ones = ((h[:, None] >> bit_idx[None, :]) & np.uint64(1)).sum(axis=0)
            # vote = ones - zeros = 2*ones - n; bit set iff vote > 0
            sig_bits = (2 * ones.astype(np.int64) - len(toks)) > 0
            sig = int((sig_bits.astype(np.uint64) << bit_idx).sum(dtype=np.uint64))
            # pack into signed int64
            out[i] = sig - (1 << 64) if sig >= (1 << 63) else sig
        return pd.Series(out)

    return simhash


def simhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    band_bits: int = 16,
    max_band_size: int = 256,
) -> DataFrame:
    """SimHash near-dup candidates: docs sharing any 16-bit band of
    their 64-bit signature (guarantees recall for hamming distance
    <= 3 by pigeonhole). Returns (left_id, right_id, hamming).

    Hot bands (> max_band_size members) are DROPPED, exactly like
    minhash_lsh_candidates: low-entropy corpora (empty / boilerplate
    docs) share band values by the thousands and the band self-join
    goes quadratic without the cap. True near-dups still collide in
    another band w.h.p. (4 independent 16-bit bands)."""
    sim = make_simhash_udf()
    sigs = _ensure_parallelism(docs).select(
        F.col(id_col).alias("doc_id"), sim(F.col(text_col)).alias("simhash")
    )
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    bandkeys = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.lit(str(b)),
                        F.shiftrightunsigned(F.col("simhash"), b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .cast("string"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band"),
    )
    # r6 (guide §2.4): same grouped-band pair generation as
    # minhash_lsh_candidates — one groupBy(band) collecting
    # (doc_id, simhash) structs, the hot-band cap as WHERE size <= cap,
    # pairs + hamming from the in-JVM combination explode. Replaces the
    # band self-join + separate size aggregation; the simhash UDF now
    # has exactly one consumer, so both checkpoints are gone. array_sort
    # on struct arrays orders by the first field (doc_id), so pairs come
    # out canonical (left < right) exactly as the old join's predicate.
    members = F.array_sort(
        F.collect_list(F.struct(F.col("doc_id"), F.col("simhash")))
    )
    grouped = bandkeys.groupBy("band").agg(members.alias("_ms"))
    combos = F.flatten(
        F.transform(
            F.col("_ms"),
            lambda x, i: F.transform(
                F.slice(F.col("_ms"), i + 2, F.size(F.col("_ms"))),
                lambda y: F.struct(
                    x["doc_id"].alias("left_id"),
                    y["doc_id"].alias("right_id"),
                    F.bit_count(
                        x["simhash"].bitwiseXOR(y["simhash"])
                    ).alias("hamming"),
                ),
            ),
        )
    )
    return (
        grouped.where(F.size("_ms") <= F.lit(int(max_band_size)))
        .select(F.explode(combos).alias("_p"))
        .select("_p.left_id", "_p.right_id", "_p.hamming")
        .where(F.col("left_id") < F.col("right_id"))
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.8,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Word n-gram Jaccard near-dup pairs. With candidate_pairs
    (e.g. from LSH) it verifies candidates; without, it brute-forces
    the cross join — only for small doc sets / oracle parity.
    Returns (left_id, right_id, jaccard)."""
    # r6: tokenize into a NAMED projection first. Written inline, the
    # split(lower(trim(text))) expression is re-evaluated by Catalyst
    # at every reference — size(), the sequence bound, and 3x
    # try_element_at PER GRAM element — i.e. O(grams * n) regex splits
    # per doc (measured 7.7s -> 0.35s for 5k docs). As a multi-
    # referenced non-cheap alias, CollapseProject keeps it evaluated
    # once.
    toks = F.col("_toks")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            # try_element_at: short docs (<n tokens) emit one truncated
            # gram (NULLs dropped by concat_ws) — matches the DuckDB
            # oracle's clamped toks[i:i+n-1] slice — instead of raising
            # under ANSI mode
            lambda i: F.concat_ws(
                " ", *[F.try_element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
    g = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_toks"),
    ).select("doc_id", grams.alias("grams"))
    if candidate_pairs is not None:
        # the candidate table is referenced twice below (id prune +
        # pair join); materialise it ONCE up front. A lazy checkpoint
        # is not enough: inside the FIRST job that computes the plan,
        # every reference races to evaluate the (often expensive)
        # candidate subtree concurrently — measured as the dominant
        # cost of bench q4 before r6 (the LSH chain ran ~3x in one job)
        candidate_pairs = candidate_pairs.localCheckpoint(eager=True)
        # only docs that appear in a candidate pair need gram arrays —
        # a semi-join prunes the (usually much larger) rest before the
        # expensive tokenise/shingle projection runs. explode instead
        # of a two-branch union: ONE reference to the candidate table
        cand_ids = candidate_pairs.select(
            F.explode(F.array("left_id", "right_id")).alias("doc_id")
        ).dropDuplicates(["doc_id"])
        g = g.join(cand_ids, "doc_id", "left_semi")
    # consumed by both join sides: EAGER checkpoint so the gram arrays
    # are derived once per doc, not once per join side racing within
    # the first downstream job (same reasoning as above)
    g = g.localCheckpoint(eager=True)
    if candidate_pairs is not None:
        pairs = (
            candidate_pairs.join(
                g.withColumnsRenamed({"doc_id": "left_id", "grams": "lg"}), "left_id"
            ).join(
                g.withColumnsRenamed({"doc_id": "right_id", "grams": "rg"}), "right_id"
            )
        )
    else:
        l = g.withColumnsRenamed({"doc_id": "left_id", "grams": "lg"})
        r = g.withColumnsRenamed({"doc_id": "right_id", "grams": "rg"})
        pairs = l.crossJoin(r).where(F.col("left_id") < F.col("right_id"))
    inter = F.size(F.array_intersect("lg", "rg"))
    union = F.size(F.array_union("lg", "rg"))
    jac = F.when(union == 0, F.lit(1.0)).otherwise(inter / union)
    return (
        pairs.select(
            "left_id", "right_id", F.round(jac, 6).alias("jaccard")
        ).where(F.col("jaccard") >= F.lit(min_jaccard))
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    candidate_pairs: DataFrame | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs. Brute force without
    candidates (small sets / oracle); with candidates it verifies.
    Cosine computed JVM-side via F.zip_with + F.aggregate in double."""
    v = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("vec"),
    )
    if candidate_pairs is None:
        l = v.withColumnsRenamed({"vec_id": "left_id", "vec": "lv"})
        r = v.withColumnsRenamed({"vec_id": "right_id", "vec": "rv"})
        pairs = l.crossJoin(r).where(F.col("left_id") < F.col("right_id"))
    else:
        pairs = (
            candidate_pairs.join(
                v.withColumnsRenamed({"vec_id": "left_id", "vec": "lv"}), "left_id"
            ).join(v.withColumnsRenamed({"vec_id": "right_id", "vec": "rv"}), "right_id")
        )
    cos = cosine_expr(F.col("lv"), F.col("rv"))
    return pairs.select(
        "left_id", "right_id", F.round(cos, 6).alias("cosine")
    ).where(F.col("cosine") >= F.lit(min_cosine))


def cosine_expr(a, b):
    """dot(a,b)/(|a||b|) as pure Column expressions (double)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def dedup_groups(pairs: DataFrame) -> DataFrame:
    """Fold near-dup pairs into groups via connected components:
    (doc_id, group_id=min doc id of the group)."""
    # CC probes + traverses its input several times; cut the (often
    # expensive verify-join) lineage so it computes once
    pairs = pairs.localCheckpoint(eager=False)
    return connected_components(pairs, "left_id", "right_id").withColumnsRenamed(
        {"node": "doc_id", "component": "group_id"}
    )
