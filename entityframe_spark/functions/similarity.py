"""Pairwise string-similarity scorers (SURVEY.md F6).

The reference deliberately assumes scoring happens upstream
(docs/design/principles.md:95); the north rule pulls it in scope.
Preference order per the Spark execution model: built-in JVM
expressions (levenshtein, token ops on split arrays) > Arrow-batched
pandas UDFs (Jaro-Winkler) > never per-row Python.

All scorers take two string columns and return a similarity in [0,1].
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

TOKEN_SPLIT = r"\s+"


def levenshtein_sim(a: Column, b: Column, max_len: int = 512) -> Column:
    """Normalised Levenshtein similarity via the JVM built-in:
    1 - dist / max(len). Inputs truncated to ``max_len`` chars so the
    O(len^2) DP stays bounded on pathological rows."""
    ta, tb = F.substring(a, 1, max_len), F.substring(b, 1, max_len)
    denom = F.greatest(F.length(ta), F.length(tb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        1.0 - F.levenshtein(ta, tb) / denom
    )


def token_jaccard(a: Column, b: Column) -> Column:
    """Whitespace-token Jaccard, entirely JVM-side:
    |tokens(a) ∩ tokens(b)| / |tokens(a) ∪ tokens(b)|."""
    ta = F.array_distinct(F.split(F.trim(a), TOKEN_SPLIT))
    tb = F.array_distinct(F.split(F.trim(b), TOKEN_SPLIT))
    inter = F.size(F.array_intersect(ta, tb))
    union = F.size(F.array_union(ta, tb))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def token_containment(a: Column, b: Column) -> Column:
    """|tokens(a) ∩ tokens(b)| / min(|tokens(a)|, |tokens(b)|) —
    robust to truncation (a prefix of b scores ~1), JVM-side."""
    ta = F.array_distinct(F.split(F.trim(a), TOKEN_SPLIT))
    tb = F.array_distinct(F.split(F.trim(b), TOKEN_SPLIT))
    inter = F.size(F.array_intersect(ta, tb))
    denom = F.least(F.size(ta), F.size(tb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(inter / denom)


def _bigrams(c: Column) -> Column:
    toks = F.split(F.trim(c), TOKEN_SPLIT)
    n = F.greatest(F.size(toks) - 1, F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        )
    )


def bigram_jaccard(a: Column, b: Column) -> Column:
    """Token-bigram Jaccard, JVM-side — far more discriminative than
    unigram overlap when documents share a small vocabulary."""
    ba, bb = _bigrams(a), _bigrams(b)
    inter = F.size(F.array_intersect(ba, bb))
    union = F.size(F.array_union(ba, bb))
    return F.when(union == 0, F.lit(1.0)).otherwise(inter / union)


def bigram_containment(a: Column, b: Column) -> Column:
    ba, bb = _bigrams(a), _bigrams(b)
    inter = F.size(F.array_intersect(ba, bb))
    denom = F.least(F.size(ba), F.size(bb))
    return F.when(denom == 0, F.lit(1.0)).otherwise(inter / denom)


def _jaro(s1: str, s2: str) -> float:
    if s1 == s2:
        return 1.0
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    if window < 0:
        window = 0
    flags1 = [False] * l1
    flags2 = [False] * l2
    matches = 0
    for i, c in enumerate(s1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not flags2[j] and s2[j] == c:
                flags1[i] = flags2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: matched chars out of order
    k = 0
    transpositions = 0
    for i in range(l1):
        if flags1[i]:
            while not flags2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
    return (m / l1 + m / l2 + (m - t) / m) / 3.0


def _jaro_winkler(s1: str, s2: str, prefix_weight: float = 0.1) -> float:
    j = _jaro(s1, s2)
    if j <= 0.7:
        return j
    prefix = 0
    for c1, c2 in zip(s1[:4], s2[:4]):
        if c1 == c2:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


@F.pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched Jaro-Winkler similarity. Python per pair inside the
    batch, but transport/dispatch is vectorized (the designated slow
    path for ops Spark lacks; SURVEY.md §2.11)."""
    av = a.fillna("").to_numpy()
    bv = b.fillna("").to_numpy()
    out = np.empty(len(av), dtype=np.float64)
    for i in range(len(av)):
        out[i] = _jaro_winkler(av[i], bv[i])
    return pd.Series(out)


def jaro_winkler_sim(a: Column, b: Column, max_len: int = 128) -> Column:
    return jaro_winkler_udf(F.substring(a, 1, max_len), F.substring(b, 1, max_len))


def char_shingles(text: Column, k: int = 5, max_chars: int = 4096) -> Column:
    """k-char shingle array, JVM-side: transform over a sequence of
    start offsets. Lowercased, whitespace-normalised first."""
    norm = F.lower(F.regexp_replace(F.substring(text, 1, max_chars), r"\s+", " "))
    n = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k)))
    )


def make_lsh_band_keys_udf(
    shingle_k: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    max_chars: int = 4096,
    seed: int = 42,
):
    """Arrow-batched text -> LSH band keys, the north-rule-sanctioned
    path ("MinHash/LSH bands over text shingles computed in
    Arrow-batched pandas UDFs").

    Per batch: k-char shingles -> crc32 base hash (deterministic
    across executors, unlike Python's salted hash()) -> ``num_hashes``
    linear permutations (a_i*x + b_i mod p, vectorized in numpy) ->
    per-band minima hashed into string keys. One compact Python stage
    instead of a 32-expression codegen tree (which measurably blows up
    JVM compile time).
    """
    import zlib

    rows_per_band = num_hashes // bands
    rng = np.random.default_rng(seed)
    p = np.int64(2_147_483_647)  # Mersenne prime 2^31-1
    A = rng.integers(1, p, size=num_hashes, dtype=np.int64)
    B = rng.integers(0, p, size=num_hashes, dtype=np.int64)

    from pyspark.sql.types import ArrayType, StringType

    @F.pandas_udf(ArrayType(StringType()))
    def band_keys(text: pd.Series) -> pd.Series:
        out = []
        for t in text.fillna(""):
            t = " ".join(t[:max_chars].lower().split())
            n = len(t)
            if n <= shingle_k:
                shingles = {t}
            else:
                shingles = {t[i : i + shingle_k] for i in range(n - shingle_k + 1)}
            base = np.fromiter(
                (zlib.crc32(s.encode()) for s in shingles),
                dtype=np.int64,
                count=len(shingles),
            )
            # (num_hashes x n_shingles) linear perms; min per row
            sig = ((A[:, None] * base[None, :] + B[:, None]) % p).min(axis=1)
            keys = [
                f"b{b}:{zlib.crc32(sig[b * rows_per_band:(b + 1) * rows_per_band].tobytes())}"
                for b in range(bands)
            ]
            out.append(keys)
        return pd.Series(out)

    return band_keys


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature as array<long>, entirely JVM-side: the i-th
    hash is min over shingles of xxhash64(i, shingle). Empty shingle
    sets get hash of the empty marker."""
    sig = [
        F.array_min(
            F.transform(shingles, lambda s, i=i: F.xxhash64(F.lit(i), s))
        )
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def lsh_band_keys(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Band the signature: array of ``bands`` string keys
    'b:<band>:<hash of band slice>'. Records sharing any band key are
    LSH candidates."""
    keys = []
    for b in range(bands):
        band_slice = F.slice(signature, b * rows_per_band + 1, rows_per_band)
        keys.append(
            F.concat_ws(
                ":",
                F.lit(f"b{b}"),
                F.xxhash64(F.concat_ws(",", F.transform(band_slice, lambda x: x.cast("string")))).cast(
                    "string"
                ),
            )
        )
    return F.array(*keys)
