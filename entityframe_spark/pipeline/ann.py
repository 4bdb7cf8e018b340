"""Approximate nearest-neighbour search over embedding columns.

Baseline: brute-force cosine top-k (one scan, JVM-side vector math —
correct at any scale but O(n) per query). Scale path: LSH bucketing
via random-hyperplane signs (deterministic planes from a seeded RNG)
so each query probes only its bucket (+ optional multi-probe of
neighbouring buckets).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from entityframe_spark.pipeline.dedup import cosine_expr


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_ids: tuple[int, ...] = (),
) -> DataFrame:
    """Exact top-k by cosine: one projection + orderBy + limit.
    Ties broken by vec_id ascending for determinism."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(
            cosine_expr(F.col(vec_col).cast("array<double>"), q), 6
        ).alias("cosine"),
    )
    if exclude_ids:
        scored = scored.where(~F.col("vec_id").isin(list(exclude_ids)))
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def make_hyperplane_bucket_udf(dim: int, n_planes: int = 12, seed: int = 42):
    """vec -> LSH bucket key: sign pattern under ``n_planes`` random
    hyperplanes, Arrow-batched (numpy matmul per batch)."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))

    @F.pandas_udf(StringType())
    def bucket(vecs: pd.Series) -> pd.Series:
        mat = np.vstack(vecs.to_numpy())
        signs = (mat @ planes) >= 0
        # pack boolean sign rows into hex strings
        return pd.Series(
            ["".join("1" if s else "0" for s in row) for row in signs]
        )

    return bucket


def lsh_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only the query's hyperplane bucket.

    At 100 TB the bucketed table is written partitioned by bucket key
    so a query reads one partition (partition pruning); here the
    filter plays that role. Recall can be raised with multi-probe
    (flip one bit) — left as the bucket-key union of hamming-1 keys.
    """
    dim = len(query_vec)
    bucket = make_hyperplane_bucket_udf(dim, n_planes, seed)
    tagged = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    qsigns = (np.asarray(query_vec) @ planes) >= 0
    qkey = "".join("1" if s else "0" for s in qsigns)
    # multi-probe: query bucket + all hamming-1 neighbours
    probes = [qkey] + [
        qkey[:i] + ("0" if qkey[i] == "1" else "1") + qkey[i + 1 :]
        for i in range(n_planes)
    ]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        tagged.where(F.col("bucket").isin(probes))
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("vec").cast("array<double>"), q), 6).alias(
                "cosine"
            ),
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
