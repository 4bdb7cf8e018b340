"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery is real and tested — schemas, partition-safe
batch iteration (mapInPandas), UDF signatures, metadata extraction —
while the actual media decode is stubbed behind DECODERS (the
image/audio libraries are not in this container). Swapping in a real
decoder is a one-function change; nothing else moves.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def synthesize_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows: payload byte j of media i is
    (i*31 + j*7) % 256 — a closed-form pattern an independent SQL
    oracle can recompute (unlike seeded PRNG bytes), so the whole
    binary->mapInPandas->feature path is value-checkable end to end.
    ``seed`` is kept for API compatibility; the pattern ignores it.
    Metadata populated per kind."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes(
            (i * 31 + j * 7) % 256 for j in range(64 + (i % 5) * 32)
        )
        rows.append(
            (
                i,
                kind,
                payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind != "audio" else None,
                48 if kind != "audio" else None,
                None if kind == "image" else 1000 + i,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_stub(payload: bytes, kind: str, strict: bool = False) -> np.ndarray:
    """STUB decoder: a real implementation would call PIL / torchaudio
    / pyav here. Deterministic fake: 8-dim feature from byte stats so
    the downstream plumbing is fully exercisable. strict=True raises
    instead (must be a closure-captured parameter, NOT a module
    global — globals don't propagate to executor python workers)."""
    if strict:
        raise NotImplementedError(
            f"real {kind} decoding requires media libraries not in this container"
        )
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return np.array(
        [
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            float(len(arr)),
            arr[: len(arr) // 2].mean() if len(arr) >= 2 else 0.0,
            arr[len(arr) // 2 :].mean() if len(arr) >= 2 else 0.0,
            float(int(arr.sum()) % 997),
        ],
        dtype=np.float32,
    )


def extract_features(
    media: DataFrame, batch_hint: int = 1024, strict: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas: batches of binary
    payloads stream through Arrow; partitioning (e.g. by kind) is
    preserved; decode failures would surface per-batch."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, k, strict)
                .tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len),
                    "feature": feats,
                }
            )

    return media.repartition("kind").mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame-sampling plan: one output row per frame timestamp
    (JVM-side sequence/explode — the expensive decode happens later in
    extract_features batches). Demonstrates explode-based fan-out for
    frame-level processing."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
