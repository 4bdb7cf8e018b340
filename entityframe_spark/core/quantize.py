"""Fixed-point weight/threshold quantisation.

The reference mandatorily quantises similarity weights to 1-6 decimal
places and does every threshold comparison in fixed point (x 10^6 u32
keys) to kill float-comparison drift (reference:
src/rust/starlings-core/src/hierarchy/builder.rs:39-95,
docs/design/principles.md:237-247). We reproduce the same semantics
with long columns: ``w_fp = half_up_round(w * 10^q) * 10^(6-q)``.

Rounding is HALF_UP (away from zero for positives) to match Rust
``f64::round``; note Python's builtin ``round`` and numpy round are
half-to-even and must NOT be used here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRECISION_FACTOR = 1_000_000  # reference builder.rs:39


def _validate_quantise(quantise: int) -> None:
    if not (1 <= int(quantise) <= 6):
        # reference builder.rs:71-76 panics outside [1, 6]
        raise ValueError(f"quantise must be in [1, 6], got {quantise}")


def quantize_weights(weight: Column, quantise: int = 6) -> Column:
    """Similarity weight in [0,1] -> fixed-point long in [0, 1_000_000].

    Spark's F.round is HALF_UP for positive inputs, matching the
    reference's f64::round (half away from zero) on [0, 1].
    """
    _validate_quantise(quantise)
    scale = 10 ** int(quantise)
    rescale = PRECISION_FACTOR // scale
    return (F.round(weight * F.lit(float(scale)), 0).cast("long") * F.lit(rescale)).alias(
        "w_fp"
    )


def threshold_to_fp(threshold: float) -> int:
    """Python-side threshold -> fixed-point key (builder.rs:44-46).

    Clamps to [0,1] then rounds half-up at 1e-6 resolution.
    """
    t = min(max(float(threshold), 0.0), 1.0)
    import math

    return int(math.floor(t * PRECISION_FACTOR + 0.5))


def fp_to_threshold(fp: int) -> float:
    """Inverse of threshold_to_fp (builder.rs:50-52)."""
    return fp / PRECISION_FACTOR
