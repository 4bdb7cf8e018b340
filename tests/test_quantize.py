"""Fixed-point quantisation parity (reference builder.rs:39-95)."""

import pytest
from pyspark.sql import functions as F

from entityframe_spark.core.quantize import (
    PRECISION_FACTOR,
    fp_to_threshold,
    quantize_weights,
    threshold_to_fp,
)


def test_threshold_to_fp_rounding_and_clamp():
    assert threshold_to_fp(0.5) == 500_000
    assert threshold_to_fp(0.0) == 0
    assert threshold_to_fp(1.0) == PRECISION_FACTOR
    assert threshold_to_fp(1.5) == PRECISION_FACTOR  # clamp (builder.rs:44-46)
    assert threshold_to_fp(-0.3) == 0
    assert threshold_to_fp(0.50001) == 500_010
    assert threshold_to_fp(0.49999) == 499_990
    # half-up at 1e-6 resolution
    assert threshold_to_fp(0.0000005) == 1
    assert fp_to_threshold(500_000) == 0.5


def test_quantize_weights_column(spark):
    df = spark.createDataFrame(
        [(0.123456789,), (0.8,), (1.0,), (0.0,)], "weight double"
    )
    out = {r["w_fp"] for r in df.select(quantize_weights(F.col("weight"), 6)).collect()}
    assert out == {123457, 800000, 1000000, 0}
    # quantise=2: 0.123456789 behaves as 0.12 (reference builder.rs:438-451)
    out2 = sorted(
        r["w_fp"] for r in df.select(quantize_weights(F.col("weight"), 2)).collect()
    )
    assert out2 == [0, 120000, 800000, 1000000]


def test_quantise_validation():
    with pytest.raises(ValueError):
        quantize_weights(F.lit(0.5), 0)
    with pytest.raises(ValueError):
        quantize_weights(F.lit(0.5), 7)
