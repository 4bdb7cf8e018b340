"""entityframe_spark — a PySpark-native entity-resolution engine.

A from-scratch re-expression of the capabilities of
will-langdale/entityframe ("starlings") on idiomatic Spark:

- weighted-edge ingest → single-linkage partition hierarchies with
  fixed-point quantised thresholds (reference:
  src/rust/starlings-core/src/hierarchy/builder.rs);
- partition materialisation at any threshold (``Collection.at``);
- multi-resolution comparison metrics (pairwise P/R/F1, ARI, NMI,
  V-measure, B-cubed, entropy, per-entity Jaccard) as grouped
  DataFrame aggregations;
- the upstream record-linkage pipeline the reference assumes
  (transcript collapse, blocking, vectorized pairwise scoring,
  transitive clustering);
- large-scale training-data ops (dedup, ANN, text analysis).

Everything is pyspark.sql DataFrames + Arrow-batched pandas UDFs;
no RDDs, no per-row Python UDFs in hot paths.
"""

from entityframe_spark.core.quantize import quantize_weights, threshold_to_fp
from entityframe_spark.operators.components import connected_components
from entityframe_spark.operators.collection import Collection
from entityframe_spark.operators.entityframe import EntityFrame, col
from entityframe_spark.io.frame_store import load_frame, save_frame

__all__ = [
    "quantize_weights",
    "threshold_to_fp",
    "connected_components",
    "Collection",
    "EntityFrame",
    "col",
    "save_frame",
    "load_frame",
]

__version__ = "0.1.0"
