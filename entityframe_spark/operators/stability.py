"""Stability, lifetime, and information-theoretic hierarchy metrics.

SURVEY.md A13/A14 — the reference's "unique to hierarchical
representation" metric family (docs/design/principles.md:334-339):

- entity lifetime   L(e) = (t_start, t_end) the entity exists for
- merge criticality C(m) = |E_left| x |E_right|
- stability score   S(t1,t2) = |P(t1) ∩ P(t2)| / |P(t1) ∪ P(t2)|
- information content I(H) = -Σ_m log2 P(m) and relative loss
  L(t) = 1 - I(H_{>=t}) / I(H) (principles.md:368-380)

All are DataFrame expressions over the grid memberships / sized merge
events the engine already produces — no new shuffles beyond one
groupBy each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.operators.hierarchy import memberships_for_grid


def _entity_signatures(memberships: DataFrame) -> DataFrame:
    """(threshold_fp, cluster_id) -> deterministic signature of the
    member set: sha256 over comma-joined sorted member ids. Same set =>
    same signature at any threshold."""
    return memberships.groupBy("threshold_fp", "cluster_id").agg(
        F.sha2(
            F.concat_ws(
                ",",
                F.array_sort(F.collect_list(F.col("record_id").cast("string"))),
            ),
            256,
        ).alias("members_sig"),
        F.count(F.lit(1)).alias("entity_size"),
    )


def entity_lifetime(
    merge_edges: DataFrame,
    records: DataFrame,
    thresholds_fp: list[int],
) -> DataFrame:
    """A13 entity lifetime over a threshold grid: for each distinct
    entity (exact member set, keyed by its min-id cluster_id +
    signature), the first and last grid threshold at which it exists
    (principles.md:336: L(e) = {(t_start, t_end)}).

    Returns (cluster_id, members_sig, entity_size, t_start_fp,
    t_end_fp, lifetime_points). Grid semantics: lifetimes are measured
    on the supplied grid, the same resolution the reference's sweep
    uses; t_start >= t_end since partitions coarsen as t falls.
    """
    mem = memberships_for_grid(merge_edges, records, thresholds_fp)
    sig = _entity_signatures(mem)
    return sig.groupBy("cluster_id", "members_sig").agg(
        F.first("entity_size").alias("entity_size"),
        F.max("threshold_fp").alias("t_start_fp"),
        F.min("threshold_fp").alias("t_end_fp"),
        F.count(F.lit(1)).alias("lifetime_points"),
    )


def stability_score(
    merge_edges: DataFrame,
    records: DataFrame,
    t1_fp: int,
    t2_fp: int,
) -> DataFrame:
    """A13 stability S(t1,t2) = |P(t1) ∩ P(t2)| / |P(t1) ∪ P(t2)|
    where partitions are compared as SETS OF ENTITIES (identical member
    sets; principles.md:338). One grid pass + one aggregation.

    Returns one row (common_entities, total_entities, stability).
    """
    mem = memberships_for_grid(merge_edges, records, [int(t1_fp), int(t2_fp)])
    sig = _entity_signatures(mem)
    if int(t1_fp) == int(t2_fp):
        # identical cuts: every entity is common by definition
        return sig.agg(
            F.count(F.lit(1)).alias("common_entities"),
            F.count(F.lit(1)).alias("total_entities"),
            F.lit(1.0).alias("stability"),
        )
    per_sig = sig.groupBy("members_sig").agg(
        F.countDistinct("threshold_fp").alias("n_t")
    )
    return per_sig.agg(
        F.coalesce(F.sum(F.when(F.col("n_t") == 2, 1)), F.lit(0)).alias(
            "common_entities"
        ),
        F.count(F.lit(1)).alias("total_entities"),
        F.round(
            F.coalesce(F.sum(F.when(F.col("n_t") == 2, 1)), F.lit(0))
            / F.count(F.lit(1)),
            9,
        ).alias("stability"),
    )


def merge_criticality(merge_events_sized: DataFrame) -> DataFrame:
    """A13 merge criticality C(m) = |E_left| x |E_right| — the number
    of cross-pairs each merge decides (principles.md:337). Input is
    build_merge_edges_sized output; adds ``criticality`` and the
    merged entity size."""
    return merge_events_sized.select(
        "threshold_fp",
        "child",
        "parent",
        "left_size",
        "right_size",
        (F.col("left_size") * F.col("right_size")).alias("criticality"),
        (F.col("left_size") + F.col("right_size")).alias("merged_size"),
    )


def information_content(merge_events_sized: DataFrame) -> DataFrame:
    """A14 information content of the hierarchy and per-threshold
    relative information loss (principles.md:368-380).

    The reference gives the skeleton I(H) = -Σ_m log2 P(m) without
    fixing P(m); we take P(m) = (|E_l| x |E_r|) / C(n,2) — the fraction
    of all record pairs this merge joins — so rare, surgical merges
    carry more information than giant agglomerations.

    Returns per distinct merge threshold: (threshold_fp, i_cum = I of
    merges with threshold >= t, info_loss = 1 - i_cum / I(H)). The
    rows with the largest info_loss JUMPS mark unstable regions.
    """
    sized = merge_events_sized.localCheckpoint(eager=False)
    # n = records participating in the hierarchy (distinct endpoints);
    # isolates carry no merges so they contribute no information
    n = (
        sized.select(F.col("child").alias("r"))
        .unionAll(sized.select(F.col("parent").alias("r")))
        .distinct()
        .count()
    )
    n_pairs = max(n * (n - 1) / 2.0, 1.0)
    per = sized.select(
        "threshold_fp",
        (-(F.log2((F.col("left_size") * F.col("right_size")) / F.lit(n_pairs)))).alias(
            "i_m"
        ),
    )
    by_t = per.groupBy("threshold_fp").agg(F.sum("i_m").alias("i_t"))
    from pyspark.sql import Window

    w = Window.orderBy(F.col("threshold_fp").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = per.agg(F.sum("i_m").alias("i_h")).collect()[0]["i_h"] or 0.0
    return by_t.select(
        "threshold_fp",
        F.round(F.sum("i_t").over(w), 9).alias("i_cum"),
        F.round(1.0 - F.sum("i_t").over(w) / F.lit(float(total)), 9).alias(
            "info_loss"
        ),
    )
