"""Resolution-comparison metrics as grouped DataFrame aggregations.

Every metric the reference specifies (docs/design/interface.md:477-488,
formulas docs/design/principles.md:277-339) derives from one sparse
contingency table between two partitions of the same record space —
one equi-join on record_id + one groupBy (SURVEY.md J3/A6-A12). The
reference's designed incremental O(k) update between thresholds
(algorithms.md:671-786) is replaced, not ported: a threshold-grid
sweep computes every contingency in a single shuffle by joining
grid-expanded memberships (A17).

Conventions:
- partitions are DataFrames (record_id, cluster_id);
- "a" is the predicted/first collection, "b" the truth/second;
- logs are natural; metrics return doubles; 0/0 guards to 0.0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EVAL_METRICS = [
    "precision",
    "recall",
    "f1",
    "ari",
    "nmi",
    "v_measure",
    "bcubed_precision",
    "bcubed_recall",
    "agreement",
]
STAT_METRICS = ["entity_count", "entropy"]


def _c2(col):
    """n choose 2 as a double-safe expression."""
    return col * (col - F.lit(1)) / F.lit(2.0)


def contingency(
    a: DataFrame, b: DataFrame, extra_keys: list[str] | None = None
) -> DataFrame:
    """Sparse contingency cells n_ij between two partitions.

    extra_keys lets the sweep path carry (threshold_a, threshold_b)
    group columns through the same single aggregation.
    Returns DataFrame(<extra_keys...>, cluster_a, cluster_b, n).
    """
    keys = extra_keys or []
    left = a.select(
        *keys, F.col("record_id"), F.col("cluster_id").alias("cluster_a")
    )
    right = b.select("record_id", F.col("cluster_id").alias("cluster_b"))
    return (
        left.join(right, "record_id")
        .groupBy(*keys, "cluster_a", "cluster_b")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _cells_with_marginals(cells: DataFrame, keys: list[str]) -> DataFrame:
    """Attach row/column marginals a_i, b_j and total N to each cell.

    Marginals computed from the cells themselves (the join in
    ``contingency`` restricts both partitions to the shared record
    space, as the reference requires a shared DataContext).
    """
    wa = cells.groupBy(*keys, "cluster_a").agg(F.sum("n").alias("a_i"))
    wb = cells.groupBy(*keys, "cluster_b").agg(F.sum("n").alias("b_j"))
    wn = cells.groupBy(*keys).agg(F.sum("n").alias("n_tot")) if keys else None
    out = cells.join(wa, [*keys, "cluster_a"]).join(wb, [*keys, "cluster_b"])
    if keys:
        return out.join(wn, keys)
    total = cells.agg(F.sum("n").alias("n_tot"))
    return out.crossJoin(F.broadcast(total))


def metrics_from_cells(cells: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """All eval metrics from contingency cells, one output row per key
    combination (or a single row when keys is None/empty).

    Pairwise: TP = sum C(n_ij,2); PP = sum C(a_i,2); AP = sum C(b_j,2)
    (principles.md:289-293). ARI per principles.md:299-303, NMI
    :305-309, V-measure :311-315, B-cubed :317-322.
    """
    keys = keys or []
    # cells fan out into four aggregation branches (cell sums, row/col
    # marginals, totals) that get self-joined; localCheckpoint cuts the
    # upstream lineage so Catalyst analyses a tiny plan instead of four
    # copies of the whole pipeline (measured minutes of planning time).
    # EAGER (r6): with a lazy checkpoint, the first job to touch the
    # plan evaluates the (often expensive — full hierarchy build +
    # membership reconstruction) upstream subtree once per branch
    # CONCURRENTLY, because the not-yet-materialised blocks race; the
    # cells frame is sweep-output-sized, so materialising it now is
    # cheap at any scale and every branch then reads blocks.
    cells = cells.localCheckpoint(eager=True)
    enriched = _cells_with_marginals(cells, keys).localCheckpoint(eager=True)
    nd = F.col("n").cast("double")
    Nd = F.col("n_tot").cast("double")
    ai = F.col("a_i").cast("double")
    bj = F.col("b_j").cast("double")

    per_cell = enriched.select(
        *keys,
        F.col("n_tot"),
        _c2(nd).alias("tp_part"),
        (nd / Nd * F.log(nd * Nd / (ai * bj))).alias("mi_part"),
        # conditional entropies: H(B|A) and H(A|B) cell contributions
        (-(nd / Nd) * F.log(nd / ai)).alias("h_b_given_a_part"),
        (-(nd / Nd) * F.log(nd / bj)).alias("h_a_given_b_part"),
        (nd * nd / ai).alias("bc_p_part"),
        (nd * nd / bj).alias("bc_r_part"),
        # marginal entropy parts must be summed once per cluster, not per
        # cell — handled below via distinct marginal frames
    )
    sums = per_cell.groupBy(*keys).agg(
        F.first("n_tot").alias("n_tot"),
        F.sum("tp_part").alias("TP"),
        F.sum("mi_part").alias("MI"),
        F.sum("h_b_given_a_part").alias("H_b_given_a"),
        F.sum("h_a_given_b_part").alias("H_a_given_b"),
        F.sum("bc_p_part").alias("bc_p"),
        F.sum("bc_r_part").alias("bc_r"),
    )

    marg_a = (
        enriched.select(*keys, "cluster_a", "a_i", "n_tot")
        .dropDuplicates([*keys, "cluster_a"])
        .groupBy(*keys)
        .agg(
            F.sum(_c2(F.col("a_i").cast("double"))).alias("PP"),
            F.sum(
                -(F.col("a_i") / F.col("n_tot"))
                * F.log(F.col("a_i") / F.col("n_tot"))
            ).alias("H_a"),
        )
    )
    marg_b = (
        enriched.select(*keys, "cluster_b", "b_j", "n_tot")
        .dropDuplicates([*keys, "cluster_b"])
        .groupBy(*keys)
        .agg(
            F.sum(_c2(F.col("b_j").cast("double"))).alias("AP"),
            F.sum(
                -(F.col("b_j") / F.col("n_tot"))
                * F.log(F.col("b_j") / F.col("n_tot"))
            ).alias("H_b"),
        )
    )
    if keys:
        joined = sums.join(marg_a, keys).join(marg_b, keys)
    else:
        joined = sums.crossJoin(marg_a).crossJoin(marg_b)
    return metrics_from_stats(joined, keys)


def metrics_from_stats(joined: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Metric expressions over a pre-aggregated stats frame (one row
    per key combination with n_tot, TP, MI, H_b_given_a, H_a_given_b,
    bc_p, bc_r, PP, H_a, AP, H_b). Split out of metrics_from_cells so
    the fused pair-grid sweep (operators/pair_sweep.py), which computes
    the same statistics kernel-side, shares these expressions verbatim
    — the two routes cannot drift."""
    keys = keys or []
    tp, pp, ap = F.col("TP"), F.col("PP"), F.col("AP")
    precision = F.when(pp > 0, tp / pp).otherwise(F.lit(0.0))
    recall = F.when(ap > 0, tp / ap).otherwise(F.lit(0.0))
    f1 = F.when(
        (pp > 0) & (ap > 0) & (tp > 0),
        2 * (tp / pp) * (tp / ap) / (tp / pp + tp / ap),
    ).otherwise(F.lit(0.0))

    n_pairs = _c2(F.col("n_tot").cast("double"))
    expected = F.when(n_pairs > 0, pp * ap / n_pairs).otherwise(F.lit(0.0))
    max_index = (pp + ap) / F.lit(2.0)
    ari = F.when(
        F.abs(max_index - expected) > 1e-15, (tp - expected) / (max_index - expected)
    ).otherwise(F.lit(1.0))

    nmi = F.when(
        (F.col("H_a") + F.col("H_b")) > 0,
        2 * F.col("MI") / (F.col("H_a") + F.col("H_b")),
    ).otherwise(F.lit(1.0))

    homogeneity = F.when(
        F.col("H_b") > 0, 1 - F.col("H_b_given_a") / F.col("H_b")
    ).otherwise(F.lit(1.0))
    completeness = F.when(
        F.col("H_a") > 0, 1 - F.col("H_a_given_b") / F.col("H_a")
    ).otherwise(F.lit(1.0))
    v_measure = F.when(
        (homogeneity + completeness) > 0,
        2 * homogeneity * completeness / (homogeneity + completeness),
    ).otherwise(F.lit(0.0))

    # A15 pairwise agreement (principles.md:357-359): fraction of record
    # pairs whose same-entity status matches across both partitions —
    # (TP + TN) / C(N,2) with TN = pairs - PP - AP + TP
    tn = n_pairs - pp - ap + tp
    agreement = F.when(n_pairs > 0, (tp + tn) / n_pairs).otherwise(F.lit(1.0))

    return joined.select(
        *keys,
        F.round(precision, 9).alias("precision"),
        F.round(recall, 9).alias("recall"),
        F.round(f1, 9).alias("f1"),
        F.round(ari, 9).alias("ari"),
        F.round(nmi, 9).alias("nmi"),
        F.round(v_measure, 9).alias("v_measure"),
        F.round(F.col("bc_p") / F.col("n_tot"), 9).alias("bcubed_precision"),
        F.round(F.col("bc_r") / F.col("n_tot"), 9).alias("bcubed_recall"),
        F.round(agreement, 9).alias("agreement"),
    )


def compare_partitions(a: DataFrame, b: DataFrame) -> DataFrame:
    """One-row DataFrame with every eval metric for two partitions."""
    return metrics_from_cells(contingency(a, b))


def pairwise_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """TP/PP/AP pair counts (useful for tests and the labeled-pair F1
    gate). One row: tp, pp, ap as doubles."""
    cells = _cells_with_marginals(
        contingency(a, b).localCheckpoint(eager=False), []
    ).localCheckpoint(eager=False)
    sums = cells.agg(F.sum(_c2(F.col("n").cast("double"))).alias("tp"))
    pp = (
        cells.select("cluster_a", "a_i")
        .dropDuplicates(["cluster_a"])
        .agg(F.sum(_c2(F.col("a_i").cast("double"))).alias("pp"))
    )
    ap = (
        cells.select("cluster_b", "b_j")
        .dropDuplicates(["cluster_b"])
        .agg(F.sum(_c2(F.col("b_j").cast("double"))).alias("ap"))
    )
    return sums.crossJoin(pp).crossJoin(ap)


def partition_entropy(a: DataFrame) -> DataFrame:
    """Resolution entropy H = -sum (|E_i|/N) ln(|E_i|/N)
    (principles.md:339). One row: entropy double."""
    sizes = a.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("sz"))
    total = a.count()
    return sizes.agg(
        F.round(
            F.coalesce(
                F.sum(
                    -(F.col("sz") / F.lit(float(total)))
                    * F.log(F.col("sz") / F.lit(float(total)))
                ),
                F.lit(0.0),
            ),
            9,
        ).alias("entropy")
    )


def entity_set_metrics(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-entity set-theoretic comparison (principles.md:327-331):
    for each cluster in ``a``, its best-Jaccard match in ``b`` with all
    three coefficients —

      jaccard  |A ∩ B| / |A ∪ B|
      dice     2|A ∩ B| / (|A| + |B|)
      overlap  |A ∩ B| / min(|A|, |B|)

    Returns (cluster_a, best_cluster_b, jaccard, dice, overlap).
    Best match selected by jaccard; ties broken by min cluster_b.
    """
    cells = _cells_with_marginals(contingency(a, b), [])
    nd = F.col("n").cast("double")
    j = cells.select(
        "cluster_a",
        "cluster_b",
        (nd / (F.col("a_i") + F.col("b_j") - F.col("n"))).alias("jaccard"),
        (2 * nd / (F.col("a_i") + F.col("b_j"))).alias("dice"),
        (nd / F.least(F.col("a_i"), F.col("b_j"))).alias("overlap"),
    )
    best = j.groupBy("cluster_a").agg(F.max("jaccard").alias("jaccard"))
    return (
        j.join(best, ["cluster_a", "jaccard"])
        .groupBy("cluster_a", "jaccard")
        # struct-min keeps one CONSISTENT row (the min-cluster_b tie
        # winner with ITS dice/overlap), not a column-wise mix
        .agg(F.min(F.struct("cluster_b", "dice", "overlap")).alias("w"))
        .select(
            "cluster_a",
            F.col("w.cluster_b").alias("best_cluster_b"),
            F.round("jaccard", 9).alias("jaccard"),
            F.round("w.dice", 9).alias("dice"),
            F.round("w.overlap", 9).alias("overlap"),
        )
    )


def entity_jaccard(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-entity best-match Jaccard (reference compare_collections,
    README.md:39-41,117-119): for each cluster in ``a``, the max over
    clusters of ``b`` of |intersect| / |union|.

    Returns DataFrame(cluster_a, best_cluster_b, jaccard).
    """
    cells = _cells_with_marginals(contingency(a, b), [])
    j = cells.select(
        "cluster_a",
        "cluster_b",
        (
            F.col("n").cast("double")
            / (F.col("a_i") + F.col("b_j") - F.col("n")).cast("double")
        ).alias("jaccard"),
    )
    best = j.groupBy("cluster_a").agg(F.max("jaccard").alias("jaccard"))
    return (
        j.join(best, ["cluster_a", "jaccard"])
        .groupBy("cluster_a", "jaccard")
        .agg(F.min("cluster_b").alias("best_cluster_b"))
        .select("cluster_a", "best_cluster_b", F.round("jaccard", 9).alias("jaccard"))
    )
