"""Distributed connected components (single-linkage transitive closure).

The reference's core clustering primitive is an in-memory union-find
(src/rust/starlings-core/src/hierarchy/builder.rs:146-218, 283-328).
At Spark scale the equivalent is the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14): O(log^2 n) rounds of pure
DataFrame ops, each round one groupBy + one join, with
localCheckpoint() per round to cut lineage. Components are labeled by
their minimum node id — the same deterministic representative our
whole engine uses (SURVEY.md §4 determinism discipline).

For blocked graphs (candidate edges only within small blocks) the
exact per-block union-find runs as an Arrow-batched applyInPandas —
no global iteration at all (reference's own designed "blocked
parallel hierarchies", docs/design/algorithms.md:789-799).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.functions import uf_native
from entityframe_spark.functions.jw_native import tune_allocator

# fire in every pyspark worker at closure-deserialize time, BEFORE the
# first Arrow batch is materialised: the multi-hundred-MB single-task
# batches otherwise fault fresh pages on every run (host confounder,
# BENCH.md); harmless on the driver
tune_allocator()


def local_component_labels(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(nodes, component label per node) for one in-task edge batch.

    C kernel when available (the per-edge Python loop was the
    single-task throughput bound at the 10M-edge component cap —
    VERDICT r3), numpy/Python union-find fallback otherwise. Both
    paths: union by min node id -> deterministic min-id labels."""
    nodes = np.unique(np.concatenate([src, dst]))
    if uf_native.native_available():
        si = np.searchsorted(nodes, np.asarray(src, dtype=np.int64))
        di = np.searchsorted(nodes, np.asarray(dst, dtype=np.int64))
        return nodes, nodes[uf_native.components_native(si, di, len(nodes))]
    return nodes, union_find_numpy(src, dst, nodes)


def _canonical(e: DataFrame) -> DataFrame:
    """Undirected edge set as (u < v) canonical pairs, no self-loops."""
    return (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
        )
        .where(F.col("u") < F.col("v"))
        .dropDuplicates(["u", "v"])
    )


def _large_star(e: DataFrame) -> DataFrame:
    """For every node a: connect each strictly-larger neighbour to
    min(Gamma(a) ∪ {a}). Output is un-deduplicated (u,v) pairs; the
    round's final _canonical handles dedup so each round costs one
    dedup shuffle, not two."""
    nbrs = e.select(F.col("u").alias("a"), F.col("v").alias("b")).unionAll(
        e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    mins = nbrs.groupBy("a").agg(F.least(F.min("b"), F.first("a")).alias("m"))
    return (
        nbrs.join(mins, "a")
        .where(F.col("b") > F.col("a"))
        .select(
            F.least("b", "m").alias("u"),
            F.greatest("b", "m").alias("v"),
        )
        .where(F.col("u") < F.col("v"))
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges high->low; for every node a connect all smaller
    neighbours (and a itself) to the minimum of them."""
    # inputs are (u,v) with u < v (possibly duplicated): v is the high end
    nbrs = e.select(F.col("v").alias("a"), F.col("u").alias("b"))
    mins = nbrs.groupBy("a").agg(F.min("b").alias("m"))
    joined = nbrs.join(mins, "a")
    out = joined.select(F.col("b").alias("src"), F.col("m").alias("dst")).unionAll(
        joined.select(F.col("a").alias("src"), F.col("m").alias("dst"))
    )
    return _canonical(out)


def _signature(e: DataFrame) -> tuple[int, int]:
    # decimal(38,0) sum: overflow-safe under ANSI mode at any realistic scale
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _cc_single_task(e: DataFrame) -> DataFrame:
    """Small-graph fast path: exact union-find in ONE Arrow-batched task.

    Graphs below ``local_threshold`` edges (post-dedup) don't justify
    the iterative algorithm's per-round job overhead; this is the same
    executor-side pandas path the per-block variant uses, so nothing is
    collected to the driver.
    """

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes, comp = local_component_labels(pdf["u"].values, pdf["v"].values)
        return pd.DataFrame({"node": nodes, "component": comp})

    return (
        e.withColumn("_g", F.lit(0))
        .groupBy("_g")
        .applyInPandas(run, schema="node long, component long")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
    local_threshold: int = 20_000_000,
) -> DataFrame:
    """Components of the undirected graph given by ``edges``.

    Returns DataFrame(node long, component long) covering every node
    that appears in an edge; component = min node id of the component.
    Callers union isolated records afterwards (see partition_at).

    Graphs up to ``local_threshold`` RAW edges run exact union-find in
    ONE Arrow task — straight off the scan, no canonical-dedup shuffle
    (the C kernel treats duplicates and reversed copies as no-op
    unions, so dedup buys nothing on this path). Larger graphs run the
    distributed alternating-star algorithm over the canonicalised edge
    set. Set local_threshold=0 to force the distributed path.

    The 20M default is a per-task MEMORY bound, not a speed bound
    (20M edges = ~320 MB of int64 arrays + the Arrow batch; the kernel
    unions ~100M edges/s): below it a single task beats the
    distributed iteration's 4-shuffles-per-round overhead by an order
    of magnitude (measured: 1M-node chain, 5M edges — 183s
    distributed vs ~12s single-task end-to-end). It was 2M when the
    in-task sweep was a per-edge Python loop (VERDICT r3).
    """
    sel = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).where(F.col("src") != F.col("dst"))
    if local_threshold:
        # raw-count probe: one scan+agg, NO shuffle (the old flow paid
        # the full canonical-dedup shuffle just to decide the route)
        n_raw = sel.count()
        if n_raw == 0:
            return sel.sparkSession.createDataFrame([], "node long, component long")
        if n_raw <= local_threshold:
            return _cc_single_task(
                sel.select(F.col("src").alias("u"), F.col("dst").alias("v"))
            ).localCheckpoint(eager=True)

    e = _canonical(sel)
    # persist so the size-probe job and the actual traversal share one
    # materialisation of the dedup shuffle; released before returning so
    # repeated calls (per-threshold partition_at) don't accumulate
    # executor storage over a session
    e0 = e.persist()
    n_edges = e0.count()
    if n_edges == 0:
        e0.unpersist()
        return e0.sparkSession.createDataFrame([], "node long, component long")

    # Per-round checkpoint blocks must be RELEASED as rounds supersede
    # each other: localCheckpoint persists ~|E| rows per round and the
    # loop runs O(log^2 n) rounds, so keeping them all grows block-
    # manager storage linearly with rounds — measured as a 16g-heap OOM
    # at 50M edges / ~25 rounds (tools/envelope_bench.py giant shape);
    # on a real cluster the same leak inflates executor storage until
    # eviction thrash. Persistent-RDD ids increase monotonically, so
    # after each round's signature job materialises its checkpoint we
    # drop every loop-created id except the newest (the current round).
    # Caller/base persists (e0 etc.) are protected by the baseline set.
    sc = e0.sparkSession.sparkContext

    def _persistent_ids() -> set[int]:
        try:
            return {int(k) for k in sc._jsc.getPersistentRDDs().keySet().toArray()}
        except Exception:
            return set()  # API drift: degrade to the old keep-all behavior

    def _unpersist_ids(ids: set[int]) -> None:
        try:
            jmap = sc._jsc.getPersistentRDDs()
            for i in ids:
                rdd = jmap.get(i)
                if rdd is not None:
                    rdd.unpersist(False)
        except Exception:
            pass

    baseline = _persistent_ids()
    e = e0.localCheckpoint(eager=False)
    sig = _signature(e)
    try:
        for _ in range(max_iterations):
            # lazy checkpoint: the signature job right after materialises
            # it, cutting lineage without computing the round twice
            e = _small_star(_large_star(e)).localCheckpoint(eager=False)
            new_sig = _signature(e)
            loop_ids = _persistent_ids() - baseline
            if len(loop_ids) > 1:
                _unpersist_ids(loop_ids - {max(loop_ids)})
            if new_sig == sig:
                break
            sig = new_sig
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_iterations} rounds"
            )
    finally:
        # the last round is materialised (its signature job ran), so the
        # original edge cache is no longer needed
        e0.unpersist()

    # converged edge set is a star forest: (member u>root? no — canonical
    # keeps u<v, so rows are (root=u, member=v)); roots also map to themselves
    members = e.select(F.col("v").alias("node"), F.col("u").alias("component"))
    roots = e.select(F.col("u").alias("node"), F.col("u").alias("component")).distinct()
    return members.unionAll(roots).dropDuplicates(["node"])


# ---------------------------------------------------------------------------
# exact in-memory union-find (per-block / per-component local path)
# ---------------------------------------------------------------------------


def union_find_numpy(src: np.ndarray, dst: np.ndarray, nodes: np.ndarray) -> np.ndarray:
    """Plain union-find with path compression; root = min id.

    Semantics match the reference's UnionFind sweep
    (builder.rs:146-218): every union picks the smaller representative
    so labels are deterministic min-ids.
    Returns component label per entry of ``nodes``.
    """
    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for s, d in zip(src, dst):
        rs, rd = find(idx[int(s)]), find(idx[int(d)])
        if rs == rd:
            continue
        # union by min node id to keep deterministic representatives
        if nodes[rs] <= nodes[rd]:
            parent[rd] = rs
        else:
            parent[rs] = rd
    return np.array([nodes[find(i)] for i in range(len(nodes))], dtype=np.int64)


def connected_components_blocked(
    edges: DataFrame,
    block_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Exact per-block components via Arrow-batched applyInPandas.

    Requires that edges never cross blocks (true for candidate pairs
    generated within blocking keys). One shuffle on block_col; no
    iteration.
    """
    sel = edges.select(
        F.col(block_col).alias("_block"),
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        nodes, comp = local_component_labels(pdf["src"].values, pdf["dst"].values)
        return pd.DataFrame({"node": nodes, "component": comp})

    out = sel.groupBy("_block").applyInPandas(per_block, schema="node long, component long")
    # a node can appear in several blocks; blocked CC is only exact when
    # blocks partition the edge space — caller guarantees it. Still dedup.
    return out.dropDuplicates(["node"])
