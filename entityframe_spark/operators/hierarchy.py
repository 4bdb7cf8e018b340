"""Partition hierarchy (single-linkage dendrogram) as a DataFrame.

The reference builds a ``PartitionHierarchy`` — ordered merge events
from a union-find sweep over descending quantised thresholds
(src/rust/starlings-core/src/hierarchy/builder.rs:66-218) — and
reconstructs the partition at any threshold t by re-applying merges
with ``merge.threshold >= t`` (builder.rs:283-328).

Spark-native representation: ``merge_edges(threshold_fp, child,
parent)`` — at threshold_fp the cluster whose representative is
``child`` fuses into the cluster represented by ``parent`` (parent =
min record id, so representatives are deterministic). Properties:

- at most n-1 rows total (vs m edges) — the compact dendrogram;
- each record id appears as ``child`` at most once (once absorbed, a
  node is never a representative again);
- the partition at threshold t is exactly the connected components of
  ``merge_edges.filter(threshold_fp >= t_fp)`` over all record ids
  (isolates = singletons), labeled by min id.

Build strategy (one global shuffle + Arrow-batched local work):
1. global connected components over ALL edges (the t=0 partition);
   every later computation is independent per component;
2. component-partitioned local single-linkage sweep — hash-shuffle on
   component, ONE union-find kernel run per ~5M-edge partition
   (mapInPandas; components never interact, so batching whole
   components per task is semantics-free) — exact reference semantics
   (descending thresholds, n-way merges at equal threshold,
   union-by-min) with zero global iteration.

This is the reference's own designed "blocked parallel hierarchies"
(docs/design/algorithms.md:789-799) expressed in Spark. Skewed/giant
components would serialize into one task; blocking upstream keeps
components small, and `max_component_edges` guards surprises.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entityframe_spark.functions import uf_native
from entityframe_spark.operators.components import _YIELD_CHUNK, connected_components
from entityframe_spark.functions.jw_native import tune_allocator

# fire in every pyspark worker at closure-deserialize time, BEFORE the
# first Arrow batch is materialised: the multi-hundred-MB single-task
# batches otherwise fault fresh pages on every run (host confounder,
# BENCH.md); harmless on the driver
tune_allocator()

MERGE_EDGE_SCHEMA = "threshold_fp long, child long, parent long"


def _sweep_arrays(pdf: pd.DataFrame):
    """pandas adapter over :func:`_sweep_arrays_np` (tests and small
    callers); the executor hot paths pass numpy columns directly and
    never build an intermediate concatenated DataFrame."""
    return _sweep_arrays_np(
        pdf["src"].to_numpy(dtype=np.int64),
        pdf["dst"].to_numpy(dtype=np.int64),
        pdf["w_fp"].to_numpy(dtype=np.int64),
    )


def _sweep_arrays_np(
    src: np.ndarray, dst: np.ndarray, wfp: np.ndarray, presorted: bool = False
):
    """Sort one component's edges by threshold DESC, ties by (src,
    dst) ASC — a CONTENT-based total order, so the merge-event
    sequence is identical no matter how edges arrive (shuffle arrival
    order is nondeterministic on a real cluster, and the fused
    single-task path sees a different arrival order than the
    per-component path; input-order ties would make the dendrogram
    tree shape flap run-to-run). Emits the sized merge-event arrays
    (t, child_id, parent_id, left_size, right_size).

    ``presorted=True`` asserts the caller already delivered rows in
    that exact order — the executor hot paths do it JVM-side with
    ``sortWithinPartitions(desc(w_fp), src, dst)``, which Tungsten
    runs spill-aware during the shuffle instead of as 3 stable numpy
    argsort passes + 3 full-size takes in the single Python task
    (measured 10M-node/50M-edge giant component: lexsort 119s +
    take 67s of a ~260s in-process sweep).

    C kernel when available (the per-edge Python loop bounded
    single-task throughput at ~1M edges/s; the kernel runs ~100M/s —
    VERDICT r3 Wrong #3), Python union-find fallback otherwise. Both
    mirror builder.rs:146-218: all edges at an equal threshold process
    in one batch (n-way merges fall out naturally); duplicate/cycle
    edges are skipped; the representative stays the min record id.
    """
    if not presorted:
        # lexsort: last key is primary -> (-w_fp, src, dst) total order
        order = np.lexsort((dst, src, -wfp))
        src, dst, wfp = src[order], dst[order], wfp[order]

    if uf_native.native_available() and len(src):
        # Dense-id fast path: interned record ids are 0..n-1 by
        # construction (core/records.py two-phase rank), so when ids
        # already fit a small non-negative span the kernel can index
        # them DIRECTLY — skipping np.unique + 2x searchsorted, which
        # dominate large single-task sweeps (measured at 10M edges:
        # 10.3s of a 17s sweep; they are also 3 full-size fresh
        # allocations on a host where page faults are the contended
        # resource, BENCH.md). The 2m+16 span bound keeps kernel array
        # memory within the sparse path's existing |nodes|<=2m worst
        # case. Hash-ids (full-range/negative) take the sparse path.
        lo = min(int(src.min()), int(dst.min()))
        span = max(int(src.max()), int(dst.max())) + 1
        if lo >= 0 and span <= 2 * len(src) + 16:
            t, c, p, ls, rs = uf_native.single_linkage_native(src, dst, wfp, span)
            return t, c, p, ls, rs

    nodes = np.unique(np.concatenate([src, dst]))
    if uf_native.native_available():
        si = np.searchsorted(nodes, src)
        di = np.searchsorted(nodes, dst)
        t, c, p, ls, rs = uf_native.single_linkage_native(si, di, wfp, len(nodes))
        return t, nodes[c], nodes[p], ls, rs

    idx = {int(n): i for i, n in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)
    size = np.ones(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    rows: list[tuple[int, int, int, int, int]] = []
    for s, d, t in zip(src, dst, wfp):
        ri, rj = find(idx[int(s)]), find(idx[int(d)])
        if ri == rj:
            continue
        if nodes[ri] <= nodes[rj]:
            keep, drop = ri, rj
        else:
            keep, drop = rj, ri
        rows.append(
            (int(t), int(nodes[drop]), int(nodes[keep]), int(size[keep]), int(size[drop]))
        )
        size[keep] += size[drop]
        parent[drop] = keep
    arr = np.array(rows, dtype=np.int64).reshape(-1, 5)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], arr[:, 4]


def _local_single_linkage(pdf: pd.DataFrame) -> pd.DataFrame:
    """Union-find sweep over one component's edges, descending
    threshold, emitting merge edges (child -> parent=min)."""
    t, c, p, _, _ = _sweep_arrays(pdf)
    return pd.DataFrame({"threshold_fp": t, "child": c, "parent": p})


MERGE_EDGE_SIZED_SCHEMA = (
    "threshold_fp long, child long, parent long, left_size long, right_size long"
)


def _local_single_linkage_sized(pdf: pd.DataFrame) -> pd.DataFrame:
    """Like _local_single_linkage but also emits the sizes of the two
    clusters being merged (parent-rooted = left, child-rooted = right)
    — the inputs for merge criticality |E_l| x |E_r| and information
    content (principles.md:336-338, 368-372)."""
    t, c, p, ls, rs = _sweep_arrays(pdf)
    return pd.DataFrame(
        {
            "threshold_fp": t,
            "child": c,
            "parent": p,
            "left_size": ls,
            "right_size": rs,
        }
    )


def _sweep_run(batches, sized: bool):
    """Executor-side sweep body shared by the fused and partitioned
    paths: accumulate TYPED numpy columns per Arrow batch (a pandas
    concat of the full edge set copied ~1.6 GB of object-dtype-prone
    frames at 50M edges), one kernel call, chunked output yields
    (same _YIELD_CHUNK batching as components.py — one whole-result
    Arrow batch was a 200-300 MB contiguous allocation). Rows arrive
    already in (-w_fp, src, dst) order (JVM sortWithinPartitions at
    both call sites) — Arrow batch iteration preserves partition
    order, so the kernel consumes them directly."""
    srcs, dsts, ws = [], [], []
    for b in batches:
        if len(b):
            srcs.append(b["src"].to_numpy(dtype=np.int64))
            dsts.append(b["dst"].to_numpy(dtype=np.int64))
            ws.append(b["w_fp"].to_numpy(dtype=np.int64))
    if not srcs:
        return
    t, c, p, ls, rs = _sweep_arrays_np(
        np.concatenate(srcs) if len(srcs) > 1 else srcs[0],
        np.concatenate(dsts) if len(dsts) > 1 else dsts[0],
        np.concatenate(ws) if len(ws) > 1 else ws[0],
        presorted=True,
    )
    for i in range(0, len(t), _YIELD_CHUNK):
        cols = {
            "threshold_fp": t[i : i + _YIELD_CHUNK],
            "child": c[i : i + _YIELD_CHUNK],
            "parent": p[i : i + _YIELD_CHUNK],
        }
        if sized:
            cols["left_size"] = ls[i : i + _YIELD_CHUNK]
            cols["right_size"] = rs[i : i + _YIELD_CHUNK]
        yield pd.DataFrame(cols)


def _msf_keep_mask(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Keep-mask of the canonical max-spanning forest over edges
    ALREADY in (-w_fp, src, dst) order: same dense-id fast path /
    sparse searchsorted mapping as :func:`_sweep_arrays_np`, same
    pure-Python union-find fallback for compiler-less workers."""
    n = len(src)
    if n == 0:
        return np.zeros(0, dtype=bool)
    if uf_native.native_available():
        lo = min(int(src.min()), int(dst.min()))
        span = max(int(src.max()), int(dst.max())) + 1
        if lo >= 0 and span <= 2 * n + 16:
            return uf_native.msf_mask_native(src, dst, span)
        nodes = np.unique(np.concatenate([src, dst]))
        return uf_native.msf_mask_native(
            np.searchsorted(nodes, src), np.searchsorted(nodes, dst), len(nodes)
        )
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(v): i for i, v in enumerate(nodes)}
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    mask = np.zeros(n, dtype=bool)
    for e in range(n):
        ri, rj = find(idx[int(src[e])]), find(idx[int(dst[e])])
        if ri == rj:
            continue
        if ri <= rj:
            parent[rj] = ri
        else:
            parent[ri] = rj
        mask[e] = True
    return mask


def _msf_filter_pass(e: DataFrame, n_parts: int | None) -> DataFrame:
    """One Kruskal-filter pass: partition to ``n_parts`` (coalesce
    down / repartition up, same rules as components._contract_
    partitions), JVM-sort each partition into the canonical
    (-w_fp, src, dst) order, and keep only each partition's canonical
    max-spanning-forest edges. Edges dropped here are provably
    non-forest in ANY superset (MapReduce MST filtering, Lattanzi et
    al. SPAA'11), so repeated passes are exact; output per task is
    bounded by its distinct node count - 1."""
    if n_parts is not None:
        cur = e.rdd.getNumPartitions()
        if n_parts < cur:
            e = e.coalesce(n_parts)
        elif n_parts > cur:
            e = e.repartition(n_parts)

    def keep(batches):
        srcs, dsts, ws = [], [], []
        for b in batches:
            if len(b):
                srcs.append(b["src"].to_numpy(dtype=np.int64))
                dsts.append(b["dst"].to_numpy(dtype=np.int64))
                ws.append(b["w_fp"].to_numpy(dtype=np.int64))
        if not srcs:
            return
        src = np.concatenate(srcs) if len(srcs) > 1 else srcs[0]
        dst = np.concatenate(dsts) if len(dsts) > 1 else dsts[0]
        wfp = np.concatenate(ws) if len(ws) > 1 else ws[0]
        m = _msf_keep_mask(src, dst)
        src, dst, wfp = src[m], dst[m], wfp[m]
        for i in range(0, len(src), _YIELD_CHUNK):
            yield pd.DataFrame(
                {
                    "src": src[i : i + _YIELD_CHUNK],
                    "dst": dst[i : i + _YIELD_CHUNK],
                    "w_fp": wfp[i : i + _YIELD_CHUNK],
                }
            )

    return (
        e.sortWithinPartitions(F.desc("w_fp"), "src", "dst")
        .mapInPandas(keep, schema="src long, dst long, w_fp long")
    )


def _msf_filter_cascade(
    edges_fp: DataFrame, n_raw: int, local_threshold: int, max_passes: int = 8
) -> tuple[DataFrame, int, DataFrame]:
    """Kruskal-filter cascade: shrink an above-threshold edge set
    toward its max-spanning forest (<= node count - 1 rows) with
    per-partition filter passes, so the FULL dendrogram sweep fits one
    exact kernel task. Merge events over the filtered set are
    IDENTICAL to the full set's: every dropped edge would have been a
    no-op union in the sweep (its endpoints connect via
    strictly-earlier canonical-order edges that survive filtering).

    This replaces, for trusted (max_component_edges=None) inputs, the
    whole CC + tag-join + component-shuffle decomposition: those jobs
    existed only to bound per-task edge counts, which the filter does
    directly. Partition schedule mirrors components._contract_cascade
    (start at the memory-bound floor ceil(E/threshold), /4 after;
    stall = parts cannot drop, meaning forest size itself exceeds one
    task's bound — the caller then falls back to the CC route over
    the filtered, smaller edge set).

    Returns (filtered_edges, row_count, persisted_handle); caller
    unpersists the handle after materialising downstream."""
    import os as _os
    import sys as _sys

    from pyspark import StorageLevel

    log = _os.environ.get("EF_CC_LOG", "") not in ("", "0")
    cur, cached = edges_fp.select("src", "dst", "w_fp"), None
    n_rows, parts = n_raw, max(1, -(-n_raw // local_threshold))
    for i in range(max_passes):
        nxt = _msf_filter_pass(cur, parts).persist(StorageLevel.DISK_ONLY)
        n_rows = nxt.count()
        if cached is not None:
            cached.unpersist()
        cur = cached = nxt
        cur_parts = cur.rdd.getNumPartitions()
        if log:
            print(
                f"[ef-msf] filter pass {i}: rows={n_rows} parts={cur_parts}",
                file=_sys.stderr,
            )
        if n_rows <= local_threshold or n_rows == 0:
            return cur, n_rows, cached
        floor_parts = -(-n_rows // local_threshold)
        parts = max(floor_parts, cur_parts // 4)
        if parts >= cur_parts:
            break
    return cur, n_rows, cached


def _sweep_fused_single_task(edges_fp: DataFrame, sized: bool, schema: str) -> DataFrame:
    """Small-graph fast path: the WHOLE edge set through one Arrow task.

    The single-linkage sweep is itself a union-find, so it computes
    the component structure implicitly — below the single-task routing
    threshold the usual decomposition (global CC job + component tag
    join + groupBy shuffle) is three Spark jobs of pure overhead
    around work one C-kernel task does anyway. Same executor-side
    path as ``_cc_single_task``: nothing is collected to the driver.
    Measured (1M records / 5M edges, local[32],
    tools/envelope_bench.py): giant component 113s -> fused removes
    the duplicated union pass + 5M-row tag join; clustered graphs
    below the threshold skip two shuffles of the full edge set.
    """
    return (
        edges_fp.select("src", "dst", "w_fp")
        .repartition(1)
        .sortWithinPartitions(F.desc("w_fp"), "src", "dst")
        .mapInPandas(lambda it: _sweep_run(it, sized), schema=schema)
    )


def _sweep_partitioned(
    tagged: DataFrame, sized: bool, schema: str, n_edges: int, edges_per_task: int
) -> DataFrame:
    """Component-partitioned sweep: hash-shuffle on ``_comp`` into
    ceil(n_edges / edges_per_task) partitions and run the union-find
    kernel ONCE PER PARTITION (mapInPandas), not once per component.

    Single-linkage components never interact, and the content-based
    edge total order (-w_fp, src, dst) makes the event sequence
    per-component deterministic regardless of which other components
    share the task — so batching whole components per task is
    semantics-free. It removes the per-GROUP Python/pandas dispatch
    that dominates post-blocking graphs (realistic shape: millions of
    ~10-edge components; groupBy().applyInPandas() pays ~ms per group
    -> minutes of pure overhead at 10M records, measured in
    tools/envelope_bench.py). Per-task memory is bounded by
    ``edges_per_task`` (plus any single component exceeding it, which
    hash partitioning cannot split — exactly what max_component_edges
    guards)."""
    n_parts = max(1, -(-n_edges // max(edges_per_task, 1)))
    return (
        tagged.repartition(n_parts, "_comp")
        # narrow projection after the exchange: _comp was only the
        # shuffle key; keeping it would ride the JVM sort AND the
        # Arrow transfer (+8 B/row) for nothing
        .select("src", "dst", "w_fp")
        .sortWithinPartitions(F.desc("w_fp"), "src", "dst")
        .mapInPandas(lambda it: _sweep_run(it, sized), schema=schema)
    )


def _msf_route(
    edges_fp: DataFrame, n_raw: int, local_threshold: int, sized: bool, schema: str
) -> tuple[DataFrame | None, DataFrame, int]:
    """Above-threshold routing via the Kruskal-filter cascade (trusted
    inputs only — callers gate on max_component_edges is None, since
    the filter bounds per-task memory by construction but cannot
    observe raw per-component edge counts for the guard contract).

    Returns (done_result | None, edges_fp, n_raw): a non-None first
    element is the finished merge-edge DataFrame (forest fit one
    task); otherwise the caller continues on the returned
    filtered-and-checkpointed edge set (smaller, merge-event
    identical)."""
    from entityframe_spark.operators.components import _ckpt_level

    filtered, n_f, handle = _msf_filter_cascade(edges_fp, n_raw, local_threshold)
    if n_f <= local_threshold:
        out = _sweep_fused_single_task(filtered, sized, schema).localCheckpoint(
            eager=True, storageLevel=_ckpt_level(n_f)
        )
        handle.unpersist()
        return out, edges_fp, n_raw
    # forest itself above one task's bound (node count beyond the
    # memory bound — true cluster-scale): distributed CC route, but
    # over the filtered edge set
    kept = filtered.localCheckpoint(eager=True, storageLevel=_ckpt_level(n_f))
    handle.unpersist()
    return None, kept, n_f


def _build_merge_edges_impl(
    edges_fp: DataFrame,
    sized: bool,
    max_component_edges: int | None,
    local_threshold: int,
    cc_local_threshold: int | None,
    edges_per_task: int,
    on_oversized: str,
) -> DataFrame:
    """Shared routing body for build_merge_edges / _sized — one
    implementation so the guard contract cannot drift between the two
    variants again (VERDICT r4 Wrong #1: the sized twin accepted
    ``max_component_edges`` but silently ignored it)."""
    if on_oversized not in ("filter", "raise"):
        raise ValueError(
            f"on_oversized must be 'filter' or 'raise', got {on_oversized!r}"
        )
    schema = MERGE_EDGE_SIZED_SCHEMA if sized else MERGE_EDGE_SCHEMA
    n_raw = edges_fp.count()
    if local_threshold:
        if n_raw <= local_threshold and (
            max_component_edges is None or n_raw <= max_component_edges
        ):
            return _sweep_fused_single_task(edges_fp, sized, schema)
        if max_component_edges is None and n_raw > local_threshold:
            # trusted input above the single-task bound: Kruskal-filter
            # cascade (see _msf_filter_cascade) — the guard contract
            # needs raw per-component counts, so guarded inputs keep
            # the CC + hot-check route below
            done, edges_fp, n_raw = _msf_route(
                edges_fp, n_raw, local_threshold, sized, schema
            )
            if done is not None:
                return done
    cc_kw = {} if cc_local_threshold is None else {"local_threshold": cc_local_threshold}
    comps = connected_components(edges_fp, "src", "dst", **cc_kw)
    tagged = edges_fp.join(
        comps.withColumnRenamed("node", "src").withColumnRenamed("component", "_comp"),
        "src",
    ).select("_comp", "src", "dst", "w_fp")
    if max_component_edges is not None:
        # DISK_ONLY past the small bound: n_raw tagged rows copied as
        # on-heap UnsafeRows (~100 B each) OOMed the 16g local-mode
        # heap at 45M edges (tools/envelope_bench.py clustered shape)
        from entityframe_spark.operators.components import _ckpt_level

        tagged = tagged.localCheckpoint(eager=False, storageLevel=_ckpt_level(n_raw))
        hot = (
            tagged.groupBy("_comp")
            .agg(F.count(F.lit(1)).alias("_n"))
            .where(F.col("_n") > int(max_component_edges))
            .orderBy(F.col("_n").desc())
            .collect()
        )
        if hot and on_oversized == "raise":
            raise ValueError(
                f"component {hot[0]['_comp']} has {hot[0]['_n']} edges "
                f"(> max_component_edges={max_component_edges}); a giant "
                "component would serialize into one task. Tighten blocking "
                "upstream (smaller blocks / drop hot LSH bands), raise the "
                "cap, pass on_oversized='filter' to route it through the "
                "Kruskal-filter cascade, or max_component_edges=None to "
                "force single-task processing."
            )
        if hot:
            return _sweep_split_oversized(
                tagged, hot, sized, schema, n_raw,
                local_threshold or 20_000_000, edges_per_task,
            )
    return _sweep_partitioned(tagged, sized, schema, n_raw, edges_per_task)


def _sweep_split_oversized(
    tagged: DataFrame,
    hot: list,
    sized: bool,
    schema: str,
    n_raw: int,
    filter_threshold: int,
    edges_per_task: int,
) -> DataFrame:
    """Guard-tripped giant components take the Kruskal-filter route
    (VERDICT r4 Wrong #2): split the tagged edge set into the oversized
    component(s) and the rest, shrink the oversized edges toward their
    max-spanning forest — per-task memory bounded by construction, and
    merge events over the filtered set are IDENTICAL to the full set's
    (see _msf_filter_cascade) — then sweep the forest in one exact
    kernel task and union with the partitioned sweep of the small
    components. Components are disjoint, so the union is exact.

    Raises only when even the filtered forest exceeds one task's bound
    (node count of one component beyond the memory bound — the genuine
    limit a single task cannot absorb)."""
    from entityframe_spark.operators.components import _ckpt_level

    hot_ids = [int(r["_comp"]) for r in hot]
    giant_n = sum(int(r["_n"]) for r in hot)
    giant = tagged.where(F.col("_comp").isin(hot_ids)).select("src", "dst", "w_fp")
    small = tagged.where(~F.col("_comp").isin(hot_ids))

    filtered, n_f, handle = _msf_filter_cascade(giant, giant_n, filter_threshold)
    if n_f > filter_threshold:
        handle.unpersist()
        raise ValueError(
            f"oversized component(s) {hot_ids} still hold {n_f} edges after "
            "max-spanning-forest filtering — the component's NODE count "
            "itself exceeds one task's memory bound "
            f"({filter_threshold} rows). Tighten blocking upstream; no "
            "single-task sweep can absorb this component."
        )
    giant_me = _sweep_fused_single_task(filtered, sized, schema).localCheckpoint(
        eager=True, storageLevel=_ckpt_level(n_f)
    )
    handle.unpersist()
    small_me = _sweep_partitioned(
        small, sized, schema, max(n_raw - giant_n, 1), edges_per_task
    )
    return small_me.unionAll(giant_me)


def build_merge_edges_sized(
    edges_fp: DataFrame,
    max_component_edges: int | None = 10_000_000,
    local_threshold: int = 20_000_000,
    cc_local_threshold: int | None = None,
    edges_per_task: int = 5_000_000,
    on_oversized: str = "filter",
) -> DataFrame:
    """build_merge_edges variant carrying (left_size, right_size) per
    merge event — identical routing (shared _build_merge_edges_impl,
    including the max_component_edges guard + oversized-component
    filter route). ``cc_local_threshold`` (None = CC default) forwards
    to connected_components so benchmarks can force the distributed
    alternating-star path."""
    return _build_merge_edges_impl(
        edges_fp, True, max_component_edges, local_threshold,
        cc_local_threshold, edges_per_task, on_oversized,
    )


def build_merge_edges(
    edges_fp: DataFrame,
    max_component_edges: int | None = 10_000_000,
    local_threshold: int = 20_000_000,
    cc_local_threshold: int | None = None,
    edges_per_task: int = 5_000_000,
    on_oversized: str = "filter",
) -> DataFrame:
    """edges_fp(src long, dst long, w_fp long) -> merge_edges DataFrame.

    Routing (same per-task memory bound as connected_components):
    graphs up to ``local_threshold`` raw edges run the whole sweep in
    ONE Arrow task (see _sweep_fused_single_task) — but only when the
    ``max_component_edges`` guard provably cannot fire (total edges
    <= cap implies every component is under the cap, so the guard
    contract is preserved exactly). Larger graphs: one global CC + one
    component-partitioned shuffle + ONE union-find kernel run per
    ~``edges_per_task``-edge partition (see _sweep_partitioned).

    ``max_component_edges`` guards the skew failure mode: one giant
    (near-global) component would funnel its whole edge set into a
    single applyInPandas task and OOM the executor. The guard costs one
    cheap count-per-component aggregation (same shuffle key as the
    sweep); what happens next is ``on_oversized``:

    - ``"filter"`` (default): route the oversized component(s) through
      the Kruskal-filter cascade — per-task memory bounded by
      construction, merge events identical (_sweep_split_oversized) —
      and raise only if even the filtered forest exceeds one task.
    - ``"raise"``: fail with guidance (the r3/r4 contract) for callers
      that treat a giant component as an upstream blocking bug.

    Pass max_component_edges=None to skip the check entirely (trusted
    pre-blocked inputs; above local_threshold these take the filter
    cascade up front without paying the CC + per-component count).
    """
    return _build_merge_edges_impl(
        edges_fp, False, max_component_edges, local_threshold,
        cc_local_threshold, edges_per_task, on_oversized,
    )


def partition_at(
    merge_edges: DataFrame,
    records: DataFrame,
    threshold_fp: int,
) -> DataFrame:
    """Materialise the partition at a threshold: CC of merge edges with
    threshold_fp >= t (inclusive semantics, builder.rs:291), isolates
    as singletons (builder.rs:313-322).

    records: DataFrame with a ``record_id`` column (full record space).
    Returns DataFrame(record_id long, cluster_id long).
    """
    active = merge_edges.where(F.col("threshold_fp") >= F.lit(int(threshold_fp)))
    comps = connected_components(active, "child", "parent")
    return (
        records.select("record_id")
        .dropDuplicates(["record_id"])
        .join(comps.withColumnRenamed("node", "record_id"), "record_id", "left")
        .select(
            "record_id",
            F.coalesce("component", "record_id").alias("cluster_id"),
        )
    )


def memberships_for_grid(
    merge_edges: DataFrame,
    records: DataFrame,
    thresholds_fp: list[int],
    local_threshold: int = 20_000_000,
    max_local_cells: int = 50_000_000,
) -> DataFrame:
    """A17 sweep support: memberships for a whole threshold grid in ONE
    pass — per-component local reconstruction via cogrouped
    applyInPandas, emitting (threshold_fp, record_id, cluster_id) for
    every grid point.

    The output is |grid| x n rows; downstream metric sweeps consume it
    with a single grouped aggregation instead of per-threshold jobs
    (SURVEY.md §2.4 A17).

    Routing: when the dendrogram fits one task (merge edges <=
    ``local_threshold``) AND the output stays bounded (|grid| x
    records <= ``max_local_cells``), the whole grid reconstruction
    runs as ONE cogrouped Arrow task — the grid kernel's union-find
    handles multiple components natively, so the global-CC job and the
    two component-tag joins are pure overhead at that size. Larger
    inputs fan out over hash-BUCKETED components (one kernel run per
    bucket, per-task cells bounded by ``max_local_cells``) — a
    1000-point sweep over 1M records is |grid| x n = 1e9 cells, which
    MUST fan out. For count/entropy-only sweeps prefer
    sweep_stats_from_merges, which never materialises cells at all.
    """
    grid = sorted({int(t) for t in thresholds_fp}, reverse=True)
    rec0 = records.select("record_id").dropDuplicates(["record_id"])
    grid_list = list(grid)

    def run(batches):
        """mapInPandas body over the tagged union stream (record rows
        carry record_id, merge-edge rows carry threshold_fp/child/
        parent): ONE kernel run per task, output yielded in
        _YIELD_CHUNK frames — the old cogroup path returned up to
        max_local_cells (~1.2+ GB) as a single pandas DataFrame plus
        its Arrow conversion copy (ADVICE r4)."""
        rid_p, ch_p, pa_p, tf_p = [], [], [], []
        for b in batches:
            is_rec = b["child"].isna()
            r = b.loc[is_rec, "record_id"]
            if len(r):
                rid_p.append(r.to_numpy(dtype=np.int64))
            m = b.loc[~is_rec]
            if len(m):
                ch_p.append(m["child"].to_numpy(dtype=np.int64))
                pa_p.append(m["parent"].to_numpy(dtype=np.int64))
                tf_p.append(m["threshold_fp"].to_numpy(dtype=np.int64))
        if not rid_p:
            if ch_p:
                raise ValueError(
                    "merge edges arrived in a task with no record rows; "
                    "memberships_for_grid requires every merge-edge "
                    "endpoint to appear in the records frame"
                )
            return
        nodes = np.sort(np.concatenate(rid_p) if len(rid_p) > 1 else rid_p[0])
        if ch_p:
            ch = np.concatenate(ch_p) if len(ch_p) > 1 else ch_p[0]
            pa = np.concatenate(pa_p) if len(pa_p) > 1 else pa_p[0]
            tf = np.concatenate(tf_p) if len(tf_p) > 1 else tf_p[0]
            order = np.argsort(-tf, kind="stable")
            ch, pa, tf = ch[order], pa[order], tf[order]
        else:
            ch = pa = tf = np.empty(0, dtype=np.int64)
        grid_arr = np.array(grid_list, dtype=np.int64)  # already descending

        ch_idx = np.searchsorted(nodes, ch)
        pa_idx = np.searchsorted(nodes, pa)
        # contract check BEFORE the kernel: an out-of-range searchsorted
        # index would make uf_grid_labels read/write parent[] out of
        # bounds — silent corruption where the old pure-Python path
        # raised a KeyError (ADVICE r4)
        for idx_arr, vals, what in ((ch_idx, ch, "child"), (pa_idx, pa, "parent")):
            bad = (idx_arr >= len(nodes)) | (
                nodes[np.minimum(idx_arr, len(nodes) - 1)] != vals
            )
            if bad.any():
                missing = np.unique(vals[bad])[:10]
                raise ValueError(
                    f"merge edges reference {what} record ids absent from "
                    f"records (first missing: {missing.tolist()}); "
                    "memberships_for_grid requires every merge-edge "
                    "endpoint to appear in the records frame"
                )

        n = len(nodes)
        if uf_native.native_available():
            # C kernel: O(edges + grid*nodes) with no per-edge Python;
            # handles multiple components in one batch natively
            labels_idx = uf_native.grid_labels_native(
                ch_idx, pa_idx, tf, n, grid_arr
            )
            for g in range(len(grid_arr)):
                row = labels_idx[g]
                for i in range(0, n, _YIELD_CHUNK):
                    yield pd.DataFrame(
                        {
                            "threshold_fp": np.full(
                                min(_YIELD_CHUNK, n - i), grid_arr[g], dtype=np.int64
                            ),
                            "record_id": nodes[i : i + _YIELD_CHUNK],
                            "cluster_id": nodes[row[i : i + _YIELD_CHUNK]],
                        }
                    )
            return

        parent = np.arange(n, dtype=np.int64)

        def find(x: int) -> int:
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        pos = 0
        for t in grid_list:  # descending: union-find only ever coarsens
            while pos < len(tf) and tf[pos] >= t:
                ri, rj = find(int(ch_idx[pos])), find(int(pa_idx[pos]))
                if ri != rj:
                    if ri <= rj:
                        parent[rj] = ri
                    else:
                        parent[ri] = rj
                pos += 1
            labels = np.array([nodes[find(i)] for i in range(n)], dtype=np.int64)
            for i in range(0, n, _YIELD_CHUNK):
                yield pd.DataFrame(
                    {
                        "threshold_fp": np.full(
                            min(_YIELD_CHUNK, n - i), t, dtype=np.int64
                        ),
                        "record_id": nodes[i : i + _YIELD_CHUNK],
                        "cluster_id": labels[i : i + _YIELD_CHUNK],
                    }
                )

    out_schema = "threshold_fp long, record_id long, cluster_id long"
    _null = F.lit(None).cast("long")

    # both routing probes in ONE job (r6): a tagged union partial-
    # aggregates map-side, so this is two tiny concurrent scans
    # instead of two sequential count jobs
    _cnt = {
        int(r["_side"]): int(r["n"])
        for r in rec0.select(F.lit(0).alias("_side"))
        .unionAll(merge_edges.select(F.lit(1).alias("_side")))
        .groupBy("_side")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_rec = _cnt.get(0, 0)
    n_me = _cnt.get(1, 0)
    if local_threshold:
        if n_me <= local_threshold and n_rec * max(len(grid), 1) <= max_local_cells:
            # fused: whole dendrogram + record space through one task
            stream = rec0.select(
                F.col("record_id"),
                _null.alias("threshold_fp"),
                _null.alias("child"),
                _null.alias("parent"),
            ).unionAll(
                merge_edges.select(
                    _null.alias("record_id"), "threshold_fp", "child", "parent"
                )
            )
            return stream.repartition(1).mapInPandas(run, schema=out_schema)

    # component id per record over the FULL edge set; isolates get their own
    all_comps = connected_components(merge_edges, "child", "parent")
    rec = rec0.join(
        all_comps.withColumnRenamed("node", "record_id"), "record_id", "left"
    ).select("record_id", F.coalesce("component", "record_id").alias("_comp"))
    # per-component cell guard (VERDICT r4 Wrong #3): hash partitioning
    # cannot split one component, so a single component whose
    # |grid| x size exceeds the per-task cell bound would silently
    # over-allocate one task — raise with guidance instead, matching
    # build_merge_edges' guard ergonomics
    biggest = rec.groupBy("_comp").agg(F.count(F.lit(1)).alias("_n")).agg(
        F.max("_n").alias("_m")
    ).collect()[0]["_m"]
    if biggest is not None and int(biggest) * max(len(grid), 1) > max_local_cells:
        raise ValueError(
            f"largest component has {int(biggest)} records; with a "
            f"{len(grid)}-point grid that is "
            f"{int(biggest) * len(grid)} cells in ONE task "
            f"(> max_local_cells={max_local_cells}). Use "
            "sweep_stats_from_merges for count/entropy sweeps (never "
            "materialises cells), split the grid across calls, or raise "
            "max_local_cells."
        )
    # merge edges belong to the component of their parent's root; parent is
    # not the root in general, so map through all_comps
    me = (
        merge_edges.join(
            all_comps.withColumnRenamed("node", "parent").withColumnRenamed(
                "component", "_comp"
            ),
            "parent",
        )
    ).select("_comp", "threshold_fp", "child", "parent")

    # hash-partition whole components so each task reconstructs MANY
    # components in one kernel run (the grid kernel handles
    # multi-component batches natively — the fused path above IS that).
    # Cogrouping on raw _comp paid a per-GROUP pandas dispatch: at 10M
    # records / 1M tiny post-blocking components that is minutes of
    # pure overhead. Partition count bounds per-task output cells
    # (|grid| x nodes_per_task <= ~max_local_cells on average) and
    # per-task input edges; the guard above bounds the worst single
    # component.
    n_buckets = max(
        1,
        -(-(n_rec * max(len(grid), 1)) // max(max_local_cells, 1)),
        -(-n_me // 5_000_000),
    )
    stream = rec.select(
        F.col("_comp"),
        F.col("record_id"),
        _null.alias("threshold_fp"),
        _null.alias("child"),
        _null.alias("parent"),
    ).unionAll(
        me.select(
            "_comp", _null.alias("record_id"), "threshold_fp", "child", "parent"
        )
    )
    return (
        stream.repartition(int(n_buckets), "_comp")
        .drop("_comp")
        .mapInPandas(run, schema=out_schema)
    )


def sweep_stats_from_merges(
    sized_merge_edges: DataFrame,
    n_records: int,
    grid_fps: list[int],
) -> DataFrame:
    """Per-threshold (entity_count, entropy) for a whole grid from the
    SIZED merge events alone — O(m + |grid|) instead of the
    memberships path's O(|grid| x n) rows.

    Each merge event replaces two clusters of sizes (a, b) with one of
    size a+b, so with p_s = s/N the entropy delta is closed-form:
        dH = (a/N)ln(a/N) + (b/N)ln(b/N) - ((a+b)/N)ln((a+b)/N)
    and the entity count drops by exactly 1. Starting from N
    singletons (H = ln N, count = N) and accumulating deltas over
    events with threshold_fp >= t gives the exact stats at every t —
    the same inclusive semantics as partition_at (builder.rs:291).
    Isolated records never appear in events and stay singletons, which
    the N-singleton start already accounts for.

    Scale shape: one groupBy(threshold_fp) partial-aggregates the m
    events down to <= PRECISION_FACTOR+1 distinct-threshold rows
    map-side; the running sum then runs in ONE ordered window over
    those rows plus |grid| sentinel rows — bounded by the quantisation
    grid (1e6), NOT by records or events, so the single-partition
    window is safe at any data scale. Grid sentinels sort AFTER real
    events at the same threshold (inclusive >= t).
    """
    spark = sized_merge_edges.sparkSession
    n = float(max(n_records, 1))
    ln_n = float(np.log(n)) if n_records > 0 else 0.0

    a = F.col("left_size").cast("double") / F.lit(n)
    b = F.col("right_size").cast("double") / F.lit(n)
    c = (F.col("left_size") + F.col("right_size")).cast("double") / F.lit(n)
    d_h = a * F.log(a) + b * F.log(b) - c * F.log(c)

    per_t = (
        sized_merge_edges.select(F.col("threshold_fp"), d_h.alias("_dh"))
        .groupBy("threshold_fp")
        .agg(F.sum("_dh").alias("dH"), F.count(F.lit(1)).alias("dC"))
        .select("threshold_fp", F.lit(0).alias("_is_grid"), "dH", "dC")
    )
    grid_rows = spark.createDataFrame(
        [(int(t),) for t in sorted({int(t) for t in grid_fps})],
        "threshold_fp long",
    ).select(
        "threshold_fp",
        F.lit(1).alias("_is_grid"),
        F.lit(0.0).alias("dH"),
        F.lit(0).alias("dC"),
    )

    from pyspark.sql.window import Window

    w = (
        Window.orderBy(F.col("threshold_fp").desc(), F.col("_is_grid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_t.unionAll(grid_rows)
        .select(
            "threshold_fp",
            "_is_grid",
            F.sum("dH").over(w).alias("_cumH"),
            F.sum("dC").over(w).alias("_cumC"),
        )
        .where(F.col("_is_grid") == 1)
        .select(
            "threshold_fp",
            (F.lit(int(n_records)) - F.col("_cumC")).alias("entity_count"),
            F.when(F.lit(n_records) > 0, F.lit(ln_n) + F.col("_cumH"))
            .otherwise(F.lit(0.0))
            .alias("entropy"),
        )
    )
