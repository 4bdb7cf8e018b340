"""Native (C, via ctypes) union-find kernels for the per-component /
per-block local work inside Arrow tasks.

Why this exists (VERDICT r3 "Wrong #3"): the exact local paths —
single-linkage dendrogram sweeps (`operators/hierarchy.py`), per-block
connected components (`operators/components.py`), and the grid
membership reconstruction — iterated edges one-by-one in pure Python
inside a single applyInPandas task. Bounded by
``max_component_edges=10M``, but a component at the cap was a ~10M
-iteration Python loop in ONE task (minutes); at 100x scale that is
the first thing to melt. These kernels run the same union-find
semantics (union by MIN node id -> deterministic min-id
representatives, reference builder.rs:146-218) over int64 index
arrays at C speed (~100M unions/s/core vs ~1M/s in Python).

Node ids are sparse int64; the Python wrappers map them to dense
indices with vectorized ``np.searchsorted`` over the sorted unique
node array (so "min index" == "min node id" inside the kernels) and
map results back by fancy-indexing. Deployment model matches
``jw_native``: ~100 lines of C compiled lazily once per host into a
per-user 0700 cache dir (atomic rename; ownership-verified before
dlopen); every caller keeps a pure-Python/numpy fallback for
compiler-less workers.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

from entityframe_spark.functions.jw_native import _cache_dir, tune_allocator

_C_SOURCE = r"""
#include <stdint.h>

/* iterative find with full path compression */
static int64_t uf_find(int64_t* parent, int64_t x)
{
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
        int64_t nxt = parent[x];
        parent[x] = root;
        x = nxt;
    }
    return root;
}

/* Connected components over dense node indices 0..n_nodes-1.
   Union by MIN INDEX (== min node id when indices follow sorted
   order). On return out[i] = root index of node i. */
void uf_components(const int64_t* src, const int64_t* dst,
                   int64_t n_edges, int64_t n_nodes, int64_t* out)
{
    for (int64_t i = 0; i < n_nodes; i++) out[i] = i;
    for (int64_t e = 0; e < n_edges; e++) {
        int64_t rs = uf_find(out, src[e]);
        int64_t rd = uf_find(out, dst[e]);
        if (rs == rd) continue;
        if (rs <= rd) out[rd] = rs; else out[rs] = rd;
    }
    for (int64_t i = 0; i < n_nodes; i++) out[i] = uf_find(out, i);
}

/* Single-linkage dendrogram sweep (reference builder.rs:146-218):
   edges pre-sorted by threshold DESC (stable), indices dense. Emits
   one merge event per union: (t, child=absorbed root, parent=kept
   root, left_size=|kept cluster|, right_size=|absorbed cluster|).
   Returns number of merge events (<= n_nodes-1). */
int64_t uf_single_linkage(const int64_t* src, const int64_t* dst,
                          const int64_t* wfp,
                          int64_t n_edges, int64_t n_nodes,
                          int64_t* parent, int64_t* size,
                          int64_t* out_t, int64_t* out_child,
                          int64_t* out_parent,
                          int64_t* out_left, int64_t* out_right)
{
    for (int64_t i = 0; i < n_nodes; i++) { parent[i] = i; size[i] = 1; }
    int64_t m = 0;
    for (int64_t e = 0; e < n_edges; e++) {
        int64_t rs = uf_find(parent, src[e]);
        int64_t rd = uf_find(parent, dst[e]);
        if (rs == rd) continue;
        int64_t keep, drop;
        if (rs <= rd) { keep = rs; drop = rd; } else { keep = rd; drop = rs; }
        out_t[m] = wfp[e];
        out_child[m] = drop;
        out_parent[m] = keep;
        out_left[m] = size[keep];
        out_right[m] = size[drop];
        size[keep] += size[drop];
        parent[drop] = keep;
        m++;
    }
    return m;
}

/* Max-spanning-forest keep-mask (Kruskal filter): edges pre-sorted by
   the canonical (-w, src, dst) total order, indices dense. mask[e]=1
   iff edge e unions two distinct components at its turn, i.e. it is
   in the canonical Kruskal forest under that order. An edge rejected
   here (cycle among strictly-earlier edges of the SAME subset) is
   rejected by Kruskal on any superset too, so dropping mask==0 edges
   from a partition never removes a globally-canonical forest edge —
   the standard MST filtering step (Lattanzi et al., "Filtering: a
   method for solving graph problems in MapReduce", SPAA'11). */
void uf_msf_mask(const int64_t* src, const int64_t* dst,
                 int64_t n_edges, int64_t n_nodes,
                 int64_t* parent, uint8_t* mask)
{
    for (int64_t i = 0; i < n_nodes; i++) parent[i] = i;
    for (int64_t e = 0; e < n_edges; e++) {
        int64_t rs = uf_find(parent, src[e]);
        int64_t rd = uf_find(parent, dst[e]);
        if (rs == rd) { mask[e] = 0; continue; }
        if (rs <= rd) parent[rd] = rs; else parent[rs] = rd;
        mask[e] = 1;
    }
}

/* Grid membership reconstruction (hierarchy.memberships_for_grid):
   merge edges (child,parent indices) pre-sorted by threshold DESC,
   grid thresholds DESC. For each grid point, apply all merges with
   tf >= t then snapshot root labels: out[g*n_nodes + i] = root index
   of node i at grid[g]. Descending grid means the union-find only
   ever coarsens — total work O(n_edges + n_grid * n_nodes). */
void uf_grid_labels(const int64_t* child, const int64_t* par,
                    const int64_t* tf, int64_t n_edges,
                    int64_t n_nodes,
                    const int64_t* grid, int64_t n_grid,
                    int64_t* parent, int64_t* out)
{
    for (int64_t i = 0; i < n_nodes; i++) parent[i] = i;
    int64_t pos = 0;
    for (int64_t g = 0; g < n_grid; g++) {
        int64_t t = grid[g];
        while (pos < n_edges && tf[pos] >= t) {
            int64_t ri = uf_find(parent, child[pos]);
            int64_t rj = uf_find(parent, par[pos]);
            if (ri != rj) {
                if (ri <= rj) parent[rj] = ri; else parent[ri] = rj;
            }
            pos++;
        }
        int64_t* row = out + g * n_nodes;
        for (int64_t i = 0; i < n_nodes; i++) row[i] = uf_find(parent, i);
    }
}
"""

_lib = None
_tried = False


def _compile() -> "ctypes.CDLL | None":
    digest = hashlib.sha256(_C_SOURCE.encode()).hexdigest()[:16]
    so_path = os.path.join(_cache_dir(), f"ef_uf_{digest}.so")
    if not os.path.exists(so_path):
        src = so_path + f".{os.getpid()}.c"
        tmp_so = so_path + f".{os.getpid()}.tmp"
        with open(src, "w") as f:
            f.write(_C_SOURCE)
        try:
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", tmp_so, src],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(tmp_so, so_path)  # atomic: concurrent workers race safely
        finally:
            for p in (src, tmp_so):
                try:
                    os.unlink(p)
                except OSError:
                    pass
    st = os.stat(so_path)
    if st.st_uid != os.getuid():
        raise RuntimeError(f"{so_path} not owned by current user; refusing to dlopen")
    lib = ctypes.CDLL(so_path)
    I64P = ctypes.POINTER(ctypes.c_int64)
    lib.uf_components.argtypes = [I64P, I64P, ctypes.c_int64, ctypes.c_int64, I64P]
    lib.uf_components.restype = None
    lib.uf_single_linkage.argtypes = [I64P] * 3 + [ctypes.c_int64] * 2 + [I64P] * 7
    lib.uf_single_linkage.restype = ctypes.c_int64
    lib.uf_grid_labels.argtypes = (
        [I64P] * 3 + [ctypes.c_int64] * 2 + [I64P, ctypes.c_int64] + [I64P] * 2
    )
    lib.uf_grid_labels.restype = None
    U8P = ctypes.POINTER(ctypes.c_uint8)
    lib.uf_msf_mask.argtypes = [I64P, I64P, ctypes.c_int64, ctypes.c_int64, I64P, U8P]
    lib.uf_msf_mask.restype = None
    return lib


def native_available() -> bool:
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _compile()
        except Exception:
            _lib = None
    return _lib is not None


def _i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def _p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def components_native(src_idx: np.ndarray, dst_idx: np.ndarray, n_nodes: int) -> np.ndarray:
    """Root index per node (0..n_nodes-1); union by min index."""
    tune_allocator()
    src_idx, dst_idx = _i64(src_idx), _i64(dst_idx)
    out = np.empty(n_nodes, dtype=np.int64)
    _lib.uf_components(_p(src_idx), _p(dst_idx), len(src_idx), n_nodes, _p(out))
    return out


def single_linkage_native(
    src_idx: np.ndarray, dst_idx: np.ndarray, wfp: np.ndarray, n_nodes: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(t, child_idx, parent_idx, left_size, right_size) arrays of the
    merge events; inputs must already be sorted by wfp DESC (stable)."""
    tune_allocator()
    src_idx, dst_idx, wfp = _i64(src_idx), _i64(dst_idx), _i64(wfp)
    cap = max(n_nodes - 1, 1) if n_nodes else 1
    parent = np.empty(n_nodes, dtype=np.int64)
    size = np.empty(n_nodes, dtype=np.int64)
    out = [np.empty(cap, dtype=np.int64) for _ in range(5)]
    m = _lib.uf_single_linkage(
        _p(src_idx), _p(dst_idx), _p(wfp), len(src_idx), n_nodes,
        _p(parent), _p(size), *[_p(o) for o in out],
    )
    return tuple(o[:m] for o in out)  # type: ignore[return-value]


def msf_mask_native(src_idx: np.ndarray, dst_idx: np.ndarray, n_nodes: int) -> np.ndarray:
    """Boolean keep-mask of the canonical Kruskal forest; inputs must
    already be in the canonical (-w, src, dst) order (weights are not
    needed — the order carries them)."""
    tune_allocator()
    src_idx, dst_idx = _i64(src_idx), _i64(dst_idx)
    parent = np.empty(n_nodes, dtype=np.int64)
    mask = np.empty(len(src_idx), dtype=np.uint8)
    _lib.uf_msf_mask(
        _p(src_idx), _p(dst_idx), len(src_idx), n_nodes, _p(parent),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return mask.view(np.bool_)


def grid_labels_native(
    child_idx: np.ndarray,
    parent_idx: np.ndarray,
    tf: np.ndarray,
    n_nodes: int,
    grid_desc: np.ndarray,
) -> np.ndarray:
    """Label matrix (n_grid, n_nodes): root index of each node at each
    grid threshold. tf and grid_desc must be sorted DESC."""
    tune_allocator()
    child_idx, parent_idx, tf = _i64(child_idx), _i64(parent_idx), _i64(tf)
    grid_desc = _i64(grid_desc)
    parent = np.empty(n_nodes, dtype=np.int64)
    out = np.empty(len(grid_desc) * n_nodes, dtype=np.int64)
    _lib.uf_grid_labels(
        _p(child_idx), _p(parent_idx), _p(tf), len(child_idx), n_nodes,
        _p(grid_desc), len(grid_desc), _p(parent), _p(out),
    )
    return out.reshape(len(grid_desc), n_nodes)
