"""ctypes bindings for the native host-side graph kernels.

Compiles ``graph_core.cpp`` on first use into the package directory (cached
by source hash; rebuilds automatically when the source changes) and exposes
numpy-friendly wrappers. Every entry point has a pure-numpy fallback used when
no C++ toolchain is available, so the framework never hard-requires the
native library — it is a performance layer (SURVEY.md §2.2: native where the
reference leans on native extensions).
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "graph_core.cpp")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _source_tag() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def _load():
    """Compile (if needed) and load the shared library; None on failure."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        so_path = os.path.join(_DIR, f"libgraph_core-{_source_tag()}.so")
        try:
            if not os.path.exists(so_path):
                tmp = so_path + f".tmp{os.getpid()}"
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        "-pthread", _SRC, "-o", tmp,
                    ],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so_path)
            lib = ctypes.CDLL(so_path)
        except (OSError, subprocess.CalledProcessError):
            return None

        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64 = ctypes.c_int64

        lib.coo_sort_by_dst.argtypes = [i64p, i64, i64, i64p, i64p]
        lib.coo_sort_by_dst.restype = None
        lib.groupby_edges.argtypes = [
            i64p, i64p, f64p, u8p, i64, i64, i64, i64p, i64p, f64p, u8p,
        ]
        lib.groupby_edges.restype = i64
        lib.bfs_batch.argtypes = [
            i64p, i64p, i64, i64p, i64, i64p, i64p, i64, i64, i64p, i64p,
        ]
        lib.bfs_batch.restype = None
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.pair_aggregate.argtypes = [
            i64p, i64, i64p, f32p, i64, i64, i64p, i64p, f64p,
        ]
        lib.pair_aggregate.restype = i64
        lib.pair_count.argtypes = [i64p, i64, i64]
        lib.pair_count.restype = i64
        lib.read_events_csv.argtypes = [
            ctypes.c_void_p, i64, i64, i64, i64, i64,
            i64p, i64p, u8p, ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.read_events_csv.restype = i64
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.segreduce_plan_sizes.argtypes = [
            i32p, i64, i64, i64, i64, i64p, ctypes.POINTER(ctypes.c_int64),
        ]
        lib.segreduce_plan_sizes.restype = i64
        lib.segreduce_plan_fill.argtypes = [
            i32p, i32p, f32p, i64, i64, i64, i64, i64p,
            i32p, f32p, i32p, i32p, i32p, i64,
        ]
        lib.segreduce_plan_fill.restype = None
        lib.ell_sort_by_degree.argtypes = [i64p, i64, i64p]
        lib.ell_sort_by_degree.restype = i64
        lib.ell_fill_bin.argtypes = [i64p, i32p, f32p, i64p, i64, i64, i32p, f32p]
        lib.ell_fill_bin.restype = None
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def coo_sort_by_dst(dst: np.ndarray, num_nodes: int) -> tuple[np.ndarray, np.ndarray]:
    """Stable sort permutation over destinations + CSR indptr.

    Returns (order [E], indptr [num_nodes+1]); ``dst[order]`` is ascending.
    O(E + N) counting sort natively; ``np.argsort(kind="stable")`` fallback.
    """
    dst = np.ascontiguousarray(dst, dtype=np.int64)
    lib = _load()
    if lib is None:
        order = np.argsort(dst, kind="stable")
        indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        np.add.at(indptr, dst + 1, 1)
        return order, np.cumsum(indptr)
    order = np.empty(len(dst), dtype=np.int64)
    indptr = np.empty(num_nodes + 1, dtype=np.int64)
    lib.coo_sort_by_dst(dst, len(dst), num_nodes, order, indptr)
    return order, indptr


def groupby_edges(
    u_codes: np.ndarray,
    i_codes: np.ndarray,
    weights: np.ndarray,
    purchased: np.ndarray,
    n_u: int,
    n_i: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Aggregate (user, item) pairs: (sum weight, any purchased), sorted by
    (user, item). Inputs are factorized integer codes."""
    u_codes = np.ascontiguousarray(u_codes, dtype=np.int64)
    i_codes = np.ascontiguousarray(i_codes, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float64)
    purchased = np.ascontiguousarray(purchased, dtype=np.uint8)
    n = len(u_codes)
    lib = _load()
    if lib is None:
        order = np.lexsort((i_codes, u_codes))
        us, is_, ws, ps = u_codes[order], i_codes[order], weights[order], purchased[order]
        new = np.empty(n, dtype=bool)
        new[0] = True
        np.not_equal(us[1:], us[:-1], out=new[1:])
        new[1:] |= is_[1:] != is_[:-1]
        group = np.cumsum(new) - 1
        m = int(group[-1]) + 1 if n else 0
        out_w = np.zeros(m)
        np.add.at(out_w, group, ws)
        out_p = np.zeros(m, dtype=np.uint8)
        np.maximum.at(out_p, group, ps)
        return us[new], is_[new], out_w, out_p
    out_u = np.empty(n, dtype=np.int64)
    out_i = np.empty(n, dtype=np.int64)
    out_w = np.empty(n, dtype=np.float64)
    out_p = np.empty(n, dtype=np.uint8)
    m = lib.groupby_edges(
        u_codes, i_codes, weights, purchased, n, n_u, n_i, out_u, out_i, out_w, out_p
    )
    return out_u[:m].copy(), out_i[:m].copy(), out_w[:m].copy(), out_p[:m].copy()


def pair_aggregate(
    indptr: np.ndarray,
    items: np.ndarray,
    weights: np.ndarray,
    n_items: int,
    max_deg: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Aggregate per-row item co-occurrence pairs into a (a, b, v) COO sorted
    by (a, b): v[a,b] = Σ_rows w_a·w_b over rows with degree ≤ max_deg.

    Native two-pass counting sort; numpy lexsort fallback.
    """
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    items = np.ascontiguousarray(items, dtype=np.int64)
    weights = np.ascontiguousarray(weights, dtype=np.float32)
    lib = _load()
    if lib is None:
        deg = np.diff(indptr)
        keep = (deg <= max_deg) & (deg > 0)
        a_parts, b_parts, v_parts = [], [], []
        for r in np.nonzero(keep)[0]:
            row_i = items[indptr[r] : indptr[r + 1]]
            row_w = weights[indptr[r] : indptr[r + 1]].astype(np.float64)
            a_parts.append(np.repeat(row_i, len(row_i)))
            b_parts.append(np.tile(row_i, len(row_i)))
            v_parts.append(np.outer(row_w, row_w).ravel())
        if not a_parts:
            return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        v = np.concatenate(v_parts)
        order = np.lexsort((b, a))
        a, b, v = a[order], b[order], v[order]
        new = np.empty(len(a), dtype=bool)
        new[0] = True
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        group = np.cumsum(new) - 1
        out_v = np.zeros(int(group[-1]) + 1)
        np.add.at(out_v, group, v)
        return a[new], b[new], out_v
    cap = int(lib.pair_count(indptr, len(indptr) - 1, max_deg))
    if cap == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0))
    out_a = np.empty(cap, dtype=np.int64)
    out_b = np.empty(cap, dtype=np.int64)
    out_v = np.empty(cap, dtype=np.float64)
    m = lib.pair_aggregate(
        indptr, len(indptr) - 1, items, weights, n_items, max_deg,
        out_a, out_b, out_v,
    )
    return out_a[:m].copy(), out_b[:m].copy(), out_v[:m].copy()


def segreduce_plan(
    src: np.ndarray,
    dst_sorted: np.ndarray,
    w: np.ndarray,
    n_out: int,
    ot: int,
    ch: int,
):
    """Padded chunk layout for the Pallas segment-reduce plan
    (``ops/spmm_fast.build_segreduce_plan``): two linear C passes instead of
    numpy's repeat/arange/cumsum/fancy-index chain over the 10M-arc arrays.

    Returns (gidx int32 [e_pad], gw f32 [e_pad], seg int32 [e_pad],
    tile_map int32 [n_chunks], first int32 [n_chunks]); None if the native
    library is unavailable (caller falls back to numpy).
    """
    lib = _load()
    if lib is None:
        return None
    # int32 id domain: wider inputs would WRAP silently through the casts
    # below (safe at cosmetics scale — ids < 1.7M — but this is a generic
    # entry point).
    if len(src):
        assert int(np.max(src)) < 2**31 and int(np.max(dst_sorted)) < 2**31, (
            "segreduce_plan ids must fit int32"
        )
    src = np.ascontiguousarray(src, dtype=np.int32)
    dst_sorted = np.ascontiguousarray(dst_sorted, dtype=np.int32)
    w = np.ascontiguousarray(w, dtype=np.float32)
    n_tiles = -(-int(n_out) // int(ot)) if n_out else 0
    cnt = np.empty(max(n_tiles, 1), dtype=np.int64)
    n_chunks = ctypes.c_int64(0)
    e_pad = int(
        lib.segreduce_plan_sizes(
            dst_sorted, len(src), int(n_out), int(ot), int(ch), cnt,
            ctypes.byref(n_chunks),
        )
    )
    gidx = np.empty(e_pad, dtype=np.int32)
    gw = np.empty(e_pad, dtype=np.float32)
    seg = np.empty(e_pad, dtype=np.int32)
    tile_map = np.empty(n_chunks.value, dtype=np.int32)
    first = np.empty(n_chunks.value, dtype=np.int32)
    lib.segreduce_plan_fill(
        src, dst_sorted, w, len(src), int(n_out), int(ot), int(ch), cnt,
        gidx, gw, seg, tile_map, first, e_pad,
    )
    return gidx, gw, seg, tile_map, first


def ell_sort_by_degree(indptr: np.ndarray):
    """Stable counting sort of CSR rows by degree (ascending). Returns
    (order int64 [n_rows], max_deg); None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    order = np.empty(len(indptr) - 1, dtype=np.int64)
    max_deg = int(lib.ell_sort_by_degree(indptr, len(indptr) - 1, order))
    return order, max_deg


def ell_fill_bin(
    indptr: np.ndarray,
    src: np.ndarray,
    w: np.ndarray,
    rows: np.ndarray,
    width: int,
):
    """Densify one ELL degree bin: returns (ib int32 [nb, W], wb f32 [nb, W])
    zero-padded; None if native unavailable."""
    lib = _load()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    src = np.ascontiguousarray(src, dtype=np.int32)
    w = np.ascontiguousarray(w, dtype=np.float32)
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    nb = len(rows)
    ib = np.empty((nb, int(width)), dtype=np.int32)
    wb = np.empty((nb, int(width)), dtype=np.float32)
    lib.ell_fill_bin(indptr, src, w, rows, nb, int(width), ib, wb)
    return ib, wb


def read_events_csv(
    path: str,
    user_col: str = "user_id",
    item_col: str = "item_id",
    type_col: str = "event_type",
    n_threads: int | None = None,
):
    """Multithreaded CSV event-log reader (native only; callers fall back to
    ``pandas.read_csv``). Extracts the integer user/item id columns and the
    event-type column (interned to codes) from a CSV with arbitrary extra
    columns — the reference's raw cosmetics dump has 9 (``notebooks/0.eda
    .ipynb`` cell 7); rows with unparseable ids are dropped.

    Returns (user_ids int64 [N], item_ids int64 [N], event_types: pandas-
    ready object array of type strings [N]).
    """
    import mmap

    lib = _load()
    if lib is None:
        raise RuntimeError("native graph_core unavailable")
    size = os.path.getsize(path)
    if size == 0:
        return (
            np.empty(0, np.int64), np.empty(0, np.int64),
            np.empty(0, dtype=object),
        )
    # mmap instead of f.read(): the reference raw dump is 2.43 GB and the
    # host has ~2 cores and tight memory — no bytes copy, no body-slice copy
    # (ACCESS_COPY gives a writable view for from_buffer without touching
    # the file; the C side never writes it).
    with open(path, "rb") as f:
        mm = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_COPY)
    try:
        nl = mm.find(b"\n")
        header = mm[: nl if nl >= 0 else size].decode().strip("\r")
        cols = [c.strip().strip('"') for c in header.split(",")]
        try:
            cu, ci, ct = (
                cols.index(user_col), cols.index(item_col), cols.index(type_col)
            )
        except ValueError as e:
            raise ValueError(f"missing column in {cols}: {e}") from None
        off = nl + 1 if nl >= 0 else size
        body_len = size - off
        if body_len:
            body_view = np.frombuffer(mm, dtype=np.uint8, offset=off)
            cap = int((body_view == 0x0A).sum()) + 1
            del body_view
        else:
            cap = 1
        out_u = np.empty(cap, dtype=np.int64)
        out_i = np.empty(cap, dtype=np.int64)
        out_t = np.empty(cap, dtype=np.uint8)
        type_names = ctypes.create_string_buffer(32 * 64)
        n_types = ctypes.c_int64(0)
        if n_threads is None:
            n_threads = min(8, os.cpu_count() or 1)
        base = ctypes.addressof(ctypes.c_char.from_buffer(mm))
        n = lib.read_events_csv(
            ctypes.c_void_p(base + off), body_len, cu, ci, ct, n_threads,
            out_u, out_i, out_t, type_names, ctypes.byref(n_types),
        )
    finally:
        # from_buffer holds an export on mm; drop before closing.
        base = None
        import gc

        gc.collect()
        mm.close()
    names = [
        type_names.raw[k * 64 : (k + 1) * 64].split(b"\0")[0].decode()
        for k in range(n_types.value)
    ]
    u, i, t = out_u[:n], out_i[:n], out_t[:n]
    ok = (u >= 0) & (i >= 0) & (t < len(names))
    lut = np.array(names + [""], dtype=object)
    return u[ok], i[ok], lut[t[ok].astype(np.int64)]


def bfs_batch(
    indptr: np.ndarray,
    indices: np.ndarray,
    sources: np.ndarray,
    target_indptr: np.ndarray,
    targets: np.ndarray,
    cutoff: int = 8,
    n_threads: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Multithreaded per-source BFS (native only; callers fall back to the
    pure-python BFS in ``explain.paths`` when unavailable).

    Returns (dist [n_targets], paths [n_targets, cutoff+1]); dist -1 means
    unreachable within cutoff, path rows hold dist+1 valid node ids.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native graph_core unavailable")
    indptr = np.ascontiguousarray(indptr, dtype=np.int64)
    indices = np.ascontiguousarray(indices, dtype=np.int64)
    sources = np.ascontiguousarray(sources, dtype=np.int64)
    target_indptr = np.ascontiguousarray(target_indptr, dtype=np.int64)
    targets = np.ascontiguousarray(targets, dtype=np.int64)
    if n_threads is None:
        n_threads = min(8, os.cpu_count() or 1)
    dist = np.empty(len(targets), dtype=np.int64)
    paths = np.full((len(targets), cutoff + 1), -1, dtype=np.int64)
    lib.bfs_batch(
        indptr, indices, len(indptr) - 1, sources, len(sources),
        target_indptr, targets, cutoff, n_threads, dist, paths,
    )
    return dist, paths
