"""ctypes bindings + on-demand build for the native graphcore library.

``shortest_path_union_by_pair`` has two engines: the vectorized numpy
fallback (``data/bfs_label.py``) and the C++ kernel (``native/
graphcore.cpp``), which this module compiles with g++ on first use (cached
next to the source) and exposes with an identical signature and identical
outputs.  ``best_shortest_path_union`` picks the native engine when the
library is importable/buildable and silently falls back otherwise.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

from evi_rag_tpu.data import bfs_label

_REPO_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO_ROOT / "native" / "graphcore.cpp"
_SO = _REPO_ROOT / "native" / "libgraphcore.so"
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_load_failed = False


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load_library(*, build_if_missing: bool = True) -> ctypes.CDLL | None:
    global _lib, _load_failed
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                if not build_if_missing:
                    raise FileNotFoundError(_SO)
                _build()
            lib = ctypes.CDLL(str(_SO))
        except Exception:
            _load_failed = True
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        lib.evi_bfs_pair_labels.restype = ctypes.c_int64
        lib.evi_bfs_pair_labels.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, i64p, ctypes.c_int64, i64p,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), i64p, i64p, i64p, i64p,
            ctypes.POINTER(i64p), i64p,
        ]
        lib.evi_free_i64.argtypes = [i64p]
        lib.evi_bfs_dist.argtypes = [
            ctypes.c_int64, ctypes.c_int64, i64p, i64p,
            ctypes.c_int64, i64p, ctypes.c_int, i64p,
        ]
        _lib = lib
        return _lib


def _as_i64(arr) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(arr, dtype=np.int64))


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def shortest_path_union_by_pair_native(
    *,
    num_nodes: int,
    edge_src,
    edge_dst,
    sources,
    targets,
    path_mode: str = "undirected",
):
    """Native engine with the exact ``bfs_label`` return contract."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("graphcore native library unavailable")
    if path_mode not in ("undirected", "qa_directed"):
        raise ValueError(f"unknown path_mode {path_mode!r}")
    src = _as_i64(edge_src)
    dst = _as_i64(edge_dst)
    ss = _as_i64(sources)
    aa = _as_i64(targets)
    e = src.shape[0]
    mask = np.zeros(e, dtype=np.uint8)
    max_pairs = max(int(ss.size) * int(aa.size), 1)
    pair_start = np.zeros(max_pairs, np.int64)
    pair_answer = np.zeros(max_pairs, np.int64)
    pair_len = np.zeros(max_pairs, np.int64)
    pair_counts = np.zeros(max_pairs, np.int64)
    edge_ids_ptr = ctypes.POINTER(ctypes.c_int64)()
    edge_total = ctypes.c_int64(0)

    n_pairs = lib.evi_bfs_pair_labels(
        int(num_nodes), int(e), _ptr(src), _ptr(dst),
        int(ss.size), _ptr(ss), int(aa.size), _ptr(aa),
        1 if path_mode == "qa_directed" else 0,
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        _ptr(pair_start), _ptr(pair_answer), _ptr(pair_len), _ptr(pair_counts),
        ctypes.byref(edge_ids_ptr), ctypes.byref(edge_total),
    )
    if n_pairs < 0:
        raise RuntimeError("evi_bfs_pair_labels failed")
    try:
        total = int(edge_total.value)
        edge_ids = (
            np.ctypeslib.as_array(edge_ids_ptr, shape=(total,)).copy().tolist()
            if total
            else []
        )
    finally:
        if edge_ids_ptr:
            lib.evi_free_i64(edge_ids_ptr)
    return (
        mask.astype(bool),
        pair_start[:n_pairs].tolist(),
        pair_answer[:n_pairs].tolist(),
        edge_ids,
        pair_counts[:n_pairs].tolist(),
        pair_len[:n_pairs].tolist(),
    )


def best_shortest_path_union(**kwargs):
    """Native when available, numpy otherwise (identical results)."""
    if load_library() is not None:
        try:
            return shortest_path_union_by_pair_native(**kwargs)
        except RuntimeError:
            pass
    return bfs_label.shortest_path_union_by_pair(**kwargs)
