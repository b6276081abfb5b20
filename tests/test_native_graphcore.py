"""Native graphcore parity vs the numpy BFS labeling engine."""

import numpy as np
import pytest

from evi_rag_tpu.data.bfs_label import bfs_dist, build_csr, shortest_path_union_by_pair
from evi_rag_tpu.data.native import load_library, shortest_path_union_by_pair_native

pytestmark = pytest.mark.skipif(
    load_library() is None, reason="graphcore native library unavailable"
)


def _random_case(rng, n=40, e=120, n_starts=2, n_answers=3):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    # Sprinkle some invalid endpoints to exercise the drop path.
    src[rng.random(e) < 0.02] = -1
    dst[rng.random(e) < 0.02] = n + 5
    starts = rng.integers(0, n, size=n_starts)
    answers = rng.integers(0, n, size=n_answers)
    return dict(num_nodes=n, edge_src=src, edge_dst=dst, sources=starts, targets=answers)


@pytest.mark.parametrize("mode", ["undirected", "qa_directed"])
def test_parity_random_graphs(mode):
    rng = np.random.default_rng(42)
    for trial in range(12):
        case = _random_case(rng)
        want = shortest_path_union_by_pair(path_mode=mode, **case)
        got = shortest_path_union_by_pair_native(path_mode=mode, **case)
        np.testing.assert_array_equal(got[0], want[0], err_msg=f"mask trial {trial}")
        assert got[1] == want[1], f"pair_start trial {trial}"
        assert got[2] == want[2]
        assert sorted(got[3]) == sorted(want[3])  # edge-id union order may differ per pair
        assert got[4] == want[4]
        assert got[5] == want[5]


def test_parity_disconnected_and_empty():
    case = dict(
        num_nodes=4,
        edge_src=np.array([0, 2]),
        edge_dst=np.array([1, 3]),
        sources=np.array([0]),
        targets=np.array([3]),  # unreachable from 0
    )
    want = shortest_path_union_by_pair(**case)
    got = shortest_path_union_by_pair_native(**case)
    assert not got[0].any() and got[1] == want[1] == []

    empty = dict(num_nodes=0, edge_src=np.zeros(0, np.int64), edge_dst=np.zeros(0, np.int64),
                 sources=np.zeros(0, np.int64), targets=np.zeros(0, np.int64))
    got = shortest_path_union_by_pair_native(**empty)
    assert got[0].size == 0 and got[1] == []


def test_native_bfs_dist():
    import ctypes

    lib = load_library()
    n = 6
    src = np.array([0, 1, 2, 4], np.int64)
    dst = np.array([1, 2, 3, 5], np.int64)
    out = np.zeros(n, np.int64)
    srcs = np.array([0], np.int64)
    lib.evi_bfs_dist(
        n, len(src),
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1, srcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        1, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    indptr, indices = build_csr(n, src, dst, undirected=True)
    want = bfs_dist(n, indptr, indices, srcs)
    np.testing.assert_array_equal(out, want)
