import numpy as np

from gnn_tail_generalization_tpu.linkpred import heuristics as H
from gnn_tail_generalization_tpu.graph import core


def small_graph():
    # 0-1, 0-2, 1-2 triangle plus 3 attached to 0
    e = np.array([[0, 0, 1, 0], [1, 2, 2, 3]])
    return core.symmetrize(e, 4)


def test_common_neighbors():
    e = small_graph()
    a = H.adjacency(e, 4)
    # CN(1,2): shared neighbor 0 (and each other? A[1]: {0,2}, A[2]: {0,1};
    # elementwise product nonzero only at 0) -> 1
    s = H.common_neighbors(a, np.array([[1], [2]]))
    assert s[0] == 1.0
    # CN(1,3): share neighbor 0 -> 1; CN(2,3) share 0 -> 1
    s = H.common_neighbors(a, np.array([[1, 2], [3, 3]]))
    np.testing.assert_array_equal(s, [1.0, 1.0])


def test_adamic_adar_weighting():
    e = small_graph()
    a = H.adjacency(e, 4)
    s = H.adamic_adar(a, np.array([[1], [2]]))
    # shared neighbor 0 has degree 3 -> 1/log(3)
    np.testing.assert_allclose(s[0], 1 / np.log(3), rtol=1e-6)


def test_ppr_scores_order_and_locality():
    e = small_graph()
    a = H.adjacency(e, 4)
    # score edges in scrambled src order; neighbors should outrank distant
    edges = np.array([[3, 0, 3], [1, 1, 0]])
    s = H.ppr_scores(a, edges)
    assert s.shape == (3,)
    # from 3, direct neighbor 0 scores higher than 2-hop node 1
    assert s[2] > s[0]


def test_heuristic_scores_dispatcher():
    e = small_graph()
    for name in ["CN", "AA", "PPR"]:
        s = H.heuristic_scores(name, e, 4, np.array([[0, 1], [2, 3]]))
        assert s.shape == (2,)
        assert np.isfinite(s).all()
