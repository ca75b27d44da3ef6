"""Edge-level label propagation modes."""
import pytest
import numpy as np
import jax
import jax.numpy as jnp

from gnn_tail_generalization_tpu.graph import core
from gnn_tail_generalization_tpu.linkpred import edge_lp


def setup(rng, n=40, m=30):
    e = core.standard_pipeline(
        np.stack([rng.integers(0, n, 120), rng.integers(0, n, 120)]), n)
    scored = np.stack(
        [rng.integers(0, n, m), rng.integers(0, n, m)], axis=1)
    logits = jnp.asarray(rng.normal(size=m).astype(np.float32))
    return e, scored, logits


def test_build_edge_graph_shares_endpoint(rng):
    scored = np.array([[0, 1], [1, 2], [3, 4]])
    adj = edge_lp.build_edge_graph(scored)
    s = set(zip(adj[0].tolist(), adj[1].tolist()))
    assert (0, 1) in s and (1, 0) in s  # share node 1
    assert (0, 2) not in s  # no shared endpoint
    for i in range(3):
        assert (i, i) in s  # self loops


def test_run_logit_lp_preserves_order_and_range(rng):
    e, scored, logits = setup(rng)
    out = edge_lp.run_logit_lp(scored, logits, n_pos_train=10,
                               n_pos_total=20, num_propagations=3)
    assert out.shape == logits.shape
    assert np.isfinite(np.asarray(out)).all()
    # blend is dominated by Y0 (0.998 factor): output close to input logits
    corr = np.corrcoef(np.asarray(out), np.asarray(logits))[0, 1]
    assert corr > 0.95


def test_run_emb_lp_scores(rng):
    e, scored, _ = setup(rng)
    h = jnp.asarray(rng.normal(size=(40, 8)).astype(np.float32))
    out = edge_lp.run_emb_lp(scored, h, num_propagations=2)
    assert out.shape == (30,)
    assert np.isfinite(np.asarray(out)).all()


def test_run_xmc_lp_dedup_and_order(rng):
    e, scored, logits = setup(rng)
    # inject duplicates
    scored[5] = scored[0]
    out = edge_lp.run_xmc_lp(e, 40, scored, logits, n_pos_train=10,
                             n_pos_total=20, num_propagations=2)
    assert out.shape == logits.shape
    assert np.isfinite(np.asarray(out)).all()
    # duplicated edges get identical outputs (dedup -> re-fan)
    np.testing.assert_allclose(float(out[5]), float(out[0]), rtol=1e-6)


@pytest.mark.slow
def test_linkpred_with_edge_lp_modes(rng):
    from gnn_tail_generalization_tpu.linkpred import model as lpm

    n = 50
    e = core.symmetrize(
        np.stack([rng.integers(0, n, 300), rng.integers(0, n, 300)]), n)
    e = core.remove_self_loops(e)
    for mode in ["logit", "emb", "xmc"]:
        cfg = lpm.LinkPredConfig(encoder="SAGE", predictor="DOT",
                                 batch_size=64, num_neg=2,
                                 eval_metric="hits", edge_lp_mode=mode,
                                 elp_num_propagations=2)
        out = lpm.train_linkpred(cfg, None, e, n, epochs=1, runs=1)
        assert "Hits@20" in out["last_results"], mode


def _build_edge_graph_loop(scored_edges, max_degree=None, seed=0):
    """The pre-round-3 per-node Python loop — kept as the semantics oracle
    for the vectorized build_edge_graph."""
    edges = np.asarray(scored_edges, np.int64)
    m = edges.shape[0]
    nodes = np.concatenate([edges[:, 0], edges[:, 1]])
    eids = np.concatenate([np.arange(m), np.arange(m)])
    order = np.argsort(nodes, kind="stable")
    nodes, eids = nodes[order], eids[order]
    bounds = np.flatnonzero(np.diff(nodes)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(nodes)]])
    rng = np.random.default_rng(seed)
    src_list, dst_list = [np.arange(m)], [np.arange(m)]
    for s, t in zip(starts, ends):
        grp = eids[s:t]
        if max_degree is not None and len(grp) > max_degree:
            grp = rng.choice(grp, max_degree, replace=False)
        k = len(grp)
        if k < 2:
            continue
        a = np.repeat(grp, k)
        b = np.tile(grp, k)
        keep = a != b
        src_list.append(a[keep])
        dst_list.append(b[keep])
    return np.stack([np.concatenate(src_list), np.concatenate(dst_list)])


def _pair_multiset(eg):
    return np.sort(eg[0] * (eg.max() + 1) + eg[1])


def test_build_edge_graph_vectorized_matches_loop():
    rng = np.random.default_rng(5)
    edges = rng.integers(0, 40, (300, 2))
    fast = edge_lp.build_edge_graph(edges)
    slow = _build_edge_graph_loop(edges)
    # multiset equality (the edge-graph consumer sorts/coalesces anyway)
    np.testing.assert_array_equal(_pair_multiset(fast),
                                  _pair_multiset(slow))


def test_build_edge_graph_max_degree_cap():
    rng = np.random.default_rng(6)
    # hub node 0 touches many edges
    edges = np.stack([np.zeros(500, np.int64),
                      rng.integers(1, 400, 500)], axis=1)
    eg = edge_lp.build_edge_graph(edges, max_degree=16, seed=1)
    # per-node contribution is capped: <= 16*15 ordered pairs per node
    n_pairs = eg.shape[1] - 500  # minus self loops
    assert n_pairs <= 400 * 16 * 15
    # the cap is a subsample of real incidences: every pair shares a node
    e = np.asarray(edges)
    share = ((e[eg[0, 500:], 0] == e[eg[1, 500:], 0])
             | (e[eg[0, 500:], 0] == e[eg[1, 500:], 1])
             | (e[eg[0, 500:], 1] == e[eg[1, 500:], 0])
             | (e[eg[0, 500:], 1] == e[eg[1, 500:], 1]))
    assert share.all()


def test_build_edge_graph_scales():
    import time
    rng = np.random.default_rng(7)
    edges = rng.integers(0, 200_000, (1_000_000, 2))
    t0 = time.time()
    eg = edge_lp.build_edge_graph(edges, max_degree=64)
    dt = time.time() - t0
    assert eg.shape[0] == 2 and eg.shape[1] >= 1_000_000
    # native C path: 0.24s measured; numpy fallback 2.4s — both depend on
    # the package's numpy-THP-madvise fix (gnn_tail_generalization_tpu
    # __init__), without which this host streams numpy at ~20 MB/s
    assert dt < 60.0, f"1M-edge build took {dt:.1f}s"  # generous: host load varies
