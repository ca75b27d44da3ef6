"""Edge-level label propagation modes."""
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
