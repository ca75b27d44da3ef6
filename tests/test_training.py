"""Short end-to-end training runs on synthetic data (CPU)."""
import dataclasses

import numpy as np
import pytest

from gnn_tail_generalization_tpu.config import build_config
from gnn_tail_generalization_tpu.data.datasets import prepare
from gnn_tail_generalization_tpu.data.synthetic import synthetic_planetoid
from gnn_tail_generalization_tpu.train import loops


@pytest.fixture(scope="module")
def small_setup():
    cfg = build_config(dataset="Cora", train_which="TeacherGNN",
                       whetherHasSE="100", se_reg=0.5)
    cfg = dataclasses.replace(
        cfg, N_nodes=300, num_feats=60, num_classes=5, batch_size=64,
        dropout=0.2,
    )
    cfg = dataclasses.replace(cfg)
    data = synthetic_planetoid(n_node=300, n_feat=60, n_class=5, seed=1,
                               name="Cora-synth")  # triggers 600-split? no:
    # "Cora" in name -> first-600 split, but n=300 -> cap
    data.train_mask = np.zeros(300, bool)
    data.train_mask[:150] = True
    data.test_mask = ~data.train_mask
    data.name = "synth"
    pd = prepare(data, cfg)
    return cfg, pd


def test_teacher_learns_and_records(small_setup):
    cfg, pd = small_setup
    res = loops.train_teacher(cfg, pd, seed=0, epochs=40)
    assert res.records.shape == (40, len(res.columns))
    assert "iso" in res.columns
    # loss decreases, accuracy beats random (20%)
    assert res.records[-1, 0] < res.records[0, 0]
    assert res.last("acc_train") > 30.0


def test_teacher_se_reg_pulls_se_norm_down(small_setup):
    cfg, pd = small_setup
    cfg = dataclasses.replace(cfg, se_reg=10.0, train_which="SEMLP")
    res = loops.train_teacher(cfg, pd, seed=0, epochs=30)
    se0 = None
    import jax.numpy as jnp

    se = res.variables["params"]["backbone"]["conv_0"]["se"]
    # init stddev 1 over [300, dim]; after 30 steps of strong reg it shrinks
    assert float(jnp.linalg.norm(se)) < np.sqrt(se.size) * 0.9
    assert res.best_variables is not None  # SEMLP keeps best ckpt


def test_semlp_full_pipeline(small_setup):
    cfg, pd = small_setup
    cfg = dataclasses.replace(cfg, train_which="SEMLP", epochs=10)
    res = loops.run_experiment(cfg, pd, seed=0, epochs=10)
    assert "teacher" in res.extra and "part1" in res.extra
    assert res.records.shape[0] == 10
    assert np.isfinite(res.records).all()
    # part1 regression loss decreased
    p1 = res.extra["part1"]
    assert p1.records[-1, 0] < p1.records[0, 0]


def test_pure_lp_separates_clusters():
    cfg = build_config(dataset="", train_which="LP", force_set_to_best_config=False)
    cfg = dataclasses.replace(cfg, N_nodes=200, num_feats=8, num_classes=2,
                              use_special_split=False)
    # two dense clusters, few cross edges
    rng = np.random.default_rng(0)
    a = rng.integers(0, 100, 600)
    b = rng.integers(0, 100, 600)
    e1 = np.stack([a, b])
    e2 = np.stack([a + 100, b + 100])
    cross = np.stack([rng.integers(0, 100, 5), rng.integers(100, 200, 5)])
    e = np.concatenate([e1, e2, cross], axis=1)
    y = np.concatenate([np.zeros(100), np.ones(100)]).astype(np.int64)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    train = rng.random(200) < 0.3
    from gnn_tail_generalization_tpu.data.datasets import NodeData

    data = NodeData(x=x, y=y, edge_index=e, train_mask=train, val_mask=None,
                    test_mask=~train, name="clusters")
    pd = prepare(data, cfg)
    out = loops.run_pure_lp(cfg, pd)
    assert out["acc_test"] > 90.0


def test_student_and_graphmlp(small_setup):
    cfg, pd = small_setup
    for tw, extra in [("StudentBaseMLP", {}),
                      ("GraphMLP", {"graphMLP_reg": 1.0})]:
        c = dataclasses.replace(cfg, train_which=tw, **extra)
        res = loops.run_experiment(c, pd, seed=0, epochs=8)
        assert np.isfinite(res.records).all(), tw


def test_multiseed_vmapped_training(small_setup):
    from gnn_tail_generalization_tpu.train.multiseed import (
        train_teacher_multiseed,
    )

    cfg, pd = small_setup
    results = train_teacher_multiseed(cfg, pd, seeds=[0, 1, 2], epochs=10)
    assert len(results) == 3
    recs = np.stack([r.records for r in results])
    assert np.isfinite(recs).all()
    # seeds actually differ (different inits)
    assert not np.allclose(results[0].records, results[1].records)
    # all of them learn
    for r in results:
        assert r.records[-1, 0] < r.records[0, 0]


def test_epoch_block_equivalence(small_setup):
    """epoch_block scanning consumes the same RNG chain: identical records."""
    cfg, pd = small_setup
    r1 = loops.train_teacher(cfg, pd, seed=4, epochs=10, epoch_block=1)
    r2 = loops.train_teacher(cfg, pd, seed=4, epochs=10, epoch_block=5)
    np.testing.assert_allclose(r1.records, r2.records, rtol=1e-4, atol=1e-3)
