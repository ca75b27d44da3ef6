"""Hierarchical (host x chip) SpMM: halo-only DCN exchange (8 CPU devs).

parallel/hier.py — the 2-host topology RESULTS.md round 5 identifies as
the bandwidth-correct alternative to the flat DCN-crossing ring.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gnn_tail_generalization_tpu.parallel import hier


def _mesh(h, c):
    return jax.make_mesh((h, c), ("host", "chip"),
                         devices=jax.devices()[: h * c])


def _random_graph(rng, n=96, e=600):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (dst, src), w)
    return np.stack([src, dst]), w, dense


@pytest.mark.parametrize("h,c", [(2, 4), (4, 2), (2, 2), (1, 4), (8, 1)])
def test_hier_spmm_matches_dense(rng, h, c):
    mesh = _mesh(h, c)
    e, w, dense = _random_graph(rng)
    hg = hier.build_hier_graph(e, 96, mesh, edge_weight=w, rb=4, eb=32)
    assert hg.n_node_pad == 96
    x = rng.normal(size=(96, 48)).astype(np.float32)
    y = hier.hier_spmm(hg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4,
                               atol=1e-4)


def test_hier_spmm_grad_via_spmm_entry(rng):
    """ops.spmm.spmm dispatches HierGraph; the custom VJP must route the
    transposed two-level exchange (dx = A^T dy)."""
    from gnn_tail_generalization_tpu.ops.spmm import spmm

    mesh = _mesh(2, 4)
    e, w, dense = _random_graph(rng, e=500)
    hg = hier.build_hier_graph(e, 96, mesh, edge_weight=w, rb=4, eb=32)
    x = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(96, 32)).astype(np.float32))

    y, vjp = jax.vjp(lambda x_: spmm(hg, x_), x)
    np.testing.assert_allclose(np.asarray(y), dense @ np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    (dx,) = vjp(ct)
    np.testing.assert_allclose(np.asarray(dx),
                               dense.T @ np.asarray(ct),
                               rtol=1e-4, atol=1e-4)


def test_hier_matches_flat_distgraph(rng):
    """Same numerics as the flat 1-D ring on the same 8-way partition
    (host-major shard order makes the partitions identical)."""
    from gnn_tail_generalization_tpu.parallel import distgraph as dgm

    e, w, dense = _random_graph(rng, n=128, e=800)
    mesh_h = _mesh(2, 4)
    hg = hier.build_hier_graph(e, 128, mesh_h, edge_weight=w, rb=4, eb=32)
    mesh_f = jax.make_mesh((8,), ("graph",), devices=jax.devices()[:8])
    dg = dgm.build_dist_graph(e, 128, mesh_f, edge_weight=w, rb=4, eb=32)
    assert hg.n_node_pad == dg.n_node_pad
    x = rng.normal(size=(hg.n_node_pad, 16)).astype(np.float32)
    y1 = hier.hier_spmm(hg, jnp.asarray(x))
    y2 = dgm.dist_spmm(dg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4,
                               atol=1e-4)


def test_hier_comm_stats_halo_smaller_than_flat(rng):
    from gnn_tail_generalization_tpu.data.synthetic import (
        fast_powerlaw_graph,
    )
    from gnn_tail_generalization_tpu.graph.core import symmetrize

    n = 4096
    e = symmetrize(fast_powerlaw_graph(n, 16_000, 5), n)
    mesh = _mesh(2, 4)
    hg = hier.build_hier_graph(e, n, mesh, rb=4, eb=32)
    st = hier.hier_comm_stats(hg)
    assert st["dcn_rows_halo_unpadded"] <= st["dcn_rows_padded"]
    # the halo must beat streaming every block across the DCN-paced ring
    assert st["flat_over_hier_dcn"] > 1.5, st
    # numerics on the power-law graph too
    x = rng.normal(size=(hg.n_node_pad, 16)).astype(np.float32)
    dense = np.zeros((hg.n_node_pad, hg.n_node_pad), np.float32)
    np.add.at(dense, (e[1], e[0]), 1.0)
    y = hier.hier_spmm(hg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-3,
                               atol=1e-3)


def test_hier_bf16_path(rng):
    mesh = _mesh(2, 2)
    e, w, dense = _random_graph(rng, n=64, e=400)
    hg = hier.build_hier_graph(e, 64, mesh, edge_weight=w, rb=4, eb=32)
    x = rng.normal(size=(64, 24)).astype(np.float32)
    y = hier.hier_spmm(hg, jnp.asarray(x), compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=3e-2,
                               atol=3e-2)


def test_full_teacher_trains_on_hier_mesh_matches_single_device(rng):
    """The REAL TricksComb teacher (residual trick, SE, Adam, head/tail
    eval) trains on a (2, 4) host x chip mesh via prepare_hier; records
    match the single-device run (the hier path skips the loss-masked
    final-layer view — gradients are identical either way)."""
    import dataclasses

    from gnn_tail_generalization_tpu.config import (
        apply_arch_configs, build_config,
    )
    from gnn_tail_generalization_tpu.data.datasets import (
        NodeData, prepare, prepare_hier,
    )
    from gnn_tail_generalization_tpu.data.synthetic import (
        fast_powerlaw_graph, synthetic_features_labels,
    )
    from gnn_tail_generalization_tpu.train import loops

    n, n_feat, n_class = 96, 24, 4
    cfg = build_config(dataset="Cora", train_which="TeacherGNN",
                       whetherHasSE="100", se_reg=0.5)
    cfg = dataclasses.replace(
        cfg, N_nodes=n, num_feats=n_feat, num_classes=n_class,
        dim_hidden=16, type_trick="Residual", use_special_split=True,
        dropout=0.0,
    )
    cfg = apply_arch_configs(cfg)
    x, y = synthetic_features_labels(n, n_feat, n_class, 0)
    train = np.zeros(n, bool)
    train[: n // 2] = True
    data = NodeData(x=x, y=y,
                    edge_index=fast_powerlaw_graph(n, n * 4, 0),
                    train_mask=train, val_mask=None, test_mask=~train,
                    name="hier-test")
    mesh = _mesh(2, 4)
    pd_h = prepare_hier(data, cfg, mesh, rb=4, eb=32)
    res_h = loops.train_teacher(cfg, pd_h, seed=0, epochs=3)
    pd_s = prepare(data, cfg)
    res_s = loops.train_teacher(cfg, pd_s, seed=0, epochs=3)
    assert np.isfinite(res_h.records).all()
    np.testing.assert_allclose(res_h.records, res_s.records, rtol=1e-4,
                               atol=1e-4)


def test_hier_plans_pass_tpu_faithful_interpreter(rng):
    """Every hier plan family (intra bucket + cross halo) runs under the
    TPU-faithful Pallas interpreter (real revisit semantics, unlike
    interpret=True) — real-silicon multi-host runs are impossible in this
    image, so this is the strongest available correctness net for the
    Mosaic programs a pod would execute. Verifies numerics against a
    host reference for both."""
    from jax.experimental.pallas import tpu as pltpu

    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

    mesh = _mesh(2, 2)
    e, w, _ = _random_graph(rng, n=64, e=500)
    hg = hier.build_hier_graph(e, 64, mesh, edge_weight=w, rb=8, eb=32)
    rows, n_blocks = hg.rows, hg.rows // hg.rb
    x = rng.normal(size=(64, 16)).astype(np.float32)

    def run_plan(sarr, darr, warr, barr, farr, q, table):
        p = sp.SegmentMatmulPlan(
            senders=jnp.asarray(sarr), dst_local=jnp.asarray(darr),
            weights=jnp.asarray(warr), block_of_chunk=jnp.asarray(barr),
            first_of_block=jnp.asarray(farr), n_node=rows,
            n_blocks=n_blocks, n_chunks=q, rb=hg.rb, eb=hg.eb,
        )
        return np.asarray(
            sp.spmm_via_plan(p, jnp.asarray(table),
                             interpret=pltpu.InterpretParams()))

    # intra bucket (h=0, k=0, j=1): dst shard 0, src shard 1 of host 0
    ib = [np.asarray(a) for a in
          (hg.ib_s, hg.ib_d, hg.ib_w, hg.ib_blk, hg.ib_first)]
    y = run_plan(ib[0][0, 0, 1], ib[1][0, 0, 1], ib[2][0, 0, 1],
                 ib[3][0, 0, 1], ib[4][0, 0, 1], hg.qi, x[rows:2 * rows])
    ref = np.zeros((rows, 16), np.float32)
    m = ((e[1] // rows == 0) & (e[0] // rows == 1))
    np.add.at(ref, (e[1][m],), w[m, None] * x[e[0][m]])
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)

    # cross plan (h=0, t=1, k=0): src host 1 halo -> dst shard (0, 0)
    cpl = [np.asarray(a) for a in
           (hg.cp_s, hg.cp_d, hg.cp_w, hg.cp_blk, hg.cp_first)]
    hidx = np.asarray(hg.halo_idx)  # [H, T, u_max] host-local
    # host 1 sends at t=1 to host (1-1)%2 = 0
    halo = x[2 * rows:][hidx[1, 0]]  # host 1's rows, host-local ids
    y2 = run_plan(cpl[0][0, 0, 0], cpl[1][0, 0, 0], cpl[2][0, 0, 0],
                  cpl[3][0, 0, 0], cpl[4][0, 0, 0], hg.qc, halo)
    ref2 = np.zeros((rows, 16), np.float32)
    m2 = ((e[1] // rows == 0) & (e[0] // (2 * rows) == 1))
    np.add.at(ref2, (e[1][m2],), w[m2, None] * x[e[0][m2]])
    np.testing.assert_allclose(y2, ref2, rtol=1e-4, atol=1e-4)
