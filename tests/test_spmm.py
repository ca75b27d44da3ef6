import numpy as np
import jax
import jax.numpy as jnp

from gnn_tail_generalization_tpu.graph import core
from gnn_tail_generalization_tpu.ops.spmm import spmm, spmm_normalized


def random_graph(rng, n=50, e=300, with_dense=True):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.normal(size=e).astype(np.float32)
    g = core.build_graph(
        np.stack([src, dst]), n, edge_weight=w, with_dense=with_dense
    )
    dense = np.zeros((n, n), dtype=np.float64)
    np.add.at(dense, (dst, src), w)
    return g, dense


def test_spmm_gather_matches_dense_reference(rng):
    g, dense = random_graph(rng)
    x = rng.normal(size=(50, 16)).astype(np.float32)
    y = spmm(g, jnp.asarray(x), "gather")
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_dense_path_matches(rng):
    g, dense = random_graph(rng)
    x = rng.normal(size=(50, 16)).astype(np.float32)
    y = spmm(g, jnp.asarray(x), "dense")
    np.testing.assert_allclose(np.asarray(y), dense @ x, rtol=1e-4, atol=1e-4)


def test_spmm_grad_is_transpose(rng):
    g, dense = random_graph(rng)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    ct = rng.normal(size=(50, 8)).astype(np.float32)

    def f(x):
        return jnp.vdot(spmm(g, x, "gather"), jnp.asarray(ct))

    dx = jax.grad(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx), dense.T @ ct, rtol=1e-4, atol=1e-4)


def test_spmm_grad_dense_path(rng):
    g, dense = random_graph(rng)
    x = rng.normal(size=(50, 8)).astype(np.float32)
    ct = rng.normal(size=(50, 8)).astype(np.float32)

    def f(x):
        return jnp.vdot(spmm(g, x, "dense"), jnp.asarray(ct))

    dx = jax.grad(f)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(dx), dense.T @ ct, rtol=1e-4, atol=1e-4)


def test_spmm_edge_weight_grad_is_sddmm(rng):
    from gnn_tail_generalization_tpu.ops.spmm import spmm_edge_grad

    g, dense = random_graph(rng)
    x = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))
    ct = jnp.asarray(rng.normal(size=(50, 8)).astype(np.float32))

    def f(w):
        return jnp.vdot(spmm_edge_grad(g, x, w, "gather"), ct)

    dw = jax.grad(f)(g.edge_weight)
    expect = np.sum(
        np.asarray(ct)[np.asarray(g.receivers)]
        * np.asarray(x)[np.asarray(g.senders)],
        axis=-1,
    )
    expect[g.n_edge:] = 0.0  # padding-slot cotangents are zeroed
    np.testing.assert_allclose(np.asarray(dw), expect, rtol=1e-4, atol=1e-4)


def test_spmm_normalized_matches_manual(rng):
    n, e = 30, 120
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = core.build_graph(np.stack([src, dst]), n)
    x = rng.normal(size=(n, 4)).astype(np.float32)

    dout = np.maximum(np.bincount(src, minlength=n), 1).astype(np.float64)
    din = np.maximum(np.bincount(dst, minlength=n), 1).astype(np.float64)
    a = np.zeros((n, n))
    np.add.at(a, (dst, src), 1.0)
    expect = (a @ (x * dout[:, None] ** -0.5)) * din[:, None] ** -0.5

    y = spmm_normalized(g, jnp.asarray(x), "both", method="gather")
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)


def test_spmm_jit_under_vmap_free(rng):
    g, dense = random_graph(rng, with_dense=False)
    x = jnp.asarray(rng.normal(size=(50, 16)).astype(np.float32))
    y = jax.jit(lambda x: spmm(g, x))(x)
    np.testing.assert_allclose(np.asarray(y), dense @ np.asarray(x), rtol=1e-4, atol=1e-4)
