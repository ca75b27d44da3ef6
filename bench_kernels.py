"""Kernel-level microbenchmarks on the real TPU (not run by the driver).

Compares SpMM implementations at ogbn-arxiv scale:
  - xla:    gather + sorted segment_sum (scatter-add lowering)
  - pallas: gather + segment-matmul kernel (ops/spmm_pallas.py)
Forward-only and forward+backward. Timing syncs via host readback (see
memory note: block_until_ready is unreliable on the tunneled backend).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def main(n_node=169343, n_edge=1_166_243, d=256):
    from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
    from gnn_tail_generalization_tpu.graph import core
    from gnn_tail_generalization_tpu.ops.spmm import spmm
    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

    e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
    g = core.build_graph(e, n_node, with_dense=False)
    plans = sp.build_plans(e, n_node)
    print(f"edges={g.n_edge} chunks={plans[0].n_chunks} "
          f"pad_ratio={plans[0].n_chunks * plans[0].eb / g.n_edge:.2f}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))

    f_xla = jax.jit(lambda g, x: spmm(g, x, "gather"))
    f_pal = jax.jit(lambda plans, x: sp.spmm_pallas_pair(plans, x))

    # correctness cross-check on device
    y1 = f_xla(g, x)
    y2 = f_pal(plans, x)
    err = float(jnp.max(jnp.abs(y1 - y2)) / (jnp.max(jnp.abs(y1)) + 1e-9))
    print(f"rel err xla vs pallas: {err:.2e}")

    t_xla = timeit(f_xla, g, x)
    t_pal = timeit(f_pal, plans, x)
    print(f"fwd: xla {t_xla*1e3:.3f} ms ({g.n_edge/t_xla/1e9:.2f} Gedge/s) | "
          f"pallas {t_pal*1e3:.3f} ms ({g.n_edge/t_pal/1e9:.2f} Gedge/s)")

    # fwd+bwd
    ct = jnp.ones_like(x)
    g_xla = jax.jit(jax.grad(
        lambda x, g, ct: jnp.vdot(spmm(g, x, "gather"), ct), argnums=0))
    g_pal = jax.jit(jax.grad(
        lambda x, plans, ct: jnp.vdot(sp.spmm_pallas_pair(plans, x), ct),
        argnums=0))
    tg_xla = timeit(g_xla, x, g, ct)
    tg_pal = timeit(g_pal, x, plans, ct)
    print(f"bwd: xla {tg_xla*1e3:.3f} ms | pallas {tg_pal*1e3:.3f} ms")


if __name__ == "__main__":
    main()
