"""Kernel-level microbenchmarks on the real TPU (not run by the driver).

Compares SpMM implementations at ogbn-arxiv scale:
  - xla:        gather + sorted segment_sum (scatter-add lowering)
  - pallas f32: 128-lane sliced gather + segment-matmul kernel
  - pallas bf16 packed: bit-packed pair gather (ops/spmm_pallas.py)
and reports effective HBM bandwidth against the measured gather-emitter
envelope (~420 Mrow/s at this 169k-row table, ~207 at GB tables — both
off the 1024-multiple cliff, RESULTS.md round 5) and the 819 GB/s v5e
peak, so the headline is roofline-honest rather than only vs the in-repo
naive path. Forward-only and forward+backward. Timing syncs via host
readback (block_until_ready is unreliable on the tunneled backend).
"""
import time

import numpy as np

import jax
import jax.numpy as jnp

HBM_PEAK_GBS = 819.0  # v5e
# measured row-gather cap at <=512B/128-lane rows and THIS table size
# (169k rows ~ 420 Mrow/s off the 1024-multiple cliff, RESULTS.md round
# 5; GB-scale tables run ~207)
EMITTER_MROWS = 420.0


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


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
    plan = plans[0]
    E, Epad = g.n_edge, plan.n_chunks * plan.eb
    print(f"edges={E} chunks={plan.n_chunks} pad_ratio={Epad / E:.2f}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))

    f_xla = jax.jit(lambda g, x: spmm(g, x, "gather"))
    f_pal = jax.jit(lambda plans, x: sp.spmm_pallas_pair(plans, x))
    f_pkd = jax.jit(
        lambda plans, x: sp.spmm_pallas_pair(plans, x,
                                             compute_dtype=jnp.bfloat16))

    # correctness cross-check on device
    y1 = f_xla(g, x)
    for name, fn in (("pallas f32", f_pal), ("pallas bf16-packed", f_pkd)):
        y2 = fn(plans, x)
        err = float(jnp.max(jnp.abs(y1 - y2)) / (jnp.max(jnp.abs(y1)) + 1e-9))
        print(f"rel err xla vs {name}: {err:.2e}")

    def report(name, t, bytes_moved):
        gbs = bytes_moved / t / 1e9
        row_floor = Epad / (EMITTER_MROWS * 1e6)
        print(f"fwd {name:20s} {t * 1e3:8.3f} ms  {E / t / 1e6:7.1f} Medge/s  "
              f"{gbs:6.1f} GB/s eff ({gbs / HBM_PEAK_GBS * 100:4.1f}% HBM peak; "
              f"gather-emitter floor {row_floor * 1e3:.2f} ms)")

    t_xla = timeit(f_xla, g, x)
    report("xla gather+scatter", t_xla, 3 * Epad * d * 4)
    t_pal = timeit(f_pal, plans, x)
    report("pallas f32", t_pal, 3 * Epad * d * 4)
    t_pkd = timeit(f_pkd, plans, x)
    report("pallas bf16-packed", t_pkd, 3 * Epad * d * 2)

    # fwd+bwd
    ct = jnp.ones_like(x)
    g_xla = jax.jit(jax.grad(
        lambda x, g, ct: jnp.vdot(spmm(g, x, "gather"), ct), argnums=0))
    g_pal = jax.jit(jax.grad(
        lambda x, plans, ct: jnp.vdot(sp.spmm_pallas_pair(plans, x), ct),
        argnums=0))
    g_pkd = jax.jit(jax.grad(
        lambda x, plans, ct: jnp.vdot(
            sp.spmm_pallas_pair(plans, x, compute_dtype=jnp.bfloat16), ct),
        argnums=0))
    tg_xla = timeit(g_xla, x, g, ct)
    tg_pal = timeit(g_pal, x, plans, ct)
    tg_pkd = timeit(g_pkd, x, plans, ct)
    print(f"bwd: xla {tg_xla * 1e3:.3f} ms | pallas f32 {tg_pal * 1e3:.3f} ms"
          f" | pallas bf16-packed {tg_pkd * 1e3:.3f} ms")

    # narrow-d check: the gather is row-bound, so d=40 (classes) costs the
    # same rows/s as d=256 — padding waste is lanes, not time
    xn = jnp.asarray(rng.normal(size=(n_node, 40)).astype(np.float32))
    t_nar = timeit(jax.jit(
        lambda plans, x: sp.spmm_pallas_pair(plans, x,
                                             compute_dtype=jnp.bfloat16)),
        plans, xn)
    print(f"fwd narrow d=40 bf16: {t_nar * 1e3:.3f} ms "
          f"({E / t_nar / 1e6:.1f} Medge/s)")


if __name__ == "__main__":
    main()
