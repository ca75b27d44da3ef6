"""Prototype: bf16-pair-packed gather + in-kernel unpack segment-matmul.

Packing: for each 256-feature group, f32 lane l packs bf16 features
(l, l+128): high 16 bits = feature l+128, low 16 = feature l. The gather
then moves 512B 128-lane rows — the XLA gather emitter's sweet spot
(320 Mrow/s vs 202 at bf16 d=256, 73 at f32 d=256).
"""
import time
import sys
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def timeit(fn, *args, iters=8):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def pack_pairs(x):
    """x: [N, 256] any float -> [N, 128] f32; lane l = (bf16(x[:,l+128]) << 16) | bf16(x[:,l])."""
    xb = x.astype(jnp.bfloat16)  # RTNE
    lo = xb[:, :128].astype(jnp.float32)
    hi = xb[:, 128:].astype(jnp.float32)
    ulo = jax.lax.bitcast_convert_type(lo, jnp.uint32)
    uhi = jax.lax.bitcast_convert_type(hi, jnp.uint32)
    u = (uhi & np.uint32(0xFFFF0000)) | (ulo >> 16)
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _kernel(block_ref, first_ref, dst_ref, w_ref, gp_ref, y_ref, *, rb):
    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    dst = dst_ref[:]
    w = w_ref[:]
    rows = jax.lax.broadcasted_iota(jnp.int32, (rb, dst.shape[0]), 0)
    s = jnp.where(rows == dst[None, :], w[None, :], 0.0).astype(jnp.bfloat16)

    u = jax.lax.bitcast_convert_type(gp_ref[:], jnp.uint32)  # [eb, 128]
    f_lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32).astype(jnp.bfloat16)
    f_hi = jax.lax.bitcast_convert_type(u & np.uint32(0xFFFF0000), jnp.float32).astype(jnp.bfloat16)
    y_ref[:, :128] += jnp.dot(s, f_lo, preferred_element_type=jnp.float32)
    y_ref[:, 128:] += jnp.dot(s, f_hi, preferred_element_type=jnp.float32)


def segment_matmul_packed(plan, gp, interpret=False):
    rb, eb = plan.rb, plan.eb
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.n_chunks,),
        in_specs=[
            pl.BlockSpec((eb,), lambda i, blk, first: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb,), lambda i, blk, first: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 128), lambda i, blk, first: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, 256), lambda i, blk, first: (blk[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        partial(_kernel, rb=rb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((plan.n_blocks * rb, 256), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.n_chunks * eb * rb * 256,
            bytes_accessed=plan.n_chunks * eb * 128 * 4 + plan.n_blocks * rb * 256 * 4,
            transcendentals=0,
        ),
    )(plan.block_of_chunk, plan.first_of_block, plan.dst_local, plan.weights, gp)


def spmm_packed(plan, x, interpret=False):
    xp = pack_pairs(x)
    gp = xp[plan.senders]
    y = segment_matmul_packed(plan, gp, interpret=interpret)
    return y[: plan.n_node]


def main(n_node=169343, n_edge=1_166_243, d=256):
    from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
    from gnn_tail_generalization_tpu.graph import core
    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

    e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
    E = e.shape[1]
    plans = sp.build_plans(e, n_node)
    plan = plans[0]

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))

    # correctness vs existing bf16 path
    f_old = jax.jit(lambda p, x: sp.spmm_via_plan(p, x, compute_dtype=jnp.bfloat16))
    f_new = jax.jit(lambda p, x: spmm_packed(p, x))
    y_old = f_old(plan, x)
    y_new = f_new(plan, x)
    err = float(jnp.max(jnp.abs(y_old - y_new)) / (jnp.max(jnp.abs(y_old)) + 1e-9))
    log(f"rel err packed vs bf16 path: {err:.2e}")

    t_old = timeit(f_old, plan, x)
    t_new = timeit(f_new, plan, x)
    log(f"full bf16 (old):    {t_old*1e3:8.3f} ms   ({E/t_old/1e6:.1f} Medge/s)")
    log(f"full packed (new):  {t_new*1e3:8.3f} ms   ({E/t_new/1e6:.1f} Medge/s)")

    # packed gather alone
    xp = jax.jit(pack_pairs)(x)
    f_g = jax.jit(lambda s, xp: xp[s])
    t = timeit(f_g, plan.senders, xp)
    log(f"packed gather alone: {t*1e3:8.3f} ms")
    # packed kernel alone
    gp = f_g(plan.senders, xp)
    f_k = jax.jit(lambda p, g: segment_matmul_packed(p, g))
    t = timeit(f_k, plan, gp)
    log(f"packed kernel alone: {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()


def sweep(n_node=169343, n_edge=1_166_243, d=256):
    from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
    from gnn_tail_generalization_tpu.graph import core
    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

    e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
    E = e.shape[1]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))

    for rb, eb in ((128, 1024), (128, 2048), (64, 1024), (64, 2048), (256, 2048), (128, 4096)):
        plans = sp.build_plans(e, n_node, rb=rb, eb=eb)
        plan = plans[0]
        f_new = jax.jit(lambda p, x: spmm_packed(p, x))
        t = timeit(f_new, plan, x)
        log(f"rb={rb:4d} eb={eb:5d} chunks={plan.n_chunks:6d} pad={plan.n_chunks*eb/E:5.2f} "
            f"full {t*1e3:8.3f} ms ({E/t/1e6:6.1f} Medge/s)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "sweep":
    sweep()
