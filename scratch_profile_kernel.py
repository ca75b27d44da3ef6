"""Round-2 kernel profiling: where does SpMM time go at arxiv scale?

Components timed on the TPU:
  1. standalone gather g = x[senders]  (f32 and bf16)
  2. segment_matmul kernel only, on pre-gathered g
  3. full spmm_via_plan (gather + kernel)
Host-side: hub coverage stats for a degree-renumbered hybrid design.
"""
import time
import sys

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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main(n_node=169343, n_edge=1_166_243, d=256):
    from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
    from gnn_tail_generalization_tpu.graph import core
    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

    e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
    E = e.shape[1]
    log(f"edges after pipeline: {E}")

    # ---- host-side stats: sender degree distribution / hub coverage ----
    send_deg = np.bincount(e[0], minlength=n_node)
    order = np.argsort(-send_deg)
    sorted_deg = send_deg[order]
    csum = np.cumsum(sorted_deg) / E
    for H in (256, 512, 1024, 2048, 4096, 8192):
        log(f"top-{H} senders cover {csum[H-1]*100:.1f}% of edges")

    plans = sp.build_plans(e, n_node)
    plan = plans[0]
    Epad = plan.n_chunks * plan.eb
    log(f"chunks={plan.n_chunks} Epad={Epad} pad_ratio={Epad/E:.3f}")

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))

    # 1. standalone gather
    f_gather = jax.jit(lambda s, x: x[s])
    t = timeit(f_gather, plan.senders, x)
    log(f"gather f32:  {t*1e3:8.3f} ms  ({Epad*d*4/t/1e9:.1f} GB/s of gather reads)")
    xb = x.astype(jnp.bfloat16)
    f_gather_b = jax.jit(lambda s, x: x[s])
    tb = timeit(f_gather_b, plan.senders, xb)
    log(f"gather bf16: {tb*1e3:8.3f} ms  ({Epad*d*2/tb/1e9:.1f} GB/s)")

    # 2. kernel only on pre-gathered g
    g32 = f_gather(plan.senders, x)
    f_k32 = jax.jit(lambda p, g: sp.segment_matmul(p, g))
    t = timeit(f_k32, plan, g32)
    log(f"kernel f32 (pre-gathered): {t*1e3:8.3f} ms")
    gb = g32.astype(jnp.bfloat16)
    f_kb = jax.jit(lambda p, g: sp.segment_matmul(p, g, compute_dtype=jnp.bfloat16))
    t = timeit(f_kb, plan, gb)
    log(f"kernel bf16 (pre-gathered): {t*1e3:8.3f} ms")

    # 3. full pipeline
    f_full32 = jax.jit(lambda p, x: sp.spmm_via_plan(p, x))
    t32 = timeit(f_full32, plan, x)
    log(f"full f32:  {t32*1e3:8.3f} ms   ({E/t32/1e6:.1f} Medge/s)")
    f_fullb = jax.jit(lambda p, x: sp.spmm_via_plan(p, x, compute_dtype=jnp.bfloat16))
    tfb = timeit(f_fullb, plan, x)
    log(f"full bf16: {tfb*1e3:8.3f} ms   ({E/tfb/1e6:.1f} Medge/s)")

    # roofline context
    log(f"speed-of-light (read E*d once @819GB/s, f32): {Epad*d*4/819e9*1e3:.2f} ms")


if __name__ == "__main__":
    main()
