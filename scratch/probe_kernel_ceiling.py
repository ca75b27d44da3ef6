"""Where does the segment-matmul kernel's ~2.5 us/chunk go?

Per-chunk cost (rb=192 x eb=1024 one-hot dot, d_out=256, LP geometry),
all operands RESIDENT random arrays (timing is value-independent):
  kernel      production packed kernel (in-VMEM unpack + s-build + dot)
  nounpack    segment_matmul bf16 (s-build + dot, no unpack)
  mxu_batch   jnp batched bf16 matmul of the SAME dot shapes with a
              MATERIALIZED S read from HBM -- the pure MXU shape ceiling
  mxu_512     same with d_out=512 (does lane fanout buy MXU efficiency?)

Verdict (v5e, 2026-08-20, brackets 193-202 Mrow/s -- good window):
  kernel 1.98 us/chunk, nounpack 2.20, mxu_batch 5.48, mxu_512 6.97
  (us per rb=192 chunk; mxu_512 normalized per 256 lanes = 3.49).
  The Pallas kernel BEATS the XLA batched-matmul of the same dot shapes
  by 2.8x (it builds S in VMEM instead of reading it from HBM, and the
  in-kernel unpack is free -- the packed path is FASTER than feeding
  pre-cast bf16). => no kernel headroom worth chasing at this shape;
  the remaining lever is plan geometry (fewer padded rows per rb --
  choose_plan_rb), not the kernel.

Usage: python scratch/probe_kernel_ceiling.py
"""
import os, sys, time
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
T0 = time.time()

def log(*a):
    print(f"[kc {time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)

def main():
    import jax
    import jax.numpy as jnp
    from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
    from gnn_tail_generalization_tpu.graph.core import symmetrize
    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp
    from gnn_tail_generalization_tpu.utils.debug import measure_gather_rate

    n_node, n_edge = 2_927_963, 30_387_995 // 2
    e = fast_powerlaw_graph(n_node, n_edge, 0)
    msg = symmetrize(e, n_node)
    rb = 192
    s = np.asarray(msg[0], np.int64)
    r = np.asarray(msg[1], np.int64)
    of = np.argsort(r, kind="stable")
    plan = sp.build_plan(s[of], r[of], None, n_node, rb=rb, eb=1024,
                         max_gather_rows=4_000_000)
    eb = plan.eb
    p0 = sp._piece_view(plan, 0)
    nc = p0.n_chunks
    rows0 = nc * eb
    log(f"piece0: rb={rb} chunks={nc} rows={rows0/1e6:.2f}M")

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    # resident random streams in the kernels' exact operand shapes
    g0 = jax.jit(lambda k: jax.random.normal(
        k, (rows0 + sp.GATHER_TAIL_PAD, 128)))(ks[0])
    gb0 = jax.jit(lambda k: jax.random.normal(
        k, (rows0 + sp.GATHER_TAIL_PAD, 256)).astype(jnp.bfloat16))(ks[1])
    ncs = 512
    sd = jax.jit(lambda k: jax.random.normal(
        k, (ncs, rb, eb)).astype(jnp.bfloat16))(ks[2])
    gbat = jax.jit(lambda k: jax.random.normal(
        k, (ncs, eb, 256)).astype(jnp.bfloat16))(ks[3])
    gbat512 = jax.jit(lambda k: jax.random.normal(
        k, (ncs, eb, 512)).astype(jnp.bfloat16))(ks[4])
    for a in (g0, gb0, sd, gbat, gbat512):
        float(jnp.sum(a.astype(jnp.float32) if a.dtype != jnp.float32 else a))

    @jax.jit
    def kernel_only(p, g):
        return sp.segment_matmul_packed(p, (g,))

    @jax.jit
    def kernel_nounpack(p, g):
        return sp.segment_matmul(p, g, compute_dtype=jnp.bfloat16)

    @jax.jit
    def mxu_batch(a, b):
        return jax.lax.dot_general(
            a, b, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    def best_ms(fn, *args, n=8, reps=3):
        out = fn(*args)
        float(jnp.sum(out))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t0) / n)
        return best * 1e3

    res = {}
    def record(name, ms, chunks):
        br = measure_gather_rate(n_node)
        res[name] = (ms, chunks, br)
        log(f"{name:10s} {ms:7.2f} ms = {ms*1e3/chunks:5.2f} us/chunk "
            f"(bracket {br:.0f} Mrow/s)")

    record("kernel", best_ms(kernel_only, p0, g0), nc)
    record("nounpack", best_ms(kernel_nounpack, p0, gb0), nc)
    record("mxu_batch", best_ms(mxu_batch, sd, gbat, n=16), ncs)
    record("mxu_512", best_ms(mxu_batch, sd, gbat512, n=16), ncs)

    print(f"\npiece0 chunks={nc}, mxu chunks={ncs}, rb={rb}, eb={eb}")
    print(f"{'stage':10s} {'ms':>8s} {'us/chunk':>9s} {'bracket':>8s}")
    for name, (ms, chunks, br) in res.items():
        print(f"{name:10s} {ms:8.2f} {ms*1e3/chunks:9.2f} {br:8.0f}")

if __name__ == "__main__":
    main()
