"""Decompose the citation2 LP SpMM: gather vs kernel vs pipeline.

Re-record of the round-4 probe (VERDICT r4 weak #3 — the original was
never committed). All stages of the LP step's FORWARD SpMM (rb-tuned
plan, 34.9M padded rows in 9 pieces) measured in ONE process with
uniform-gather brackets interleaved, at d=256 (the LP encoder's hidden
width — the packed-pair path, ONE [N, 128] f32 gather stream):

  bracket    uniform 4M-row gather from the [N, 128] f32 packed table
  plan-g     piece-0 senders gather from the same table (pattern test)
  kernel     segment_matmul_packed on piece 0 with a RESIDENT gather
             (kernel-only cost)
  piece      gather + kernel for piece 0 (pipeline overlap visible)
  fwd la1/2  full 9-piece spmm_via_plan, serial vs lookahead-1
  d128 fwd   the same plan at d=128 (direct-bf16 gather path) for
             comparison with probe_piece_overlap

Usage: python scratch/probe_decisive.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[dec {time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


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
    rb = sp.choose_plan_rb(np.asarray(msg[1]), n_node)
    s = np.asarray(msg[0], np.int64)
    r = np.asarray(msg[1], np.int64)
    of = np.argsort(r, kind="stable")
    plan = sp.build_plan(s[of], r[of], None, n_node, rb=rb, eb=1024,
                         max_gather_rows=4_000_000)
    eb = plan.eb
    log(f"plan: rb={rb} chunks={plan.n_chunks} "
        f"pieces={len(plan.piece_bounds)-1} "
        f"E_pad={plan.n_chunks*eb/1e6:.1f}M")

    x256 = jax.jit(lambda k: jax.random.normal(k, (n_node, 256)))(
        jax.random.PRNGKey(0))
    x128 = x256[:, :128]
    packed = jax.jit(sp.pack_bf16_pairs)(x256)  # [N, 128] f32, resident

    p0 = sp._piece_view(plan, 0)
    rows0 = p0.n_chunks * eb

    @jax.jit
    def gather(x, i):
        return x[i]

    @jax.jit
    def kernel_only(p, g):
        return sp.segment_matmul_packed(p, (g,))

    @jax.jit
    def piece_full(p, pk):
        return sp.segment_matmul_packed(p, (pk[p.senders],))

    fwd256 = jax.jit(
        lambda p, x: sp.spmm_via_plan(p, x, compute_dtype=jnp.bfloat16))

    g0 = gather(packed, p0.senders)
    float(jnp.sum(g0))  # resident gather for kernel-only

    def best_ms(fn, *args, n=4, reps=2):
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

    stages = {}

    def record(name, ms, rows=None):
        br = measure_gather_rate(n_node)
        stages[name] = (ms, br)
        extra = f" = {rows / ms / 1e3:.0f} Mrow/s" if rows else ""
        log(f"{name:12s} {ms:7.1f} ms{extra}  (bracket {br:.0f} Mrow/s)")

    record("plan-g", best_ms(gather, packed, p0.senders), rows0)
    record("kernel", best_ms(kernel_only, p0, g0), rows0)
    del g0
    record("piece", best_ms(piece_full, p0, packed), rows0)
    del x128  # HBM headroom for the full fwd (the first cut OOMed here)
    rows_all = plan.n_chunks * eb
    sp.PIECE_LOOKAHEAD = 1
    record("fwd_la1", best_ms(fwd256, plan, x256, n=2), rows_all)
    sp.PIECE_LOOKAHEAD = 2
    record("fwd_la2", best_ms(fwd256, plan, x256, n=2), rows_all)
    sp.PIECE_LOOKAHEAD = 1

    print(f"\nrows piece0 {rows0/1e6:.2f}M, total {rows_all/1e6:.1f}M, "
          f"rb={rb}")
    print(f"{'stage':12s} {'ms':>8s} {'Mrow/s':>8s} {'bracket':>8s}")
    for name, (ms, br) in stages.items():
        rows = rows0 if name in ("plan-g", "kernel", "piece") else rows_all
        print(f"{name:12s} {ms:8.1f} {rows/ms/1e3:8.0f} {br:8.0f}")


if __name__ == "__main__":
    main()
