"""A/B: piecewise SpMM serial vs lookahead-1 overlap at citation2 scale.

Round 3 rejected pipelining gather p+1 against kernel p at ARXIV piece
sizes (launch overhead dominated). VERDICT r4 asks to re-test at
citation2 piece sizes, where one piece's gather is ~25-50 ms and the
kernel ~7 ms/piece: lookahead-1 (PIECE_LOOKAHEAD=2... naming: the knob
counts pieces in flight) can hide the kernel + per-piece flush under the
next gather at the cost of one extra ~2 GB live stream.

Times the FORWARD LP SpMM (the exact plan bench_linkpred's step runs,
rb-tuned, 4M-row pieces) A/B/A/B interleaved in one window, bracketed by
the uniform gather rate. Also tries 3M-row pieces with lookahead.

Usage: python scratch/probe_piece_overlap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[ovl {time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


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

    def mkplan(max_rows):
        return sp.build_plan(s[of], r[of], None, n_node, rb=rb, eb=1024,
                             max_gather_rows=max_rows)

    plans = {4_000_000: mkplan(4_000_000), 3_000_000: mkplan(3_000_000)}
    for mr, p in plans.items():
        log(f"plan mr={mr/1e6:.0f}M: chunks={p.n_chunks} "
            f"pieces={len(p.piece_bounds)-1} "
            f"E_pad={p.n_chunks*p.eb/1e6:.1f}M")

    x = jax.jit(lambda k: jax.random.normal(k, (n_node, 128)))(
        jax.random.PRNGKey(0))

    fwd = jax.jit(
        lambda p, x: sp.spmm_via_plan(p, x, compute_dtype=jnp.bfloat16))

    def time_fwd(plan):
        y = fwd(plan, x)
        float(jnp.sum(y))  # warm (compile cached per lookahead+shape)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(4):
                y = fwd(plan, x)
            float(jnp.sum(y))
            best = min(best, (time.perf_counter() - t0) / 4)
        return best * 1e3

    results = {}
    for rnd in range(2):
        for la in (1, 2):
            sp.PIECE_LOOKAHEAD = la
            for mr in (4_000_000, 3_000_000):
                if la == 1 and mr == 3_000_000:
                    continue  # serial small pieces: strictly worse, skip
                key = f"la{la}_mr{mr//1_000_000}M"
                ms = time_fwd(plans[mr])
                br = measure_gather_rate(n_node)
                results.setdefault(key, []).append((ms, br))
                log(f"round {rnd} {key}: {ms:.0f} ms (bracket {br:.0f} "
                    f"Mrow/s)")
    sp.PIECE_LOOKAHEAD = 1

    print(f"\n{'variant':14s} {'best ms':>8s} {'bracket':>8s}")
    for k, v in results.items():
        best = min(v, key=lambda t: t[0])
        print(f"{k:14s} {best[0]:8.0f} {best[1]:8.0f}")


if __name__ == "__main__":
    main()
