"""Re-record the gather-emitter operating curve vs TABLE SIZE (round 5).

RESULTS.md round 4 cites this probe (originally uncommitted, re-recorded
this round — VERDICT r4 weak #3): 4M uniform 512B/128-lane f32 row
gathers from tables of increasing row count. Finding: the emitter rate
falls from 201-320 Mrow/s at the 169k-row (87 MB) table to ~116-140 at
GB-scale tables, so per-SpMM roofline floors must be calibrated at the
actual table size (bench.py and bench_linkpred.py both do, round 5).

Also re-checks the locality variants that justified "graph reordering is
a dead end" (sorted vs scattered indices at the citation2 table).

Usage: python scratch/probe_gather_curve.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[curve {time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    rows = 4_000_000

    @jax.jit
    def gather(x, i):
        return x[i]

    def rate(n_table, idx_np, x):
        i = jnp.asarray(idx_np, jnp.int32)
        float(jnp.sum(gather(x, i)))
        best = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            for _ in range(8):
                out = gather(x, i)
            float(jnp.sum(out))
            best = min(best, (time.perf_counter() - t) / 8)
        return rows / best / 1e6

    rng = np.random.default_rng(0)
    print(f"{'table rows':>12s} {'span MB':>8s} {'Mrow/s':>8s}")
    for n in (169_343, 524_288, 1_048_576, 2_097_152, 2_927_963):
        x = jax.jit(lambda k, n=n: jax.random.normal(k, (n, 128)))(
            jax.random.PRNGKey(0))
        r = rate(n, rng.integers(0, n, rows), x)
        print(f"{n:12d} {n * 512 / 1e6:8.0f} {r:8.1f}")
        log(f"table {n}: {r:.1f} Mrow/s")
        del x

    # locality variants at the citation2 table
    n = 2_927_963
    x = jax.jit(lambda k: jax.random.normal(k, (n, 128)))(
        jax.random.PRNGKey(0))
    uni = rng.integers(0, n, rows)
    # power-law-scattered: draw hub-skewed values like a real sender
    # stream (dst popularity ~ u^2, same generator as fast_powerlaw_graph)
    u = rng.random(rows)
    pl = np.minimum((n * u ** 2).astype(np.int64), n - 1)
    perm = rng.permutation(n)
    variants = {
        "uniform": uni,
        "uniform sorted": np.sort(uni),
        "power-law scattered": perm[pl],
        "power-law hubs-contiguous": pl,
    }
    print(f"\n{'variant':28s} {'Mrow/s':>8s}")
    for name, idx in variants.items():
        r = rate(n, idx, x)
        print(f"{name:28s} {r:8.1f}")
        log(f"{name}: {r:.1f}")


if __name__ == "__main__":
    main()
