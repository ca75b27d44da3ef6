"""Characterize XLA's TPU row-gather emitter: rows/s and GB/s vs dtype, row
width, and index ordering. Drives the round-2 kernel redesign."""
import time
import sys

import numpy as np
import jax
import jax.numpy as jnp


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


def main(n_node=169343, n_rows=2_816_000):
    rng = np.random.default_rng(0)
    # block-sorted-ish indices (what the plan produces): sorted within
    # chunks of 2048
    idx_rand = rng.integers(0, n_node, n_rows).astype(np.int32)
    idx_block = idx_rand.reshape(-1, 2048).copy()
    idx_block.sort(axis=1)
    idx_block = jnp.asarray(idx_block.reshape(-1))
    idx_sorted = jnp.asarray(np.sort(idx_rand))
    idx_rand = jnp.asarray(idx_rand)

    f = jax.jit(lambda s, x: x[s])

    for dt, bytes_per in ((jnp.float32, 4), (jnp.bfloat16, 2), (jnp.int8, 1)):
        for d in (128, 256, 512):
            x = jnp.asarray(
                rng.normal(size=(n_node, d)).astype(np.float32) * 10
            ).astype(dt)
            t = timeit(f, idx_block, x)
            rowb = d * bytes_per
            log(f"{jnp.dtype(dt).name:9s} d={d:4d} row={rowb:5d}B  block-sorted: "
                f"{t*1e3:7.2f} ms  {n_rows/t/1e6:6.1f} Mrow/s  "
                f"{2*n_rows*rowb/t/1e9:6.1f} GB/s(r+w)")

    # index-order sensitivity at bf16 d=256
    x = jnp.asarray(rng.normal(size=(n_node, 256)).astype(np.float32)).astype(
        jnp.bfloat16)
    for name, idx in (("random", idx_rand), ("block2048", idx_block),
                      ("fully-sorted", idx_sorted)):
        t = timeit(f, idx, x)
        log(f"bf16 d=256 {name:12s}: {t*1e3:7.2f} ms  {n_rows/t/1e6:6.1f} Mrow/s")


if __name__ == "__main__":
    main()
