"""Observability: profiler traces, NaN guards, throughput counters.

The reference has essentially none of this (SURVEY.md section 5): wall-clock
prints and a dead PAPI block. TPU-native equivalents:

- ``profile_trace``: jax.profiler trace context (view in TensorBoard /
  xprof) around any training region.
- ``checked``: jax.experimental.checkify wrapper with float checks — the
  debug-run equivalent of torch's anomaly detection; returns (err, out) and
  ``err.throw()``s on NaN/Inf with a located stack.
- ``assert_finite``: host-side pytree finiteness check for tests/loops.
- ``spmm_edges_per_sec``: the per-kernel edges/s counter used as the
  framework's canonical perf unit (BASELINE.md).
"""
from __future__ import annotations

import contextlib
import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def profile_trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def checked(fn, *, div: bool = True, nan: bool = True, inf: bool = True):
    """checkify-wrapped fn: returns g(*args) -> (err, out).

    checkify has no standalone inf set: nan_checks covers NaN AND Inf
    detection, so ``inf`` folds into ``nan`` (requesting either enables
    nan_checks) rather than being a silent no-op."""
    from jax.experimental import checkify

    checks = []
    if div:
        checks.append(checkify.div_checks)
    if nan or inf:
        checks.append(checkify.nan_checks)
    errors = frozenset(c for cs in checks for c in cs)
    return checkify.checkify(fn, errors=errors)


def assert_finite(tree: Any, name: str = "pytree") -> None:
    bad = []

    def visit(path, leaf):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                bad.append(jax.tree_util.keystr(path))

    jax.tree_util.tree_map_with_path(visit, tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad}")


def measure_gather_rate(n_node: int, rows: int = 4_000_000, seed: int = 7,
                        idx: np.ndarray | None = None,
                        repeats: int = 2) -> float:
    """Best-of-``repeats`` rate (Mrow/s) for a 512B/128-lane f32 row gather
    from an ``n_node``-row table — the exact operand shape the packed-pair
    SpMM's gather moves. This is the bench-roofline calibration primitive:
    the emitter rate is TABLE-SIZE and WINDOW dependent (169k-row table:
    201-320 Mrow/s; 2.9M-row: 135-211 — RESULTS.md round 4), so a fixed
    constant is the wrong floor at any other scale or minute.

    ``idx``: optional explicit gather stream (e.g. real plan senders) —
    defaults to fresh uniform draws. Methodology (RESULTS.md round 4b):
    8 dispatches per host sync (the tunnel round trip is ~30 ms; fewer
    dispatches understate the rate and overstate pct_of_floor), data
    passed as arguments (never closure constants), sync via float(sum).
    """

    @jax.jit
    def gather(x, i):
        return x[i]

    x = jax.jit(lambda k: jax.random.normal(k, (n_node, 128)))(
        jax.random.PRNGKey(seed))
    if idx is None:
        idx = np.random.default_rng(seed).integers(0, n_node, rows)
    rows = len(idx)
    i = jnp.asarray(idx, jnp.int32)
    float(jnp.sum(gather(x, i)))  # warm/compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(8):
            out = gather(x, i)
        float(jnp.sum(out))
        best = min(best, (time.perf_counter() - t0) / 8)
    return rows / best / 1e6


def spmm_edges_per_sec(g, x, method: str = "auto", iters: int = 10) -> float:
    """Measured SpMM throughput in edges/s (host-readback synced — see the
    axon-tunnel sync note in bench.py)."""
    from ..ops.spmm import spmm

    f = jax.jit(lambda g, x: spmm(g, x, method))
    out = f(g, x)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(g, x)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / iters
    return g.n_edge / dt
