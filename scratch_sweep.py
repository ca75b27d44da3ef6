import time, numpy as np, jax, jax.numpy as jnp
t00 = time.time()
def log(*a): print(f"[{time.time()-t00:7.1f}s]", *a, flush=True)
from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
from gnn_tail_generalization_tpu.graph import core
from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

n_node, n_edge, d = 50_000, 400_000, 256
e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))
log("setup", e.shape[1])

ref = None
for eb in (1024, 2048, 4096):
    plans = sp.build_plans(e, n_node, eb=eb)
    for dt in (jnp.float32, jnp.bfloat16):
        f = jax.jit(lambda p, x, dt=dt: sp.spmm_pallas_pair(p, x, False, dt))
        try:
            y = f(plans, x)
            s = float(jnp.sum(y))
        except Exception as ex:
            log(f"eb={eb} {dt.__name__}: FAIL {str(ex)[:120]}")
            continue
        t0 = time.time()
        for _ in range(5):
            y = f(plans, x)
        float(jnp.sum(y))
        ms = (time.time() - t0) / 5 * 1e3
        if ref is None:
            ref = s
        log(f"eb={eb} {dt.__name__}: {ms:.2f} ms  sum={s:.2f} "
            f"chunks={plans[0].n_chunks}")
