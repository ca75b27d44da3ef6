import time, numpy as np, jax, jax.numpy as jnp
t00=time.time()
def log(*a): print(f"[{time.time()-t00:7.1f}s]", *a, flush=True)
from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
from gnn_tail_generalization_tpu.graph import core
from gnn_tail_generalization_tpu.ops import spmm_pallas as sp
n_node = 169343
e = core.standard_pipeline(fast_powerlaw_graph(n_node, 1_166_243, 0), n_node)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n_node, 256)).astype(np.float32))
log("setup", e.shape[1])

def timeit(f, *a, n=8):
    y = f(*a); float(jnp.sum(y))
    t0=time.time()
    for _ in range(n): y = f(*a)
    float(jnp.sum(y))
    return (time.time()-t0)/n*1e3

for rb, dt in ((128, jnp.float32), (128, jnp.bfloat16), (256, jnp.float32), (256, jnp.bfloat16)):
    plans = sp.build_plans(e, n_node, rb=rb)
    f = jax.jit(lambda p, x, dt=dt: sp.spmm_pallas_pair(p, x, False, dt))
    log(f"rb={rb} {dt.__name__}: {timeit(f, plans, x):.1f} ms "
        f"(chunks={plans[0].n_chunks})")
