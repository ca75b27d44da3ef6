import time, numpy as np, jax, jax.numpy as jnp
t00=time.time()
def log(*a): print(f"[{time.time()-t00:7.1f}s]", *a, flush=True)
from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
from gnn_tail_generalization_tpu.graph import core
from gnn_tail_generalization_tpu.ops import spmm_pallas as sp
n_node, n_edge, d = 50_000, 400_000, 256
e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))
plans = sp.build_plans(e, n_node)
log("plans", plans[0].n_chunks)
f = jax.jit(lambda p, x: sp.spmm_pallas_pair(p, x))
y = f(plans, x); log("compiled", float(jnp.sum(y)))
t0=time.time()
for _ in range(10): y = f(plans, x)
float(jnp.sum(y)); log(f"pallas sender-sorted: {(time.time()-t0)/10*1e3:.2f} ms")
