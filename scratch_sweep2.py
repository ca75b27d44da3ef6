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
plans = sp.build_plans(e, n_node, eb=2048)
f = jax.jit(lambda p, x: sp.spmm_pallas_pair(p, x, False, jnp.bfloat16))
y = f(plans, x); log("compiled", float(jnp.sum(y)))
t0 = time.time()
for _ in range(5): y = f(plans, x)
float(jnp.sum(y)); log(f"eb=2048 bf16: {(time.time()-t0)/5*1e3:.2f} ms")
