import time, numpy as np, jax, jax.numpy as jnp
def log(*a): print(*a, flush=True)
from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
from gnn_tail_generalization_tpu.graph import core
n_node, n_edge, d = 50_000, 400_000, 256
e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))
idx = jnp.asarray(np.sort(rng.integers(0, n_node, 1_144_832)).astype(np.int32))
f = jax.jit(lambda x, i: x[i])
y = f(x, idx); float(jnp.sum(y))
t0=time.time()
for _ in range(5): y = f(x, idx)
float(jnp.sum(y)); log(f"gather [1.14M,256] f32: {(time.time()-t0)/5*1e3:.2f} ms")
g = jax.jit(lambda x, i: jnp.sum(x[i]))
float(g(x, idx))
t0=time.time()
for _ in range(5): s = g(x, idx)
float(s); log(f"gather+sum fused: {(time.time()-t0)/5*1e3:.2f} ms")
