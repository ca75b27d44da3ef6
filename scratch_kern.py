import time, numpy as np, jax, jax.numpy as jnp
t00 = time.time()
def log(*a): print(f"[{time.time()-t00:7.1f}s]", *a, flush=True)
from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
from gnn_tail_generalization_tpu.graph import core
from gnn_tail_generalization_tpu.ops.spmm import spmm
from gnn_tail_generalization_tpu.ops import spmm_pallas as sp

n_node, n_edge, d = 50_000, 400_000, 256
e = core.standard_pipeline(fast_powerlaw_graph(n_node, n_edge, 0), n_node)
g = core.build_graph(e, n_node, with_dense=False)
log("graph built", g.n_edge)
plans = sp.build_plans(e, n_node)
log("plans built", plans[0].n_chunks)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(n_node, d)).astype(np.float32))
log("x on device")

f_xla = jax.jit(lambda g, x: spmm(g, x, "gather"))
y1 = f_xla(g, x); s1 = float(jnp.sum(y1)); log("xla compiled+run", s1)
t0 = time.time()
for _ in range(5): y1 = f_xla(g, x)
float(jnp.sum(y1)); log(f"xla: {(time.time()-t0)/5*1e3:.2f} ms/iter")

f_pal = jax.jit(lambda p, x: sp.spmm_pallas_pair(p, x))
y2 = f_pal(plans, x); s2 = float(jnp.sum(y2)); log("pallas compiled+run", s2)
t0 = time.time()
for _ in range(5): y2 = f_pal(plans, x)
float(jnp.sum(y2)); log(f"pallas: {(time.time()-t0)/5*1e3:.2f} ms/iter")
log("sum relerr", abs(s1 - s2) / abs(s1))

ct = jnp.ones_like(x)
g_xla = jax.jit(jax.grad(lambda x: jnp.vdot(spmm(g, x, "gather"), ct)))
g_pal = jax.jit(jax.grad(lambda x: jnp.vdot(sp.spmm_pallas_pair(plans, x), ct)))
d1 = g_xla(x); float(jnp.sum(d1)); log("xla grad compiled")
t0 = time.time()
for _ in range(5): d1 = g_xla(x)
float(jnp.sum(d1)); log(f"xla grad: {(time.time()-t0)/5*1e3:.2f} ms/iter")
d2 = g_pal(x); float(jnp.sum(d2)); log("pallas grad compiled")
t0 = time.time()
for _ in range(5): d2 = g_pal(x)
float(jnp.sum(d2)); log(f"pallas grad: {(time.time()-t0)/5*1e3:.2f} ms/iter")
log("grad diff", float(jnp.max(jnp.abs(d1 - d2))))

# bf16 compute variant
f_pal16 = jax.jit(lambda p, x: sp.spmm_pallas_pair(p, x, False, jnp.bfloat16))
y3 = f_pal16(plans, x); s3 = float(jnp.sum(y3)); log("pallas bf16 compiled", s3)
t0 = time.time()
for _ in range(5): y3 = f_pal16(plans, x)
float(jnp.sum(y3)); log(f"pallas bf16: {(time.time()-t0)/5*1e3:.2f} ms/iter")
log("bf16 relerr", abs(s1 - s3) / abs(s1))
