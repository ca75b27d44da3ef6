import time, numpy as np, jax, jax.numpy as jnp
t00=time.time()
def log(*a): print(f"[{time.time()-t00:7.1f}s]", *a, flush=True)
import bench as B

cfg, pd = B.build_workload()
log("workload", pd.graph.n_edge)
from gnn_tail_generalization_tpu.models.teacher import TeacherGNN
from gnn_tail_generalization_tpu.train.loops import _nll_masked
from gnn_tail_generalization_tpu.ops.spmm import spmm
model = TeacherGNN(cfg)
g = pd.graph
x = jnp.asarray(pd.x); y = jnp.asarray(pd.y); mask = jnp.asarray(pd.train_mask)
variables = jax.jit(lambda g,x: model.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, g, x, train=True))(g, x)
params = variables["params"]
const = {"g": g, "x": x, "y": y, "mask": mask}

def timeit(f, *a, n=8):
    out = f(*a); float(jnp.sum(jax.tree.leaves(out)[0]))
    t0=time.time()
    for _ in range(n): out = f(*a)
    float(jnp.sum(jax.tree.leaves(out)[0]))
    return (time.time()-t0)/n*1e3

# 1: single pallas spmm at this scale, d=256
h = jnp.zeros((pd.n_node, 256), jnp.float32)
f1 = jax.jit(lambda g, h: spmm(g, h))
log(f"spmm d=256: {timeit(f1, g, h):.1f} ms")

# 2: eval-mode forward (no dropout)
f2 = jax.jit(lambda p, c: model.apply({"params": p}, c["g"], c["x"], train=False)[1])
log(f"fwd eval: {timeit(f2, params, const):.1f} ms")

# 3: train-mode forward + loss
def lossfn(p, c, k):
    _, classi, se, _ = model.apply({"params": p}, c["g"], c["x"], train=True, rngs={"dropout": k})
    l = _nll_masked(classi, c["y"], c["mask"])
    return l + cfg.se_reg * se
f3 = jax.jit(lossfn)
k = jax.random.PRNGKey(0)
log(f"fwd train+loss: {timeit(f3, params, const, k):.1f} ms")

# 4: value_and_grad (no optimizer)
f4 = jax.jit(lambda p, c, k: jax.grad(lossfn)(p, c, k)["backbone"]["conv_0"]["kernel"])
log(f"fwd+bwd: {timeit(f4, params, const, k):.1f} ms")
