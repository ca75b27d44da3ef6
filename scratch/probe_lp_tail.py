"""Decompose the citation2 LP train step beyond the SpMMs (round 5).

Post-cliff-fix the scanned step is ~586 ms vs a 338 ms 2-SpMM gather
floor; this probe splits the remainder: transposed-bwd SpMM, dense
encoder tail, predictor/loss, value_and_grad overhead. All stages in
one process, brackets interleaved (same rules as probe_decisive).

Usage: python scratch/probe_lp_tail.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

T0 = time.time()


def log(*a):
    print(f"[tail {time.time()-T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from gnn_tail_generalization_tpu.data.synthetic import fast_powerlaw_graph
    from gnn_tail_generalization_tpu.graph.core import build_graph, symmetrize
    from gnn_tail_generalization_tpu.linkpred.encoders import hoisted_first_agg
    from gnn_tail_generalization_tpu.linkpred.model import (
        LinkPredConfig, LinkPredModel, compute_loss,
    )
    from gnn_tail_generalization_tpu.ops import spmm_pallas as sp
    from gnn_tail_generalization_tpu.ops.spmm import spmm
    from gnn_tail_generalization_tpu.ops.spmm_pallas import choose_plan_rb
    from gnn_tail_generalization_tpu.utils.debug import measure_gather_rate

    sp.DEFAULT_MAX_GATHER_ROWS = 4_000_000
    n, n_feat = 2_927_963, 128
    e = fast_powerlaw_graph(n, 30_387_995 // 2, 0)
    msg = symmetrize(e, n)
    rb = choose_plan_rb(np.asarray(msg[1]), n)
    g = build_graph(msg, n, with_dense=False, with_plans=True, lean=True,
                    plan_rb=rb)
    log(f"graph built rb={rb}")
    x = jax.jit(lambda k: jax.random.normal(k, (n, n_feat)))(
        jax.random.PRNGKey(0))
    cfg = LinkPredConfig(encoder="SAGE", predictor="DOT",
                         loss_func="ce_loss", use_node_feats=True,
                         train_node_emb=False, eval_metric="mrr",
                         num_neg=3, batch_size=64 * 1024,
                         spmm_method="pallas_bf16")
    agg0 = jax.jit(lambda g_, x_: hoisted_first_agg(
        "SAGE", g_, x_, cfg.spmm_method).astype(jnp.bfloat16))(g, x)
    model = LinkPredModel(cfg, n, n_feat)
    k = jax.random.PRNGKey(0)
    const = {"g": g, "x": x, "agg0": agg0}
    params = jax.jit(lambda c: model.init(
        {"params": k, "dropout": k}, c["g"], c["x"],
        jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32), train=False,
    ))(const)["params"]
    bsz = cfg.batch_size
    pos = jnp.asarray(np.asarray(msg[:, :bsz].T, np.int32))
    neg = jnp.asarray(
        np.random.default_rng(1).integers(0, n, (bsz, cfg.num_neg, 2),
                                          ).astype(np.int32))
    log("setup done")

    @jax.jit
    def spmm_fwd(c, h):
        return spmm(c["g"], h, "pallas_bf16")

    @jax.jit
    def spmm_bwd(c, h):
        return spmm(c["g"].transpose(), h, "pallas_bf16")

    @jax.jit
    def encode(p, c, rng):
        return model.apply({"params": p}, c["g"], c["x"], train=True,
                           rngs={"dropout": rng}, agg0=c["agg0"],
                           method=model.encode)

    def loss_fn(p, c, pos, neg, rng):
        h = model.apply({"params": p}, c["g"], c["x"], train=True,
                        rngs={"dropout": rng}, agg0=c["agg0"],
                        method=model.encode)
        pos_out = model.apply({"params": p}, h[pos[:, 0]], h[pos[:, 1]],
                              train=True, rngs={"dropout": rng},
                              method=model.predict_pairs)
        nf = neg.reshape(-1, 2)
        neg_out = model.apply({"params": p}, h[nf[:, 0]], h[nf[:, 1]],
                              train=True, rngs={"dropout": rng},
                              method=model.predict_pairs
                              ).reshape(bsz, cfg.num_neg)
        return compute_loss(cfg, pos_out, neg_out)

    loss_j = jax.jit(loss_fn)
    vg_j = jax.jit(jax.value_and_grad(loss_fn))

    # SpMM operand: reuse the resident agg0 [n, 256] bf16 buffer — a
    # fresh [n, 256] f32 zeros pushed the probe over HBM (OOM, round 5)
    hbf = agg0

    def best_ms(fn, *args, nrep=2, nin=2):
        out = fn(*args)
        float(jnp.sum(jax.tree.leaves(out)[0]))
        best = float("inf")
        for _ in range(nrep):
            t0 = time.perf_counter()
            for _ in range(nin):
                out = fn(*args)
            float(jnp.sum(jax.tree.leaves(out)[0]))
            best = min(best, (time.perf_counter() - t0) / nin)
        return best * 1e3

    stages = {}

    def rec(name, ms):
        br = measure_gather_rate(n)
        stages[name] = (ms, br)
        log(f"{name:12s} {ms:7.1f} ms  (bracket {br:.0f})")

    rec("spmm_fwd", best_ms(spmm_fwd, const, hbf))
    rec("spmm_bwd", best_ms(spmm_bwd, const, hbf))
    rec("encode", best_ms(encode, params, const, k))
    rec("loss_fwd", best_ms(loss_j, params, const, pos, neg, k))
    rec("vg", best_ms(vg_j, params, const, pos, neg, k, nin=1))

    print(f"\n{'stage':12s} {'ms':>8s} {'bracket':>8s}")
    for name, (ms, br) in stages.items():
        print(f"{name:12s} {ms:8.1f} {br:8.0f}")
    f, b = stages["spmm_fwd"][0], stages["spmm_bwd"][0]
    print(f"dense fwd tail (encode - spmm_fwd): "
          f"{stages['encode'][0] - f:.0f} ms")
    print(f"predictor+gather tail (loss_fwd - encode): "
          f"{stages['loss_fwd'][0] - stages['encode'][0]:.0f} ms")
    print(f"vg - spmms = {stages['vg'][0] - f - b:.0f} ms total non-SpMM")


if __name__ == "__main__":
    main()
