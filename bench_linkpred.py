"""Link prediction at ogbl-citation2 scale on the real TPU (not driver-run).

The reference's I2_GTL headline dataset is ogbl-citation2 (2.9M nodes,
~30M directed edges, /root/reference/trainer_link_prediction.py:215-431);
protocol = full-graph encode per 64Ki-edge minibatch
(/root/reference/Link_prediction_model/model.py:144-152).

This script (round 4):
1. trains SAGE+DOT through train_linkpred (library path) on a synthetic
   citation2-shaped graph — finiteness + MRR + cold/warm wall-clock, now
   with the device-resident scanned epoch (ONE host sync per epoch);
2. times the scanned train step directly (async best-of-2 windows);
3. calibrates the gather-emitter rate IN-RUN at the real table size (the
   tunnel degrades 3-5x for minutes at a time and the emitter rate is
   table-size dependent — a fixed 320 Mrow/s constant measured at arxiv
   scale is the wrong floor here, RESULTS.md round 4);
4. prints ONE JSON line with roofline fields mirroring bench.py's and
   writes it to BENCH_LP_r05.json.

Step anatomy (SAGE 2-layer, raw-feature input, round-4 design): layer-1
aggregation is HOISTED (constant input -> loop invariant; encoders.py
hoisted_first_agg), so the step runs 2 SpMMs (fwd layer-2 + its
transposed backward) over rb-tuned plans (choose_plan_rb), bf16 dense
tail, halfword dropout.
"""
import json
import sys
import time

import numpy as np

_T0 = time.time()


def _log(*a):
    print(f"[lp {time.time()-_T0:6.1f}s]", *a, file=sys.stderr, flush=True)


def measure_gather_rate(n_node, rows=4_000_000, seed=7):
    """Shared in-run calibration primitive (utils/debug.py) — the same
    methodology bench.py now uses (VERDICT r4 next #2)."""
    from gnn_tail_generalization_tpu.utils.debug import (
        measure_gather_rate as _mgr,
    )

    return _mgr(n_node, rows=rows, seed=seed)


def main(n_node=2_927_963, n_edge=30_387_995 // 2, n_feat=128,
         eval_pos=8192, num_neg_eval=50, seed=0):
    from gnn_tail_generalization_tpu.data.synthetic import (
        fast_powerlaw_graph,
    )
    from gnn_tail_generalization_tpu.graph.core import symmetrize
    from gnn_tail_generalization_tpu.linkpred import sampling
    from gnn_tail_generalization_tpu.linkpred.model import (
        LinkPredConfig, train_linkpred,
    )

    import jax
    import jax.numpy as jnp

    # citation2 headroom: 4M-row pieces keep one gather stream ~2 GB
    from gnn_tail_generalization_tpu.ops import spmm_pallas as _sp

    _sp.DEFAULT_MAX_GATHER_ROWS = 4_000_000

    rng = np.random.default_rng(seed)
    e = fast_powerlaw_graph(n_node, n_edge, seed)
    _log(f"graph built: {e.shape[1]} directed edges")
    # features generated ON the device: a [2.9M, 128] f32 table is 1.5 GB
    # of pure tunnel transfer if built host-side
    x = jax.jit(lambda k: jax.random.normal(k, (n_node, n_feat)),
                )(jax.random.PRNGKey(seed))
    _log("features built (on device)")

    # citation2-shaped split: most edges train, sampled eval sets (the
    # real protocol's 86M eval negatives would be pure host-build time on
    # a synthetic benchmark; the sampled-negative MRR protocol is labeled
    # in the JSON)
    m = e.shape[1]
    perm = rng.permutation(m)
    val = e[:, perm[:eval_pos]]
    test = e[:, perm[eval_pos: 2 * eval_pos]]
    train = e[:, perm[2 * eval_pos:]]
    keys = sampling.edge_keys(e, n_node)
    negs = np.asarray(sampling.rejection_sample_non_edges(
        np.random.default_rng(seed + 1), keys, n_node,
        2 * eval_pos * num_neg_eval))
    split_edge = {
        "train": {"edge": train.T},
        "valid": {"edge": val.T,
                  "edge_neg": negs[: eval_pos * num_neg_eval]},
        "test": {"edge": test.T,
                 "edge_neg": negs[eval_pos * num_neg_eval:]},
    }
    msg_edges = symmetrize(train, n_node)
    _log(f"split built: train={train.shape[1]} msg={msg_edges.shape[1]}")

    cfg = LinkPredConfig(
        encoder="SAGE", predictor="DOT", loss_func="ce_loss",
        use_node_feats=True, train_node_emb=False,
        eval_metric="mrr", num_neg=3, batch_size=64 * 1024,
        spmm_method="pallas_bf16",
    )

    t0 = time.time()
    out = train_linkpred(
        cfg, x, e, n_node, epochs=2, runs=1, eval_steps=2, seed=seed,
        split_edge=split_edge, msg_edges=msg_edges,
        max_steps_per_epoch=8, log_every=1,
    )
    wall = time.time() - t0
    stats = out["stats"]
    _log(f"done: {stats} wall={wall:.1f}s")
    mrr_test = stats["test_mean"]
    assert np.isfinite(mrr_test)
    del out

    # --- direct step timing: the same library pieces train_linkpred uses,
    # assembled once so repeat timings don't pay the host graph build
    from gnn_tail_generalization_tpu.graph.core import build_graph
    from gnn_tail_generalization_tpu.linkpred.encoders import (
        hoisted_first_agg,
    )
    from gnn_tail_generalization_tpu.linkpred.model import (
        LinkPredModel, make_epoch_fn,
    )
    from gnn_tail_generalization_tpu.ops.spmm_pallas import choose_plan_rb
    import optax

    plan_rb = choose_plan_rb(np.asarray(msg_edges[1]), n_node)
    g = build_graph(msg_edges, n_node, with_dense=False, with_plans=True,
                    lean=True, plan_rb=plan_rb)
    rows_fwd = g.plans[0].n_chunks * g.plans[0].eb
    rows_bwd = g.plans[1].n_chunks * g.plans[1].eb
    _log(f"timing graph: plan_rb={plan_rb} rows fwd/bwd "
         f"{rows_fwd/1e6:.1f}M/{rows_bwd/1e6:.1f}M "
         f"(real {msg_edges.shape[1]/1e6:.1f}M)")
    agg0 = jax.jit(
        lambda g_, x_: hoisted_first_agg("SAGE", g_, x_, cfg.spmm_method)
        .astype(jnp.bfloat16))(g, x)
    const = {"g": g, "x": x, "agg0": agg0}
    model = LinkPredModel(cfg, n_node, n_feat)
    k = jax.random.PRNGKey(seed)
    params = jax.jit(
        lambda c: model.init(
            {"params": k, "dropout": k}, c["g"], c["x"],
            jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32), train=False,
        ))(const)["params"]
    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm),
                     optax.adam(cfg.lr))
    opt_state = tx.init(params)
    n_steps = 16
    bsz = cfg.batch_size
    epoch_fn = make_epoch_fn(cfg, model, tx, n_node, n_steps, bsz,
                             n_steps * bsz)
    pos_all = jnp.asarray(train.T[: n_steps * bsz].astype(np.int32))
    keys_sorted = sampling.build_membership(
        sampling.edge_keys(msg_edges, n_node))

    params, opt_state, losses = epoch_fn(
        params, opt_state, const, pos_all, keys_sorted, k)  # compile+warm
    float(jnp.sum(losses))
    # rate calibrations INTERLEAVED with the epoch timings: the tunnel/chip
    # degrades 3-5x for minutes at a time, so a rate measured minutes away
    # from the step is the wrong floor. The floor uses the FASTEST rate
    # seen (largest denominator -> most conservative pct_of_floor).
    rates = [measure_gather_rate(n_node)]
    step_ms = float("inf")
    warm_epoch = float("inf")
    for w in range(2):
        t0 = time.perf_counter()
        params, opt_state, l1 = epoch_fn(
            params, opt_state, const, pos_all, keys_sorted,
            jax.random.fold_in(k, w + 1))
        float(jnp.sum(l1))
        warm_epoch = min(warm_epoch, time.perf_counter() - t0)
        t0 = time.perf_counter()
        params, opt_state, l2 = epoch_fn(
            params, opt_state, const, pos_all, keys_sorted,
            jax.random.fold_in(k, w + 10))
        float(jnp.sum(l2))
        warm_epoch = min(warm_epoch, time.perf_counter() - t0)
        step_ms = min(step_ms, warm_epoch / n_steps * 1e3)
        rates.append(measure_gather_rate(n_node))
    _log(f"scanned step: {step_ms:.0f} ms; warm {n_steps}-step epoch "
         f"(ONE dispatch+sync): {warm_epoch:.1f}s; rates {rates}")

    # --- the REAL OGB citation2 eval protocol at scale (VERDICT r4 next
    # #6): fixed 1000-negative lists per positive
    # (/root/reference/Link_prediction_model/utils.py:43-91,
    # trainer_link_prediction.py:230-236) — encode once, score
    # [8192, 1000] negative destinations through the chunked predictor,
    # grouped MRR. OGB's lists are uniform random destinations (possible
    # collisions with true edges included), built per source node.
    from gnn_tail_generalization_tpu.linkpred import metrics as M

    n_eval_pos, n_neg_list = eval_pos, 1000
    pos_eval = val.T[:n_eval_pos].astype(np.int64)
    neg_dst = rng.integers(0, n_node, (n_eval_pos, n_neg_list))
    neg_edges = np.stack(
        [np.repeat(pos_eval[:, 0], n_neg_list), neg_dst.reshape(-1)],
        axis=1)

    @jax.jit
    def encode_all_fn(params, c):
        return model.apply({"params": params}, c["g"], c["x"], train=False,
                           agg0=c["agg0"], method=model.encode)

    @jax.jit
    def predict_chunk(params, h, edges):
        return model.apply({"params": params}, h[edges[:, 0]],
                           h[edges[:, 1]], train=False,
                           method=model.predict_pairs)

    def ogb_eval():
        h = encode_all_fn(params, const)
        chunk = 512 * 1024
        outs = [predict_chunk(params, h, jnp.asarray(pos_eval))]
        m = len(neg_edges)
        for s0 in range(0, m, chunk):
            idx = (s0 + np.arange(chunk)) % m
            outs.append(predict_chunk(params, h, jnp.asarray(
                neg_edges[idx])))
        pos_s = np.asarray(outs[0])
        neg_s = np.concatenate([np.asarray(o) for o in outs[1:]])[:m]
        return pos_s, neg_s.reshape(n_eval_pos, n_neg_list)

    pos_s, neg_s = ogb_eval()  # compile + warm
    t0 = time.perf_counter()
    pos_s, neg_s = ogb_eval()
    mrr_1000 = M.mrr(jnp.asarray(pos_s), jnp.asarray(neg_s))
    ogb_eval_s = time.perf_counter() - t0
    _log(f"OGB 1000-neg eval: {n_eval_pos} pos x {n_neg_list} negs in "
         f"{ogb_eval_s:.2f}s (warm, incl. full-graph encode), "
         f"MRR={mrr_1000:.4f}")
    assert np.isfinite(mrr_1000)
    del params, opt_state, const, agg0

    rate = max(rates)
    rows_per_step = rows_fwd + rows_bwd  # 2 SpMMs/step (L1 hoisted)
    floor_ms = rows_per_step / (rate * 1e3)
    pct = 100.0 * floor_ms / step_ms
    _log(f"gather rate {rate:.0f} Mrow/s -> floor {floor_ms:.0f} ms "
         f"-> {pct:.0f}% of floor")

    rec = {
        "metric": "linkpred_citation2_scale",
        "n_node": n_node,
        "n_msg_edges": int(msg_edges.shape[1]),
        "train_positives": int(train.shape[1]),
        "encoder": "SAGE", "predictor": "DOT",
        "mrr_test": round(float(mrr_test), 4),
        "eval_protocol": f"MRR over {num_neg_eval} sampled uniform "
                         "negatives per positive (train-loop eval); the "
                         "fixed-1000-negative OGB protocol is timed "
                         "separately below",
        "ogb_1000neg_eval": {
            "n_pos": n_eval_pos, "n_neg_per_pos": n_neg_list,
            "mrr": round(float(mrr_1000), 4),
            "warm_eval_s": round(ogb_eval_s, 2),
            "definition": "full-graph encode + chunked predict of "
                          "[8192 pos + 8192x1000 neg] pairs, grouped "
                          "MRR (utils.py:43-91 protocol)",
        },
        "wall_s_2epochs_8steps_cold": round(wall, 1),
        "warm_epoch_steps": n_steps,
        "warm_epoch_s": round(warm_epoch, 2),
        "step_ms": round(step_ms, 1),
        "step_definition": "train fwd+bwd+adam, 64Ki-edge batch, "
                           "full-graph encode; step_ms = (scanned "
                           "16-step epoch incl. ONE dispatch+sync) / 16, "
                           "best of 4 epochs; layer-1 agg hoisted "
                           "(2 SpMMs/step)",
        "plan_rb": plan_rb,
        "gather_rows_per_step": rows_per_step,
        "gather_rate_mrow_s_measured": round(rate, 1),
        "gather_emitter_floor_ms": round(floor_ms, 1),
        "pct_gather_emitter_floor": round(pct, 1),
    }
    line = json.dumps(rec)
    print(line)
    with open("BENCH_LP_r05.json", "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
