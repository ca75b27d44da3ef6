"""Hierarchical (host x chip) SpMM: ICI ring within hosts, halo-only DCN.

The flat 1-D ring (parallel/distgraph.py) ppermutes FULL feature blocks
S-1 times; when some ring links cross DCN every hop is paced by the
~3.1 GB/s per-chip DCN share and projected 2-host efficiency collapses
(RESULTS.md round 5: 3.7% at citation2 scale). The bandwidth-correct
2-level topology implemented here:

- **Within a host** (chips on ICI): the proven ring — per-(dst_chip,
  src_chip) buckets with scatter-free Pallas segment-matmul plans,
  feature blocks ppermuted over the ``chip`` mesh axis.
- **Across hosts** (DCN): move only the HALO. For each ordered host
  pair (g -> h), the build step computes U_gh = the unique source rows
  of host g that any shard of host h needs. Per cross step t, host g
  assembles the [U_max, d] halo buffer for its target (one within-host
  psum over ICI), each chip ships a 1/C slice over ONE ``host``-axis
  ppermute (so the pair's DCN volume is U_max * d * itemsize, the
  partition's lower bound up to padding), the receiving host reassembles
  it with an ICI all_gather, and every chip aggregates its
  (dst_chip, src_host) bucket with a Pallas plan whose senders index the
  halo buffer (striped pads wrap at U_max via build_plan's stripe_mod).

DCN bytes per SpMM = sum_{g != h} U_gh_pad * d * itemsize — compare
``ring_bytes_per_spmm`` in comm_volume_stats: at citation2 scale and
H=2 the halo is ~25x smaller than streaming all blocks across DCN.

Reference: none — the reference is single-GPU
(/root/reference/trainer_node_classification.py:258); this is TPU-native
completeness for multi-host pods (SURVEY.md section 2.9).
"""
from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.spmm_pallas import (
    GATHER_TAIL_PAD, SegmentMatmulPlan, build_plan, spmm_via_plan,
)
from .distgraph import global_put


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _plan_arrays(s, r, w, n_out_rows, rb, eb, stripe_mod):
    """Host-side plan arrays (senders incl. the +8 tail, dst_local, w,
    block_of_chunk, first_of_block, n_chunks). Native C++ when available;
    otherwise build_plan + host readback (CPU backends only — fine for
    tests; the tunneled-TPU path always has the native lib)."""
    from .. import native as _native

    order = np.argsort(r, kind="stable")
    s, r, w = s[order], r[order], w[order]
    nat = _native.segment_matmul_plan_arrays(s, r, w, n_out_rows, rb, eb,
                                             stripe_mod=stripe_mod)
    if nat is not None:
        return nat
    p = build_plan(s, r, w, n_out_rows, rb=rb, eb=eb, max_gather_rows=None,
                   stripe_mod=stripe_mod)
    return (np.asarray(p.senders), np.asarray(p.dst_local),
            np.asarray(p.weights), np.asarray(p.block_of_chunk),
            np.asarray(p.first_of_block), p.n_chunks)


def _stack(plan_list, grid_shape, rows, rb, eb, stripe_mod):
    """Stack host-side plan tuples (from _plan_arrays) living on a
    flattened grid into common-chunk-count arrays. Padding chunks target
    the LAST block with weight 0 / first=0 (Pallas revisit safety, see
    distgraph._stack_bucket_plans); pad + tail senders are striped
    modulo ``stripe_mod``."""
    q = max(p[5] for p in plan_list) if plan_list else 1
    q = max(q, 1)
    n = len(plan_list)
    n_blocks = rows // rb
    width = q * eb
    stripe = ((np.arange(width + GATHER_TAIL_PAD, dtype=np.uint64)
               * np.uint64(2654435761))
              % np.uint64(max(stripe_mod, 1))).astype(np.int32)
    out_s = np.broadcast_to(stripe, (n, len(stripe))).copy()
    out_d = np.zeros((n, width), np.int32)
    out_w = np.zeros((n, width), np.float32)
    out_b = np.full((n, q), n_blocks - 1, np.int32)
    out_f = np.zeros((n, q), np.int32)
    for i, (ps, pd, pw, pb, pf, nc) in enumerate(plan_list):
        out_s[i, : len(ps)] = ps
        out_d[i, : len(pd)] = pd
        out_w[i, : len(pw)] = pw
        out_b[i, : nc] = pb
        out_f[i, : nc] = pf
    shape = tuple(grid_shape)
    return (out_s.reshape(shape + (-1,)), out_d.reshape(shape + (-1,)),
            out_w.reshape(shape + (-1,)), out_b.reshape(shape + (-1,)),
            out_f.reshape(shape + (-1,)), q)


_DATA = [
    "ib_s", "ib_d", "ib_w", "ib_blk", "ib_first",
    "cp_s", "cp_d", "cp_w", "cp_blk", "cp_first", "halo_idx",
    "ib_s_t", "ib_d_t", "ib_w_t", "ib_blk_t", "ib_first_t",
    "cp_s_t", "cp_d_t", "cp_w_t", "cp_blk_t", "cp_first_t", "halo_idx_t",
    "deg_out", "deg_in",
]
_META = ["n_node", "n_node_pad", "rows", "n_hosts", "n_chips", "rb", "eb",
         "qi", "qc", "qi_t", "qc_t", "u_max", "u_max_t", "mesh",
         "host_axis", "chip_axis", "dcn_rows"]


@partial(jax.tree_util.register_dataclass, data_fields=_DATA,
         meta_fields=_META)
@dataclass(frozen=True)
class HierGraph:
    """Two-level sharded graph over a (host, chip) mesh.

    Intra arrays: [H, C_dst, C_src, qi*eb(+8 senders)] / [H, C, C, qi];
    cross arrays: [H, T, C_dst, qc*eb(+8)] / [H, T, C, qc] with T = H-1
    and senders indexing the [u_max, d] halo buffer of cross step t
    (src host g = (h + t) % H); ``halo_idx``: [H, T, u_max] HOST-local
    row ids the SENDING host gathers (striped pads wrap at C*rows).
    ``_t`` twins drive the transposed ring (backward)."""

    ib_s: jax.Array
    ib_d: jax.Array
    ib_w: jax.Array
    ib_blk: jax.Array
    ib_first: jax.Array
    cp_s: Optional[jax.Array]
    cp_d: Optional[jax.Array]
    cp_w: Optional[jax.Array]
    cp_blk: Optional[jax.Array]
    cp_first: Optional[jax.Array]
    halo_idx: Optional[jax.Array]
    ib_s_t: jax.Array
    ib_d_t: jax.Array
    ib_w_t: jax.Array
    ib_blk_t: jax.Array
    ib_first_t: jax.Array
    cp_s_t: Optional[jax.Array]
    cp_d_t: Optional[jax.Array]
    cp_w_t: Optional[jax.Array]
    cp_blk_t: Optional[jax.Array]
    cp_first_t: Optional[jax.Array]
    halo_idx_t: Optional[jax.Array]
    deg_out: jax.Array
    deg_in: jax.Array
    n_node: int = 0
    n_node_pad: int = 0
    rows: int = 0
    n_hosts: int = 1
    n_chips: int = 1
    rb: int = 8
    eb: int = 1024
    qi: int = 0
    qc: int = 0
    qi_t: int = 0
    qc_t: int = 0
    u_max: int = 0
    u_max_t: int = 0
    mesh: Optional[Mesh] = None
    host_axis: str = "host"
    chip_axis: str = "chip"
    #: total unpadded cross-host halo rows per SpMM (the DCN volume's
    #: information content; the padded/actual volume is in
    #: hier_comm_stats)
    dcn_rows: int = 0

    def transpose(self) -> "HierGraph":
        return dataclasses.replace(
            self,
            ib_s=self.ib_s_t, ib_d=self.ib_d_t, ib_w=self.ib_w_t,
            ib_blk=self.ib_blk_t, ib_first=self.ib_first_t,
            cp_s=self.cp_s_t, cp_d=self.cp_d_t, cp_w=self.cp_w_t,
            cp_blk=self.cp_blk_t, cp_first=self.cp_first_t,
            halo_idx=self.halo_idx_t,
            ib_s_t=self.ib_s, ib_d_t=self.ib_d, ib_w_t=self.ib_w,
            ib_blk_t=self.ib_blk, ib_first_t=self.ib_first,
            cp_s_t=self.cp_s, cp_d_t=self.cp_d, cp_w_t=self.cp_w,
            cp_blk_t=self.cp_blk, cp_first_t=self.cp_first,
            halo_idx_t=self.halo_idx,
            deg_out=self.deg_in, deg_in=self.deg_out,
            qi=self.qi_t, qc=self.qc_t, qi_t=self.qi, qc_t=self.qc,
            u_max=self.u_max_t, u_max_t=self.u_max,
        )


def _build_direction(e, w, n_node_pad, rows, H, C, rb, eb):
    """Host-side intra/cross plan arrays + halo index table for ONE edge
    direction (dst = e[1]). Returns dict of numpy arrays + meta."""
    src, dst = e[0], e[1]
    shard_s, shard_d = src // rows, dst // rows
    host_s, host_d = shard_s // C, shard_d // C
    chip_s, chip_d = shard_s % C, shard_d % C
    T = max(H - 1, 1)

    same = host_s == host_d
    intra = []
    for h in range(H):
        for k in range(C):
            for j in range(C):
                m = same & (host_d == h) & (chip_d == k) & (chip_s == j)
                sl = (src[m] - (h * C + j) * rows)
                rl = (dst[m] - (h * C + k) * rows)
                intra.append(_plan_arrays(sl, rl, w[m], rows, rb, eb,
                                          stripe_mod=rows))
    ib = _stack(intra, (H, C, C), rows, rb, eb, stripe_mod=rows)

    cp = None
    halo_idx = None
    u_max = 0
    dcn_rows = 0
    if H > 1:
        # pass 1: per (h, t) pair the unique source rows of host g
        pair_u = {}
        for h in range(H):
            for t in range(1, H):
                g = (h + t) % H
                m = (~same) & (host_d == h) & (host_s == g)
                u = np.unique(src[m])
                pair_u[(h, t)] = u
                dcn_rows += len(u)
        u_raw = max((len(u) for u in pair_u.values()), default=1)
        u_max = _round_up(max(u_raw, 8), 8 * C)
        u_sl = u_max // C

        cross = []
        halo_idx = np.zeros((H, T, u_max), np.int32)
        stripe = ((np.arange(u_max, dtype=np.uint64)
                   * np.uint64(2654435761))
                  % np.uint64(C * rows)).astype(np.int32)
        for h in range(H):
            for t in range(1, H):
                g = (h + t) % H
                u = pair_u[(h, t)]
                # sender side: host g ships this list at step t
                # (its target at t is (g - t) % H == h)
                row = stripe.copy()
                row[: len(u)] = (u - g * C * rows).astype(np.int32)
                halo_idx[g, t - 1] = row
                m = (~same) & (host_d == h) & (host_s == g)
                pos_all = np.searchsorted(u, src[m])
                for k in range(C):
                    mk = chip_d[m] == k
                    sl = pos_all[mk]
                    rl = dst[m][mk] - (h * C + k) * rows
                    cross.append(_plan_arrays(
                        sl, rl, w[m][mk], rows, rb, eb, stripe_mod=u_max))
        cp = _stack(cross, (H, T, C), rows, rb, eb, stripe_mod=u_max)
        assert u_sl * C == u_max

    return dict(ib=ib, cp=cp, halo_idx=halo_idx, u_max=u_max,
                dcn_rows=dcn_rows)


def build_hier_graph(
    edge_index: np.ndarray,
    n_node: int,
    mesh: Mesh,
    edge_weight: Optional[np.ndarray] = None,
    *,
    host_axis: str = "host",
    chip_axis: str = "chip",
    rb: int = 128,
    eb: int = 1024,
) -> HierGraph:
    """Host-side build + sharded device placement. The mesh must carry
    the two axes; rows are partitioned host-major (shard = host*C +
    chip), so a host owns a contiguous [C*rows] range."""
    H = mesh.shape[host_axis]
    C = mesh.shape[chip_axis]
    S = H * C
    e = np.asarray(edge_index, np.int64)
    w = (np.ones(e.shape[1], np.float32) if edge_weight is None
         else np.asarray(edge_weight, np.float32))
    n_node_pad = _round_up(n_node, S * rb)
    rows = n_node_pad // S

    deg_out = np.bincount(e[0], minlength=n_node_pad).astype(np.float32)
    deg_in = np.bincount(e[1], minlength=n_node_pad).astype(np.float32)

    fwd = _build_direction(e, w, n_node_pad, rows, H, C, rb, eb)
    bwd = _build_direction(e[::-1], w, n_node_pad, rows, H, C, rb, eb)

    sh_i = NamedSharding(mesh, P(host_axis, chip_axis, None, None))
    sh_c = NamedSharding(mesh, P(host_axis, None, chip_axis, None))
    sh_h = NamedSharding(mesh, P(host_axis, None, None))
    sh_v = NamedSharding(mesh, P((host_axis, chip_axis),))
    put = lambda a, sh: None if a is None else global_put(a, sh)

    def unpack(d, sh_intra, sh_cross):
        ib_s, ib_d, ib_w, ib_b, ib_f, qi = d["ib"]
        if d["cp"] is None:
            cp = (None,) * 5
            qc = 0
        else:
            *cp, qc = d["cp"]
        return (
            put(ib_s, sh_intra), put(ib_d, sh_intra), put(ib_w, sh_intra),
            put(ib_b, sh_intra), put(ib_f, sh_intra),
            put(cp[0], sh_cross) if d["cp"] else None,
            put(cp[1], sh_cross) if d["cp"] else None,
            put(cp[2], sh_cross) if d["cp"] else None,
            put(cp[3], sh_cross) if d["cp"] else None,
            put(cp[4], sh_cross) if d["cp"] else None,
            put(d["halo_idx"], sh_h),
            qi, qc,
        )

    f = unpack(fwd, sh_i, sh_c)
    b = unpack(bwd, sh_i, sh_c)

    return HierGraph(
        ib_s=f[0], ib_d=f[1], ib_w=f[2], ib_blk=f[3], ib_first=f[4],
        cp_s=f[5], cp_d=f[6], cp_w=f[7], cp_blk=f[8], cp_first=f[9],
        halo_idx=f[10],
        ib_s_t=b[0], ib_d_t=b[1], ib_w_t=b[2], ib_blk_t=b[3],
        ib_first_t=b[4],
        cp_s_t=b[5], cp_d_t=b[6], cp_w_t=b[7], cp_blk_t=b[8],
        cp_first_t=b[9], halo_idx_t=b[10],
        deg_out=put(deg_out, sh_v), deg_in=put(deg_in, sh_v),
        n_node=n_node, n_node_pad=n_node_pad, rows=rows,
        n_hosts=H, n_chips=C, rb=rb, eb=eb,
        qi=f[11], qc=f[12], qi_t=b[11], qc_t=b[12],
        u_max=fwd["u_max"], u_max_t=bwd["u_max"],
        mesh=mesh, host_axis=host_axis, chip_axis=chip_axis,
        dcn_rows=fwd["dcn_rows"],
    )


def hier_spmm(g: HierGraph, x: jax.Array,
              compute_dtype=jnp.float32) -> jax.Array:
    """y = A @ x with x/y row-sharded [n_node_pad, d] over
    (host, chip). Intra-host chips ring over ICI; cross-host steps move
    only the per-pair halo over the host axis."""
    H, C = g.n_hosts, g.n_chips
    rows = g.rows
    ha, ca = g.host_axis, g.chip_axis
    interpret = jax.default_backend() != "tpu"
    T = max(H - 1, 1)
    u_sl = g.u_max // C if g.u_max else 0
    eb = g.eb

    xspec = P((ha, ca), None)
    spec_i = P(ha, ca, None, None)
    spec_c = P(ha, None, ca, None)
    spec_h = P(ha, None, None)

    n_blocks = rows // g.rb

    def mkplan(sarr, darr, warr, barr, farr, q):
        return SegmentMatmulPlan(
            senders=sarr, dst_local=darr, weights=warr,
            block_of_chunk=barr, first_of_block=farr,
            n_node=rows, n_blocks=n_blocks, n_chunks=q, rb=g.rb, eb=eb,
        )

    operands = [g.ib_s, g.ib_d, g.ib_w, g.ib_blk, g.ib_first]
    specs = [xspec] + [spec_i] * 5
    has_cross = H > 1 and g.cp_s is not None
    if has_cross:
        operands += [g.cp_s, g.cp_d, g.cp_w, g.cp_blk, g.cp_first,
                     g.halo_idx]
        specs += [spec_c] * 5 + [spec_h]

    @partial(shard_map, mesh=g.mesh, in_specs=tuple(specs),
             out_specs=xspec, check_vma=False)
    def f(x_local, ib_s, ib_d, ib_w, ib_b, ib_f, *cross):
        k = jax.lax.axis_index(ca)
        y = jnp.zeros((rows, x_local.shape[1]), jnp.float32)
        # intra-host ring over the chip axis (ICI)
        blk = x_local
        for t in range(C):
            j = (k + t) % C
            take = lambda a: jnp.take(a[0, 0], j, axis=0)
            plan = mkplan(take(ib_s), take(ib_d), take(ib_w),
                          take(ib_b), take(ib_f), g.qi)
            y = y + spmm_via_plan(plan, blk, interpret=interpret,
                                  compute_dtype=compute_dtype)
            if t < C - 1:
                blk = jax.lax.ppermute(
                    blk, ca, [(i, (i - 1) % C) for i in range(C)])
        if has_cross:
            cp_s, cp_d, cp_w, cp_b, cp_f, h_idx = cross
            for t in range(1, H):
                # assemble MY host's halo for its step-t target
                idx = h_idx[0, t - 1]  # [u_max] host-local rows
                local = idx - k * rows
                ok = (local >= 0) & (local < rows)
                safe = jnp.clip(local, 0, rows - 1)
                contrib = jnp.where(ok[:, None], x_local[safe], 0.0)
                halo_full = jax.lax.psum(contrib, ca)  # replicated in host
                slc = jax.lax.dynamic_slice_in_dim(
                    halo_full, k * u_sl, u_sl)
                # ONE host-axis hop per pair: DCN moves u_max*d total
                recv = jax.lax.ppermute(
                    slc, ha, [(i, (i - t) % H) for i in range(H)])
                halo = jax.lax.all_gather(recv, ca, tiled=True)
                take = lambda a: a[0, t - 1, 0]
                plan = mkplan(take(cp_s), take(cp_d), take(cp_w),
                              take(cp_b), take(cp_f), g.qc)
                y = y + spmm_via_plan(plan, halo, interpret=interpret,
                                      compute_dtype=compute_dtype)
        return y.astype(x_local.dtype)

    return f(x, *operands)


def hier_comm_stats(g: HierGraph, d_feat: int = 128,
                    itemsize: int = 4) -> dict:
    """DCN/ICI volume of one hier_spmm vs the flat ring (VERDICT r4
    next #4 follow-on). DCN bytes = padded halo blocks, one host hop per
    (g, h) pair; the flat ring's DCN-paced volume for comparison is its
    full block stream."""
    H, C = g.n_hosts, g.n_chips
    pairs = H * (H - 1)
    dcn_bytes = pairs * g.u_max * d_feat * itemsize
    flat_ring_rows = (H * C - 1) * g.n_node_pad
    return {
        "dcn_rows_halo_unpadded": int(g.dcn_rows),
        "dcn_bytes_per_spmm": int(dcn_bytes),
        "dcn_rows_padded": int(pairs * g.u_max),
        "ici_ring_rows_per_spmm": int((C - 1) * g.n_node_pad),
        "flat_ring_rows_per_spmm": int(flat_ring_rows),
        "flat_over_hier_dcn": float(
            flat_ring_rows / max(pairs * g.u_max, 1)),
    }


def shard_params_hier(g: HierGraph, params):
    """Canonical teacher parameter shardings on a (host, chip) mesh: SE
    tables (name 'se') row-sharded over BOTH axes (matching the
    n_node_pad row partition), everything else replicated — the 2-level
    analog of distgraph.shard_params."""
    mesh = g.mesh
    row = NamedSharding(mesh, P((g.host_axis, g.chip_axis),))
    rep = NamedSharding(mesh, P())

    def spec(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if any(n == "se" for n in names):
            return jax.device_put(leaf, row)
        return jax.device_put(leaf, rep)

    return jax.tree_util.tree_map_with_path(spec, params)
