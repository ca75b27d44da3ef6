"""Checkpoint / resume: pytree save/load (params + SE tables + opt state).

The reference uses bare torch.save/load of state_dicts with multi-GPU
prefix stripping (``/root/reference/utils.py:958-986``); here the whole
train state (params pytree incl. structural-embedding tables, optimizer
state, epoch counter) round-trips through flax's msgpack serialization —
one file, no pickle of arbitrary objects.
"""
from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
from flax import serialization


def save_pytree(tree: Any, path: str) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host_tree = jax.tree.map(np.asarray, tree)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(host_tree))


def load_pytree(template: Any, path: str) -> Any:
    """Restore into the structure of ``template`` (shapes must match —
    the msgpack format is structure-validated, unlike torch's strict=False
    loads)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_sharded_state(dirpath: str, state: Any, *,
                       overwrite: bool = True) -> None:
    """Multi-host-safe checkpoint of a (possibly sharded) train-state
    pytree via orbax: every process writes only its addressable shards,
    writes are coordinated across the process group, and the layout is
    the standard OCDBT/zarr tree. Use for DistGraph/multi-host runs where
    ``save_pytree``'s ``np.asarray`` would have to materialize
    non-addressable global arrays (impossible off-host) — and on tunneled
    single-chip setups, where per-shard writes avoid one giant
    device->host pull.

    The reference's torch.save state_dicts (utils.py:958-986) have no
    sharded analog; this is the TPU-native equivalent."""
    import orbax.checkpoint as ocp

    # force=True delegates overwrite to orbax, which deletes on the primary
    # host AFTER its save-start barrier — a hand-rolled pre-barrier rmtree
    # races with other processes' existence checks on non-coherent shared
    # filesystems (NFS attribute caches etc.)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(dirpath), state, force=overwrite)
    ckptr.wait_until_finished()


def load_sharded_state(dirpath: str, template: Any) -> Any:
    """Restore a sharded checkpoint. ``template`` is a pytree of arrays OR
    jax.ShapeDtypeStructs; leaves carrying a ``.sharding`` restore straight
    onto those device shardings (each process reads only its shards) —
    including shardings that DIFFER from the ones at save time (orbax
    reshards on load, so a pod checkpoint restores fine on one chip)."""
    import orbax.checkpoint as ocp

    def abstract(x):
        if isinstance(x, (int, float, str, bytes)):
            return x
        sharding = getattr(x, "sharding", None)
        return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(dirpath),
                         jax.tree.map(abstract, template))


def _sharded_dir(path: str) -> str:
    return os.path.splitext(path)[0] + ".orbax"


def _needs_sharded_io(state: Any) -> bool:
    """msgpack save is wrong under a process group: every process would
    race on the same file, and ``np.asarray`` cannot materialize leaves
    whose shards live on other hosts."""
    if jax.process_count() > 1:
        return True
    return any(isinstance(leaf, jax.Array) and not leaf.is_fully_addressable
               for leaf in jax.tree.leaves(state))


def save_train_state(path: str, *, params, opt_state=None, batch_stats=None,
                     epoch: int = 0, extra: dict | None = None,
                     sharded: bool | None = None) -> None:
    """``sharded=None`` auto-routes: multi-host (or non-addressable
    leaves) -> orbax directory next to ``path``; otherwise one msgpack
    file (reference torch.save analog, utils.py:958-960)."""
    state = {"params": params, "epoch": epoch}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if batch_stats is not None:
        state["batch_stats"] = batch_stats
    if extra:
        state["extra"] = extra
    if sharded is None:
        sharded = _needs_sharded_io(state)
    if sharded:
        save_sharded_state(_sharded_dir(path), state)
        # drop a stale msgpack from an earlier single-host run at the same
        # path, or load_train_state could later prefer the older file
        if jax.process_index() == 0 and os.path.exists(path):
            os.remove(path)
    else:
        save_pytree(state, path)


def load_train_state(path: str, template: dict) -> dict:
    d = _sharded_dir(path)
    has_dir, has_file = os.path.isdir(d), os.path.exists(path)
    if has_dir and has_file:
        # both formats present (e.g. a single-host msgpack run and a later
        # sharded run sharing a save dir): newest wins
        has_dir = os.path.getmtime(d) > os.path.getmtime(path)
    if has_dir:
        return load_sharded_state(d, template)
    return load_pytree(template, path)
