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


def save_train_state(path: str, *, params, opt_state=None, batch_stats=None,
                     epoch: int = 0, extra: dict | None = None) -> None:
    state = {"params": params, "epoch": epoch}
    if opt_state is not None:
        state["opt_state"] = opt_state
    if batch_stats is not None:
        state["batch_stats"] = batch_stats
    if extra:
        state["extra"] = extra
    save_pytree(state, path)


def load_train_state(path: str, template: dict) -> dict:
    return load_pytree(template, path)
