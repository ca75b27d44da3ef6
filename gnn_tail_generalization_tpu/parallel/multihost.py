"""Multi-host process groups and DCN-aware meshes.

The reference has no distributed story at all (SURVEY.md section 2.9: one
GPU, an unused DistributedDataParallel import at
``/root/reference/utils.py:22``). This is the TPU-native collective
backend it lacks:

- ``initialize_multihost`` wraps ``jax.distributed.initialize`` — the
  NCCL/MPI-equivalent process-group bootstrap. On TPU pods the arguments
  are discovered from the environment; explicit args support CPU
  multi-process testing (tests/test_multihost.py runs 2 processes x 4
  virtual CPU devices each and checks numerics against a dense
  reference).
- ``make_multihost_graph_mesh`` builds the 1-D ``('graph',)`` mesh for
  DistGraph row-sharding with hosts CONTIGUOUS along the axis: shards
  owned by one host sit next to each other, so the ring SpMM's ppermute
  neighbors are intra-host (ICI) for all but one hop per host boundary —
  the expensive DCN hop happens once per host per ring cycle rather than
  on every step.
- ``make_dcn_ici_mesh`` exposes the general 2-D ('dcn', 'ici') factorization
  for workloads that want to shard different axes across vs within hosts.

All collectives themselves (ppermute/psum/all_gather in distgraph.py and
distributed.py) are ordinary JAX collectives: once the process group and
mesh exist, XLA lowers them onto ICI within a slice and DCN across hosts
with no further code.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join the multi-host process group. No-op if already initialized or
    if running single-process with no coordinator configured.

    On TPU pods call with no arguments (everything comes from the
    environment). For CPU/GPU multi-process, pass coordinator_address
    ("host:port"), num_processes and process_id explicitly."""
    # NOTE: must not touch jax.process_count()/jax.devices() here — any
    # backend-initialising call before jax.distributed.initialize is an
    # error. The only initialization probe is the distributed global state.
    try:
        from jax._src import distributed as _dist

        if _dist.global_state.client is not None:
            return  # already initialized
    except ImportError:  # pragma: no cover - private-API drift fallback
        pass
    if coordinator_address is None and num_processes is None:
        # No explicit args: delegate to JAX's cluster auto-detection (TPU
        # pod metadata, MEGASCALE_COORDINATOR_ADDRESS, SLURM, ...). On a
        # plain single-process machine detection fails -> stay local.
        try:
            jax.distributed.initialize()
        except Exception:
            pass
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    if local_device_ids is not None:
        kwargs["local_device_ids"] = list(local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_multihost_graph_mesh(axis: str = "graph") -> Mesh:
    """1-D mesh over ALL devices of the process group, ordered host-major
    (process 0's devices first, then process 1's, ...), so contiguous
    dst-row shards — and therefore ring ppermute neighbors — are intra-host
    wherever possible."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (axis,))


def make_dcn_ici_mesh(axes=("dcn", "ici")) -> Mesh:
    """2-D (hosts, devices-per-host) mesh: the first axis crosses DCN
    (slow, between hosts), the second stays on ICI (fast, within a host's
    slice). Shard bandwidth-hungry dimensions over ``ici`` and only
    coarse-grained ones over ``dcn``."""
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(grid, axes)
