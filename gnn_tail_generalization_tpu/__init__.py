"""TPU-native framework with the capabilities of amazon-science/gnn-tail-generalization.

Cold Brew (ICLR 2022) re-designed TPU-first: JAX/XLA for the compute graph,
Pallas kernels for the sparse hot ops, ``jax.sharding`` + ``shard_map`` for
multi-chip scale-out.

Layer map (mirrors SURVEY.md section 7):

- ``graph/``       immutable static-shape graph container + host-side builders
- ``ops/``         SpMM / SDDMM / top-k attention kernels (XLA, MXU-matmul and
                   Pallas paths) with custom VJPs
- ``nn/``          flax modules: GCN conv with Structural Embeddings, norm /
                   residual / graph-dropout trick zoo, MLP builders
- ``models/``      TeacherGNN, SEMLP (Cold Brew student), StudentBaseMLP,
                   GraphMLP
- ``propagation/`` label propagation / Correct&Smooth / diffusion features
- ``parallel/``    device-mesh sharding of graphs and the distributed SpMM
- ``train/``       jitted train loops, eval (head/tail/isolation), checkpoints
- ``data/``        dataset registry: synthetic generators + Planetoid raw reader
- ``linkpred/``    link-prediction encoders/predictors/losses/samplers
"""

__version__ = "0.1.0"


def _disable_numpy_thp_madvise():
    """Turn off numpy's MADV_HUGEPAGE on large allocations.

    On hosts with ``transparent_hugepage/defrag = [madvise]`` (this image),
    numpy's hugepage madvise makes every first touch of a fresh large
    buffer run SYNCHRONOUS memory compaction — measured ~85 ms per 2 MB
    region here, i.e. numpy streaming at 10-50 MB/s while plain C runs at
    ~1.3 GB/s. Host-side graph preprocessing (plan builds, bucket fills,
    edge expansions) is exactly such fresh-buffer streaming, so this
    single switch is worth ~100x on those paths (RESULTS.md). Set
    GNN_TPU_KEEP_NUMPY_THP=1 to keep numpy's default."""
    import os

    if os.environ.get("GNN_TPU_KEEP_NUMPY_THP"):
        return
    try:
        try:
            from numpy._core import multiarray as _ma  # numpy >= 2
        except ImportError:  # pragma: no cover - numpy 1.x
            from numpy.core import multiarray as _ma
        _ma._set_madvise_hugepage(False)
    except Exception:  # pragma: no cover - private API may move
        pass


_disable_numpy_thp_madvise()


def _enable_jax_compilation_cache():
    """Persistent JAX compilation cache (``~/.cache/jax-gnn-tpu``).

    The tunneled TPU backend compiles REMOTELY and a heavy program (the
    scanned LP epoch, the vmapped multi-seed step) can take many minutes
    per fresh process; the persistent cache turns every re-run into a
    disk load. Programs cheaper than 1 s skip the cache (write cost).
    Harmless on CPU; disable with GNN_TPU_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("GNN_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = os.path.expanduser("~/.cache/jax-gnn-tpu")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - config may move across versions
        pass


_enable_jax_compilation_cache()
