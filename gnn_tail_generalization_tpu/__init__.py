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
