"""Optimizer factories matching torch.optim semantics.

torch.optim.Adam(weight_decay=wd) adds wd * p to the gradient BEFORE the
moment updates (L2, not decoupled AdamW) — optax equivalent:
chain(add_decayed_weights(wd), adam(lr)). The reference optimizer spec
strings like 'torch.optim.Adam&0.005' (utils.py:640-643) map to
optfun='adam', lr=0.005 in the config pipeline.
"""
from __future__ import annotations

import optax

from ..config import Config


def make_optimizer(cfg: Config, lr: float | None = None,
                   weight_decay: float | None = None,
                   grad_clip_norm: float | None = None):
    lr = cfg.lr if lr is None else lr
    wd = cfg.weight_decay if weight_decay is None else weight_decay
    if cfg.optfun == "adam":
        base = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    elif cfg.optfun == "sgd":
        base = optax.sgd(lr)
    else:
        raise ValueError(cfg.optfun)
    parts = []
    if grad_clip_norm:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    parts.append(base)
    return optax.chain(*parts)
