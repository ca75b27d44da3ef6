"""Diffusion / SGC / LP feature preprocessing + spectral embedding.

Reference parity: ``/root/reference/Label_propagation_model/diffusion_feature.py``
- DAD adjacency with self loops (147-157)
- sgc (64-67):       x <- A^k x
- lp (69-82):        result <- clip(y + alpha * A @ result^p, 0, 1)
- diffusion (84-94): x <- (x - alpha * (I - A) x)^p
- spectral (115-130 + norm_spec.jl:39-64): top-k eigenvectors of the
  normalized regularized Laplacian I + D (A + tau/N 11^T) D with the SCDM
  QR rotation — the Julia/Arpack solver is replaced by scipy's Lanczos
  (eigsh on a LinearOperator); one-time host-side preprocessing.
- community (96-113): Louvain one-hot in the reference (broken as shipped —
  missing imports); here an asynchronous label-propagation community
  detector with the same one-hot output contract.

These run once at preprocessing time on the host (numpy/scipy); the
per-epoch propagation loops live in propagation/correlation.py on device.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import scipy.sparse as ssp
import scipy.sparse.linalg as sla

from ..graph.core import symmetrize


def dad_adjacency(edge_index: np.ndarray, n_node: int) -> ssp.csr_matrix:
    """to_undirected + set_diag + sym-normalize (diffusion_feature.py:147-157)."""
    e = symmetrize(edge_index, n_node)
    a = ssp.csr_matrix(
        (np.ones(e.shape[1]), (e[0], e[1])), shape=(n_node, n_node)
    )
    a = a + ssp.eye(n_node) - ssp.diags(a.diagonal())  # set_diag -> 1
    deg = np.asarray(a.sum(axis=1)).reshape(-1)
    dis = np.where(deg > 0, deg**-0.5, 0.0)
    return ssp.diags(dis) @ a @ ssp.diags(dis)


def sgc_features(x: np.ndarray, adj: ssp.spmatrix,
                 num_propagations: int) -> np.ndarray:
    x = np.asarray(x, np.float64)
    for _ in range(num_propagations):
        x = adj @ x
    return x.astype(np.float32)


def lp_features(adj: ssp.spmatrix, train_idx: np.ndarray, labels: np.ndarray,
                num_propagations: int, p: Optional[float] = None,
                alpha: Optional[float] = None) -> np.ndarray:
    p = 0.6 if p is None else p
    alpha = 0.4 if alpha is None else alpha
    c = int(labels.max()) + 1
    y = np.zeros((labels.shape[0], c))
    y[train_idx, labels[train_idx]] = 1.0
    result = y.copy()
    for _ in range(num_propagations):
        result = y + alpha * (adj @ np.power(result, p))
        result = np.clip(result, 0, 1)
    return result.astype(np.float32)


def diffusion_features(x: np.ndarray, adj: ssp.spmatrix,
                       num_propagations: int, p: Optional[float] = None,
                       alpha: Optional[float] = None) -> np.ndarray:
    p = 1.0 if p is None else p
    alpha = 0.5 if alpha is None else alpha
    x = np.power(np.asarray(x, np.float64), p)
    eye = ssp.eye(adj.shape[0])
    for _ in range(num_propagations):
        x = x - alpha * ((eye - adj) @ x)
        x = np.power(x, p)
    return x.astype(np.float32)


def spectral_embedding(edge_index: np.ndarray, n_node: int,
                       k: int = 128) -> np.ndarray:
    """norm_spec.jl:39-64 in scipy: Lanczos top-k of the normalized
    regularized Laplacian, then SCDM rotation."""
    e = symmetrize(edge_index, n_node)
    a = ssp.csr_matrix(
        (np.ones(e.shape[1]), (e[0], e[1])), shape=(n_node, n_node)
    )
    d = np.asarray(a.sum(axis=1)).reshape(-1)
    tau = d.sum() / len(d)
    dvec = 1.0 / np.sqrt(d + tau)

    def matvec(v):
        # NRL v = v + D (A + tau/N 11^T) D v
        dv = dvec * v
        return v + dvec * ((a @ dv) + (tau / n_node) * dv.sum())

    op = sla.LinearOperator((n_node, n_node), matvec=matvec, dtype=np.float64)
    k_eff = min(k, n_node - 2)
    vals, vecs = sla.eigsh(op, k=k_eff, which="LM", tol=1e-6,
                           ncv=min(2 * k_eff + 1, n_node))

    # SCDM rotation: column-pivoted QR of V^T, SVD of the pivot block
    import scipy.linalg

    _, _, piv = scipy.linalg.qr(vecs.T, pivoting=True)
    piv = piv[:k_eff]
    u, _, vt = np.linalg.svd(vecs[piv, :].T, full_matrices=False)
    out = vecs @ (u @ vt)
    if k_eff < k:
        out = np.concatenate(
            [out, np.zeros((n_node, k - k_eff))], axis=1
        )
    return out.astype(np.float32)


def community_features(edge_index: np.ndarray, n_node: int,
                       max_iter: int = 50, seed: int = 0) -> np.ndarray:
    """One-hot community assignment. The reference uses Louvain
    (diffusion_feature.py:96-113, broken imports as shipped); here:
    asynchronous label propagation (Raghavan et al.) — same output contract
    (one-hot [N, n_communities])."""
    e = symmetrize(edge_index, n_node)
    order = np.argsort(e[0], kind="stable")
    src_sorted, dst_sorted = e[0][order], e[1][order]
    ptr = np.searchsorted(src_sorted, np.arange(n_node + 1))
    labels = np.arange(n_node)
    rng = np.random.default_rng(seed)
    for _ in range(max_iter):
        changed = 0
        for v in rng.permutation(n_node):
            nb = dst_sorted[ptr[v]:ptr[v + 1]]
            if len(nb) == 0:
                continue
            cnt = np.bincount(labels[nb])
            best = cnt.argmax()
            if labels[v] != best:
                labels[v] = best
                changed += 1
        if changed == 0:
            break
    uniq, remap = np.unique(labels, return_inverse=True)
    one_hot = np.zeros((n_node, len(uniq)), np.float32)
    one_hot[np.arange(n_node), remap] = 1.0
    return one_hot


def preprocess(method: str, x: Optional[np.ndarray],
               edge_index: np.ndarray, n_node: int,
               labels: Optional[np.ndarray] = None,
               train_idx: Optional[np.ndarray] = None,
               num_propagations: int = 10, p: Optional[float] = None,
               alpha: Optional[float] = None, k_spectral: int = 128
               ) -> np.ndarray:
    """Dispatcher (diffusion_feature.py:132-169, minus the .pt cache)."""
    if method == "community":
        return community_features(edge_index, n_node)
    if method == "spectral":
        return spectral_embedding(edge_index, n_node, k_spectral)
    adj = dad_adjacency(edge_index, n_node)
    if method == "sgc":
        return sgc_features(x, adj, num_propagations)
    if method == "diffusion":
        return diffusion_features(x, adj, num_propagations, p, alpha)
    if method == "lp":
        return lp_features(adj, train_idx, labels, num_propagations, p, alpha)
    raise ValueError(method)
