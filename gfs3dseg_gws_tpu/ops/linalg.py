"""Small linear-algebra ops: SVD energy reconstruction and label propagation."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def svd_energy_reconstruct(protos: np.ndarray, energy: float = 0.95) -> np.ndarray:
    """Energy-truncated SVD reconstruction of the geometric-word basis.

    Mirrors reference get_basis.py:50-71: SVD of protos^T (D, K), find the
    smallest rank r such that sum(s[:r]) > energy * sum(s), reconstruct
    u[:, :r] @ diag(s[:r]) @ vh[:r] and transpose back. The output keeps all
    K rows — the truncation reduces RANK, not row count.

    Args:
      protos: (K, D) cluster means.
      energy: singular-value energy to keep (the reference hardcodes 0.95).
    Returns:
      (K, D) reconstructed basis, float32.
    """
    a = np.asarray(protos, dtype=np.float64).T               # (D, K)
    u, s, vh = np.linalg.svd(a, full_matrices=False)
    cum = np.cumsum(s)
    r = int(np.searchsorted(cum > energy * cum[-1], True)) + 1
    recon = u[:, :r] @ np.diag(s[:r]) @ vh[:r, :]            # (D, K)
    return recon.T.astype(np.float32)                        # (K, D)


def label_propagate(affinity: jax.Array, labels: jax.Array,
                    alpha: float = 0.99) -> jax.Array:
    """Closed-form label propagation (Zhou et al. 2003).

    Reference pretrain/models/mpti.py:273-292 computes a dense inverse on the
    GPU; on TPU we symmetrically normalise and SOLVE the linear system
    instead — same result, better conditioned, no explicit inverse.

    Args:
      affinity: (M, M) symmetric, zero-diagonal affinity matrix.
      labels:   (M, C) initial label matrix.
    Returns:
      (M, C) propagated label scores Z = (I - alpha*S)^{-1} Y.
    """
    eps = jnp.float32(np.finfo(np.float64).eps)
    d = jnp.sum(affinity, axis=1)
    d_inv_sqrt = jax.lax.rsqrt(d + eps)
    s = affinity * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]
    m = affinity.shape[0]
    # reference adds eps to the whole matrix before inverting; keep that.
    a = jnp.eye(m, dtype=s.dtype) - alpha * s + eps
    return jax.scipy.linalg.solve(a, labels)


def local_constrained_affinity(node_feat: jax.Array, k: int,
                               sigma: float = 1.0,
                               method: str = "gaussian") -> jax.Array:
    """k-NN-sparsified affinity matrix over graph nodes.

    Replaces the reference's faiss.IndexFlatL2 search + torch scatter
    (pretrain/models/mpti.py:230-270) with one fused distance/top-k on device:
    at MPTI's graph sizes (~2-4k nodes) an index structure buys nothing.

    Returns a dense symmetric (M, M) matrix with zero diagonal.
    """
    from gfs3dseg_gws_tpu.ops.knn import pairwise_sq_dists

    m = node_feat.shape[0]
    d2 = pairwise_sq_dists(node_feat, node_feat)             # (M, M)
    # exclude self like faiss search k+1 then drop col 0
    d2_noself = d2 + jnp.eye(m, dtype=d2.dtype) * jnp.float32(1e30)
    neg_d2, idx = jax.lax.top_k(-d2_noself, k)               # (M, k)
    if method == "gaussian":
        dist = jnp.sqrt(jnp.maximum(-neg_d2, 0.0))
        sim = jnp.exp(-0.5 * (dist / sigma) ** 2)
    elif method == "cosine":
        norm = node_feat / (jnp.linalg.norm(node_feat, axis=-1, keepdims=True)
                            + 1e-12)
        sim_full = norm @ norm.T
        sim = jnp.take_along_axis(sim_full, idx, axis=1)
    else:
        raise NotImplementedError(method)
    a = jnp.zeros((m, m), dtype=jnp.float32)
    a = a.at[jnp.arange(m)[:, None], idx].set(sim)
    a = a + a.T
    return a * (1.0 - jnp.eye(m, dtype=a.dtype))
