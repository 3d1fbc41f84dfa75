"""Batched kNN-graph adjacency and graph Laplacians over patch centers.

Replicates the semantics of the reference graph builders
(models/point_mamba.py:620-715 ``create_graph_from_centers`` /
``create_graph_from_feature_space_gpu_weighted_adjacency``) and Laplacians
(:717-814 per-sample, :3001-3050 batched, :1304-1317 ``build_rw_laplacian``)
— but fully batched and scatter-free: instead of advanced-index scatter we
build the neighbor mask with one-hot sums and multiply by the (symmetric)
global weight matrix, which is mathematically identical because edge weights
depend only on the symmetric pairwise distance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from si_mamba_tpu.ops.pointops import pairwise_dist


def knn_adjacency(
    points: jax.Array,
    k: int,
    alpha: float = 1.0,
    symmetric: bool = False,
    self_loop: bool = False,
    binary: bool = False,
    gaussian_sigma: bool = False,
) -> jax.Array:
    """Weighted/binary kNN adjacency over (B, N, D) points -> (B, N, N).

    Semantics (reference models/point_mamba.py:620-715):
    - top-(k+1) nearest by euclidean distance (including self), drop the
      nearest (self) column unless ``self_loop``;
    - weights ``exp(-alpha * d^2)``, or when ``gaussian_sigma`` (reference's
      ``alpha == 0`` branch) ``exp(-d^2 / (2 sigma^2))`` with sigma the mean
      of the full batched distance matrix;
    - ``binary`` writes 1s instead of weights;
    - ``symmetric`` also writes the transposed edges. Because the weight for
      (i, j) equals the weight for (j, i), this is ``max(A, A^T)``.
    """
    B, N, _ = points.shape
    d = pairwise_dist(points, points, exact=True)  # (B, N, N)

    neg_vals, idx = lax.top_k(-d, k + 1)  # nearest first
    if not self_loop:
        idx = idx[..., 1:]

    # Neighbor mask via one-hot sum: mask[b, i, j] = 1 iff j in knn(i).
    mask = jnp.sum(jax.nn.one_hot(idx, N, dtype=points.dtype), axis=-2)
    mask = jnp.minimum(mask, 1.0)

    if binary:
        A = mask
    else:
        if gaussian_sigma:
            sigma = jnp.mean(d)
            W = jnp.exp(-(d**2) / (2.0 * sigma**2))
        else:
            W = jnp.exp(-alpha * d**2)
        A = mask * W

    if symmetric:
        A = jnp.maximum(A, jnp.swapaxes(A, -1, -2))
    return A


def rw_laplacian(
    A: jax.Array,
    eps: float = 1e-6,
    eps_mode: str = "add",
    presymmetrize: bool = True,
) -> jax.Array:
    """Random-walk normalized Laplacian ``L_rw = I - D^{-1} A`` (batched).

    ``eps_mode='add'`` divides by ``deg + eps`` (reference per-sample path,
    models/point_mamba.py:736); ``'clamp'`` clamps ``deg`` at ``eps``
    (batched path :3026 and build_rw_laplacian :1314).
    """
    if presymmetrize:
        A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    deg = jnp.sum(A, axis=-1)
    if eps_mode == "add":
        denom = deg + eps
    elif eps_mode == "clamp":
        denom = jnp.maximum(deg, eps)
    else:
        raise ValueError(f"unknown eps_mode {eps_mode!r}")
    DinvA = A / denom[..., None]
    I = jnp.eye(A.shape[-1], dtype=A.dtype)
    return I - DinvA


def sym_laplacian(A: jax.Array, eps: float = 0.0) -> jax.Array:
    """Symmetric normalized Laplacian ``L = I - D^{-1/2} A D^{-1/2}``.

    Reference models/point_mamba.py:764-793 (``matrix: symmetric`` config).
    """
    A = 0.5 * (A + jnp.swapaxes(A, -1, -2))
    deg = jnp.sum(A, axis=-1)
    dinv_sqrt = (deg + eps) ** -0.5
    norm = dinv_sqrt[..., :, None] * A * dinv_sqrt[..., None, :]
    I = jnp.eye(A.shape[-1], dtype=A.dtype)
    return I - norm
