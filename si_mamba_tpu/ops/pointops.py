"""Point-cloud primitives: pairwise distances, FPS, kNN, grouping.

TPU-native replacements for the reference's CUDA deps (pointnet2_ops
``furthest_point_sample`` / ``gather_operation`` and pytorch3d
``sample_farthest_points`` / ``knn_points`` — see reference
models/point_mamba.py:76-111 and utils/misc.py:14-21). Everything here is a
pure function with static shapes so it compiles once under ``jit``:

- FPS is the inherently-sequential argmax-over-min-distance loop, expressed as
  a ``lax.fori_loop`` with a fixed trip count (vectorized over the batch).
- kNN is a batched top-k over a matmul-form pairwise-distance matrix (MXU).
- Grouping is a static ``take_along_axis`` gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def pairwise_sqdist(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared euclidean distances via the matmul expansion (MXU-friendly).

    x: (..., N, D), y: (..., M, D) -> (..., N, M). Clamped at 0 to guard
    against negative values from cancellation.
    """
    x2 = jnp.sum(x * x, axis=-1)[..., :, None]
    y2 = jnp.sum(y * y, axis=-1)[..., None, :]
    xy = jnp.einsum("...nd,...md->...nm", x, y)
    return jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)


def pairwise_sqdist_exact(x: jax.Array, y: jax.Array) -> jax.Array:
    """Squared distances via explicit differences: matches the reference's
    ``((x[:,None]-y[None,:])**2).sum(-1)`` numerics exactly (reference
    models/point_mamba.py:626,682). Use for small N (graph over patch
    centers) where bit-level agreement with the torch pipeline matters.
    """
    diff = x[..., :, None, :] - y[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def pairwise_dist(x: jax.Array, y: jax.Array, exact: bool = True) -> jax.Array:
    """Euclidean distances. ``exact`` selects the difference-form numerics."""
    sq = pairwise_sqdist_exact(x, y) if exact else pairwise_sqdist(x, y)
    return jnp.sqrt(sq)


def fps(points: jax.Array, n_samples: int, start_idx: jax.Array | int = 0) -> jax.Array:
    """Farthest point sampling.

    points: (B, N, 3). Returns int32 indices (B, n_samples).

    Deterministic from ``start_idx`` (default 0 — matching pytorch3d
    ``sample_farthest_points(random_start_point=False)`` used at reference
    models/point_mamba.py:93 and pointnet2's ``furthest_point_sample``).
    ``start_idx`` may be a (B,) array for a keyed random start.
    """
    B, N, _ = points.shape
    start = jnp.broadcast_to(jnp.asarray(start_idx, jnp.int32), (B,))
    idxs = jnp.zeros((B, n_samples), jnp.int32).at[:, 0].set(start)
    min_d = jnp.full((B, N), jnp.inf, dtype=points.dtype)

    def body(i, carry):
        min_d, idxs = carry
        last = lax.dynamic_index_in_dim(idxs, i - 1, axis=1, keepdims=False)  # (B,)
        last_pt = jnp.take_along_axis(points, last[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((points - last_pt) ** 2, axis=-1)  # (B,N)
        min_d = jnp.minimum(min_d, d)
        nxt = jnp.argmax(min_d, axis=-1).astype(jnp.int32)  # (B,)
        idxs = lax.dynamic_update_index_in_dim(idxs, nxt, i, axis=1)
        return min_d, idxs

    _, idxs = lax.fori_loop(1, n_samples, body, (min_d, idxs))
    return idxs


def knn(query: jax.Array, points: jax.Array, k: int) -> jax.Array:
    """Indices of the k nearest ``points`` for each ``query`` point.

    query: (B, Q, D), points: (B, N, D) -> int32 (B, Q, k), sorted by
    ascending distance. Replaces pytorch3d ``knn_points`` (reference
    models/point_mamba.py:96).
    """
    d = pairwise_sqdist(query, points)
    _, idx = lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def gather_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points: (B, N, C), idx: (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """points: (B, N, C), idx: (B, G, K) -> (B, G, K, C) neighborhood gather."""
    B, G, K = idx.shape
    flat = gather_points(points, idx.reshape(B, G * K))
    return flat.reshape(B, G, K, points.shape[-1])


def ball_query(query: jax.Array, points: jax.Array, radius: float,
               max_samples: int) -> jax.Array:
    """Indices of up to ``max_samples`` points within ``radius`` of each query
    (reference part_segmentation/models/pointnet2_utils.py:60-76
    ``query_ball_point``): out-of-radius slots repeat the first in-radius
    neighbor. query (B, S, D), points (B, N, D) -> int32 (B, S, max_samples).
    """
    d = pairwise_sqdist(query, points)  # (B, S, N)
    inside = d <= radius**2
    # nearest-first candidates; mask those outside the radius
    neg, idx = lax.top_k(jnp.where(inside, -d, -jnp.inf), max_samples)
    valid = neg > -jnp.inf
    first = idx[..., :1]
    return jnp.where(valid, idx, first).astype(jnp.int32)


def set_abstraction(points: jax.Array, features: jax.Array | None,
                    n_centroids: int, radius: float, max_samples: int,
                    mlp_apply) -> tuple[jax.Array, jax.Array]:
    """PointNet++ SSG set-abstraction level (reference pointnet2_utils.py:
    134-180 ``PointNetSetAbstraction``): FPS centroids → ball-query grouping
    (center-normalized, features concatenated) → per-point MLP → max-pool.

    points (B, N, 3); features (B, N, C) or None; ``mlp_apply`` maps
    (B, S, K, 3+C) -> (B, S, K, C'). Returns (new_xyz (B, S, 3),
    new_features (B, S, C')).
    """
    new_xyz = gather_points(points, fps(points, n_centroids))
    idx = ball_query(new_xyz, points, radius, max_samples)
    grouped = group_points(points, idx) - new_xyz[:, :, None, :]
    if features is not None:
        grouped = jnp.concatenate([grouped, group_points(features, idx)], axis=-1)
    return new_xyz, jnp.max(mlp_apply(grouped), axis=2)


def set_abstraction_msg(points: jax.Array, features: jax.Array | None,
                        n_centroids: int, radius_list, max_samples_list,
                        mlp_applies) -> tuple[jax.Array, jax.Array]:
    """Multi-scale-grouping set abstraction (reference pointnet2_utils.py:
    200-259 ``PointNetSetAbstractionMsg``): one shared FPS centroid set, per
    scale a ball-query at its own (radius, nsample) → center-normalized
    grouping (+features) → that scale's MLP → max-pool, features concatenated
    across scales.

    ``mlp_applies[i]`` maps (B, S, K_i, 3+C) -> (B, S, K_i, C'_i). Returns
    (new_xyz (B, S, 3), concat features (B, S, sum_i C'_i)).
    """
    assert len(radius_list) == len(max_samples_list) == len(mlp_applies)
    new_xyz = gather_points(points, fps(points, n_centroids))
    outs = []
    for radius, k, mlp_apply in zip(radius_list, max_samples_list, mlp_applies):
        idx = ball_query(new_xyz, points, radius, k)
        grouped = group_points(points, idx) - new_xyz[:, :, None, :]
        if features is not None:
            grouped = jnp.concatenate([group_points(features, idx), grouped],
                                      axis=-1)
        outs.append(jnp.max(mlp_apply(grouped), axis=2))
    return new_xyz, jnp.concatenate(outs, axis=-1)
