"""Batched, key-driven point-cloud augmentations (pure JAX).

Vectorized replacements for the reference's per-sample-loop GPU transforms
(datasets/data_transforms.py:6-121) — one rng key per batch, designed to run
*inside* the jitted train step so augmentation fuses with the forward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rotate_y(pts: jax.Array, key: jax.Array) -> jax.Array:
    """Per-sample random rotation about the y (up) axis."""
    B = pts.shape[0]
    ang = jax.random.uniform(key, (B,)) * 2 * jnp.pi
    c, s = jnp.cos(ang), jnp.sin(ang)
    zeros, ones = jnp.zeros_like(c), jnp.ones_like(c)
    R = jnp.stack([c, zeros, s, zeros, ones, zeros, -s, zeros, c], axis=-1)
    R = R.reshape(B, 3, 3)
    return jnp.einsum("bnd,bde->bne", pts, R)


def scale_and_translate(pts: jax.Array, key: jax.Array,
                        scale_low: float = 2.0 / 3.0, scale_high: float = 3.0 / 2.0,
                        translate_range: float = 0.2) -> jax.Array:
    """Per-sample anisotropic scale + translation."""
    B = pts.shape[0]
    k1, k2 = jax.random.split(key)
    scale = jax.random.uniform(k1, (B, 1, 3), minval=scale_low, maxval=scale_high)
    shift = jax.random.uniform(k2, (B, 1, 3), minval=-translate_range,
                               maxval=translate_range)
    return pts * scale + shift


def jitter(pts: jax.Array, key: jax.Array, std: float = 0.01,
           clip: float = 0.05) -> jax.Array:
    noise = jnp.clip(std * jax.random.normal(key, pts.shape), -clip, clip)
    return pts + noise


def translate(pts: jax.Array, key: jax.Array, translate_range: float = 0.2) -> jax.Array:
    B = pts.shape[0]
    shift = jax.random.uniform(key, (B, 1, 3), minval=-translate_range,
                               maxval=translate_range)
    return pts + shift


def scale(pts: jax.Array, key: jax.Array, scale_low: float = 2.0 / 3.0,
          scale_high: float = 3.0 / 2.0) -> jax.Array:
    B = pts.shape[0]
    s = jax.random.uniform(key, (B, 1, 3), minval=scale_low, maxval=scale_high)
    return pts * s


def random_input_dropout(pts: jax.Array, key: jax.Array,
                         max_dropout_ratio: float = 0.875) -> jax.Array:
    """Replace a random fraction of points with the first point (reference
    PointcloudRandomInputDropout semantics, static shape)."""
    B, N, _ = pts.shape
    k1, k2 = jax.random.split(key)
    ratio = jax.random.uniform(k1, (B, 1)) * max_dropout_ratio
    drop = jax.random.uniform(k2, (B, N)) <= ratio
    return jnp.where(drop[..., None], pts[:, :1, :], pts)


def fps_resample(pts: jax.Array, key: jax.Array, npoints: int,
                 point_all: int | None = None) -> jax.Array:
    """Reference train-time resample (tools/runner_finetune.py:177-194):
    FPS to ``point_all`` (the reference's 1200/2400/4800/8192 table) then
    random-subsample npoints."""
    from si_mamba_tpu.ops.pointops import fps, gather_points

    B, N, _ = pts.shape
    n_over = point_all if point_all is not None else int(npoints * 1.2)
    if N > n_over:
        idx = fps(pts, n_over)
        pts = gather_points(pts, idx)
    else:
        n_over = N
    sel = jax.vmap(lambda k: jax.random.permutation(k, n_over)[:npoints])(
        jax.random.split(key, B))
    return jnp.take_along_axis(pts, sel[..., None], axis=1)
