"""Pure-XLA Chamfer distances (replacing pytorch3d ``chamfer_distance`` /
the reference's absent CUDA chamfer extension — reference
models/point_mamba.py:24,2947-2956,3203).

Semantics follow pytorch3d: per-cloud term is the *mean over points* of the
min (squared) distance to the other cloud; the loss is the sum of both
directions, optionally mean-reduced over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from si_mamba_tpu.ops.pointops import pairwise_sqdist_exact


def _chamfer(x: jax.Array, y: jax.Array, squared: bool) -> jax.Array:
    d = pairwise_sqdist_exact(x, y)  # (..., N, M)
    if not squared:
        d = jnp.sqrt(d)
    cham_x = jnp.mean(jnp.min(d, axis=-1), axis=-1)
    cham_y = jnp.mean(jnp.min(d, axis=-2), axis=-1)
    return cham_x + cham_y


def chamfer_l2(x: jax.Array, y: jax.Array, batch_reduction: str | None = "mean") -> jax.Array:
    """Squared-L2 chamfer (pytorch3d default; config ``loss: cdl2``).

    x: (B, N, 3), y: (B, M, 3). batch_reduction in {'mean', None}.
    """
    per = _chamfer(x, y, squared=True)
    return jnp.mean(per) if batch_reduction == "mean" else per


def chamfer_l1(x: jax.Array, y: jax.Array, batch_reduction: str | None = "mean") -> jax.Array:
    """Unsquared (L2-norm) chamfer (config ``loss: cdl1``)."""
    per = _chamfer(x, y, squared=False)
    return jnp.mean(per) if batch_reduction == "mean" else per
