"""Earth-mover's distance via entropic OT (Sinkhorn) — the optional EMD
reconstruction loss the reference declares but never executes (its CUDA emd
extension is absent and the branch raises NotImplementedError, reference
models/point_mamba.py:2947-2956 / README.md:44-46). Pure XLA, on-device."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from si_mamba_tpu.ops.pointops import pairwise_sqdist_exact


def emd_sinkhorn(x: jax.Array, y: jax.Array, epsilon: float = 0.01,
                 n_iters: int = 50, batch_reduction: str | None = "mean"
                 ) -> jax.Array:
    """Approximate EMD between (B, N, 3) and (B, M, 3) clouds.

    Entropic-regularized OT with uniform marginals, log-domain iterations;
    returns <P, C> per batch element (or the batch mean).
    """
    C = pairwise_sqdist_exact(x.astype(jnp.float32), y.astype(jnp.float32))
    B, N, M = C.shape
    logK = -C / epsilon
    log_r = -jnp.log(jnp.asarray(N, jnp.float32))
    log_c = -jnp.log(jnp.asarray(M, jnp.float32))
    f = jnp.zeros((B, N), jnp.float32)
    g = jnp.zeros((B, M), jnp.float32)

    def body(_, fg):
        f, g = fg
        f = log_r - jax.nn.logsumexp(logK + g[:, None, :], axis=-1)
        g = log_c - jax.nn.logsumexp(logK + f[:, :, None], axis=-2)
        return f, g

    f, g = lax.fori_loop(0, n_iters, body, (f, g))
    P = jnp.exp(f[:, :, None] + logK + g[:, None, :])
    per = jnp.sum(P * C, axis=(-2, -1))
    return jnp.mean(per) if batch_reduction == "mean" else per
