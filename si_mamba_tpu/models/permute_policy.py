"""Learned traversal-permutation policy for the classifier (the ``tau`` path
of reference PointMamba.forward :900-955 + MixerModel2 :275-278 +
new_layers.StochasticNeuralSortPermuter :122-166).

A 3-layer Mamba stack over the detached token sequence (+ eigen-embedding)
produces inner (per-traversal token) and outer (traversal-level) logits;
Gumbel-perturbed argsort yields hard permutations whose Plackett-Luce
log-probability is returned as the policy term. Off for all published
results — provided for capability parity and RL-style fine-tuning.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from si_mamba_tpu.models.embed import trunc_normal_init
from si_mamba_tpu.models.layers import MixerModel
from si_mamba_tpu.ops.sinkhorn import plackett_luce_log_prob


class StochasticNeuralSortPermuter(nn.Module):
    """Gumbel-perturbed argsort → one-hot permutation (hard, stochastic)."""

    @nn.compact
    def __call__(self, z: jax.Array, tau: float) -> jax.Array:
        """z: (B, N) log-scores -> (B, N, N) one-hot permutation rows."""
        eps = jnp.finfo(z.dtype).eps
        g = -jnp.log(-jnp.log(
            jax.random.uniform(self.make_rng("policy"), z.shape) + eps) + eps)
        pi = jnp.argsort(z + tau * g, axis=-1)  # (B, N)
        return jax.nn.one_hot(pi, z.shape[-1], dtype=z.dtype)


class PermutePolicy(nn.Module):
    """Produces permuted sequence indices + the policy log-prob."""

    trans_dim: int
    num_group: int
    k_top_eigenvectors: int
    n_layer: int = 3
    rms_norm: bool = False

    @nn.compact
    def __call__(self, tokens_seq: jax.Array, pos_seq: jax.Array,
                 eigvals: jax.Array, eigvecs: jax.Array, tau: float,
                 reverse: bool = True):
        """tokens_seq/pos_seq: (B, 2kG, C) detached sequence; eigvals (B, k);
        eigvecs (B, G, k). Returns (perm_indices (B, kG), policy (B,))."""
        B = tokens_seq.shape[0]
        G = self.num_group
        k = self.k_top_eigenvectors

        # eigen embedding: per (traversal, token) sorted eigenvector value +
        # its eigenvalue (reference :908-912)
        sorted_vecs = jnp.sort(jnp.swapaxes(eigvecs, 1, 2), axis=2)  # (B, k, G)
        stacked = jnp.stack(
            [-sorted_vecs, jnp.broadcast_to(eigvals[..., None], sorted_vecs.shape)],
            axis=-1)  # (B, k, G, 2)
        emb = nn.Dense(128, kernel_init=trunc_normal_init(), name="eigen_fc1")(stacked)
        emb = nn.gelu(emb, approximate=False)
        emb = nn.Dense(self.trans_dim, kernel_init=trunc_normal_init(),
                       name="eigen_fc2")(emb)
        emb = emb.reshape(B, k * G, self.trans_dim)
        emb = jnp.concatenate([emb, emb[:, ::-1]], axis=1)  # (B, 2kG, C)

        # MixerModel2: eigen emb added to the input tokens (reference :275-278)
        feats = MixerModel(self.trans_dim, self.n_layer, rms_norm=self.rms_norm,
                           name="logit_blocks")(
            jax.lax.stop_gradient(tokens_seq) + emb,
            jax.lax.stop_gradient(pos_seq))
        feats = nn.LayerNorm(epsilon=1e-5, name="logit_norm")(feats)
        if reverse:
            f1, f2 = jnp.split(feats, 2, axis=1)
            feats = f1 + f2[:, ::-1]  # (B, kG, C)

        def head(x, name):
            h = nn.Dense(self.trans_dim, kernel_init=trunc_normal_init(),
                         name=f"{name}_fc1")(x)
            h = nn.LayerNorm(epsilon=1e-5, name=f"{name}_ln")(h)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(1, kernel_init=trunc_normal_init(), name=f"{name}_fc2")(h)

        logits_inner = head(feats, "logit_head").reshape(B, k, G)
        logits_outer = head(feats.reshape(B, k, G, self.trans_dim).mean(axis=2),
                            "logit_head2")[..., 0]  # (B, k)

        permuter = StochasticNeuralSortPermuter()
        P_inner = permuter(logits_inner.reshape(B * k, G), tau).reshape(B, k, G, G)
        P_outer = permuter(logits_outer, tau)  # (B, k, k)
        perm_outer = jnp.argmax(P_outer, axis=2)  # (B, k)
        perm = jnp.argmax(P_inner, axis=3) + perm_outer[..., None] * G
        perm = perm.reshape(B, k * G)

        li = jnp.take_along_axis(logits_inner.reshape(B, k * G), perm, axis=1)
        lo = jnp.take_along_axis(logits_outer, perm_outer, axis=1)
        policy = (plackett_luce_log_prob(li.reshape(B, k, G)).sum(axis=1)
                  + plackett_luce_log_prob(lo))
        return perm, policy
