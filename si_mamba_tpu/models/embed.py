"""Patch encoder, positional embedding MLP, classification head.

The reference's Conv1d(k=1) stacks are Dense layers in disguise — on TPU they
become MXU matmuls batched over (B, G, n) with BatchNorm statistics taken
over every non-feature axis (identical to torch BatchNorm1d over
(B·G, C, n)). Reference models/point_mamba.py:42-73 (Encoder), :459-463
(pos_embed), :488-498 (cls_head_finetune).

Under jit with a data-sharded mesh the BatchNorm batch statistics are
*global* (XLA inserts the cross-device reductions), which reproduces the
reference's ``--sync_bn`` mode by construction.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class PatchEncoder(nn.Module):
    """PointNet-style per-group encoder: (B, G, n, 3) -> (B, G, C).

    ``bn_momentum`` optionally overrides the BatchNorm running-average
    momentum with a (possibly traced) per-epoch value — the TPU-side
    equivalent of the reference's ``BNMomentumScheduler`` (utils/misc.py:
    103-133), which mutates module momentum per epoch. Flax convention:
    momentum here is the running-average retention (1 - torch momentum).
    """

    encoder_channel: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, point_groups: jax.Array, train: bool = False,
                 bn_momentum=None) -> jax.Array:
        mom = 0.9 if bn_momentum is None else bn_momentum
        B, G, n, _ = point_groups.shape
        # Rank-3 (B·G, n, C) layout: rank-4 Dense→BN→max chains trip an XLA
        # TPU fusion-cost CHECK (FusedSpatialMajorConvolution, fusion_util.cc)
        # — and flat matmuls map straight onto the MXU anyway.
        x = point_groups.astype(self.dtype).reshape(B * G, n, 3)
        # first_conv: 3 -> 128 -> BN -> ReLU -> 256
        x = nn.Dense(128, kernel_init=trunc_normal_init(), name="conv1", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=mom, epsilon=1e-5,
                         name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(256, kernel_init=trunc_normal_init(), name="conv2", dtype=self.dtype)(x)
        # global per-group feature, concat back per point
        g = jnp.max(x, axis=1, keepdims=True)  # (BG, 1, 256)
        x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)  # (BG, n, 512)
        # second_conv: 512 -> 512 -> BN -> ReLU -> C
        x = nn.Dense(512, kernel_init=trunc_normal_init(), name="conv3", dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=mom, epsilon=1e-5,
                         name="bn2", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(self.encoder_channel, kernel_init=trunc_normal_init(), name="conv4", dtype=self.dtype)(x)
        return jnp.max(x, axis=1).reshape(B, G, self.encoder_channel)


class PosEmbedMLP(nn.Module):
    """3 -> 128 -> GELU -> d MLP over centers (exact-erf GELU like torch)."""

    out_dim: int
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, kernel_init=trunc_normal_init(), name="fc1", dtype=self.dtype)(xyz.astype(self.dtype))
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.out_dim, kernel_init=trunc_normal_init(), name="fc2", dtype=self.dtype)(x)


class ClsHead(nn.Module):
    """Linear-BN-ReLU-Dropout ×2 then Linear classifier head."""

    cls_dim: int
    hidden: int = 256
    drop: float = 0.5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 bn_momentum=None) -> jax.Array:
        mom = 0.9 if bn_momentum is None else bn_momentum
        for i in range(2):
            x = nn.Dense(self.hidden, kernel_init=trunc_normal_init(), name=f"fc{i+1}", dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=mom, epsilon=1e-5,
                             name=f"bn{i+1}", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.drop)(x, deterministic=not train)
        return nn.Dense(self.cls_dim, kernel_init=trunc_normal_init(), name="out", dtype=self.dtype)(x)
