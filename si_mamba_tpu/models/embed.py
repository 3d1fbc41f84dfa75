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

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def trunc_normal_init(std: float = 0.02):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch ``nn.BatchNorm1d`` TRAIN-mode semantics exactly.

    Differs from ``flax.linen.BatchNorm`` in one point: torch normalizes by
    the biased batch variance but updates the running variance with the
    UNBIASED (Bessel n/(n-1)) estimate; flax stores the biased one. For the
    cls-head BNs (n = batch size) that is a ~3% running-var deflation per
    update under flax — visible in eval after from-scratch training. Keeps
    flax's variable names (params scale/bias, batch_stats mean/var) so
    checkpoints and the torch importer are unchanged.

    ``momentum`` is the flax-convention retention factor (1 − torch
    momentum) and may be a traced array (BN-momentum scheduler).
    """

    use_running_average: bool = True
    momentum: Any = 0.9  # float or traced scalar (BN-momentum scheduler)
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        feat = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((feat,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((feat,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axes)
            var = jnp.mean(jnp.square(x32), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = x.size // feat
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(self.dtype)


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
        x = TorchBatchNorm(use_running_average=not train, momentum=mom,
                           epsilon=1e-5, name="bn1", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dense(256, kernel_init=trunc_normal_init(), name="conv2", dtype=self.dtype)(x)
        # global per-group feature, concat back per point
        g = jnp.max(x, axis=1, keepdims=True)  # (BG, 1, 256)
        x = jnp.concatenate([jnp.broadcast_to(g, x.shape), x], axis=-1)  # (BG, n, 512)
        # second_conv: 512 -> 512 -> BN -> ReLU -> C
        x = nn.Dense(512, kernel_init=trunc_normal_init(), name="conv3", dtype=self.dtype)(x)
        x = TorchBatchNorm(use_running_average=not train, momentum=mom,
                           epsilon=1e-5, name="bn2", dtype=self.dtype)(x)
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
            x = TorchBatchNorm(use_running_average=not train, momentum=mom,
                               epsilon=1e-5, name=f"bn{i+1}", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.drop)(x, deterministic=not train)
        return nn.Dense(self.cls_dim, kernel_init=trunc_normal_init(), name="out", dtype=self.dtype)(x)
