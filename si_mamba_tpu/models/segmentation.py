"""ShapeNetPart segmentation model (reference part_segmentation/models/
pt_mamba.py:419-796 ``get_model`` + MixerModelForSegmentation :325-416 +
PointNetFeaturePropagation pointnet2_utils.py:262-312).

Group(128×32) → PatchEncoder → spectral ordering (SAST / HLT / xyz) →
12-layer Mamba stack with feature taps at layers {3,7,11} → concat 1152-d →
global max+avg + one-hot label embedding → 3-NN inverse-distance feature
propagation back to the 2048 points → conv head → log-softmax.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from si_mamba_tpu.models.embed import (
    PatchEncoder,
    PosEmbedMLP,
    TorchBatchNorm,
    trunc_normal_init,
)
from si_mamba_tpu.models.grouping import group_divider
from si_mamba_tpu.models.layers import Block
from si_mamba_tpu.models.ordering import hlt_sequence, sast_sequence, xyz_sequence
from si_mamba_tpu.models.point_mamba import spectral_eigvecs
from si_mamba_tpu.ops.pointops import pairwise_sqdist
import math


@dataclasses.dataclass(frozen=True)
class PartSegConfig:
    """Mirrors part_segmentation/cfgs/config.yaml model keys."""

    trans_dim: int = 384
    depth: int = 12
    cls_dim: int = 50  # part classes
    num_categories: int = 16
    group_size: int = 32
    num_group: int = 128
    encoder_dims: int = 384
    rms_norm: bool = False
    drop_path: float = 0.1
    drop_path_rate: float = 0.1
    drop_out: float = 0.0
    fetch_idx: tuple = (3, 7, 11)
    # ordering
    method: str = "HLT"  # HLT | SAST | Point_MAMBA
    reverse: bool = True
    knn_graph: int = 20
    k_top_eigenvectors: int = 4
    smallest: bool = True
    alpha: float = 10.0
    symmetric: bool = True
    self_loop: bool = False
    binary: bool = True
    matrix: str = "laplacian"
    scan_impl: str = "auto"
    # 'mamba' (reference Mamba-1 parity default) | 'ssd' (opt-in MXU-native
    # scalar-decay chunked-matmul mixer, ops/ssd.py — no parity claim)
    mixer: str = "mamba"
    ssd_chunk: int = 128  # SSD chunk length (see PointMambaConfig.ssd_chunk)
    dtype: str = "float32"


class MixerModelForSegmentation(nn.Module):
    """Mamba stack returning norm_f-projected features at ``fetch_idx``."""

    d_model: int
    n_layer: int
    fetch_idx: tuple = (3, 7, 11)
    rms_norm: bool = False
    norm_eps: float = 1e-5
    drop_path: float = 0.0
    scan_impl: str = "auto"
    mixer: str = "mamba"
    ssd_chunk: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        hidden = x + pos
        residual = None
        div = math.sqrt(self.n_layer)
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        norm_f = norm_cls(epsilon=self.norm_eps, name="norm_f", dtype=self.dtype)
        feats = []
        for i in range(self.n_layer):
            hidden, residual = Block(
                self.d_model, rms_norm=self.rms_norm, norm_eps=self.norm_eps,
                drop_path=self.drop_path, out_proj_div=div,
                scan_impl=self.scan_impl, mixer=self.mixer,
                ssd_chunk=self.ssd_chunk, dtype=self.dtype,
                name=f"layers_{i}",
            )(hidden, residual, deterministic)
            if i in self.fetch_idx:
                out = hidden + residual if residual is not None else hidden
                feats.append(norm_f(out))
        return feats


def feature_propagation_interp(xyz1: jax.Array, xyz2: jax.Array,
                               feats2: jax.Array) -> jax.Array:
    """3-NN inverse-distance interpolation of feats2 (B, S, D) at xyz2
    (B, S, 3) onto xyz1 (B, N, 3) -> (B, N, D)."""
    d = pairwise_sqdist(xyz1, xyz2)  # (B, N, S)
    neg, idx = jax.lax.top_k(-d, 3)
    dists = jnp.maximum(-neg, 0.0)
    w = 1.0 / (dists + 1e-8)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = jnp.take_along_axis(feats2[:, None], idx[..., None], axis=2)
    return jnp.sum(gathered * w[..., None], axis=2)


class PartSegModel(nn.Module):
    config: PartSegConfig

    @nn.compact
    def __call__(self, pts: jax.Array, cls_label_onehot: jax.Array,
                 train: bool = False) -> jax.Array:
        """pts: (B, N, 3); cls_label_onehot: (B, 16). Returns per-point
        log-probs (B, N, cls_dim)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, N, _ = pts.shape

        grouped = group_divider(pts, cfg.num_group, cfg.group_size)
        tokens = PatchEncoder(cfg.encoder_dims, dtype=dtype, name="encoder")(
            grouped.neighborhood, train=train)
        pos = PosEmbedMLP(cfg.trans_dim, dtype=dtype, name="pos_embed")(grouped.center)
        center = grouped.center

        if cfg.method == "Point_MAMBA":
            x, pos_seq = xyz_sequence(tokens, pos, center)
            orders = jnp.stack([jnp.argsort(center[..., d], axis=-1)
                                for d in range(3)], axis=1)
            from si_mamba_tpu.models.ordering import apply_orders

            center_seq = apply_orders(center, orders.astype(jnp.int32))
        else:
            _, eigvecs = spectral_eigvecs(center.astype(jnp.float32), cfg)
            eigvecs = eigvecs.astype(dtype)
            if cfg.method == "SAST":
                x, pos_seq = sast_sequence(tokens, pos, eigvecs, reverse=cfg.reverse)
                cseq, _ = sast_sequence(center, center, eigvecs, reverse=cfg.reverse)
                center_seq = cseq
            elif cfg.method == "HLT":
                rng = (self.make_rng("order") if self.has_rng("order")
                       else jax.random.key(0))
                x, pos_seq = hlt_sequence(tokens, pos, eigvecs,
                                          cfg.k_top_eigenvectors, rng)
                center_seq, _ = hlt_sequence(center, center, eigvecs,
                                             cfg.k_top_eigenvectors,
                                             rng)  # same rng -> same order
            else:
                raise ValueError(cfg.method)

        feats = MixerModelForSegmentation(
            cfg.trans_dim, cfg.depth, fetch_idx=cfg.fetch_idx,
            rms_norm=cfg.rms_norm, drop_path=cfg.drop_path,
            scan_impl=cfg.scan_impl, mixer=cfg.mixer,
            ssd_chunk=cfg.ssd_chunk, dtype=dtype,
            name="blocks")(
            x, pos_seq, deterministic=not train)
        norm = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=dtype)
        seq_feat = jnp.concatenate([norm(f) for f in feats], axis=-1)  # (B, S, 1152)

        x_max = jnp.max(seq_feat, axis=1)  # (B, 1152)
        x_avg = jnp.mean(seq_feat, axis=1)
        # label conv: 16 -> 64, no bias, BN + LeakyReLU(0.2)
        lbl = nn.Dense(64, use_bias=False, kernel_init=trunc_normal_init(),
                       name="label_conv")(cls_label_onehot.astype(dtype))
        lbl = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, name="label_bn", dtype=dtype)(lbl)
        lbl = nn.leaky_relu(lbl, 0.2)
        global_feat = jnp.concatenate([x_max, x_avg, lbl], axis=-1)  # (B, 2368)
        global_bcast = jnp.broadcast_to(global_feat[:, None, :],
                                        (B, N, global_feat.shape[-1]))

        # feature propagation: interpolate seq features at centers onto points,
        # concat raw xyz, then MLP [1536, 1024] with BN+ReLU
        interp = feature_propagation_interp(pts, center_seq, seq_feat)
        f = jnp.concatenate([pts.astype(dtype), interp], axis=-1)  # (B, N, 1155)
        for i, width in enumerate((cfg.trans_dim * 4, 1024)):
            f = nn.Dense(width, kernel_init=trunc_normal_init(),
                         name=f"prop_fc{i+1}")(f)
            f = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"prop_bn{i+1}", dtype=dtype)(f)
            f = nn.relu(f)

        h = jnp.concatenate([f, global_bcast], axis=-1)  # (B, N, 3392)
        h = nn.Dense(512, kernel_init=trunc_normal_init(), name="convs1")(h)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns1", dtype=dtype)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.5)(h, deterministic=not train)
        h = nn.Dense(256, kernel_init=trunc_normal_init(), name="convs2")(h)
        h = TorchBatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bns2", dtype=dtype)(h)
        h = nn.relu(h)
        h = nn.Dense(cfg.cls_dim, kernel_init=trunc_normal_init(), name="convs3")(h)
        return jax.nn.log_softmax(h, axis=-1)


def nll_loss(log_probs: jax.Array, target: jax.Array) -> jax.Array:
    """Mean NLL over all points (reference ``get_loss`` pt_mamba.py:790-796)."""
    picked = jnp.take_along_axis(log_probs, target[..., None].astype(jnp.int32),
                                 axis=-1)[..., 0]
    return -jnp.mean(picked)
