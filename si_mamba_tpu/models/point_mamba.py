"""PointMamba classifier — the finetune/eval model.

TPU-native rebuild of reference ``PointMamba`` (models/point_mamba.py:430-1183)
published-config behavior: Group → PatchEncoder → pos-embed → spectral
ordering (SAST / HLT / xyz 'MAMBA') → MixerModel → mean-pool → cls head.
The tau!=None learned-permutation-policy path (logit_blocks / permuter /
Plackett-Luce, reference :900-955) is off at HEAD for all published results
and is provided separately in ``si_mamba_tpu.models.permute_policy``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from si_mamba_tpu.models.embed import ClsHead, PatchEncoder, PosEmbedMLP
from si_mamba_tpu.models.grouping import group_divider
from si_mamba_tpu.models.layers import MixerModel, MixerModelAdd
from si_mamba_tpu.models.ordering import hlt_sequence, sast_sequence, xyz_sequence
from si_mamba_tpu.ops.graph import knn_adjacency, rw_laplacian, sym_laplacian
from si_mamba_tpu.ops.spectral import topk_eigh


@dataclasses.dataclass(frozen=True)
class PointMambaConfig:
    """Mirrors the reference model YAML keys (cfgs/finetune_*.yaml)."""

    trans_dim: int = 384
    depth: int = 12
    cls_dim: int = 40
    group_size: int = 32
    num_group: int = 64
    encoder_dims: int = 384
    rms_norm: bool = False
    drop_path: float = 0.1
    drop_out: float = 0.0
    drop_out_in_block: float = 0.0
    cls_head_dropout: float = 0.5  # reference hard-codes 0.5 (:488-498)
    use_cls_token: bool = False
    # ordering method config
    method: str = "SAST"  # SAST | HLT | MAMBA
    reverse: bool = True
    reverse_2: bool = False
    reverse_3: bool = False
    knn_graph: int = 20
    k_top_eigenvectors: int = 4
    alpha: float = 100.0
    smallest: bool = True
    symmetric: bool = True
    self_loop: bool = False
    binary: bool = True
    matrix: str = "laplacian"  # laplacian | symmetric
    add_after_layer: bool = False
    # compute
    scan_impl: str = "auto"
    spectral_method: str = "eigh"  # eigh (exact) | subspace (MXU-only approx)
    # 'mamba' = reference Mamba-1 selective scan (parity default);
    # 'ssd' = opt-in scalar-decay chunked-matmul mixer (ops/ssd.py) —
    # MXU-native, beyond-reference, NO parity claim
    mixer: str = "mamba"
    # SSD chunk length (the padded sequence is processed in chunks of this
    # many tokens; larger chunks amortize per-chunk state I/O — kernel A/B
    # in benchmarks/ssd_kernel_ab.json — at the cost of more pad waste when
    # seq_len is not a multiple)
    ssd_chunk: int = 128
    dtype: str = "float32"
    # tensor parallelism: name of the model mesh axis to shard every mixer's
    # d_inner over (parallel/tensor_parallel.py). Requires running under a
    # mesh that has this axis (jax.set_mesh / runner tp_size config key);
    # composes with the 'data' axis. None = no TP (reference behavior).
    tp_axis: Optional[str] = None

    @property
    def seq_len(self) -> int:
        if self.method == "MAMBA":
            return 3 * self.num_group
        if self.method == "HLT":
            return 2 * self.num_group
        mult = 2 if (self.reverse or self.reverse_2) else 1
        return mult * self.k_top_eigenvectors * self.num_group

    @classmethod
    def from_dict(cls, d) -> "PointMambaConfig":
        """Build from a config-model mapping, ignoring non-field keys
        (NAME, rotation, ...) — the one filter every entry point shares."""
        return cls(**{k: v for k, v in dict(d).items()
                      if k in cls.__dataclass_fields__})


def spectral_eigvecs(center: jax.Array, cfg: PointMambaConfig) -> tuple[jax.Array, jax.Array]:
    """Graph → Laplacian → top-k eigenpairs for the ordering stage.

    Returns (eigvals (B, k), eigvecs (B, G, k)). Batched XLA eigh replaces
    the reference's per-sample cuSOLVER loop (models/point_mamba.py:717-761).
    """
    A = knn_adjacency(
        center, k=cfg.knn_graph, alpha=cfg.alpha, symmetric=cfg.symmetric,
        self_loop=cfg.self_loop, binary=cfg.binary,
    )
    if cfg.matrix == "laplacian":
        L = rw_laplacian(A, eps=1e-6, eps_mode="add")
        if getattr(cfg, "spectral_method", "eigh") == "subspace" and cfg.smallest:
            from si_mamba_tpu.ops.spectral import topk_smallest_subspace

            vals, vecs = topk_smallest_subspace(L, cfg.k_top_eigenvectors)
        else:
            vals, vecs, _, _ = topk_eigh(L, cfg.k_top_eigenvectors,
                                         smallest=cfg.smallest)
    else:
        # symmetric variant computes k+1 and drops the first (reference :764-814)
        L = sym_laplacian(A)
        vals, vecs, _, _ = topk_eigh(L, cfg.k_top_eigenvectors + 1, smallest=cfg.smallest)
        vals, vecs = vals[..., 1:], vecs[..., 1:]
    return vals, vecs


class PointMamba(nn.Module):
    config: PointMambaConfig

    @nn.compact
    def __call__(self, pts: jax.Array, train: bool = False,
                 fps_start_idx: jax.Array | int = 0,
                 bn_momentum=None, return_features: bool = False) -> jax.Array:
        """``bn_momentum``: optional traced override of every BatchNorm's
        running-average momentum (flax convention) — the scheduler value from
        ``optim.bn_momentum_schedule`` (reference BNMomentumScheduler,
        utils/misc.py:103-133 + config key ``bnmscheduler``).

        ``return_features``: also return the pooled pre-head feature
        (reference ``concat_f``, models/point_mamba.py:1124) — the t-SNE
        eval input (``test_only_tsne``, tools/runner_finetune.py:573-611)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)

        grouped = group_divider(pts, cfg.num_group, cfg.group_size, start_idx=fps_start_idx)
        tokens = PatchEncoder(cfg.encoder_dims, dtype=dtype, name="encoder")(
            grouped.neighborhood, train=train, bn_momentum=bn_momentum)
        pos = PosEmbedMLP(cfg.trans_dim, dtype=dtype, name="pos_embed")(grouped.center)

        eigvecs = None
        if cfg.method == "SAST":
            if cfg.reverse_3:
                raise NotImplementedError(
                    "reverse_3 is a dead config in the reference (hard-coded "
                    "32-token blocks, models/point_mamba.py:1018-1052); "
                    "configs mark it 'always False'.")
            _, eigvecs = spectral_eigvecs(grouped.center.astype(jnp.float32), cfg)
            eigvecs = eigvecs.astype(dtype)
            x, pos_seq = sast_sequence(tokens, pos, eigvecs, reverse=cfg.reverse,
                                       reverse_2=cfg.reverse_2)
        elif cfg.method == "HLT":
            _, eigvecs = spectral_eigvecs(grouped.center.astype(jnp.float32), cfg)
            eigvecs = eigvecs.astype(dtype)
            rng = (self.make_rng("order") if self.has_rng("order")
                   else jax.random.key(0))
            x, pos_seq = hlt_sequence(tokens, pos, eigvecs, cfg.k_top_eigenvectors, rng)
        elif cfg.method == "MAMBA":
            x, pos_seq = xyz_sequence(tokens, pos, grouped.center)
        else:
            raise ValueError(f"unknown method {cfg.method!r}")

        if cfg.drop_out > 0:
            x = nn.Dropout(cfg.drop_out)(x, deterministic=not train)

        if cfg.add_after_layer:
            # MixerModelAdd (inter-layer re-sort) is not TP-wired: the
            # cross_merge gathers between layers would need their own
            # sharding story; the published configs never combine the two.
            if cfg.tp_axis is not None:
                raise NotImplementedError("tp_axis with add_after_layer")
            if cfg.mixer != "mamba":
                raise NotImplementedError("mixer='ssd' with add_after_layer")
            x = MixerModelAdd(cfg.trans_dim, cfg.depth, rms_norm=cfg.rms_norm,
                              drop_path=cfg.drop_path,
                              drop_out_in_block=cfg.drop_out_in_block,
                              scan_impl=cfg.scan_impl, dtype=dtype, name="blocks")(
                x, pos_seq, eigvecs, reverse=cfg.reverse, deterministic=not train)
        else:
            x = MixerModel(cfg.trans_dim, cfg.depth, rms_norm=cfg.rms_norm,
                           drop_path=cfg.drop_path,
                           drop_out_in_block=cfg.drop_out_in_block,
                           scan_impl=cfg.scan_impl, tp_axis=cfg.tp_axis,
                           mixer=cfg.mixer, ssd_chunk=cfg.ssd_chunk,
                           dtype=dtype, name="blocks")(
                x, pos_seq, deterministic=not train)

        x = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=dtype)(x)
        feat = jnp.mean(x, axis=1)
        logits = ClsHead(cfg.cls_dim, drop=cfg.cls_head_dropout, dtype=dtype,
                         name="cls_head_finetune")(
            feat, train=train, bn_momentum=bn_momentum)
        if return_features:
            return logits, feat
        return logits


def cross_entropy_loss_acc(logits: jax.Array, labels: jax.Array) -> tuple[jax.Array, jax.Array]:
    """CE loss (per-sample) + accuracy%, matching reference ``get_loss_acc``
    (models/point_mamba.py:565-572)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    loss = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32)) * 100.0
    return loss, acc
