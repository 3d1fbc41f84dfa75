"""Point-MAE-Mamba pretraining model (TPU-native).

Re-implements the reference HEAD pretrain path (``Point_MAE_Mamba`` with
``method: smallest_eigenvectors_seperate_learnable_tokens``, reference
models/point_mamba.py:2135-2541 MaskMamba_2, :2837-2866 MambaDecoder_SST,
:2869-3219 Point_MAE_Mamba) with static shapes throughout:

- random masking with a *fixed* count (num_mask = int(mask_ratio·G)) via a
  keyed permutation — no boolean reshape tricks;
- K traversal orders from the diffusion-wavelet SGWT + Sinkhorn
  straight-through permutations (on-device greedy rounding by default,
  replacing the reference's host-sync Hungarian);
- permutation application by index gather on the hard path with the soft
  matmul supplying gradients (value-identical to the reference's
  ``P_hard + P_hat - detach(P_hat)`` matmul);
- token restoration (visible + learnable mask tokens back into traversal
  slots, reference :3150-3190) as cumsum-rank gathers instead of boolean
  scatters;
- Chamfer-L2 reconstruction loss in pure XLA.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from si_mamba_tpu.models.embed import PatchEncoder, PosEmbedMLP, trunc_normal_init
from si_mamba_tpu.models.grouping import group_divider
from si_mamba_tpu.models.layers import MixerModel
from si_mamba_tpu.ops.chamfer import chamfer_l1, chamfer_l2
from si_mamba_tpu.ops.graph import knn_adjacency, rw_laplacian
from si_mamba_tpu.ops.sinkhorn import sinkhorn_sort_perm
from si_mamba_tpu.ops.wavelets import DiffusionWaveletSGWT, scale_scores


@dataclasses.dataclass(frozen=True)
class PointMAEConfig:
    """Mirrors cfgs/pretrain.yaml model block."""

    trans_dim: int = 384
    encoder_dims: int = 384
    depth: int = 12
    decoder_depth: int = 4
    group_size: int = 32
    num_group: int = 64
    mask_ratio: float = 0.6
    mask_type: str = "rand"
    drop_path_rate: float = 0.1
    rms_norm: bool = False
    loss: str = "cdl2"
    # spectral / ordering config
    method: str = "smallest_eigenvectors_seperate_learnable_tokens"
    reverse: bool = True
    knn_graph: int = 20
    k_top_eigenvectors: int = 4
    smallest: bool = True
    alpha: float = 10.0
    symmetric: bool = True
    self_loop: bool = False
    binary: bool = True
    # wavelet/sinkhorn
    wavelet_J: int = 3
    sinkhorn_epsilon: float = 0.05
    sinkhorn_iters: int = 40
    sinkhorn_rounding: str = "greedy"  # 'hungarian' for host-sync parity runs
    # 'sorted' = true differentiable sorting (improved default);
    # 'self' = the reference HEAD's cost-vs-self, whose optimal plan is the
    # identity — i.e. the published pretrain behavior (degenerate orders).
    # Use parity_preset() to pin the published behavior explicitly.
    sinkhorn_target: str = "sorted"
    # compute
    scan_impl: str = "auto"
    # 'mamba' (reference Mamba-1 parity default) | 'ssd' (opt-in MXU-native
    # scalar-decay chunked-matmul mixer, ops/ssd.py — no parity claim)
    mixer: str = "mamba"
    ssd_chunk: int = 128  # SSD chunk length (see PointMambaConfig.ssd_chunk)
    # 'eigh' exact Gram eigendecomposition; 'jacobi' = exact matmul-only
    # parallel-Jacobi eigh (ops/jacobi.py — TPU perf path, parity-gated)
    wavelet_solver: str = "eigh"
    dtype: str = "float32"

    @property
    def num_mask(self) -> int:
        return int(self.mask_ratio * self.num_group)

    @property
    def num_vis(self) -> int:
        return self.num_group - self.num_mask

    def parity_preset(self) -> "PointMAEConfig":
        """Published-behavior replication mode: the reference HEAD's Sinkhorn
        cost is score-vs-SELF (models/point_mamba.py:1579-1599), whose optimal
        transport plan is the identity permutation, and rounding is scipy
        Hungarian (:1627-1632). This preset pins both so parity runs replicate
        the released results' degenerate traversal orders rather than the
        improved 'sorted' default."""
        return dataclasses.replace(self, sinkhorn_target="self",
                                   sinkhorn_rounding="hungarian")


def random_mask(rng: jax.Array, B: int, G: int, num_mask: int) -> jax.Array:
    """(B, G) float mask with exactly num_mask ones per row (reference
    ``_mask_center_rand`` :2232-2255, static count)."""
    scores = jax.random.uniform(rng, (B, G))
    ranks = jnp.argsort(jnp.argsort(scores, axis=-1), axis=-1)
    return (ranks < num_mask).astype(jnp.float32)


def block_mask(rng: jax.Array, center: jax.Array, num_mask: int) -> jax.Array:
    """(B, G) mask of the num_mask nearest groups to a random seed group
    (reference ``_mask_center_block`` :2203-2230, static count)."""
    B, G, _ = center.shape
    seed = jax.random.randint(rng, (B,), 0, G)
    seed_pt = jnp.take_along_axis(center, seed[:, None, None], axis=1)
    d = jnp.linalg.norm(center - seed_pt, axis=-1)  # (B, G)
    ranks = jnp.argsort(jnp.argsort(d, axis=-1), axis=-1)
    return (ranks < num_mask).astype(jnp.float32)


def restore_tokens(mask_sorted: jax.Array, vis_tokens: jax.Array,
                   mask_tokens: jax.Array) -> jax.Array:
    """Fill a traversal-ordered canvas: masked slots take the next mask token,
    visible slots the next visible token (in traversal order).

    mask_sorted: (B, S) 0/1; vis_tokens: (B, n_vis, C); mask_tokens:
    (B, n_mask, C). Returns (B, S, C). Static-gather replacement for the
    reference's boolean scatters (models/point_mamba.py:3150-3190).
    """
    m = mask_sorted
    mask_rank = (jnp.cumsum(m, axis=-1) - m).astype(jnp.int32)
    vis_rank = (jnp.cumsum(1.0 - m, axis=-1) - (1.0 - m)).astype(jnp.int32)
    from_mask = jnp.take_along_axis(mask_tokens, mask_rank[..., None], axis=1)
    from_vis = jnp.take_along_axis(vis_tokens, vis_rank[..., None], axis=1)
    return jnp.where(m[..., None] > 0.5, from_mask, from_vis)


def select_by_rank(x: jax.Array, mask: jax.Array, count: int, masked: bool) -> jax.Array:
    """Select the `count` masked (or visible) rows of x (B, S, C) in order.

    Stable argsort of the 0/1 mask puts visible (0) positions first in
    original order, masked (1) after — exactly the reference's boolean-mask
    ``reshape(B, -1, C)`` semantics with a static output shape.
    """
    order = jnp.argsort(mask, axis=-1, stable=True)  # (B, S)
    idx = order[:, -count:] if masked else order[:, :count]
    return jnp.take_along_axis(x, idx[..., None], axis=1)


class PointMAEMamba(nn.Module):
    config: PointMAEConfig

    @nn.compact
    def __call__(self, pts: jax.Array, train: bool = False, noaug: bool = False,
                 tau: Optional[float] = None, vis: bool = False,
                 mask_override: Optional[jax.Array] = None,
                 orders_override: Optional[jax.Array] = None):
        """``mask_override`` (B, G) 0/1 and ``orders_override`` (B, K, G) int
        bypass the keyed mask / wavelet-Sinkhorn order generation — used by
        the torch-oracle parity tests and traversal visualization (the
        reference's MaskMamba_2 likewise takes ``orders`` as an input,
        models/point_mamba.py:2316). Eval-only for orders (no soft-perm
        gradient exists for an injected hard order)."""
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        K = cfg.k_top_eigenvectors
        B = pts.shape[0]
        G, n_mask, n_vis = cfg.num_group, cfg.num_mask, cfg.num_vis

        grouped = group_divider(pts, G, cfg.group_size)
        center = grouped.center.astype(jnp.float32)
        neighborhood = grouped.neighborhood.astype(dtype)

        if cfg.method == "MAMBA":
            return self._legacy_mae(cfg, dtype, grouped, train, noaug, vis)

        # ---- traversal orders from diffusion wavelets + sinkhorn ----------
        if orders_override is not None:
            assert not train, "orders_override is an eval/parity-test hook"
            order_idx = orders_override.astype(jnp.int32)  # (B, K, G)
            P_hat = None
        else:
            A = knn_adjacency(center, k=cfg.knn_graph, alpha=cfg.alpha,
                              symmetric=cfg.symmetric, self_loop=cfg.self_loop,
                              binary=cfg.binary, gaussian_sigma=(cfg.alpha == 0))
            L = rw_laplacian(A, eps=1e-6, eps_mode="clamp")
            coeffs = DiffusionWaveletSGWT(J=cfg.wavelet_J, in_features=3,
                                          solver=cfg.wavelet_solver, dtype=dtype,
                                          name="diff_sgwt")(
                center, L, tau=tau, deterministic=not train)
            scores = scale_scores(coeffs, k=K)  # (B, G, K)
            P, P_hat = sinkhorn_sort_perm(jnp.swapaxes(scores, 1, 2),
                                          epsilon=cfg.sinkhorn_epsilon,
                                          n_iters=cfg.sinkhorn_iters,
                                          rounding=cfg.sinkhorn_rounding,
                                          target=cfg.sinkhorn_target)  # (B, K, G, G)
            order_idx = jnp.argmax(jax.lax.stop_gradient(P), axis=-1)  # (B, K, G) hard

        # ---- masking -------------------------------------------------------
        if mask_override is not None:
            mask = mask_override.astype(jnp.float32)
        elif noaug or cfg.mask_ratio == 0:
            mask = jnp.zeros((B, G))
        elif cfg.mask_type == "rand":
            mask = random_mask(self.make_rng("mask") if self.has_rng("mask")
                               else jax.random.key(0), B, G, n_mask)
        else:
            mask = block_mask(self.make_rng("mask") if self.has_rng("mask")
                              else jax.random.key(0), center, n_mask)

        # ---- encode + permute ---------------------------------------------
        tokens = PatchEncoder(cfg.encoder_dims, dtype=dtype, name="encoder")(
            neighborhood, train=train)
        pos = PosEmbedMLP(cfg.trans_dim, dtype=dtype, name="pos_embed")(grouped.center)

        def permute(x):
            """Apply the K permutations: hard gather value, straight-through
            gradient into the Sinkhorn scores only.

            Matches d/dx[(P_hard + P_hat - detach(P_hat)) @ x] = P_hard^T g:
            the token gradient flows through the hard gather alone, while
            d/dP_hat = g x^T flows via the soft term over stop_grad(x).
            """
            # one flattened gather — no K-fold materialization of the
            # operand (x[:, None].repeat(K) made XLA write a (B,K,G,C)
            # copy of x before gathering from it)
            hard = jnp.take_along_axis(
                x, order_idx.reshape(B, K * G)[..., None],
                axis=1).reshape(B, K, G, -1)
            if train:
                xf = jax.lax.stop_gradient(
                    x.reshape(B, 1, G, -1).astype(jnp.float32))
                soft = jnp.einsum("bkij,bcjf->bkif", P_hat.astype(jnp.float32), xf)
                soft = soft.reshape(hard.shape).astype(x.dtype)
                return hard + soft - jax.lax.stop_gradient(soft)
            return hard

        tok_k = permute(tokens)  # (B, K, G, C)
        pos_k = permute(pos)
        mask_k = jnp.take_along_axis(
            mask, order_idx.reshape(B, K * G), axis=1).reshape(B, K, G)

        # flatten traversals
        C = cfg.trans_dim
        tok_flat = tok_k.reshape(B, K * G, C)
        pos_flat = pos_k.reshape(B, K * G, C)
        mask_flat = mask_k.reshape(B, K * G)

        # per-traversal visible/masked selections (static shapes). With noaug
        # the mask is all-zero and every token is visible (reference returns
        # features over the full 2KG sequence for the SVM probe).
        if noaug:
            n_vis = G
        tok_vis = select_by_rank(tok_k.reshape(B * K, G, C), mask_k.reshape(B * K, G),
                                 n_vis, masked=False).reshape(B, K * n_vis, C)
        pos_vis = select_by_rank(pos_k.reshape(B * K, G, C), mask_k.reshape(B * K, G),
                                 n_vis, masked=False).reshape(B, K * n_vis, C)

        if cfg.reverse:
            x_vis_in = jnp.concatenate([tok_vis, tok_vis[:, ::-1]], axis=1)
            pos_vis_in = jnp.concatenate([pos_vis, pos_vis[:, ::-1]], axis=1)
            pos_full = jnp.concatenate([pos_flat, pos_flat[:, ::-1]], axis=1)
            mask_rev = mask_flat[:, ::-1]
            mask_full = jnp.concatenate([mask_flat, mask_rev], axis=1)
        else:
            x_vis_in, pos_vis_in = tok_vis, pos_vis
            pos_full = pos_flat
            mask_rev = None
            mask_full = mask_flat

        # ---- encoder over visible tokens ----------------------------------
        x_vis = MixerModel(cfg.trans_dim, cfg.depth, rms_norm=cfg.rms_norm,
                           drop_path=cfg.drop_path_rate, scan_impl=cfg.scan_impl,
                           mixer=cfg.mixer, ssd_chunk=cfg.ssd_chunk, dtype=dtype, name="blocks")(
            x_vis_in, pos_vis_in, deterministic=not train)
        x_vis = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=dtype)(x_vis)

        if noaug:
            return x_vis

        # ---- token restoration --------------------------------------------
        mask_token = self.param("mask_token", trunc_normal_init(), (1, 1, C))
        n_total_mask = mask_full.shape[1] - (2 if cfg.reverse else 1) * K * n_vis
        mask_tokens = jnp.broadcast_to(mask_token, (B, n_total_mask, C)).astype(dtype)

        # forward half: K traversals of G slots each; flattened cumsum-rank
        # restore == the reference's per-traversal loop because every
        # traversal holds exactly n_vis visible / n_mask masked slots
        fwd_canvas = restore_tokens(
            mask_flat, x_vis[:, : K * n_vis], mask_tokens[:, : K * n_mask])
        if cfg.reverse:
            rev_canvas = restore_tokens(mask_rev, x_vis[:, K * n_vis :],
                                        mask_tokens[:, K * n_mask :])
            x_full = jnp.concatenate([fwd_canvas, rev_canvas], axis=1)
        else:
            x_full = fwd_canvas

        # ---- decoder + reconstruction -------------------------------------
        # The SST decoder consumes the ENCODER's permuted pos embeddings
        # (reference :3192 passes sorted_pos_full; decoder_pos_embed is only
        # used by the legacy 'MAMBA' path).
        x_rec = MixerModel(cfg.trans_dim, cfg.decoder_depth, rms_norm=cfg.rms_norm,
                           drop_path=cfg.drop_path_rate, scan_impl=cfg.scan_impl,
                           mixer=cfg.mixer, ssd_chunk=cfg.ssd_chunk, dtype=dtype, name="MAE_decoder")(
            x_full, pos_full, deterministic=not train)
        x_rec = nn.LayerNorm(epsilon=1e-5, name="decoder_norm", dtype=dtype)(x_rec)

        # masked-slot predictions (static count)
        total_masked = (2 if cfg.reverse else 1) * K * n_mask
        x_masked = select_by_rank(x_rec, mask_full, total_masked, masked=True)
        # ground truth by INDEX COMPOSITION: slot-of-masked (stable argsort,
        # same rule as select_by_rank) -> original group id (order_idx) ->
        # one gather from the ungathered neighborhood. The old path
        # materialized the permuted+reversed (B, 2KG, M, 3) neighborhood
        # (~50 MB HBM round-trip at B=128) only to select the masked rows
        # of a stop-grad tensor.
        slot_of_masked = jnp.argsort(mask_full, axis=-1,
                                     stable=True)[:, -total_masked:]  # (B, T)
        oidx_flat = order_idx.reshape(B, K * G)
        oidx_full = (jnp.concatenate([oidx_flat, oidx_flat[:, ::-1]], axis=1)
                     if cfg.reverse else oidx_flat)  # (B, 2KG) int32
        gidx = jnp.take_along_axis(oidx_full, slot_of_masked, axis=1)  # (B, T)
        gt = jnp.take_along_axis(grouped.neighborhood,
                                 gidx[..., None, None], axis=1)  # (B, T, M, 3)
        gt = gt.reshape(B * total_masked, cfg.group_size, 3)

        rebuild = nn.Dense(3 * cfg.group_size, kernel_init=trunc_normal_init(),
                           name="increase_dim")(x_masked)
        rebuild = rebuild.reshape(B * total_masked, cfg.group_size, 3)

        if cfg.loss == "cdl2":
            loss_fn = chamfer_l2
        elif cfg.loss == "cdl1":
            loss_fn = chamfer_l1
        elif cfg.loss == "emd":
            from si_mamba_tpu.ops.emd import emd_sinkhorn

            loss_fn = emd_sinkhorn
        else:
            raise NotImplementedError(cfg.loss)
        per = loss_fn(rebuild.astype(jnp.float32), gt.astype(jnp.float32),
                      batch_reduction=None)
        loss = jnp.mean(per)

        if vis:
            return loss, {
                "rebuild": rebuild.reshape(B, total_masked, cfg.group_size, 3),
                "gt": gt.reshape(B, total_masked, cfg.group_size, 3),
            }
        return loss


def _append_legacy(cls):
    """Attach the legacy 'MAMBA' MAE path (reference MaskMamba :1186-1301 +
    MambaDecoder :2805-2834 + Point_MAE_Mamba MAMBA branch :3057-3093):
    plain rand/block masking, visible tokens in original order, decoder over
    [visible, mask tokens] with decoder-side pos embeddings, reconstruction
    of the last n_mask tokens."""

    def _legacy_mae(self, cfg, dtype, grouped, train, noaug, vis):
        B = grouped.center.shape[0]
        G, n_mask, n_vis = cfg.num_group, cfg.num_mask, cfg.num_vis
        center = grouped.center.astype(dtype)
        neighborhood = grouped.neighborhood.astype(dtype)

        if noaug or cfg.mask_ratio == 0:
            mask = jnp.zeros((B, G))
            n_vis_eff, n_mask_eff = G, 0
        elif cfg.mask_type == "rand":
            mask = random_mask(self.make_rng("mask") if self.has_rng("mask")
                               else jax.random.key(0), B, G, n_mask)
            n_vis_eff, n_mask_eff = n_vis, n_mask
        else:
            mask = block_mask(self.make_rng("mask") if self.has_rng("mask")
                              else jax.random.key(0), center, n_mask)
            n_vis_eff, n_mask_eff = n_vis, n_mask

        tokens = PatchEncoder(cfg.encoder_dims, dtype=dtype, name="encoder")(
            neighborhood, train=train)
        C = cfg.trans_dim
        x_vis = select_by_rank(tokens, mask, n_vis_eff, masked=False)
        center_vis = select_by_rank(center, mask, n_vis_eff, masked=False)
        pos_vis = PosEmbedMLP(C, dtype=dtype, name="pos_embed")(center_vis)

        x_vis = MixerModel(C, cfg.depth, rms_norm=cfg.rms_norm,
                           drop_path=cfg.drop_path_rate, scan_impl=cfg.scan_impl,
                           mixer=cfg.mixer, ssd_chunk=cfg.ssd_chunk, dtype=dtype, name="blocks")(
            x_vis, pos_vis, deterministic=not train)
        x_vis = nn.LayerNorm(epsilon=1e-5, name="norm", dtype=dtype)(x_vis)
        if noaug:
            return x_vis

        dec_pos_embed = PosEmbedMLP(C, dtype=dtype, name="decoder_pos_embed")
        center_mask = select_by_rank(center, mask, n_mask_eff, masked=True)
        pos_full = jnp.concatenate(
            [dec_pos_embed(center_vis), dec_pos_embed(center_mask)], axis=1)

        mask_token = self.param("mask_token", trunc_normal_init(), (1, 1, C))
        x_full = jnp.concatenate(
            [x_vis, jnp.broadcast_to(mask_token, (B, n_mask_eff, C)).astype(dtype)],
            axis=1)
        x_rec = MixerModel(C, cfg.decoder_depth, rms_norm=cfg.rms_norm,
                           drop_path=cfg.drop_path_rate, scan_impl=cfg.scan_impl,
                           mixer=cfg.mixer, ssd_chunk=cfg.ssd_chunk, dtype=dtype, name="MAE_decoder")(
            x_full, pos_full, deterministic=not train)
        x_rec = nn.LayerNorm(epsilon=1e-5, name="decoder_norm", dtype=dtype)(
            x_rec[:, -n_mask_eff:])

        rebuild = nn.Dense(3 * cfg.group_size, kernel_init=trunc_normal_init(),
                           name="increase_dim")(x_rec)
        rebuild = rebuild.reshape(B * n_mask_eff, cfg.group_size, 3)
        gt = select_by_rank(neighborhood.reshape(B, G, -1), mask, n_mask_eff,
                            masked=True)
        gt = gt.reshape(B * n_mask_eff, cfg.group_size, 3)
        loss_fn = chamfer_l2 if cfg.loss == "cdl2" else chamfer_l1
        loss = loss_fn(rebuild.astype(jnp.float32), gt.astype(jnp.float32))
        if vis:
            return loss, {"rebuild": rebuild.reshape(B, n_mask_eff, cfg.group_size, 3),
                          "gt": gt.reshape(B, n_mask_eff, cfg.group_size, 3)}
        return loss

    cls._legacy_mae = _legacy_mae
    return cls


_append_legacy(PointMAEMamba)
