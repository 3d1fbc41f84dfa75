"""Pipeline-parallel Mamba mixer stack over a ``pipe`` mesh axis.

A scale-out axis the reference (DP-only, SURVEY.md §2.2) does not have:
the depth dimension of the MixerModel (reference models/point_mamba.py:
178-272) is sharded across devices — stage p holds layers
[p·L/P, (p+1)·L/P) — and microbatches stream through the stages GPipe-style:
at every tick each stage applies its layers to the (hidden, residual) pair
it holds, then hands the pair to the next stage over ICI via
``lax.ppermute``. After M + P - 1 ticks all M microbatches have drained.

Everything runs inside one ``shard_map`` over ``Mesh('pipe')``; XLA sees a
static schedule (a ``lax.scan`` over ticks) and the collectives are
differentiable, so ``jax.grad`` through the pipeline works out of the box
(tests/test_pipeline.py pins values AND grads against the sequential
MixerModel).

Per the seq_scan.py autodiff note, shard_map transposes of replicated
inputs hit an XLA sharding assertion on this jax version, so all inputs are
passed pipe-TILED (leading P axis, sharded on 'pipe'): stage 0 reads the
real input from its slice, the final stage writes the real output to its
slice, and cotangents come back slice-stacked (summed outside where
needed).

Uniform block recurrence (matches MixerModel exactly): carry (h, res) with
h0 = x + pos, res0 = 0; per layer: res ← h + res; h ← mixer(norm(res));
final output = norm_f(h + res).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from si_mamba_tpu.ops.selective_scan import mamba_mixer_apply

_MIXER_KEYMAP = {
    "in_proj": "in_proj_w", "conv1d_weight": "conv_w", "conv1d_bias": "conv_b",
    "x_proj": "x_proj_w", "dt_proj": "dt_proj_w", "dt_proj_bias": "dt_proj_b",
    "A_log": "A_log", "D": "D", "out_proj": "out_proj_w",
}
# flax param names → packed ssd_mixer_apply keys (models/layers.SSDMixer)
_SSD_KEYMAP = {
    "in_proj": "in_proj_w", "conv1d_weight": "conv_w", "conv1d_bias": "conv_b",
    "dt_bias": "dt_bias", "A_log": "A_log", "D": "D",
    "norm_scale": "norm_scale", "out_proj": "out_proj_w",
}


def stack_mixer_params(params: dict, n_layer: int, n_stages: int,
                       mixer: str = "mamba"):
    """MixerModel param dict ({'layers_i': {'norm', 'mixer'}, 'norm_f'}) →
    (stacked, norm_f) where every stacked leaf has leading dims
    (n_stages, n_layer // n_stages)."""
    if n_layer % n_stages != 0:
        raise ValueError(
            f"pipeline stages must divide the stack depth evenly: "
            f"n_layer={n_layer}, n_stages={n_stages} (uneven stage loads "
            f"would idle the short stages every tick)")
    per = n_layer // n_stages

    def leaf(path_fn):
        rows = [path_fn(params[f"layers_{i}"]) for i in range(n_layer)]
        x = jnp.stack(rows)
        return x.reshape((n_stages, per) + x.shape[1:])

    keymap = _SSD_KEYMAP if mixer == "ssd" else _MIXER_KEYMAP
    stacked = {
        "norm_scale": leaf(lambda l: l["norm"]["scale"]),
        "norm_bias": leaf(lambda l: l["norm"].get("bias",
                                                  jnp.zeros_like(l["norm"]["scale"]))),
        "mixer": {v: leaf(lambda l, k=k: l["mixer"][k])
                  for k, v in keymap.items()},
    }
    return stacked, params["norm_f"]


def _layer_norm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    return (y * scale + bias).astype(x.dtype)


def _stage_apply(stage_params, h, res, *, d_state, dt_rank, scan_impl,
                 norm_eps=1e-5, mixer="mamba", ssd_chunk=128):
    """Apply this stage's layers_per_stage blocks to the (h, res) pair."""
    per = stage_params["norm_scale"].shape[0]
    for i in range(per):
        res = h + res
        hn = _layer_norm(res, stage_params["norm_scale"][i],
                         stage_params["norm_bias"][i], eps=norm_eps)
        lp = {k: v[i] for k, v in stage_params["mixer"].items()}
        if mixer == "ssd":
            from si_mamba_tpu.ops.ssd import ssd_mixer_apply

            # geometry recoverable from the packed shapes: d_inner from
            # out_proj rows, d_state from the conv's extra (B,C) channels —
            # but NOT chunk, which must be passed to match SSDMixer's
            # full-tile default (q=64 would half-fill the MXU tile)
            d_inner = lp["out_proj_w"].shape[0]
            n = (lp["conv_w"].shape[0] - d_inner) // 2
            h = ssd_mixer_apply(
                lp, hn, n_heads=lp["A_log"].shape[0], d_state=n,
                chunk=ssd_chunk,
                # thread the kernel choice like the mamba branch below —
                # otherwise a scan_impl: ssd_fused config silently runs XLA
                impl="ssd_fused" if scan_impl == "ssd_fused" else "xla")
        else:
            h = mamba_mixer_apply(lp, hn, d_state=d_state, dt_rank=dt_rank,
                                  impl=scan_impl)
    return h, res


def pipeline_mixer_apply(stacked, norm_f, x, *, mesh: Mesh, axis: str = "pipe",
                         n_micro: int, d_state: int = 16,
                         dt_rank: int | None = None,
                         scan_impl: str = "chunked", norm_eps: float = 1e-5,
                         mixer: str = "mamba"):
    """Forward the full mixer stack with depth sharded over ``axis``.

    stacked/norm_f from ``stack_mixer_params`` (pass the same ``mixer``);
    x = tokens + pos, (B, L, D) with B % n_micro == 0. Returns
    norm_f(h + res), identical to ``MixerModel.apply`` (deterministic mode).
    """
    B, L, D = x.shape
    n_stages = mesh.shape[axis]
    assert B % n_micro == 0, (B, n_micro)
    mb = B // n_micro
    if dt_rank is None:
        dt_rank = math.ceil(D / 16)  # MambaMixer default (d_model / 16)

    # pipe-tile the input: stage 0's slice carries the real data
    x_mb = x.reshape(n_micro, mb, L, D)
    x_tiled = jnp.broadcast_to(x_mb[None], (n_stages,) + x_mb.shape)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)),
             out_specs=P(axis),
             check_vma=False)
    def run(stage_params, x_t):
        sp = jax.tree.map(lambda a: a[0], stage_params)  # local stage slice
        xs = x_t[0]  # (n_micro, mb, L, D); meaningful on stage 0
        stage = lax.axis_index(axis)
        nst = lax.axis_size(axis)
        ticks = n_micro + nst - 1
        fwd = [(i, (i + 1) % nst) for i in range(nst)]

        h = jnp.zeros((mb, L, D), x_t.dtype)
        res = jnp.zeros((mb, L, D), x_t.dtype)
        outs = jnp.zeros((n_micro, mb, L, D), jnp.float32)

        def tick(carry, t):
            h, res, outs = carry
            # stage 0 ingests microbatch t (if still in range)
            inject = lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, n_micro - 1), axis=0, keepdims=False)
            first = stage == 0
            h_in = jnp.where(first & (t < n_micro), inject, h)
            res_in = jnp.where(first & (t < n_micro), jnp.zeros_like(res), res)
            h2, res2 = _stage_apply(sp, h_in, res_in, d_state=d_state,
                                    dt_rank=dt_rank, scan_impl=scan_impl,
                                    norm_eps=norm_eps, mixer=mixer)
            # final stage emits microbatch t - (nst-1)
            out_mb = (h2 + res2).astype(jnp.float32)
            emit = (stage == nst - 1) & (t >= nst - 1)
            idx = jnp.clip(t - (nst - 1), 0, n_micro - 1)
            cur = lax.dynamic_index_in_dim(outs, idx, axis=0, keepdims=False)
            outs = lax.dynamic_update_index_in_dim(
                outs, jnp.where(emit, out_mb, cur), idx, axis=0)
            # hand the pair to the next stage
            h3 = lax.ppermute(h2, axis, fwd)
            res3 = lax.ppermute(res2, axis, fwd)
            return (h3, res3, outs), 0.0

        (h, res, outs), _ = lax.scan(tick, (h, res, outs), jnp.arange(ticks))
        return outs[None]

    outs_t = run(stacked, x_tiled)
    y = outs_t[-1].reshape(B, L, D)  # the final stage's slice is the output
    return _layer_norm(y, norm_f["scale"],
                       norm_f.get("bias", jnp.zeros_like(norm_f["scale"])),
                       eps=norm_eps)


def pipeline_pointmamba_logits(variables: dict, cfg, pts, *, mesh: Mesh,
                               axis: str = "pipe", n_micro: int,
                               scan_impl: str = "chunked"):
    """Eval-mode PointMamba classifier forward with the 12-layer mixer stack
    pipelined over ``axis`` — the full model composition (VERDICT r2 #6):
    grouping → PatchEncoder → pos-embed → spectral ordering run replicated
    (they are <5% of the FLOPs), the Mamba stack streams GPipe-style through
    the pipeline stages, and the final norm → mean-pool → cls head close the
    graph. Matches ``PointMamba.apply(..., train=False)`` exactly
    (tests/test_pipeline.py pins the logits).

    variables: the model's {'params', 'batch_stats'}; cfg: PointMambaConfig;
    pts: (B, N, 3) with B % n_micro == 0.
    """
    from si_mamba_tpu.models.embed import ClsHead, PatchEncoder, PosEmbedMLP
    from si_mamba_tpu.models.grouping import group_divider
    from si_mamba_tpu.models.ordering import (
        hlt_sequence,
        sast_sequence,
        xyz_sequence,
    )
    from si_mamba_tpu.models.point_mamba import spectral_eigvecs

    if cfg.add_after_layer or cfg.rms_norm:
        # MixerModelAdd's per-layer cross-merge re-sort (and RMSNorm's
        # mean-free normalization) are not part of the pipelined block
        # recurrence — the param layout would load fine but the logits
        # would silently diverge from PointMamba.apply
        raise NotImplementedError(
            f"pipeline_pointmamba_logits covers the plain MixerModel stack "
            f"only (add_after_layer={cfg.add_after_layer}, "
            f"rms_norm={cfg.rms_norm})")
    if jnp.dtype(cfg.dtype) != jnp.float32:
        # This composition runs fp32 end-to-end; a bf16 config would
        # silently diverge from PointMamba.apply (bf16 encoder/head and
        # bf16-cast eigvecs change SAST argsort tie-breaks).
        raise NotImplementedError(
            f"pipeline_pointmamba_logits supports dtype=float32 only "
            f"(got dtype={cfg.dtype})")
    p, bs = variables["params"], variables["batch_stats"]
    grouped = group_divider(pts, cfg.num_group, cfg.group_size)
    tokens = PatchEncoder(cfg.encoder_dims).apply(
        {"params": p["encoder"], "batch_stats": bs["encoder"]},
        grouped.neighborhood, train=False)
    pos = PosEmbedMLP(cfg.trans_dim).apply({"params": p["pos_embed"]},
                                           grouped.center)
    if cfg.method == "SAST":
        _, eigvecs = spectral_eigvecs(grouped.center.astype(jnp.float32), cfg)
        x, pos_seq = sast_sequence(tokens, pos, eigvecs, reverse=cfg.reverse,
                                   reverse_2=cfg.reverse_2)
    elif cfg.method == "HLT":
        _, eigvecs = spectral_eigvecs(grouped.center.astype(jnp.float32), cfg)
        x, pos_seq = hlt_sequence(tokens, pos, eigvecs,
                                  cfg.k_top_eigenvectors, jax.random.key(0))
    elif cfg.method == "MAMBA":
        x, pos_seq = xyz_sequence(tokens, pos, grouped.center)
    else:
        raise ValueError(cfg.method)

    n_stages = mesh.shape[axis]
    stacked, norm_f = stack_mixer_params(p["blocks"], cfg.depth, n_stages,
                                         mixer=cfg.mixer)
    h = pipeline_mixer_apply(stacked, norm_f, x + pos_seq, mesh=mesh,
                             axis=axis, n_micro=n_micro, scan_impl=scan_impl,
                             mixer=cfg.mixer)
    h = _layer_norm(h, p["norm"]["scale"], p["norm"]["bias"])
    feat = jnp.mean(h, axis=1)
    return ClsHead(cfg.cls_dim, drop=cfg.cls_head_dropout).apply(
        {"params": p["cls_head_finetune"],
         "batch_stats": bs["cls_head_finetune"]}, feat, train=False)
