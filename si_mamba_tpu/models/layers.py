"""Mamba mixer / block / stack as flax modules.

Mirrors the reference block structure (reference models/block.py:17-76 and
models/point_mamba.py:147-272 MixerModel) with mamba-ssm 1.1.1 mixer
semantics, re-expressed functionally for XLA: the non-fused add→norm→mixer
path is the ground-truth math (XLA fuses add+LN on its own; no Triton kernel
needed — SURVEY.md §2.3 N3).

Initializers replicate the torch defaults so from-scratch training matches:
- Linear / Conv1d: kaiming_uniform(a=√5) ⇒ U(-1/√fan_in, 1/√fan_in)
- dt_proj: weight U(±dt_rank^-1/2); bias = softplus^{-1}(exp(U·log-range))
- out_proj additionally divided by √n_layer (GPT-2 residual rescale,
  reference models/point_mamba.py:115-144).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from si_mamba_tpu.ops.selective_scan import causal_conv1d, selective_scan


def torch_linear_init(scale: float = 1.0):
    """U(-scale/sqrt(fan_in), +scale/sqrt(fan_in)) for kernels shaped (in, out)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = scale / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _uniform_bound(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dt_bias_init(dt_min: float = 1e-3, dt_max: float = 0.1, floor: float = 1e-4):
    """Inverse-softplus of a log-uniform dt sample (mamba-ssm dt_proj init)."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.maximum(dt, floor)
        inv = dt + jnp.log(-jnp.expm1(-dt))
        return inv.astype(dtype)

    return init


def _a_log_init(d_inner: int, d_state: int):
    def init(key, shape, dtype=jnp.float32):
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32), (d_inner, 1))
        return jnp.log(a).astype(dtype)

    return init


class MambaMixer(nn.Module):
    """Mamba-v1 selective-SSM token mixer (replaces mamba-ssm CUDA Mamba)."""

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Optional[int] = None
    out_proj_div: float = 1.0  # GPT-2 rescale: sqrt(n_residuals * n_layer)
    scan_impl: str = "auto"
    tp_axis: Optional[str] = None  # tensor-parallel mesh axis (context mesh)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_inner = self.expand * self.d_model
        dt_rank = self.dt_rank if self.dt_rank is not None else math.ceil(self.d_model / 16)

        def scaled_out_init(key, shape, dtype=jnp.float32):
            return torch_linear_init()(key, shape, dtype) / self.out_proj_div

        params = {
            "in_proj_w": self.param("in_proj", torch_linear_init(), (self.d_model, 2 * d_inner)),
            "conv_w": self.param("conv1d_weight", _uniform_bound(1 / math.sqrt(self.d_conv)),
                                 (d_inner, self.d_conv)),
            "conv_b": self.param("conv1d_bias", _uniform_bound(1 / math.sqrt(self.d_conv)),
                                 (d_inner,)),
            "x_proj_w": self.param("x_proj", torch_linear_init(),
                                   (d_inner, dt_rank + 2 * self.d_state)),
            "dt_proj_w": self.param("dt_proj", _uniform_bound(dt_rank**-0.5),
                                    (dt_rank, d_inner)),
            "dt_proj_b": self.param("dt_proj_bias", _dt_bias_init(), (d_inner,)),
            "A_log": self.param("A_log", _a_log_init(d_inner, self.d_state),
                                (d_inner, self.d_state)),
            "D": self.param("D", nn.initializers.ones, (d_inner,)),
            "out_proj_w": self.param("out_proj", scaled_out_init, (d_inner, self.d_model)),
        }
        x = x.astype(self.dtype)
        # TP path only under jit: eager partial-manual shard_map (and eager
        # with_sharding_constraint without a context mesh) are unsupported,
        # and flax ``init`` runs eagerly — the plain path computes the same
        # values, so init'd downstream params are identical.
        if self.tp_axis is not None and not self.is_initializing():
            from jax.sharding import PartitionSpec as P

            from si_mamba_tpu.parallel.tensor_parallel import mamba_mixer_tp

            ax = self.tp_axis
            wsc = jax.lax.with_sharding_constraint
            tp_params = {
                "in_proj_w": wsc(params["in_proj_w"].reshape(
                    self.d_model, 2, d_inner), P(None, None, ax)),
                "conv_w": wsc(params["conv_w"], P(ax, None)),
                "conv_b": wsc(params["conv_b"], P(ax)),
                "x_proj_w": wsc(params["x_proj_w"], P(ax, None)),
                "dt_proj_w": wsc(params["dt_proj_w"], P(None, ax)),
                "dt_proj_b": wsc(params["dt_proj_b"], P(ax)),
                "A_log": wsc(params["A_log"], P(ax, None)),
                "D": wsc(params["D"], P(ax)),
                "out_proj_w": wsc(params["out_proj_w"], P(ax, None)),
            }
            impl = self.scan_impl if self.scan_impl != "auto" else "chunked"
            return mamba_mixer_tp(tp_params, x, d_state=self.d_state,
                                  dt_rank=dt_rank, axis=ax, scan_impl=impl)
        from si_mamba_tpu.ops.selective_scan import mamba_mixer_apply

        return mamba_mixer_apply(params, x, d_state=self.d_state, dt_rank=dt_rank,
                                 impl=self.scan_impl)


class SSDMixer(nn.Module):
    """Scalar-decay SSD token mixer (ops/ssd.py) — opt-in MXU-native
    alternative to the Mamba-1 ``MambaMixer`` (``PointMambaConfig.
    mixer='ssd'``). Beyond-reference: no parity claim; the chunked
    recurrence runs as dense matmuls instead of a VPU scan (see
    benchmarks/ROOFLINE.md for why that is the only way past the Mamba-1
    VPU wall). Head layout: d_inner = expand·d_model split into
    head_dim-64-ish heads, one B/C group, A scalar per head."""

    d_model: int
    # FULL-TILE geometry: q=k=n=p=128 makes every SSD contraction a
    # (8,128)-tile-aligned 128x128 matmul — 64-wide operands half-fill the
    # MXU tile and measured ~2% of peak (profile, round 3)
    d_state: int = 128
    d_conv: int = 4
    expand: int = 2
    head_dim: int = 128
    chunk: int = 128
    out_proj_div: float = 1.0
    tp_axis: Optional[str] = None  # tensor-parallel mesh axis (context mesh)
    # 'ssd_fused' routes the chunked recurrence through the fused Pallas
    # kernel (ops/pallas/ssd_kernel.py, VMEM-resident chunks); any other
    # value keeps the XLA einsum path. TP ignores this (the sharded mixer
    # is einsum-based).
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_inner = self.expand * self.d_model
        # head_dim must DIVIDE d_inner (the head reshape is exact); when the
        # configured value doesn't, fall back to the largest divisor <= it
        # (e.g. d_inner=448 -> 112, not the non-divisor 149 that
        # floor-division would pick)
        head_dim = self.head_dim
        if d_inner % head_dim:
            head_dim = next(d for d in range(min(head_dim, d_inner), 0, -1)
                            if d_inner % d == 0)
        n_heads = d_inner // head_dim
        conv_dim = d_inner + 2 * self.d_state

        def scaled_out_init(key, shape, dtype=jnp.float32):
            return torch_linear_init()(key, shape, dtype) / self.out_proj_div

        def a_log_init(key, shape, dtype=jnp.float32):
            return jnp.log(jax.random.uniform(key, shape, jnp.float32,
                                              1.0, 16.0)).astype(dtype)

        params = {
            "in_proj_w": self.param(
                "in_proj", torch_linear_init(),
                (self.d_model, 2 * d_inner + 2 * self.d_state + n_heads)),
            "conv_w": self.param("conv1d_weight",
                                 _uniform_bound(1 / math.sqrt(self.d_conv)),
                                 (conv_dim, self.d_conv)),
            "conv_b": self.param("conv1d_bias",
                                 _uniform_bound(1 / math.sqrt(self.d_conv)),
                                 (conv_dim,)),
            "dt_bias": self.param("dt_bias", _dt_bias_init(), (n_heads,)),
            "A_log": self.param("A_log", a_log_init, (n_heads,)),
            "D": self.param("D", nn.initializers.ones, (n_heads,)),
            "norm_scale": self.param("norm_scale", nn.initializers.ones,
                                     (d_inner,)),
            "out_proj_w": self.param("out_proj", scaled_out_init,
                                     (d_inner, self.d_model)),
        }
        x = x.astype(self.dtype)
        # TP path only under jit, for the same reason as MambaMixer above:
        # flax init runs eagerly and the plain path computes identical values
        if self.tp_axis is not None and not self.is_initializing():
            from jax.sharding import PartitionSpec as P

            from si_mamba_tpu.parallel.tensor_parallel import ssd_mixer_tp

            ax = self.tp_axis
            wsc = jax.lax.with_sharding_constraint
            d_in, n = d_inner, self.d_state
            w, cw, cb = params["in_proj_w"], params["conv_w"], params["conv_b"]
            tp_params = {
                "in_proj_z": wsc(w[:, :d_in], P(None, ax)),
                "in_proj_x": wsc(w[:, d_in:2 * d_in], P(None, ax)),
                "in_proj_bc": w[:, 2 * d_in:2 * d_in + 2 * n],
                "in_proj_dt": wsc(w[:, 2 * d_in + 2 * n:], P(None, ax)),
                "conv_x_w": wsc(cw[:d_in], P(ax, None)),
                "conv_x_b": wsc(cb[:d_in], P(ax)),
                "conv_bc_w": cw[d_in:],
                "conv_bc_b": cb[d_in:],
                "dt_bias": wsc(params["dt_bias"], P(ax)),
                "A_log": wsc(params["A_log"], P(ax)),
                "D": wsc(params["D"], P(ax)),
                "norm_scale": wsc(params["norm_scale"], P(ax)),
                "out_proj_w": wsc(params["out_proj_w"], P(ax, None)),
            }
            return ssd_mixer_tp(
                tp_params, x, n_heads=n_heads, d_state=self.d_state,
                chunk=self.chunk, axis=ax,
                impl="ssd_fused" if self.scan_impl == "ssd_fused" else "xla")
        from si_mamba_tpu.ops.ssd import ssd_mixer_apply

        impl = "ssd_fused" if self.scan_impl == "ssd_fused" else "xla"
        return ssd_mixer_apply(params, x, n_heads=n_heads,
                               d_state=self.d_state, chunk=self.chunk,
                               impl=impl)


class DropPath(nn.Module):
    """Per-sample stochastic depth (timm DropPath semantics)."""

    rate: float

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class Block(nn.Module):
    """Add → Norm → Mixer prenorm-variant block (reference models/block.py:17-76).

    Returns (mixer_output, residual) where residual is the pre-norm sum; the
    very first block takes residual=None and skips DropPath on its input.
    """

    d_model: int
    rms_norm: bool = False
    norm_eps: float = 1e-5
    drop_path: float = 0.0
    residual_in_fp32: bool = False
    out_proj_div: float = 1.0
    scan_impl: str = "auto"
    tp_axis: Optional[str] = None
    mixer: str = "mamba"  # 'mamba' (reference Mamba-1) | 'ssd' (opt-in MXU)
    ssd_chunk: int = 128  # SSD chunk length (must divide the padded seq)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden, residual=None, deterministic: bool = True):
        if residual is None:
            residual = hidden
        else:
            residual = DropPath(self.drop_path)(hidden, deterministic) + residual
        if self.residual_in_fp32:
            residual = residual.astype(jnp.float32)
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        h = norm_cls(epsilon=self.norm_eps, name="norm", dtype=self.dtype)(residual)
        if self.mixer == "ssd":
            h = SSDMixer(self.d_model, out_proj_div=self.out_proj_div,
                         tp_axis=self.tp_axis, scan_impl=self.scan_impl,
                         chunk=self.ssd_chunk, dtype=self.dtype,
                         name="mixer")(h)
        else:
            h = MambaMixer(self.d_model, out_proj_div=self.out_proj_div,
                           scan_impl=self.scan_impl, tp_axis=self.tp_axis,
                           dtype=self.dtype, name="mixer")(h)
        return h, residual


class MixerModel(nn.Module):
    """Stack of Mamba blocks + final norm (reference models/point_mamba.py:178-272)."""

    d_model: int
    n_layer: int
    rms_norm: bool = False
    norm_eps: float = 1e-5
    drop_path: float = 0.0
    drop_out_in_block: float = 0.0
    residual_in_fp32: bool = False
    scan_impl: str = "auto"
    tp_axis: Optional[str] = None
    mixer: str = "mamba"
    ssd_chunk: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, deterministic: bool = True):
        hidden = x + pos
        residual = None
        div = math.sqrt(self.n_layer)  # n_residuals_per_layer=1
        for i in range(self.n_layer):
            hidden, residual = Block(
                self.d_model, rms_norm=self.rms_norm, norm_eps=self.norm_eps,
                drop_path=self.drop_path, residual_in_fp32=self.residual_in_fp32,
                out_proj_div=div, scan_impl=self.scan_impl,
                tp_axis=self.tp_axis, mixer=self.mixer,
                ssd_chunk=self.ssd_chunk, dtype=self.dtype,
                name=f"layers_{i}",
            )(hidden, residual, deterministic)
            if self.drop_out_in_block > 0:
                hidden = nn.Dropout(self.drop_out_in_block)(hidden, deterministic=deterministic)
        residual = hidden + residual if residual is not None else hidden
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        return norm_cls(epsilon=self.norm_eps, name="norm_f", dtype=self.dtype)(residual)


class MixerModelAdd(nn.Module):
    """MixerModel that re-sorts tokens by the top-k eigenvectors after every
    layer (reference ``MixerModel_add``, models/point_mamba.py:281-428,
    ``add_after_layer`` config): merge the 2k traversals back to original
    token order via inverse-permutation gather (``cross_merg`` :350-370), sum
    them, then rebuild the k sorted traversals + reversed copy.
    """

    d_model: int
    n_layer: int
    rms_norm: bool = False
    norm_eps: float = 1e-5
    drop_path: float = 0.0
    drop_out_in_block: float = 0.0
    scan_impl: str = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, eigvecs, reverse: bool = True, deterministic: bool = True):
        from si_mamba_tpu.models.ordering import cross_merge, resort_sequence

        hidden = x + pos
        residual = None
        div = math.sqrt(self.n_layer)
        for i in range(self.n_layer):
            hidden, residual = Block(
                self.d_model, rms_norm=self.rms_norm, norm_eps=self.norm_eps,
                drop_path=self.drop_path, out_proj_div=div, scan_impl=self.scan_impl,
                dtype=self.dtype, name=f"layers_{i}",
            )(hidden, residual, deterministic)
            if self.drop_out_in_block > 0:
                hidden = nn.Dropout(self.drop_out_in_block)(hidden, deterministic=deterministic)
            merged = cross_merge(hidden, eigvecs)  # (B, G, D) summed over traversals
            hidden = resort_sequence(merged, eigvecs, reverse=reverse)
        residual = hidden + residual if residual is not None else hidden
        norm_cls = nn.RMSNorm if self.rms_norm else nn.LayerNorm
        return norm_cls(epsilon=self.norm_eps, name="norm_f", dtype=self.dtype)(residual)
