"""Fused Pallas TPU kernel for the causal depthwise conv + SiLU (fwd + bwd).

Replaces the XLA path for the Mamba mixer's width-W causal conv (reference
external dep causal-conv1d, SURVEY.md §2.3 N2): XLA's autodiff of the
shifted-multiply formulation emits per-layer multi-pass multiply+reduce
fusions for the weight grads (~0.27 ms/layer measured on v5e at B=32,
L=512, D=768 in bf16) plus separate dx/dsilu fusions; this kernel does the
whole backward — dsilu, dx, per-(batch, d-block) dw/db partials — in one
pass over VMEM-resident whole-sequence blocks.

Layout: grid (B, D/BD); each cell holds the full (L, BD) sequence slab in
VMEM (L≤2048, BD=384 bf16 ⇒ ≤1.5 MB — fits comfortably). Time shifts are
static slices + zero-pad concat, so no cross-chunk carries are needed.
fp32 accumulation throughout; outputs stored in the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_back(x, k):
    """x[t-k] with zeros for t<k. x: (L, BD)."""
    if k == 0:
        return x
    L, BD = x.shape
    return jnp.concatenate([jnp.zeros((k, BD), x.dtype), x[: L - k]], axis=0)


def _shift_fwd(x, k):
    """x[t+k] with zeros for t>=L-k. x: (L, BD)."""
    if k == 0:
        return x
    L, BD = x.shape
    return jnp.concatenate([x[k:], jnp.zeros((k, BD), x.dtype)], axis=0)


def _conv_s(x_c, w, b):
    """Pre-activation conv: s[t] = sum_k w[k] x[t-W+1+k] + b. w: (W, BD)."""
    W = w.shape[0]
    s = b[None, :]
    for k in range(W):
        s = s + w[k][None, :] * _shift_back(x_c, W - 1 - k)
    return s


def _fwd_kernel(x_ref, w_ref, b_ref, y_ref):
    x_c = x_ref[0].astype(jnp.float32)  # (L, BD)
    s = _conv_s(x_c, w_ref[:, :], b_ref[0, :])
    y_ref[0] = (s * jax.nn.sigmoid(s)).astype(y_ref.dtype)


def _bwd_kernel(x_ref, w_ref, b_ref, g_ref, dx_ref, dw_ref, db_ref):
    W = w_ref.shape[0]
    x_c = x_ref[0].astype(jnp.float32)
    g_c = g_ref[0].astype(jnp.float32)
    s = _conv_s(x_c, w_ref[:, :], b_ref[0, :])
    sig = jax.nn.sigmoid(s)
    ds = g_c * sig * (1.0 + s * (1.0 - sig))  # d silu(s) = σ(s)(1 + s(1-σ))
    # dx[t] = sum_k w[k] ds[t + W-1-k]
    dx = jnp.zeros_like(x_c)
    for k in range(W):
        dx = dx + w_ref[k, :][None, :] * _shift_fwd(ds, W - 1 - k)
    dx_ref[0] = dx.astype(dx_ref.dtype)
    # dw[k] = sum_t ds[t] x[t-W+1+k]  (per-cell partial; XLA sums over B).
    # The tap axis is sublane-padded to 8 (Mosaic block constraint).
    Wp = dw_ref.shape[1]
    rows = [jnp.sum(ds * _shift_back(x_c, W - 1 - k), axis=0, keepdims=True)
            for k in range(W)]
    rows.append(jnp.zeros((Wp - W, ds.shape[1]), jnp.float32))
    dw_ref[0] = jnp.concatenate(rows, axis=0)
    db_ref[0, 0] = jnp.sum(ds, axis=0)


def _pick_bd(D):
    bd = 384 if D % 384 == 0 else 256
    while D % bd != 0:
        bd //= 2
    return bd


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _causal_conv_silu_pallas(x, weight, bias, interpret=False):
    y, _ = _cc_fwd(x, weight, bias, interpret)
    return y


def _pad_L(x):
    L = x.shape[1]
    Lp = -(-L // 8) * 8
    return (jnp.pad(x, ((0, 0), (0, Lp - L), (0, 0))) if Lp != L else x), L


def _cc_fwd(x, weight, bias, interpret):
    B, L0, D = x.shape
    x_p, L0 = _pad_L(x)
    L = x_p.shape[1]
    W = weight.shape[1]
    bd = _pick_bd(D)
    wt = jnp.swapaxes(weight, 0, 1).astype(jnp.float32)  # (W, D)
    y = pl.pallas_call(
        _fwd_kernel,
        grid=(B, D // bd),
        in_specs=[
            pl.BlockSpec((1, L, bd), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, bd), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bd), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, bd), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), x.dtype),
        interpret=interpret,
    )(x_p, wt, bias.astype(jnp.float32)[None, :])
    return y[:, :L0], (x, weight, bias)


def _cc_bwd(interpret, res, g):
    x, weight, bias = res
    B, L0, D = x.shape
    x_p, _ = _pad_L(x)
    g_p, _ = _pad_L(g)
    L = x_p.shape[1]
    W = weight.shape[1]
    bd = _pick_bd(D)
    wt = jnp.swapaxes(weight, 0, 1).astype(jnp.float32)
    Wp = -(-W // 8) * 8  # sublane-pad the tap axis of the dw partials
    dx, dwp, dbp = pl.pallas_call(
        functools.partial(_bwd_kernel),
        grid=(B, D // bd),
        in_specs=[
            pl.BlockSpec((1, L, bd), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((W, bd), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bd), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, bd), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, L, bd), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Wp, bd), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bd), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, L, D), x.dtype),
            jax.ShapeDtypeStruct((B, Wp, D), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        ),
        interpret=interpret,
    )(x_p, wt, bias.astype(jnp.float32)[None, :], g_p)
    dw = jnp.swapaxes(jnp.sum(dwp, axis=0)[:W], 0, 1).astype(weight.dtype)  # (D, W)
    db = jnp.sum(dbp, axis=(0, 1)).astype(bias.dtype)
    return dx[:, :L0], dw, db


_causal_conv_silu_pallas.defvjp(_cc_fwd, _cc_bwd)


def causal_conv1d_silu_pallas(x, weight, bias, *, interpret: bool = False):
    """Fused causal depthwise conv + bias + SiLU with Pallas fwd AND bwd.

    Drop-in for ``causal_conv1d(x, weight, bias, activation='silu')``
    (ops/selective_scan.py:33) on TPU. x: (B, L, D); weight: (D, W).
    """
    return _causal_conv_silu_pallas(x, weight, bias, interpret)
