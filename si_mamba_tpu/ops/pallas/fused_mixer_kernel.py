"""Fully fused Mamba-mixer interior as one Pallas TPU kernel (fwd + bwd).

Round-1 profiling showed the train step is NOT scan-bound: the 12-layer scan
kernel alone is ~16 ms fwd+bwd while the mixer stack costs ~85 ms — the gap
is HBM round-trips for the conv/x_proj/dt_proj intermediates (xi, x_dbl, dt,
scan operands) plus the residuals XLA saves for their backward. This kernel
fuses everything between the two big projections into a single pass:

    xz (= x @ in_proj)  →  [ split → causal-conv → silu → x_proj/dt_proj
                             → softplus discretize → selective scan
                             → C-contract + D-skip → silu(z) gate ]  →  y

so per layer only xz is read and y written; xi / x_dbl / dt / B / C never
touch HBM, in either pass. in_proj/out_proj stay in XLA — they are pure MXU
matmuls XLA already runs at bf16 peak.

Two algebraic rewrites make the in-kernel projections MXU-friendly:
- dt_proj is folded into x_proj:  dt_raw = xi @ (x_proj[:, :R] @ dt_proj)
  = xi @ W_dt, a (d_inner, d_inner) matmul instead of two rank-R ones (the
  reference applies no nonlinearity between them — models/point_mamba.py
  mamba_inner_ref path, mamba-ssm 1.1.1). The composition happens OUTSIDE
  the custom_vjp, so autodiff recovers exact d(x_proj)/d(dt_proj).
- B/C are produced directly in scan layout via dot_general(W_bc^T-style
  contraction): (2n, T) = contract(W_bc (di, 2n), xi (T, di)) — no in-kernel
  transpose.

The backward (custom VJP, reverse chunk order like the scan kernel's)
recomputes the whole interior from xz in VMEM, runs the reverse dh scan, and
ACCUMULATES weight grads in VMEM-resident output blocks (constant index maps
— the TPU grid is sequential) instead of emitting per-cell partials. The
causal conv needs 3 rows of left-context: the forward carries them in
scratch (sequential L→R); the backward reads the previous time-chunk's block
via a second xz input spec (R→L iteration can't carry) and zeroes it at
chunk 0. Symmetrically, d(conv) needs 3 rows of FUTURE dxi_lin — carried in
scratch, since backward iterates right-to-left.

Replaces: mamba-ssm's fused ``mamba_inner_fn`` CUDA kernel (SURVEY.md §2.3
N1/N2 — reference models/point_mamba.py:25 imports).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from si_mamba_tpu.ops.pallas.selective_scan_kernel import (
    _scan_fwd_subblocks,
    _scan_rev_subblocks,
)

_F32 = jnp.float32


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dot_f32(a, b, dims):
    """fp32-faithful MXU contraction via bf16 hi/lo splitting (3 passes).

    The v5e MXU rounds operands to bf16; a single-pass dot costs ~1e-3
    relative error, which compounds through exp(Σ delta·A) in the scan. The
    reference CUDA kernel keeps this math in fp32 — 3 passes recover it
    (dropping only the lo·lo term) at negligible MXU cost in this VPU-bound
    kernel.
    """
    bf = jnp.bfloat16
    a_hi = a.astype(bf)
    b_hi = b.astype(bf)
    a_lo = (a - a_hi.astype(_F32)).astype(bf)
    b_lo = (b - b_hi.astype(_F32)).astype(bf)
    dg = functools.partial(lax.dot_general, dimension_numbers=dims,
                           preferred_element_type=_F32)
    return dg(a_hi, b_hi) + (dg(a_hi, b_lo) + dg(a_lo, b_hi))


_MM = (((1,), (0,)), ((), ()))  # standard (T, K) @ (K, N)


def _conv_causal(x_part, prev, conv_wt, conv_b, *, T: int, W: int):
    """xi_lin[t] = b + Σ_i w[i] · x[t - (W-1) + i]; prev = last W-1 rows of
    the chunk to the left (zeros at chunk 0)."""
    xi_lin = conv_b[0][None, :] + x_part * conv_wt[W - 1][None, :]
    for i in range(W - 1):
        k = W - 1 - i  # lag
        xs = jnp.concatenate([prev[W - 1 - k :, :], x_part[: T - k, :]], axis=0)
        xi_lin = xi_lin + xs * conv_wt[i][None, :]
    return xi_lin


def _fwd_kernel(xz_ref, convwt_ref, convb_ref, wdt_ref, dtb_ref, wbc_ref,
                at_ref, d_ref, y_ref, hent_ref, h_ref, xcar_ref,
                *, T: int, S: int, n: int, W: int):
    di = d_ref.shape[-1]
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        h_ref[:, :] = jnp.zeros((n, di), _F32)
        xcar_ref[:, :] = jnp.zeros((W - 1, di), _F32)

    hent_ref[0, 0] = h_ref[:, :]

    x_part = xz_ref[0, :, :di].astype(_F32)  # (T, di)
    z_c = xz_ref[0, :, di:].astype(_F32)

    xi_lin = _conv_causal(x_part, xcar_ref[:, :], convwt_ref[:, :],
                          convb_ref[:, :], T=T, W=W)
    xcar_ref[:, :] = x_part[T - (W - 1) :, :]
    xi = _silu(xi_lin)

    dt_raw = _dot_f32(xi, wdt_ref[:, :], _MM) + dtb_ref[0][None, :]
    delta = jax.nn.softplus(dt_raw)
    # (2n, T) = contract di: rows = B/C state channels, lanes = time
    bct = _dot_f32(wbc_ref[:, :], xi, (((0,), (1,)), ((), ())))
    b_c, c_c = bct[:n], bct[n:]

    a = jnp.exp(delta[None, :, :] * at_ref[:, :][:, None, :])  # (n, T, di)
    b = (delta * xi)[None, :, :] * b_c[:, :, None]
    hs, h_out = _scan_fwd_subblocks(a, b, h_ref[:, :], T=T, S=S)
    h_ref[:, :] = h_out

    y = jnp.sum(c_c[:, :, None] * hs, axis=0) + d_ref[0][None, :] * xi
    y_ref[0] = (y * _silu(z_c)).astype(y_ref.dtype)


def _bwd_kernel(xz_ref, xzp_ref, g_ref, convwt_ref, convb_ref, wdt_ref,
                dtb_ref, wbc_ref, at_ref, d_ref, hent_ref,
                dxz_ref, dwdt_ref, dwbc_ref, dconvwt_ref, dconvb_ref,
                dat_ref, dd_ref, ddtb_ref, dh_ref, dcar_ref,
                *, T: int, S: int, n: int, W: int, nchunks: int):
    di = d_ref.shape[-1]
    b_i = pl.program_id(0)
    c = pl.program_id(1)  # 0 == LAST time chunk (reversed index maps)

    @pl.when(c == 0)
    def _():
        dh_ref[:, :] = jnp.zeros((n, di), _F32)
        dcar_ref[:, :] = jnp.zeros((W - 1, di), _F32)

    @pl.when((b_i == 0) & (c == 0))
    def _():
        dwdt_ref[:, :] = jnp.zeros_like(dwdt_ref)
        dwbc_ref[:, :] = jnp.zeros_like(dwbc_ref)
        dconvwt_ref[:, :] = jnp.zeros_like(dconvwt_ref)
        dconvb_ref[:, :] = jnp.zeros_like(dconvb_ref)
        dat_ref[:, :] = jnp.zeros_like(dat_ref)
        dd_ref[:, :] = jnp.zeros_like(dd_ref)
        ddtb_ref[:, :] = jnp.zeros_like(ddtb_ref)

    x_part = xz_ref[0, :, :di].astype(_F32)
    z_c = xz_ref[0, :, di:].astype(_F32)
    g_c = g_ref[0].astype(_F32)
    h_in = hent_ref[0, 0]

    # left conv context: previous time chunk's last rows; zeros at chunk 0
    is_first_chunk = (c == nchunks - 1)
    prev = jnp.where(is_first_chunk, 0.0,
                     xzp_ref[0, T - (W - 1) :, :di].astype(_F32))

    # ---- recompute the interior ----------------------------------------
    xi_lin = _conv_causal(x_part, prev, convwt_ref[:, :], convb_ref[:, :],
                          T=T, W=W)
    xi = _silu(xi_lin)
    dt_raw = _dot_f32(xi, wdt_ref[:, :], _MM) + dtb_ref[0][None, :]
    delta = jax.nn.softplus(dt_raw)
    bct = _dot_f32(wbc_ref[:, :], xi, (((0,), (1,)), ((), ())))
    b_c, c_c = bct[:n], bct[n:]
    A = at_ref[:, :][:, None, :]
    Dp = d_ref[0]

    a = jnp.exp(delta[None, :, :] * A)
    b = (delta * xi)[None, :, :] * b_c[:, :, None]
    hs, _ = _scan_fwd_subblocks(a, b, h_in, T=T, S=S)
    h_prev = jnp.concatenate([h_in[:, None, :], hs[:, : T - 1, :]], axis=1)

    # ---- gate grads -----------------------------------------------------
    sig = jax.nn.sigmoid(z_c)
    y0 = jnp.sum(c_c[:, :, None] * hs, axis=0) + Dp[None, :] * xi
    dz = g_c * y0 * (sig * (1.0 + z_c * (1.0 - sig)))
    gy = g_c * (z_c * sig)  # (T, di)

    # ---- reverse recurrence dh_t = gy_t C_t + a_{t+1} dh_{t+1} ----------
    q = c_c[:, :, None] * gy[None, :, :]
    ashift = jnp.concatenate([a[:, 1:, :], jnp.ones((n, 1, di), _F32)], axis=1)
    dh, _ = _scan_rev_subblocks(ashift, q, dh_ref[:, :], T=T, S=S)
    dh_ref[:, :] = (a[:, 0:1, :] * dh[:, 0:1, :]).reshape(n, di)

    # ---- scan-input grads ------------------------------------------------
    daa = dh * h_prev * a
    dhb = jnp.sum(dh * b_c[:, :, None], axis=0)  # (T, di)
    ddelta = jnp.sum(daa * A, axis=0) + dhb * xi
    ddt_raw = ddelta * jax.nn.sigmoid(dt_raw)
    du = delta * dhb + gy * Dp[None, :]  # d(xi) through the scan + D skip
    dbt = jnp.sum(dh * (delta * xi)[None, :, :], axis=2)  # (n, T)
    dct = jnp.sum(hs * gy[None, :, :], axis=2)  # (n, T)

    # ---- project back to xi: dt path + B/C path -------------------------
    # (T, di) = contract dt_raw's out-dim with W_dt's out-dim
    dxi = du + _dot_f32(ddt_raw, wdt_ref[:, :], (((1,), (1,)), ((), ())))
    dbct = jnp.concatenate([dbt, dct], axis=0)  # (2n, T)
    dxi = dxi + _dot_f32(dbct, wbc_ref[:, :], (((0,), (1,)), ((), ())))
    dxi_lin = dxi * (sig_xi := jax.nn.sigmoid(xi_lin)) * (1.0 + xi_lin * (1.0 - sig_xi))

    # ---- conv grads + dx (needs future dxi_lin rows: carried R→L) -------
    dx = dxi_lin * convwt_ref[W - 1][None, :]
    for i in range(W - 1):
        k = W - 1 - i  # lag of tap i
        dfut = jnp.concatenate([dxi_lin[k:, :], dcar_ref[: k, :]], axis=0)
        dx = dx + dfut * convwt_ref[i][None, :]
        xs = jnp.concatenate([prev[W - 1 - k :, :], x_part[: T - k, :]], axis=0)
        dconvwt_ref[i, :] += jnp.sum(xs * dxi_lin, axis=0)
    dcar_ref[:, :] = dxi_lin[: W - 1, :]
    dconvwt_ref[W - 1, :] += jnp.sum(x_part * dxi_lin, axis=0)
    dconvb_ref[0, :] += jnp.sum(dxi_lin, axis=0)

    # ---- weight grads (VMEM accumulators) --------------------------------
    dwdt_ref[:, :] += _dot_f32(xi, ddt_raw, (((0,), (0,)), ((), ())))
    dwbc_ref[:, :] += _dot_f32(xi, dbct, (((0,), (1,)), ((), ())))
    dat_ref[:, :] += jnp.sum(daa * delta[None, :, :], axis=1)
    dd_ref[0, :] += jnp.sum(gy * xi, axis=0)
    ddtb_ref[0, :] += jnp.sum(ddt_raw, axis=0)

    dxz_ref[0, :, :di] = dx.astype(dxz_ref.dtype)
    dxz_ref[0, :, di:] = dz.astype(dxz_ref.dtype)


def _fused_fwd_call(xz, conv_wt, conv_b, wdt, dtb, wbc, at, d, *, chunk: int,
                    sub_block: int, interpret: bool):
    Bb, L, di2 = xz.shape
    di = di2 // 2
    n = at.shape[0]
    W = conv_wt.shape[0]
    nc = L // chunk

    kernel = functools.partial(_fwd_kernel, T=chunk, S=sub_block, n=n, W=W)
    const = lambda i, c: (0, 0)
    y, hent = pl.pallas_call(
        kernel,
        grid=(Bb, nc),
        in_specs=[
            pl.BlockSpec((1, chunk, di2), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((di, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((di, 2 * n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, chunk, di), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, di), lambda i, c: (i, c, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bb, L, di), xz.dtype),
            jax.ShapeDtypeStruct((Bb, nc, n, di), _F32),
        ),
        scratch_shapes=[pltpu.VMEM((n, di), _F32),
                        pltpu.VMEM((W - 1, di), _F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(xz, conv_wt, conv_b, wdt, dtb, wbc, at, d)
    return y, hent


def _fused_bwd_call(xz, conv_wt, conv_b, wdt, dtb, wbc, at, d, hent, g, *,
                    chunk: int, sub_block: int, interpret: bool):
    Bb, L, di2 = xz.shape
    di = di2 // 2
    n = at.shape[0]
    W = conv_wt.shape[0]
    nc = L // chunk

    kernel = functools.partial(_bwd_kernel, T=chunk, S=sub_block, n=n, W=W,
                               nchunks=nc)
    const = lambda i, c: (0, 0)
    rd = lambda i, c: (i, nc - 1 - c, 0)
    # previous time chunk (for conv left context); clamped at 0 and masked
    # in-kernel at the first chunk
    rprev = lambda i, c: (i, jnp.maximum(nc - 1 - c - 1, 0), 0)

    outs = pl.pallas_call(
        kernel,
        grid=(Bb, nc),
        in_specs=[
            pl.BlockSpec((1, chunk, di2), rd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, di2), rprev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, di), rd, memory_space=pltpu.VMEM),  # g
            pl.BlockSpec((W, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((di, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((di, 2 * n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n, di), lambda i, c: (i, nc - 1 - c, 0, 0),
                         memory_space=pltpu.VMEM),  # h entries
        ],
        out_specs=(
            pl.BlockSpec((1, chunk, di2), rd, memory_space=pltpu.VMEM),  # dxz
            pl.BlockSpec((di, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((di, 2 * n), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((W, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, di), const, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Bb, L, di2), _F32),
            jax.ShapeDtypeStruct((di, di), _F32),
            jax.ShapeDtypeStruct((di, 2 * n), _F32),
            jax.ShapeDtypeStruct((W, di), _F32),
            jax.ShapeDtypeStruct((1, di), _F32),
            jax.ShapeDtypeStruct((n, di), _F32),
            jax.ShapeDtypeStruct((1, di), _F32),
            jax.ShapeDtypeStruct((1, di), _F32),
        ),
        scratch_shapes=[pltpu.VMEM((n, di), _F32),
                        pltpu.VMEM((W - 1, di), _F32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(xz, xz, g, conv_wt, conv_b, wdt, dtb, wbc, at, d, hent)
    return outs


def _pad_L(xz, chunk):
    Bb, L, _ = xz.shape
    Lp = -(-L // chunk) * chunk
    if Lp != L:
        xz = jnp.pad(xz, ((0, 0), (0, Lp - L), (0, 0)))
    return xz, L


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused_core(xz, conv_wt, conv_b, wdt, dtb, wbc, at, d,
                chunk=64, sub_block=8, interpret=False):
    y, _ = _core_fwd(xz, conv_wt, conv_b, wdt, dtb, wbc, at, d,
                     chunk, sub_block, interpret)
    return y


def _core_fwd(xz, conv_wt, conv_b, wdt, dtb, wbc, at, d,
              chunk, sub_block, interpret):
    xz_p, L = _pad_L(xz, chunk)
    y, hent = _fused_fwd_call(xz_p, conv_wt, conv_b[None, :], wdt,
                              dtb[None, :], wbc, at, d[None, :],
                              chunk=chunk, sub_block=sub_block,
                              interpret=interpret)
    return y[:, :L], (xz, conv_wt, conv_b, wdt, dtb, wbc, at, d, hent)


def _core_bwd(chunk, sub_block, interpret, res, g):
    xz, conv_wt, conv_b, wdt, dtb, wbc, at, d, hent = res
    xz_p, L = _pad_L(xz, chunk)
    g_p = jnp.pad(g.astype(_F32), ((0, 0), (0, xz_p.shape[1] - L), (0, 0))) \
        if xz_p.shape[1] != L else g.astype(_F32)
    (dxz, dwdt, dwbc, dconvwt, dconvb, dat, dd, ddtb) = _fused_bwd_call(
        xz_p, conv_wt, conv_b[None, :], wdt, dtb[None, :], wbc, at,
        d[None, :], hent, g_p, chunk=chunk, sub_block=sub_block,
        interpret=interpret)
    return (dxz[:, :L].astype(xz.dtype), dconvwt.astype(conv_wt.dtype),
            dconvb[0].astype(conv_b.dtype), dwdt.astype(wdt.dtype),
            ddtb[0].astype(dtb.dtype), dwbc.astype(wbc.dtype),
            dat.astype(at.dtype), dd[0].astype(d.dtype))


_fused_core.defvjp(_core_fwd, _core_bwd)


def fused_mamba_mixer(xz, conv_w, conv_b, x_proj_w, dt_proj_w, dt_proj_b,
                      A, D, *, dt_rank: int, d_state: int, chunk: int = 64,
                      interpret: bool = False):
    """Fused mixer interior: xz (B, L, 2·d_inner) → y (B, L, d_inner).

    Parameters use the mamba_mixer_apply layouts (conv_w (d_inner, W),
    x_proj_w (d_inner, dt_rank+2n), dt_proj_w (dt_rank, d_inner), A (d_inner,
    n)). The dt_proj composition and all layout transposes are differentiable
    XLA ops outside the custom VJP, so parameter grads are exact.
    """
    wdt = jnp.dot(x_proj_w[:, :dt_rank].astype(_F32),
                  dt_proj_w.astype(_F32), precision=lax.Precision.HIGHEST)
    wbc = x_proj_w[:, dt_rank : dt_rank + 2 * d_state].astype(_F32)
    return _fused_core(xz, jnp.swapaxes(conv_w, 0, 1).astype(_F32),
                       conv_b.astype(_F32), wdt, dt_proj_b.astype(_F32),
                       wbc, jnp.swapaxes(A, 0, 1).astype(_F32),
                       D.astype(_F32), chunk, 8, interpret)


def fused_mixer_supported(d_inner: int, d_state: int, L: int) -> bool:
    """Lane-dim and state-dim constraints for the Mosaic lowering."""
    return d_inner % 128 == 0 and d_state <= 32
