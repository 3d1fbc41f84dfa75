"""Fused Pallas TPU kernel for the Mamba selective scan.

Replaces the HBM-bound XLA paths: the (B, L, d_inner, n) discretized tensors
never hit HBM — each grid step keeps one (n, T, BD) chunk in VMEM, runs a
Hillis-Steele inclusive scan over the chunk (log2 T vectorized steps),
carries the (n, BD) state across chunks in scratch, and contracts the state
against C in-register. Memory traffic drops from O(L·d·n) fp32 to the
O(L·d) inputs/outputs.

Design (see pallas guide):
- grid = (B, d_inner/BD, L/T); the chunk axis is innermost so TPU's
  sequential grid iteration threads the recurrence carry through VMEM
  scratch (reset at chunk 0 via @pl.when) — no dynamic slicing in-kernel;
- lanes = d_inner block (BD), sublanes = time chunk (T); the small state
  dim n rides the leading axis of 3-D VMEM arrays;
- B/C arrive pre-transposed (B, n, L) so chunk blocks are (n, T);
- fp32 state regardless of activation dtype.

Training uses a custom VJP whose backward runs the chunked XLA
implementation (rematerializes the forward); a dedicated backward kernel is
the follow-up optimization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from si_mamba_tpu.ops.selective_scan import selective_scan_chunked


def _scan_kernel(x_ref, dt_ref, bt_ref, ct_ref, z_ref, a_ref, d_ref, dtb_ref,
                 y_ref, h_ref, *, T: int):
    n, BD = a_ref.shape
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        h_ref[:, :] = jnp.zeros((n, BD), jnp.float32)

    A = a_ref[:, :][:, None, :]  # (n, 1, BD)
    dtb = dtb_ref[0, :]
    Dp = d_ref[0, :]

    x_c = x_ref[0].astype(jnp.float32)  # (T, BD)
    dt_c = jax.nn.softplus(dt_ref[0].astype(jnp.float32) + dtb[None, :])
    b_c = bt_ref[0].astype(jnp.float32)  # (n, T)
    c_c = ct_ref[0].astype(jnp.float32)  # (n, T)

    a = jnp.exp(dt_c[None, :, :] * A)  # (n, T, BD)
    b = (dt_c * x_c)[None, :, :] * b_c[:, :, None]  # (n, T, BD)

    # Hillis-Steele inclusive scan along the T axis
    k = 1
    while k < T:
        a_prev = jnp.concatenate(
            [jnp.ones((n, k, BD), jnp.float32), a[:, : T - k, :]], axis=1)
        b_prev = jnp.concatenate(
            [jnp.zeros((n, k, BD), jnp.float32), b[:, : T - k, :]], axis=1)
        b = b + a * b_prev
        a = a * a_prev
        k *= 2

    hs = a * h_ref[:, :][:, None, :] + b  # (n, T, BD)
    # static slice of the last step (scalar-int indexing would lower to the
    # unsupported dynamic_slice primitive)
    h_ref[:, :] = hs[:, T - 1 : T, :].reshape(n, BD)

    y_c = jnp.sum(c_c[:, :, None] * hs, axis=0)  # (T, BD)
    y_c = y_c + Dp[None, :] * x_c
    z_c = z_ref[0].astype(jnp.float32)
    y_c = y_c * (z_c * jax.nn.sigmoid(z_c))
    y_ref[0] = y_c.astype(y_ref.dtype)


def _pallas_scan_fwd_only(x, dt, Bmat, Cmat, z, A, D, dt_bias, *,
                          block_d: int = 256, chunk: int = 128,
                          interpret: bool = False):
    """x, dt, z: (B, L, d); Bmat, Cmat: (B, L, n); A: (d, n); D, dt_bias: (d,).

    Returns y (B, L, d). L must be a multiple of ``chunk``; d of block_d.
    """
    Bb, L, d = x.shape
    n = A.shape[1]
    assert d % block_d == 0, (d, block_d)
    assert L % chunk == 0, (L, chunk)
    nchunks = L // chunk
    ndb = d // block_d

    Bt = jnp.swapaxes(Bmat, 1, 2)  # (B, n, L)
    Ct = jnp.swapaxes(Cmat, 1, 2)
    At = jnp.swapaxes(A, 0, 1)  # (n, d)

    kernel = functools.partial(_scan_kernel, T=chunk)
    grid = (Bb, ndb, nchunks)  # chunk axis innermost: sequential carry

    ld = lambda i, j, c: (i, c, j)  # (1, T, BD) blocks of x/dt/z/y
    ln = lambda i, j, c: (i, 0, c)  # (1, n, T) blocks of Bt/Ct

    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, chunk, block_d), ld, memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, chunk, block_d), ld, memory_space=pltpu.VMEM),  # dt
            pl.BlockSpec((1, n, chunk), ln, memory_space=pltpu.VMEM),  # Bt
            pl.BlockSpec((1, n, chunk), ln, memory_space=pltpu.VMEM),  # Ct
            pl.BlockSpec((1, chunk, block_d), ld, memory_space=pltpu.VMEM),  # z
            pl.BlockSpec((n, block_d), lambda i, j, c: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda i, j, c: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda i, j, c: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, chunk, block_d), ld, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bb, L, d), x.dtype),
        scratch_shapes=[pltpu.VMEM((n, block_d), jnp.float32)],
        interpret=interpret,
    )(x, dt, Bt, Ct, z, At, D[None, :], dt_bias[None, :])
    return y


def _fwd_impl(u, delta, A, B, C, D, z, delta_bias, block_d, chunk, interpret):
    Bb, L, d = u.shape
    chunk = min(chunk, L)
    Lp = -(-L // chunk) * chunk
    if Lp != L:
        pad = ((0, 0), (0, Lp - L), (0, 0))
        u_p, dt_p, B_p, C_p, z_p = (jnp.pad(t, pad) for t in (u, delta, B, C, z))
    else:
        u_p, dt_p, B_p, C_p, z_p = u, delta, B, C, z
    bd = block_d
    while d % bd != 0:
        bd //= 2
    y = _pallas_scan_fwd_only(u_p, dt_p, B_p, C_p, z_p, A, D, delta_bias,
                              block_d=bd, chunk=chunk, interpret=interpret)
    return y[:, :L]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias,
                           block_d=256, chunk=128, interpret=False):
    return _fwd_impl(u, delta, A, B, C, D, z, delta_bias, block_d, chunk, interpret)


def _vjp_fwd(u, delta, A, B, C, D, z, delta_bias, block_d, chunk, interpret):
    y = _fwd_impl(u, delta, A, B, C, D, z, delta_bias, block_d, chunk, interpret)
    return y, (u, delta, A, B, C, D, z, delta_bias)


def _vjp_bwd(block_d, chunk, interpret, res, g):
    u, delta, A, B, C, D, z, delta_bias = res
    # Rematerialized backward through the chunked XLA implementation — exact
    # same math as the kernel (fp32 state, softplus(dt + bias) inside).
    _, vjp = jax.vjp(
        lambda *args: selective_scan_chunked(*args, delta_softplus=True, chunk=chunk),
        u, delta, A, B, C, D, z, delta_bias)
    return vjp(g)


_selective_scan_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def selective_scan_pallas(u, delta, A, B, C, D=None, z=None, delta_bias=None,
                          delta_softplus: bool = True, *, block_d: int = 256,
                          chunk: int = 128, interpret: bool = False):
    """Drop-in for ``selective_scan`` with the fused Pallas forward.

    The fused kernel folds softplus(dt+bias), ZOH discretization, the scan,
    the C-contraction, the D skip, and the silu(z) gate; callers must pass
    D, z, delta_bias (the Mamba mixer always does).
    """
    if not delta_softplus or D is None or z is None or delta_bias is None:
        raise NotImplementedError(
            "pallas path implements the full fused mamba scan "
            "(delta_softplus + D + z + delta_bias)")
    return _selective_scan_pallas(u, delta, A, B, C, D, z, delta_bias,
                                  block_d, chunk, interpret)
