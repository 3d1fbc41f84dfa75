"""Fused Pallas TPU kernel for the chunked scalar-decay SSD mixer core.

The XLA path (``ops/ssd.ssd_chunked``) materializes every stage of the
chunked recurrence in HBM: xdt, the (b,h,nc,q,q) decay-masked attention
tensor GM, per-chunk states, y_intra, y_inter. ROOFLINE.md measures that
step HBM-bound (~18 ms floor of a 62.9 ms step). This kernel keeps one
(q,·) chunk of everything in VMEM per grid step and threads the (h,n,p)
inter-chunk states through scratch, so per layer the SSD core touches HBM
only for its true inputs/outputs (x, dt, S, B, C in; y + the per-chunk
entry states out).

Layout (production geometry q = n = p = 128 — every contraction is one
full (8,128)-tile 128x128 MXU matmul):

- grid = (b, nc): ONE grid step processes ALL heads of one chunk (an
  in-kernel static loop over head slices). The chunk axis is innermost so
  TPU's sequential grid iteration threads the (h, n, p) state carry
  through VMEM scratch (reset at chunk 0 via @pl.when), exactly like the
  Mamba-1 scan kernel in selective_scan_kernel.py.
- x and y stay in the model's NATIVE (b, l, h*p) layout end-to-end: the
  (1, q, h*p) block is fully contiguous in HBM (1536-byte rows at the
  production geometry), so the kernel neither materializes a head-major
  transpose (an earlier wrapper design — ~25 MB relayout per tensor per
  layer) nor pays strided 256-byte-row DMAs (a per-head-grid design —
  measured SLOWER than the transposes it removed).
- B/C are shared across heads (b,nc,q,n): with heads in-kernel they are
  DMA'd ONCE per chunk instead of once per (head, chunk) — h x fewer
  reads — and the head-shared G = C @ B^T attention matmul is hoisted out
  of the head loop entirely.
- The backward accumulates the head-shared dB/dC partials in VMEM
  registers and writes (b,nc,q,n) — h x less HBM write traffic than
  per-head partials plus it absorbs the XLA sum-over-heads reduction.
- dt and the per-chunk decay cumsum S ride ONE (b,nc,h,2,q) operand and
  are transposed to (q,2) columns in-register (a single small relayout
  instead of two 1-D lane->sublane transposes);
- decay math fp32, matmul operands cast to the activation dtype (bf16 in
  the perf preset) with fp32 MXU accumulation — bit-for-bit the same
  dtype discipline as ``ssd_chunked``.

Backward (custom VJP) iterates chunks in REVERSE grid order, recomputes
the in-chunk decay mask from S, runs the reverse state recurrence
  dh_in[c] = exp(S_end[c]) * dh_out[c] + (C * exp(S))^T @ dy[c]
through scratch, and emits dense dx plus per-(b,nc,h) partials for dt/S
that a cheap XLA reduction finishes. All A-dependence flows through
S = cumsum(dt*A), which the wrapper computes OUTSIDE the custom_vjp
boundary — autodiff chains dS -> (ddt, dA) for free.

Scalar decay factors use rank-0 extraction (``sd[0, q-1]``): Mosaic
lowers scalar*vector as a splat, while a (1,1) vector broadcast to (n,p)
is "broadcast in both sublanes and lanes" — not implemented (the
BENCH_r03 MosaicError).

No reference counterpart (the reference is Mamba-1 only); this implements
the SSD math of ops/ssd.py, which is itself beyond-reference and opt-in.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_F32 = jnp.float32


def ssd_fused_supported(l: int, chunk: int, d_state: int, head_dim: int) -> bool:
    """Mosaic lane/tile constraints for the COMPILED kernel (interpret mode
    handles any shape): full-lane state/head dims and a sublane-aligned
    chunk that divides L."""
    return (l % chunk == 0 and chunk % 8 == 0 and chunk >= 8
            and d_state % 128 == 0 and head_dim % 128 == 0)


def _tri(q):
    rows = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    cols = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    return rows >= cols


def _decay_mask(S_col, S_row):
    """M[t,s] = exp(S[t]-S[s]) for s<=t else 0 — masked in LOG space
    (see ops/ssd.py: post-exp masking turns inf*0 into NaN)."""
    q = S_row.shape[1]
    logM = S_col - S_row  # (q,1)-(1,q) -> (q,q)
    return jnp.exp(jnp.where(_tri(q), logM, -jnp.inf))


def _head_sd(sd_ref, j):
    """Per-head decay columns from the (1,1,h,2,q) SD block: returns
    (S_col, dt_col, S_row, Send, send_scalar)."""
    sd = sd_ref[0, 0, j].astype(_F32)           # (2, q): rows [S; dt]
    sdT = sd.T                                   # (q, 2)
    S_col, dt_col = sdT[:, 0:1], sdT[:, 1:2]     # (q, 1)
    S_row = sd[0:1, :]                           # (1, q)
    q = S_row.shape[1]
    Send = sd[0:1, q - 1:q]                      # (1, 1)
    return S_col, dt_col, S_row, Send, sd[0, q - 1]


def _head_sd3(sd_ref, j):
    """Per-head columns from the (1,1,h,3,q) SD block (rows [S; dt; D]):
    returns (S_col, dt_col, S_row, send_scalar, d_scalar)."""
    sd = sd_ref[0, 0, j].astype(_F32)            # (3, q)
    sdT = sd.T                                   # (q, 3)
    S_col, dt_col = sdT[:, 0:1], sdT[:, 1:2]     # (q, 1)
    S_row = sd[0:1, :]                           # (1, q)
    q = S_row.shape[1]
    return S_col, dt_col, S_row, sd[0, q - 1], sd[2, 0]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _make_fwd_kernel(h, p, emit_states, emit_hfin, mm):
    def kernel(sd_ref, x_ref, b_ref, c_ref, *outs_scratch):
        refs = list(outs_scratch)
        hc = refs.pop()                          # VMEM scratch (h, n, p) f32

        @pl.when(pl.program_id(1) == 0)
        def _():
            hc[...] = jnp.zeros_like(hc)

        B = b_ref[0, 0]                          # (q, n) mm dtype
        C = c_ref[0, 0]
        # head-shared attention scores — ONE matmul for all heads
        G = lax.dot_general(C, B, (((1,), (1,)), ((), ())),
                            preferred_element_type=_F32)       # (q, q)
        for j in range(h):
            S_col, dt_col, S_row, _, send = _head_sd(sd_ref, j)
            x = x_ref[0][:, j * p:(j + 1) * p]   # (q, p) mm dtype
            xdt = (x.astype(_F32) * dt_col).astype(mm)
            GM = (G * _decay_mask(S_col, S_row)).astype(mm)
            y_intra = lax.dot_general(GM, xdt, (((1,), (0,)), ((), ())),
                                      preferred_element_type=_F32)  # (q, p)
            h_in = hc[j]                         # (n, p) f32
            y_inter = lax.dot_general(C, h_in.astype(mm),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=_F32)
            y = y_intra + y_inter * jnp.exp(S_col)

            T_end = jnp.exp(send - S_col)        # (q, 1)
            xdt_dec = (xdt.astype(_F32) * T_end).astype(mm)
            states = lax.dot_general(B, xdt_dec, (((0,), (0,)), ((), ())),
                                     preferred_element_type=_F32)   # (n, p)
            hc[j] = jnp.exp(send) * h_in + states
            refs[0][0, :, j * p:(j + 1) * p] = y.astype(refs[0].dtype)
            if emit_states:
                refs[1][0, 0, j] = h_in
        if emit_hfin:
            # same (b,) block every chunk, c innermost: the LAST write
            # (the slice's final state) is what lands in HBM
            refs[1 + bool(emit_states)][0] = hc[...]
    return kernel


def _fwd_call(SD, x, Bc, Cc, interpret, emit_states=True, emit_hfin=False):
    """``x`` is the NATIVE (b, l, h*p) sequence layout; ``SD`` is
    (b, nc, h, 2, q). ``emit_states=False`` (inference / undifferentiated
    primal) skips the (b,nc,h,n,p) fp32 per-chunk-state output — XLA
    cannot DCE a custom-call output, and at production geometry it is
    ~50 MB of pure HBM write per layer that only the backward reads.
    ``emit_hfin`` adds the slice-final (b,h,n,p) state (sequence
    parallelism's carry)."""
    b, nc, h, _, q = SD.shape
    n = Bc.shape[-1]
    d = x.shape[-1]
    p = d // h
    mm = x.dtype
    grid = (b, nc)
    blk_sd = lambda i, c: (i, c, 0, 0, 0)
    blk_x = lambda i, c: (i, c, 0)
    blk_bc = lambda i, c: (i, c, 0, 0)
    blk_b = lambda i, c: (i, 0, 0, 0)
    out_specs = [pl.BlockSpec((1, q, d), blk_x, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    if emit_states:
        out_specs.append(pl.BlockSpec((1, 1, h, n, p), blk_sd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, nc, h, n, p), _F32))
    if emit_hfin:
        out_specs.append(pl.BlockSpec((1, h, n, p), blk_b,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h, n, p), _F32))
    out = pl.pallas_call(
        _make_fwd_kernel(h, p, emit_states, emit_hfin, mm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, h, 2, q), blk_sd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, d), blk_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, n), blk_bc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, n), blk_bc, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((h, n, p), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(SD, x, Bc, Cc)
    out = list(out) if isinstance(out, (list, tuple)) else [out]
    y = out.pop(0)
    h_in = out.pop(0) if emit_states else None
    h_fin = out.pop(0) if emit_hfin else None
    return y, h_in, h_fin


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _make_bwd_kernel(h, p, seed, mm):
    """``seed=True`` takes an extra (b,h,n,p) input — the cotangent of the
    slice-final state (return_carry path) — to seed the reverse carry;
    ``seed=False`` starts it at zero without paying that input's HBM reads."""
    if seed:
        def kernel(sd_ref, x_ref, b_ref, c_ref, hin_ref, dy_ref, dhf_ref,
                   dx_ref, dsdt_ref, db_ref, dc_ref, dhc):
            @pl.when(pl.program_id(1) == 0)
            def _():
                dhc[...] = dhf_ref[0]  # dL/dh_out of the LAST chunk

            _bwd_body(h, p, sd_ref, x_ref, b_ref, c_ref, hin_ref, dy_ref,
                      dx_ref, dsdt_ref, db_ref, dc_ref, dhc, mm)
    else:
        def kernel(sd_ref, x_ref, b_ref, c_ref, hin_ref, dy_ref,
                   dx_ref, dsdt_ref, db_ref, dc_ref, dhc):
            @pl.when(pl.program_id(1) == 0)
            def _():
                dhc[...] = jnp.zeros_like(dhc)

            _bwd_body(h, p, sd_ref, x_ref, b_ref, c_ref, hin_ref, dy_ref,
                      dx_ref, dsdt_ref, db_ref, dc_ref, dhc, mm)
    return kernel


def _bwd_head(sd, x, h_in, dy, dh_out, B, C, G, mm, d_j=None):
    """Shared per-head backward math of BOTH kernel variants (split and
    xbc) — one body so the two cannot drift numerically (advisor r4). The
    ONLY variant-specific term is the optional in-kernel D-skip grad
    (``d_j`` set): dx gains ``d_j*dy`` and a scalar dD partial is returned.

    ``sd`` = (S_col (q,1), dt_col (q,1), S_row (1,q), send scalar).
    Returns (dx_cols (q,p), dS_final (1,q), ddt_row (1,q), dD scalar|None,
    dB_part (q,n), dC_part (q,n), dh_new (n,p))."""
    S_col, dt_col, S_row, send = sd
    E_col = jnp.exp(S_col)
    T_end = jnp.exp(send - S_col)

    # the reverse state carry (dh_out) stays fp32 through every product it
    # enters — the XLA oracle's mixed bf16*f32 einsums promote to f32
    # there, and bf16-rounding dh measurably degrades the dt grads
    # (cancellation in the dS sums amplifies the 0.4% rounding to
    # ~30% on a few elements)
    x32 = x.astype(_F32)
    dy32 = dy.astype(_F32)
    xdt32 = x32 * dt_col
    xdt = xdt32.astype(mm)
    M = _decay_mask(S_col, S_row)
    GM = G * M                               # (q,q) f32, zero off-tril

    # dxdt = GM^T @ dy + (B @ dh_out) * T_end
    t1 = lax.dot_general(GM.astype(mm), dy, (((0,), (0,)), ((), ())),
                         preferred_element_type=_F32)          # (q, p)
    Bdh = lax.dot_general(B.astype(_F32), dh_out,
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=_F32)         # (q, p)
    dxdt = t1 + Bdh * T_end
    dx_cols = dxdt * dt_col
    dD = None
    if d_j is not None:
        dx_cols = dx_cols + d_j * dy32       # in-kernel D-skip grad
        dD = jnp.sum(dy32 * x32)             # scalar D-skip grad partial
    ddt_col = jnp.sum(dxdt * x32, axis=1, keepdims=True)       # (q, 1)

    # dGM = dy @ xdt^T ; dG = dGM * M ; dlogM = dGM * GM
    dGM = lax.dot_general(dy, xdt, (((1,), (1,)), ((), ())),
                          preferred_element_type=_F32)         # (q_t, q_s)
    dG = dGM * M
    dlogM = dGM * GM

    # dC += dG @ B + (dy @ h_in^T) * E ; dB += dG^T @ C + xdt_dec @ dh^T
    h_mm = h_in.astype(mm)
    dC_part = (lax.dot_general(dG.astype(mm), B, (((1,), (0,)), ((), ())),
                               preferred_element_type=_F32)
               + lax.dot_general(dy, h_mm, (((1,), (1,)), ((), ())),
                                 preferred_element_type=_F32) * E_col)
    xdt_dec = xdt.astype(_F32) * T_end  # bf16-rounded xdt (matches fwd)
    dB_part = (lax.dot_general(dG.astype(mm), C, (((0,), (0,)), ((), ())),
                               preferred_element_type=_F32)
               + lax.dot_general(xdt_dec, dh_out, (((1,), (1,)), ((), ())),
                                 preferred_element_type=_F32))

    # dS: mask rows/cols + exp(S) factor + T_end + chunk-decay terms
    Chin = lax.dot_general(C, h_mm, (((1,), (0,)), ((), ())),
                           preferred_element_type=_F32)        # (q, p)
    dE = jnp.sum(dy32 * Chin, axis=1, keepdims=True)
    dT = jnp.sum(Bdh * xdt32, axis=1, keepdims=True)           # (q, 1)
    dS_col = (jnp.sum(dlogM, axis=1, keepdims=True)            # t-row sums
              + dE * E_col - dT * T_end)
    dS_row_neg = jnp.sum(dlogM, axis=0, keepdims=True)         # s-col sums
    dSend = (jnp.sum(dT * T_end) +
             jnp.exp(send) * jnp.sum(dh_out * h_in))           # scalar

    q = S_row.shape[1]
    two = jnp.concatenate([dS_col, ddt_col], axis=1)           # (q, 2)
    twoT = two.T                                               # (2, q)
    is_end = (lax.broadcasted_iota(jnp.int32, (1, q), 1) == q - 1)
    dS_final = twoT[0:1] - dS_row_neg + jnp.where(is_end, dSend, 0.0)

    # carry: dh_in = exp(Send) * dh_out + (C * E)^T @ dy  (fp32
    # operands — this is the long-range product chain; see the dh_out
    # note above). Scalar (rank-0) decay factor: see module docstring.
    Ceff = C.astype(_F32) * E_col
    dh_new = jnp.exp(send) * dh_out + lax.dot_general(
        Ceff, dy32, (((0,), (0,)), ((), ())),
        preferred_element_type=_F32)
    return dx_cols, dS_final, twoT[1:2], dD, dB_part, dC_part, dh_new


def _bwd_body(h, p, sd_ref, x_ref, b_ref, c_ref, hin_ref, dy_ref,
              dx_ref, dsdt_ref, db_ref, dc_ref, dhc, mm):
    B = b_ref[0, 0]
    C = c_ref[0, 0]
    q, n = B.shape
    # head-shared scores, hoisted exactly like the forward
    G = lax.dot_general(C, B, (((1,), (1,)), ((), ())),
                        preferred_element_type=_F32)
    # head-shared dB/dC accumulate in registers; ONE (q,n) write each
    dB_acc = jnp.zeros((q, n), _F32)
    dC_acc = jnp.zeros((q, n), _F32)
    for j in range(h):
        S_col, dt_col, S_row, _, send = _head_sd(sd_ref, j)
        x = x_ref[0][:, j * p:(j + 1) * p]       # (q, p) mm
        h_in = hin_ref[0, 0, j]                  # (n, p) f32
        dy = dy_ref[0][:, j * p:(j + 1) * p]     # (q, p) mm
        dh_out = dhc[j]                          # (n, p) f32

        dx_cols, dS_final, ddt_row, _, dB_part, dC_part, dh_new = _bwd_head(
            (S_col, dt_col, S_row, send), x, h_in, dy, dh_out, B, C, G, mm)
        dx_ref[0, :, j * p:(j + 1) * p] = dx_cols.astype(dx_ref.dtype)
        dsdt_ref[0, 0, j] = jnp.concatenate([dS_final, ddt_row], axis=0)
        dB_acc += dB_part
        dC_acc += dC_part
        dhc[j] = dh_new
    db_ref[0, 0] = dB_acc
    dc_ref[0, 0] = dC_acc


def _bwd_call(SD, x, Bc, Cc, h_in, dy, interpret, dh_fin=None):
    """``x``/``dy``/``dx`` ride the native (b, l, h*p) layout (see
    ``_fwd_call``); the chunk grid axis is REVERSED so the state cotangent
    threads back through scratch. dB/dC come out head-summed (B/C are
    head-shared)."""
    b, nc, h, _, q = SD.shape
    n = Bc.shape[-1]
    d = x.shape[-1]
    p = d // h
    mm = x.dtype
    grid = (b, nc)

    def rev_sd(i, c):
        return (i, nc - 1 - c, 0, 0, 0)

    def rev_x(i, c):
        return (i, nc - 1 - c, 0)

    def rev_bc(i, c):
        return (i, nc - 1 - c, 0, 0)

    in_specs = [
        pl.BlockSpec((1, 1, h, 2, q), rev_sd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d), rev_x, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, q, n), rev_bc, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, q, n), rev_bc, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h, n, p), rev_sd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d), rev_x, memory_space=pltpu.VMEM),
    ]
    inputs = [SD, x, Bc, Cc, h_in, dy]
    if dh_fin is not None:
        in_specs.append(pl.BlockSpec((1, h, n, p), lambda i, c: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(dh_fin)
    dx, dsdt, dB, dC = pl.pallas_call(
        _make_bwd_kernel(h, p, dh_fin is not None, mm),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, q, d), rev_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, 2, q), rev_sd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, n), rev_bc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, q, n), rev_bc, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((b, nc, h, 2, q), _F32),
            jax.ShapeDtypeStruct((b, nc, q, n), _F32),
            jax.ShapeDtypeStruct((b, nc, q, n), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((h, n, p), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return dx, dsdt, dB, dC


# ---------------------------------------------------------------------------
# custom-VJP wrapper (native-layout chunked operands)
# ---------------------------------------------------------------------------

def _stack_sd(S, dt):
    # (b,h,nc,q) x2 -> (b,nc,h,2,q): ~1.6 MB f32 at the bench geometry
    return jnp.stack([S, dt], axis=-2).transpose(0, 2, 1, 3, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ssd_fused(x, dt, S, Bc, Cc, interpret=False):
    """x (b, l, h*p) NATIVE sequence layout, activation dtype; dt/S
    (b,h,nc,q) f32 (S = per-chunk inclusive cumsum of dt*A); Bc/Cc
    (b,nc,q,n) activation dtype. Returns y (b, l, h*p) in the activation
    dtype (no D-skip)."""
    y, _, _ = _fwd_call(_stack_sd(S, dt), x, Bc, Cc, interpret,
                        emit_states=False)
    return y


def _ssd_fused_fwd(x, dt, S, Bc, Cc, interpret):
    SD = _stack_sd(S, dt)  # (b,nc,h,2,q) f32
    y, h_in, _ = _fwd_call(SD, x, Bc, Cc, interpret)
    return y, (SD, x, Bc, Cc, h_in)


def _split_bwd(res, dy, interpret, dh_fin=None):
    SD, x, Bc, Cc, h_in = res
    dx, dsdt, dB, dC = _bwd_call(SD, x, Bc, Cc, h_in,
                                 dy.astype(x.dtype), interpret,
                                 dh_fin=dh_fin)
    # (b,nc,h,2,q) -> (b,h,nc,q) per row; dB/dC already head-summed
    dS = dsdt[:, :, :, 0].transpose(0, 2, 1, 3)
    ddt = dsdt[:, :, :, 1].transpose(0, 2, 1, 3)
    return dx, ddt, dS, dB.astype(Bc.dtype), dC.astype(Cc.dtype)


def _ssd_fused_bwd(interpret, res, dy):
    return _split_bwd(res, dy, interpret)


_ssd_fused.defvjp(_ssd_fused_fwd, _ssd_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _ssd_fused_carry(x, dt, S, Bc, Cc, interpret=False):
    """Like ``_ssd_fused`` but also returns the slice-final state h_fin
    (b,h,n,p) fp32 — the sequence-parallel carry. Its cotangent seeds the
    reverse state chain in the backward kernel."""
    # Undifferentiated primal (inference): skip the per-chunk-state
    # output the backward would read — XLA cannot DCE a custom-call output.
    y, _, h_fin = _fwd_call(_stack_sd(S, dt), x, Bc, Cc, interpret,
                            emit_states=False, emit_hfin=True)
    return y, h_fin


def _ssd_fused_carry_fwd(x, dt, S, Bc, Cc, interpret):
    SD = _stack_sd(S, dt)
    y, h_in, h_fin = _fwd_call(SD, x, Bc, Cc, interpret, emit_states=True,
                               emit_hfin=True)
    return (y, h_fin), (SD, x, Bc, Cc, h_in)


def _ssd_fused_carry_bwd(interpret, res, cts):
    dy, dh_fin = cts
    return _split_bwd(res, dy, interpret, dh_fin=dh_fin.astype(_F32))


_ssd_fused_carry.defvjp(_ssd_fused_carry_fwd, _ssd_fused_carry_bwd)


@functools.partial(jax.jit,
                   static_argnames=("chunk", "return_carry", "interpret"))
def ssd_chunked_pallas(x, dt, A, Bm, Cm, D, *, chunk: int = 128,
                       return_carry: bool = False,
                       interpret: bool = False):
    """Drop-in for ``ops.ssd.ssd_chunked`` (same shapes/semantics incl.
    ``return_carry`` for sequence parallelism) backed by the fused
    VMEM-resident kernel. L must be a chunk multiple (callers pad);
    compiled mode additionally needs ``ssd_fused_supported``.
    """
    in_dtype = x.dtype
    mm = in_dtype if in_dtype == jnp.bfloat16 else _F32
    b, l, h, p = x.shape
    n = Bm.shape[-1]
    assert l % chunk == 0, (l, chunk)
    nc, q = l // chunk, chunk

    # (b,l,h,p) -> (b,l,h*p) is a FREE contiguous reshape; the kernel's
    # head loop slices each head's (q,p) chunk out of the native layout,
    # so no head-major transpose of the 25 MB activation is materialized
    # (the dt transpose below is (b,l,h) — ~0.4 MB, noise)
    xf = x.reshape(b, l, h * p).astype(mm)
    dth = dt.astype(_F32).transpose(0, 2, 1).reshape(b, h, nc, q)
    Bc = Bm.reshape(b, nc, q, n).astype(mm)
    Cc = Cm.reshape(b, nc, q, n).astype(mm)
    # per-chunk inclusive cumsum of dt*A — OUTSIDE the custom_vjp, so
    # autodiff routes dS into (ddt, dA) without kernel involvement
    S = jnp.cumsum(dth * A.astype(_F32)[None, :, None, None], axis=-1)

    if return_carry:
        y, h_fin = _ssd_fused_carry(xf, dth, S, Bc, Cc, interpret)
    else:
        y = _ssd_fused(xf, dth, S, Bc, Cc, interpret)
    y = y.reshape(b, l, h, p).astype(in_dtype)
    y = y + D[None, None, :, None].astype(in_dtype) * x
    if return_carry:
        # total slice decay: sum of every chunk's last cumsum entry
        # (matches ops/ssd.ssd_chunked's return_carry contract)
        total_decay = jnp.exp(S[..., -1].sum(-1))  # (b,h)
        return y, total_decay, h_fin
    return y


# ---------------------------------------------------------------------------
# boundary-fused variant: un-split (x|B|C) operand + in-kernel D-skip
# ---------------------------------------------------------------------------
# The mixer's conv emits ONE (b, l, d_inner + 2n) buffer; the split into
# x/B/C (and the matching pad+concat of their grads) costs ~3-4 ms/step of
# pure HBM copies at the bench geometry (benchmarks/profile_ssd_fused_step
# .json: per-layer pad_maximum/split fusions on (32,512,1024) bf16). All
# three column groups are 128-lane aligned, so the kernel slices them out
# of one VMEM block and the backward writes dx/dB/dC into disjoint columns
# of ONE dxbc output. The per-head D-skip (y += D[h]*x) rides the head
# loop (x is already resident), so the wrapper returns the finished mixer
# core output with zero extra elementwise passes.


def _make_fwd_kernel_xbc(h, p, d, n, emit_states, emit_hfin, mm):
    def kernel(sd_ref, xbc_ref, *outs_scratch):
        refs = list(outs_scratch)
        hc = refs.pop()                          # VMEM scratch (h, n, p) f32

        @pl.when(pl.program_id(1) == 0)
        def _():
            hc[...] = jnp.zeros_like(hc)

        blk = xbc_ref[0]                         # (q, d + 2n) mm dtype
        B = blk[:, d:d + n]                      # (q, n)
        C = blk[:, d + n:d + 2 * n]
        G = lax.dot_general(C, B, (((1,), (1,)), ((), ())),
                            preferred_element_type=_F32)       # (q, q)
        for j in range(h):
            S_col, dt_col, S_row, send, d_j = _head_sd3(sd_ref, j)
            x = blk[:, j * p:(j + 1) * p]        # (q, p)
            x32 = x.astype(_F32)
            xdt = (x32 * dt_col).astype(mm)
            GM = (G * _decay_mask(S_col, S_row)).astype(mm)
            y_intra = lax.dot_general(GM, xdt, (((1,), (0,)), ((), ())),
                                      preferred_element_type=_F32)
            h_in = hc[j]                         # (n, p) f32
            y_inter = lax.dot_general(C, h_in.astype(mm),
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=_F32)
            y = y_intra + y_inter * jnp.exp(S_col) + d_j * x32

            T_end = jnp.exp(send - S_col)        # (q, 1)
            xdt_dec = (xdt.astype(_F32) * T_end).astype(mm)
            states = lax.dot_general(B, xdt_dec, (((0,), (0,)), ((), ())),
                                     preferred_element_type=_F32)
            hc[j] = jnp.exp(send) * h_in + states
            refs[0][0, :, j * p:(j + 1) * p] = y.astype(refs[0].dtype)
            if emit_states:
                refs[1][0, 0, j] = h_in
        if emit_hfin:
            # same (b,) block every chunk, c innermost: the LAST write
            # (the slice's final state) is what lands in HBM
            refs[1 + bool(emit_states)][0] = hc[...]
    return kernel


def _fwd_call_xbc(SD, xbc, d, interpret, emit_states=True, emit_hfin=False):
    b, nc, h, _, q = SD.shape
    total = xbc.shape[-1]
    n = (total - d) // 2
    p = d // h
    mm = xbc.dtype
    blk_sd = lambda i, c: (i, c, 0, 0, 0)
    blk_x = lambda i, c: (i, c, 0)
    blk_b = lambda i, c: (i, 0, 0, 0)
    out_specs = [pl.BlockSpec((1, q, d), blk_x, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((b, nc * q, d), xbc.dtype)]
    if emit_states:
        out_specs.append(pl.BlockSpec((1, 1, h, n, p), blk_sd,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, nc, h, n, p), _F32))
    if emit_hfin:
        out_specs.append(pl.BlockSpec((1, h, n, p), blk_b,
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((b, h, n, p), _F32))
    out = pl.pallas_call(
        _make_fwd_kernel_xbc(h, p, d, n, emit_states, emit_hfin, mm),
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((1, 1, h, 3, q), blk_sd, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, total), blk_x, memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((h, n, p), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(SD, xbc)
    out = list(out) if isinstance(out, (list, tuple)) else [out]
    y = out.pop(0)
    h_in = out.pop(0) if emit_states else None
    h_fin = out.pop(0) if emit_hfin else None
    return y, h_in, h_fin


def _make_bwd_kernel_xbc(h, p, d, n, seed, mm):
    """xbc backward: the per-head math is ``_bwd_head`` (shared with the
    split kernel), plus the in-kernel D-skip grad (``d_j``) and the 3-row
    dsdt layout. ``seed=True`` takes the slice-final state cotangent input
    (return_carry path), mirroring ``_make_bwd_kernel``."""
    def body(sd_ref, xbc_ref, hin_ref, dy_ref, dxbc_ref, dsdt_ref, dhc):
        blk = xbc_ref[0]                         # (q, d + 2n)
        B = blk[:, d:d + n]
        C = blk[:, d + n:d + 2 * n]
        q = B.shape[0]
        G = lax.dot_general(C, B, (((1,), (1,)), ((), ())),
                            preferred_element_type=_F32)
        dB_acc = jnp.zeros((q, n), _F32)
        dC_acc = jnp.zeros((q, n), _F32)
        for j in range(h):
            S_col, dt_col, S_row, send, d_j = _head_sd3(sd_ref, j)
            x = blk[:, j * p:(j + 1) * p]
            h_in = hin_ref[0, 0, j]              # (n, p) f32
            dy = dy_ref[0][:, j * p:(j + 1) * p]
            dh_out = dhc[j]                      # (n, p) f32 (see _bwd_head)

            (dx_cols, dS_final, ddt_row, dD, dB_part, dC_part,
             dh_new) = _bwd_head((S_col, dt_col, S_row, send), x, h_in,
                                 dy, dh_out, B, C, G, mm, d_j=d_j)
            dxbc_ref[0, :, j * p:(j + 1) * p] = dx_cols.astype(
                dxbc_ref.dtype)
            pos = lax.broadcasted_iota(jnp.int32, (1, q), 1)
            dD_row = jnp.where(pos == 0, dD, 0.0)              # (1, q)
            dsdt_ref[0, 0, j] = jnp.concatenate(
                [dS_final, ddt_row, dD_row], axis=0)           # (3, q)
            dB_acc += dB_part
            dC_acc += dC_part
            dhc[j] = dh_new
        dxbc_ref[0, :, d:d + n] = dB_acc.astype(dxbc_ref.dtype)
        dxbc_ref[0, :, d + n:d + 2 * n] = dC_acc.astype(dxbc_ref.dtype)

    if seed:
        def kernel(sd_ref, xbc_ref, hin_ref, dy_ref, dhf_ref,
                   dxbc_ref, dsdt_ref, dhc):
            @pl.when(pl.program_id(1) == 0)
            def _():
                dhc[...] = dhf_ref[0]  # dL/dh_out of the LAST chunk

            body(sd_ref, xbc_ref, hin_ref, dy_ref, dxbc_ref, dsdt_ref, dhc)
    else:
        def kernel(sd_ref, xbc_ref, hin_ref, dy_ref,
                   dxbc_ref, dsdt_ref, dhc):
            @pl.when(pl.program_id(1) == 0)
            def _():
                dhc[...] = jnp.zeros_like(dhc)

            body(sd_ref, xbc_ref, hin_ref, dy_ref, dxbc_ref, dsdt_ref, dhc)
    return kernel


def _bwd_call_xbc(SD, xbc, h_in, dy, d, interpret, dh_fin=None):
    b, nc, h, _, q = SD.shape
    total = xbc.shape[-1]
    n = (total - d) // 2
    p = d // h
    mm = xbc.dtype

    rev_sd = lambda i, c: (i, nc - 1 - c, 0, 0, 0)
    rev_x = lambda i, c: (i, nc - 1 - c, 0)
    in_specs = [
        pl.BlockSpec((1, 1, h, 3, q), rev_sd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, total), rev_x, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, h, n, p), rev_sd, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d), rev_x, memory_space=pltpu.VMEM),
    ]
    inputs = [SD, xbc, h_in, dy]
    if dh_fin is not None:
        in_specs.append(pl.BlockSpec((1, h, n, p), lambda i, c: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(dh_fin)
    dxbc, dsdt = pl.pallas_call(
        _make_bwd_kernel_xbc(h, p, d, n, dh_fin is not None, mm),
        grid=(b, nc),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, q, total), rev_x, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, 3, q), rev_sd, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(xbc.shape, xbc.dtype),
            jax.ShapeDtypeStruct((b, nc, h, 3, q), _F32),
        ],
        scratch_shapes=[pltpu.VMEM((h, n, p), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(*inputs)
    return dxbc, dsdt


def _stack_sdd(S, dt, Dv):
    # (b,h,nc,q) x2 + (h,) -> (b,nc,h,3,q) rows [S; dt; D-broadcast]
    Drow = jnp.broadcast_to(Dv[None, :, None, None], S.shape)
    return jnp.stack([S, dt, Drow], axis=-2).transpose(0, 2, 1, 3, 4)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ssd_fused_xbc(xbc, dt, S, Dv, d, interpret=False):
    """xbc (b, l, d + 2n) NATIVE un-split conv output (cols [x | B | C]),
    activation dtype; dt/S (b,h,nc,q) f32; Dv (h,) f32 skip weights; ``d``
    = d_inner (static). Returns the finished mixer core y (b, l, d)
    INCLUDING the D-skip, in the activation dtype."""
    y, _, _ = _fwd_call_xbc(_stack_sdd(S, dt, Dv), xbc, d, interpret,
                            emit_states=False)
    return y


def _ssd_fused_xbc_fwd(xbc, dt, S, Dv, d, interpret):
    SD = _stack_sdd(S, dt, Dv)
    y, h_in, _ = _fwd_call_xbc(SD, xbc, d, interpret)
    return y, (SD, xbc, h_in)


def _xbc_bwd(res, dy, d, interpret, dh_fin=None):
    SD, xbc, h_in = res
    dxbc, dsdt = _bwd_call_xbc(SD, xbc, h_in, dy.astype(xbc.dtype), d,
                               interpret, dh_fin=dh_fin)
    dS = dsdt[:, :, :, 0].transpose(0, 2, 1, 3)    # (b,h,nc,q)
    ddt = dsdt[:, :, :, 1].transpose(0, 2, 1, 3)
    dD = dsdt[:, :, :, 2, 0].sum(axis=(0, 1))      # (h,)
    return dxbc, ddt, dS, dD


def _ssd_fused_xbc_bwd(d, interpret, res, dy):
    return _xbc_bwd(res, dy, d, interpret)


_ssd_fused_xbc.defvjp(_ssd_fused_xbc_fwd, _ssd_fused_xbc_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _ssd_fused_xbc_carry(xbc, dt, S, Dv, d, interpret=False):
    """Like ``_ssd_fused_xbc`` but also returns the slice-final state h_fin
    (b,h,n,p) fp32 — the sequence-parallel carry (mirrors
    ``_ssd_fused_carry`` on the split kernel)."""
    y, _, h_fin = _fwd_call_xbc(_stack_sdd(S, dt, Dv), xbc, d, interpret,
                                emit_states=False, emit_hfin=True)
    return y, h_fin


def _ssd_fused_xbc_carry_fwd(xbc, dt, S, Dv, d, interpret):
    SD = _stack_sdd(S, dt, Dv)
    y, h_in, h_fin = _fwd_call_xbc(SD, xbc, d, interpret, emit_states=True,
                                   emit_hfin=True)
    return (y, h_fin), (SD, xbc, h_in)


def _ssd_fused_xbc_carry_bwd(d, interpret, res, cts):
    dy, dh_fin = cts
    return _xbc_bwd(res, dy, d, interpret, dh_fin=dh_fin.astype(_F32))


_ssd_fused_xbc_carry.defvjp(_ssd_fused_xbc_carry_fwd, _ssd_fused_xbc_carry_bwd)


@functools.partial(jax.jit, static_argnames=("d_inner", "chunk",
                                             "return_carry", "interpret"))
def ssd_chunked_pallas_xbc(xbc, dt, A, D, *, d_inner: int, chunk: int = 128,
                           return_carry: bool = False,
                           interpret: bool = False):
    """Boundary-fused mixer core: takes the conv's un-split (b, l,
    d_inner + 2n) output directly (no x/B/C split copies; the backward
    emits ONE dxbc buffer) and applies the per-head D-skip in-kernel.
    Same math as ``ssd_chunked_pallas`` + D-skip; L must be a chunk
    multiple and the geometry must pass ``ssd_fused_supported``.

    ``return_carry`` adds the (total_decay (b,h), h_fin (b,h,n,p)) affine
    map of the slice — the same contract as ``ops.ssd.ssd_chunked`` — for
    a future joint-buffer sequence-parallel mixer route. NOTE the existing
    parallel wrappers (``parallel/seq_scan._ssd_local``,
    ``parallel/tensor_parallel._ssd_mixer_local``) deliberately keep the
    split kernel: their operands arrive ALREADY split (separate shard_map
    inputs / separate per-shard projections), so the xbc form would add a
    (x|B|C) concat instead of removing one."""
    in_dtype = xbc.dtype
    mm = in_dtype if in_dtype == jnp.bfloat16 else _F32
    b, l, _ = xbc.shape
    h = dt.shape[-1]
    assert l % chunk == 0, (l, chunk)
    nc, q = l // chunk, chunk
    dth = dt.astype(_F32).transpose(0, 2, 1).reshape(b, h, nc, q)
    S = jnp.cumsum(dth * A.astype(_F32)[None, :, None, None], axis=-1)
    if return_carry:
        y, h_fin = _ssd_fused_xbc_carry(xbc.astype(mm), dth, S,
                                        D.astype(_F32), d_inner, interpret)
        total_decay = jnp.exp(S[..., -1].sum(-1))  # (b,h)
        return y.astype(in_dtype), total_decay, h_fin
    y = _ssd_fused_xbc(xbc.astype(mm), dth, S, D.astype(_F32), d_inner,
                       interpret)
    return y.astype(in_dtype)
