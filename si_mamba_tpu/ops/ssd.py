"""Chunked scalar-decay SSM (SSD / "Mamba-2-style") — an MXU-native mixer.

WHY (beyond-reference, opt-in): the reference's Mamba-1 selective scan has a
per-(channel, state) decay `exp(Δ[t,d]·A[d,n])`, which blocks any matmul
reformulation — the train step is VPU-bound at ~84% of the measured v5e VPU
roofline (benchmarks/ROOFLINE.md). Restricting the decay to ONE scalar per
head (the SSD structure of Mamba-2, Dao & Gu 2024) turns the whole
recurrence into chunked dense matmuls that ride the 197 TFLOP/s MXU instead
of the 1.25 Tops/s VPU. This module provides that algorithmic escape hatch
as an opt-in mixer (`PointMambaConfig.mixer='ssd'`); it is NOT the
reference architecture and carries no parity claim — the Mamba-1 path
stays the default everywhere.

Math. Per head h with state size N and head dim P, inclusive log-decay
cumsum S[t] = Σ_{r≤t} Δ[r]·A (A < 0 scalar per head):

    h[t] = e^{Δ[t]A} h[t-1] + Δ[t]·B[t]⊗x[t]
    y[t] = C[t]·h[t] + D·x[t]
         = Σ_{s≤t} (C[t]·B[s]) e^{S[t]-S[s]} Δ[s] x[s] + D·x[t]

Split L into chunks of Q. Within a chunk the quadratic form
(C Bᵀ ⊙ decay-mask) @ (Δx) is a batched (Q×Q)@(Q×P) matmul; chunk-boundary
states B ᵀ@(decay⊙Δx) and their length-L/Q carry scan handle the rest.
All decays are ≤ 1 by construction (S is non-increasing), so nothing
overflows — no exponent recentering needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_F32 = jnp.float32


def ssd_scan_ref(x, dt, A, Bm, Cm, D):
    """Sequential oracle of the SSD recurrence (test reference, O(L) scan).

    x: (b, l, h, p) head inputs; dt: (b, l, h) post-softplus step sizes;
    A: (h,) negative scalars; Bm/Cm: (b, l, n) shared across heads (one
    B/C group); D: (h,) skip. Returns (b, l, h, p), fp32.
    """
    x, dt, Bm, Cm = (t.astype(_F32) for t in (x, dt, Bm, Cm))
    A = A.astype(_F32)
    b, l, h, p = x.shape
    n = Bm.shape[-1]

    def step(carry, inp):
        xt, dtt, bt, ct = inp  # (b,h,p) (b,h) (b,n) (b,n)
        decay = jnp.exp(dtt * A)  # (b,h)
        inject = (dtt[..., None] * xt)[:, :, None, :] * bt[:, None, :, None]
        carry = decay[:, :, None, None] * carry + inject  # (b,h,n,p)
        yt = jnp.einsum("bn,bhnp->bhp", ct, carry)
        return carry, yt

    h0 = jnp.zeros((b, h, n, p), _F32)
    xs = (x.transpose(1, 0, 2, 3), dt.transpose(1, 0, 2),
          Bm.transpose(1, 0, 2), Cm.transpose(1, 0, 2))
    _, ys = lax.scan(step, h0, xs)
    y = ys.transpose(1, 0, 2, 3)  # (b, l, h, p)
    return y + D[None, None, :, None].astype(_F32) * x


@functools.partial(jax.jit, static_argnames=("chunk", "return_carry"))
def ssd_chunked(x, dt, A, Bm, Cm, D, *, chunk: int = 64,
                return_carry: bool = False):
    """Chunked matmul SSD — same result as ``ssd_scan_ref`` (≤1e-5 rel).

    Shapes as in ``ssd_scan_ref``; L must be a multiple of ``chunk`` (the
    callers pad). Layout: the head axis is moved next to batch ONCE up
    front so every contraction is a plain (b·h·nc)-batched matmul — with
    heads minor, XLA lowers the masked-decay einsums through full-tensor
    transposes instead of the MXU. Decay/cumsum math runs fp32; matmul
    operands are cast back to the input dtype (bf16 halves the MXU cost
    and the HBM traffic of the (q,k) mask tensor).
    """
    in_dtype = x.dtype
    mm = in_dtype if in_dtype == jnp.bfloat16 else _F32
    A = A.astype(_F32)
    b, l, h, p = x.shape
    n = Bm.shape[-1]
    assert l % chunk == 0, (l, chunk)
    nc, q = l // chunk, chunk

    # head-major layouts, one transpose each. The big (l, d)-sized tensors
    # stay in the input dtype end-to-end (each fp32 materialization of a
    # (b,h,l,p) tensor is a 50 MB HBM round-trip); only the small decay
    # tensors (b,h,nc,q) and the matmul ACCUMULATORS are fp32.
    xh = x.transpose(0, 2, 1, 3).reshape(b, h, nc, q, p).astype(mm)
    dth = dt.astype(_F32).transpose(0, 2, 1).reshape(b, h, nc, q)
    Bc = Bm.reshape(b, nc, q, n).astype(mm)
    Cc = Cm.reshape(b, nc, q, n).astype(mm)

    S = jnp.cumsum(dth * A[None, :, None, None], axis=-1)  # (b,h,nc,q) <= 0
    xdt = xh * dth[..., None].astype(mm)  # (b,h,nc,q,p)

    # ---- intra-chunk: (C Bᵀ ⊙ decay-mask) @ Δx --------------------------
    G = jnp.einsum("bcqn,bckn->bcqk", Cc, Bc,
                   preferred_element_type=_F32)  # (b,nc,q,k)
    # decay s->t = exp(S[t]-S[s]) for s<=t, else 0. MASK IN LOG SPACE:
    # for s>t the exponent S[t]-S[s] is large POSITIVE (S is
    # non-increasing) and exp overflows to inf at production widths —
    # inf * 0 from a post-exp mask is NaN. exp(-inf) is an exact 0.
    logM = S[..., :, None] - S[..., None, :]  # (b,h,nc,q,k)
    tri = jnp.tril(jnp.ones((q, q), bool))
    M = jnp.exp(jnp.where(tri[None, None, None], logM, -jnp.inf))
    GM = (G[:, None] * M).astype(mm)  # (b,h,nc,q,k)
    y_intra = jnp.einsum("bhcqk,bhckp->bhcqp", GM, xdt,
                         preferred_element_type=_F32)

    # ---- chunk-boundary states + carry scan over chunks ------------------
    # state_c = Σ_s exp(S[end]-S[s]) B[s] ⊗ Δx[s]        (b,h,nc,n,p)
    T_end = jnp.exp(S[..., -1:] - S)  # (b,h,nc,q)
    xdt_dec = xdt * T_end[..., None].astype(mm)
    states = jnp.einsum("bcqn,bhcqp->bhcnp", Bc, xdt_dec,
                        preferred_element_type=_F32)
    chunk_decay = jnp.exp(S[..., -1])  # (b,h,nc)

    def carry_step(hprev, inp):
        st, dec = inp  # (b,h,n,p), (b,h)
        hout = dec[..., None, None] * hprev + st
        return hout, hprev  # emit the INCOMING state for this chunk

    h0 = jnp.zeros((b, h, n, p), _F32)
    h_fin, h_in = lax.scan(carry_step, h0,
                           (states.transpose(2, 0, 1, 3, 4),
                            chunk_decay.transpose(2, 0, 1)))
    h_in = h_in.transpose(1, 2, 0, 3, 4)  # (b,h,nc,n,p) state entering chunk

    # ---- inter-chunk: C[t] · exp(S[t]) · h_in ---------------------------
    y_inter = jnp.einsum("bcqn,bhcnp->bhcqp", Cc,
                         h_in.astype(mm), preferred_element_type=_F32)
    y_inter = y_inter * jnp.exp(S)[..., None]

    y = (y_intra + y_inter).astype(in_dtype)
    y = y.reshape(b, h, l, p).transpose(0, 2, 1, 3)
    y = y + D[None, None, :, None].astype(in_dtype) * x
    if return_carry:
        # carry across an OUTER time split (sequence parallelism): the total
        # decay over this slice and the final state from a zero init — the
        # recurrence is affine in h0, so callers fix outputs up as
        # y += C[t]·exp(S[t])·h0 without a second pass (parallel/seq_scan).
        # S is a PER-CHUNK cumsum: the slice total is the sum of every
        # chunk's last entry, not the last chunk's alone
        total_decay = jnp.exp(S[..., -1].sum(-1))  # (b,h) = exp(Σ_l Δ·A)
        return y, total_decay, h_fin
    return y


def ssd_fused_route(impl: str, l_padded: int, chunk: int, d_state: int,
                    head_dim: int, _interpret: bool = False) -> bool:
    """THE fused-kernel routing predicate, shared by every ``ssd_fused``
    call site (``ssd_mixer_apply``, ``parallel/seq_scan._ssd_local``,
    ``parallel/tensor_parallel._ssd_mixer_local``): interpret mode always
    routes (Mosaic tile constraints apply only to compiled kernels);
    compiled mode needs the TPU backend + a supported tile geometry.
    ``l_padded`` is the chunk-multiple sequence length the kernel will see."""
    if impl != "ssd_fused":
        return False
    if _interpret:
        return True
    from si_mamba_tpu.ops.pallas.ssd_kernel import ssd_fused_supported

    return (jax.default_backend() == "tpu"
            and ssd_fused_supported(l_padded, chunk, d_state, head_dim))


def ssd_fused_engaged(l: int, *, chunk: int = 128, d_state: int = 128,
                      head_dim: int = 128) -> bool:
    """True iff ``impl='ssd_fused'`` would actually route to the Pallas
    kernel for this geometry on the CURRENT backend (see
    ``ssd_fused_route``). Bench/profiler guard: without it an off-TPU or
    off-tile run silently measures the XLA fallback and reports it as a
    fused-kernel number (an A/A comparison)."""
    pad = (-l) % chunk
    return ssd_fused_route("ssd_fused", l + pad, chunk, d_state, head_dim)


def ssd_mixer_apply(params, u, *, n_heads: int, d_state: int,
                    chunk: int = 64, impl: str = "xla",
                    _interpret: bool = False):
    """Full SSD mixer: in_proj → conv/SiLU on (x,B,C) → chunked SSD →
    gated RMSNorm → out_proj. Layout mirrors the Mamba-2 block structure
    (public SSD formulation) re-expressed for XLA; see ``models/layers.
    SSDMixer`` for the flax wrapper and initializers.

    ``impl``: 'xla' (default, the chunked-einsum path above) or
    'ssd_fused' — the fused Pallas kernel (ops/pallas/ssd_kernel.py) that
    keeps the chunk recurrence VMEM-resident; falls back to XLA when the
    geometry misses the Mosaic tile constraints (``ssd_fused_supported``)
    or off-TPU. ``_interpret`` runs the kernel in interpret mode (tests).

    params keys: in_proj_w (d_model, 2*d_inner + 2*d_state + n_heads),
    conv_w (d_inner + 2*d_state, d_conv), conv_b, dt_bias (n_heads,),
    A_log (n_heads,), D (n_heads,), norm_scale (d_inner,),
    out_proj_w (d_inner, d_model). u: (b, l, d_model).
    """
    from si_mamba_tpu.ops.selective_scan import causal_conv1d

    cdt = u.dtype
    wcast = (lambda w: w.astype(cdt)) if cdt != _F32 else (lambda w: w)
    b, l, _ = u.shape
    zxbcdt = u @ wcast(params["in_proj_w"])
    d_inner = (zxbcdt.shape[-1] - 2 * d_state - n_heads) // 2
    head_p = d_inner // n_heads
    z, xbc, dt_raw = jnp.split(
        zxbcdt, [d_inner, 2 * d_inner + 2 * d_state], axis=-1)
    # joint causal conv + SiLU over (x, B, C) — one depthwise conv. Route
    # through the fused Pallas conv kernel on TPU (same 128-lane gate as
    # the Mamba-1 mixer, ops/selective_scan.py:275-283): the xbc width
    # d_inner + 2*d_state is 1024 at the production geometry, and the XLA
    # shifted-multiply conv is pure HBM-bound glue on a 25 MB tensor.
    conv_width = xbc.shape[-1]
    if (impl in ("xla", "ssd_fused") and not _interpret
            and jax.default_backend() == "tpu" and conv_width % 128 == 0):
        from si_mamba_tpu.ops.pallas.causal_conv_kernel import (
            causal_conv1d_silu_pallas,
        )

        xbc = causal_conv1d_silu_pallas(xbc, params["conv_w"],
                                        params["conv_b"])
    else:
        xbc = causal_conv1d(xbc, wcast(params["conv_w"]),
                            wcast(params["conv_b"]), activation="silu")
    dt = jax.nn.softplus(dt_raw.astype(_F32)
                         + params["dt_bias"][None, None, :])  # (b,l,h)
    A = -jnp.exp(params["A_log"].astype(_F32))  # (h,) negative

    # pad L to the chunk multiple (zero dt => zero decay-change + zero input)
    pad = (-l) % chunk
    if ssd_fused_route(impl, l + pad, chunk, d_state, head_p, _interpret):
        # boundary-fused kernel: xbc stays UN-SPLIT (the x/B/C split and
        # its grad pad+concat are ~3-4 ms/step of HBM copies at the bench
        # geometry) and the D-skip rides the kernel's head loop
        from si_mamba_tpu.ops.pallas.ssd_kernel import ssd_chunked_pallas_xbc

        if pad:
            xbc = jnp.pad(xbc, ((0, 0), (0, pad), (0, 0)))
            dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        y = ssd_chunked_pallas_xbc(xbc, dt, A, params["D"].astype(_F32),
                                   d_inner=d_inner, chunk=chunk,
                                   interpret=_interpret)[:, :l]
    else:
        xm, Bm, Cm = jnp.split(xbc, [d_inner, d_inner + d_state], axis=-1)
        if pad:
            xm = jnp.pad(xm, ((0, 0), (0, pad), (0, 0)))
            Bm = jnp.pad(Bm, ((0, 0), (0, pad), (0, 0)))
            Cm = jnp.pad(Cm, ((0, 0), (0, pad), (0, 0)))
            dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        xh = xm.reshape(b, l + pad, n_heads, head_p)
        y = ssd_chunked(xh, dt, A, Bm, Cm, params["D"].astype(_F32),
                        chunk=chunk)
        y = y.reshape(b, l + pad, d_inner)[:, :l]

    # gated RMSNorm (the Mamba-2 block normalizes y * silu(z) before
    # out_proj; groupnorm with one group == RMSNorm over d_inner)
    y = y.astype(_F32) * jax.nn.silu(z.astype(_F32))
    y = y * lax.rsqrt(jnp.mean(jnp.square(y), axis=-1, keepdims=True) + 1e-5)
    y = y * params["norm_scale"].astype(_F32)
    return y.astype(cdt) @ wcast(params["out_proj_w"])
