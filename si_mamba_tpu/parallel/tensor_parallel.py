"""Tensor-parallel Mamba mixer over a ``model`` mesh axis.

Megatron-style sharding adapted to the selective-SSM block: every channel of
d_inner is an independent scan, so the state space splits for free —

- in_proj column-sharded on d_inner (x and z halves shard independently);
- the causal conv is depthwise → local;
- x_proj row-sharded: partial (B, L, dt_rank + 2n) products + one psum
  (tiny: 56 floats/token);
- dt_proj column-sharded → local dt slice; A_log/D/dt_bias sharded;
- the scan runs on the local d_inner/M channels with NO communication;
- out_proj row-sharded: partial (B, L, d_model) products + one psum.

Two psums per layer; everything else local. Composes with the 'data' axis
(the psums ride the model axis only).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from si_mamba_tpu.ops.selective_scan import causal_conv1d, selective_scan


def shard_mixer_params(params: Dict[str, Any], mesh: Mesh, axis: str = "model"
                       ) -> Dict[str, Any]:
    """Device-put mixer params with their TP shardings.

    in_proj is reshaped (d, 2, d_inner) so the x/z halves shard on d_inner
    independently; column-sharded: conv, dt_proj(out), A_log, D, dt bias,
    x_proj(in), out_proj(in).
    """
    d_model, two_di = params["in_proj_w"].shape
    d_inner = two_di // 2
    named = lambda *spec: NamedSharding(mesh, P(*spec))
    put = jax.device_put
    return {
        "in_proj_w": put(params["in_proj_w"].reshape(d_model, 2, d_inner),
                         named(None, None, axis)),
        "conv_w": put(params["conv_w"], named(axis, None)),
        "conv_b": put(params["conv_b"], named(axis)),
        "x_proj_w": put(params["x_proj_w"], named(axis, None)),
        "dt_proj_w": put(params["dt_proj_w"], named(None, axis)),
        "dt_proj_b": put(params["dt_proj_b"], named(axis)),
        "A_log": put(params["A_log"], named(axis, None)),
        "D": put(params["D"], named(axis)),
        "out_proj_w": put(params["out_proj_w"], named(axis, None)),
    }


def _mixer_local(params, x, *, d_state: int, dt_rank: int, axis: str,
                 scan_impl: str):
    """Per-shard mixer body; x replicated (or data-sharded on another axis)."""
    xz = jnp.einsum("bld,dch->blch", x, params["in_proj_w"])  # (B, L, 2, di/M)
    xi, z = xz[:, :, 0], xz[:, :, 1]
    xi = causal_conv1d(xi, params["conv_w"], params["conv_b"], activation="silu")
    # row-sharded x_proj: partial products summed across shards
    x_dbl = lax.psum(xi @ params["x_proj_w"], axis)  # (B, L, dt_rank + 2n)
    dt = x_dbl[..., :dt_rank] @ params["dt_proj_w"]  # (B, L, di/M) local
    Bc = x_dbl[..., dt_rank : dt_rank + d_state]
    Cc = x_dbl[..., dt_rank + d_state :]
    A = -jnp.exp(params["A_log"].astype(jnp.float32))
    y = selective_scan(xi, dt, A, Bc, Cc, D=params["D"], z=z,
                       delta_bias=params["dt_proj_b"], delta_softplus=True,
                       impl=scan_impl)
    return lax.psum(y @ params["out_proj_w"], axis)  # (B, L, d_model)


def mamba_mixer_tp(params: Dict[str, Any], x: jax.Array, *,
                   mesh: Mesh | None = None, d_state: int, dt_rank: int,
                   axis: str = "model", scan_impl: str = "chunked") -> jax.Array:
    """Tensor-parallel functional Mamba mixer (see shard_mixer_params).

    params must already be sharded by ``shard_mixer_params`` (or carry the
    equivalent layouts, e.g. via with_sharding_constraint inside a jitted
    model); x is replicated over ``axis``. mesh=None uses the context mesh
    (``jax.set_mesh``).
    """
    pspec = {
        "in_proj_w": P(None, None, axis),
        "conv_w": P(axis, None),
        "conv_b": P(axis),
        "x_proj_w": P(axis, None),
        "dt_proj_w": P(None, axis),
        "dt_proj_b": P(axis),
        "A_log": P(axis, None),
        "D": P(axis),
        "out_proj_w": P(axis, None),
    }
    # Manual only over the model axis: any OTHER mesh axis (e.g. 'data' in a
    # composed ('data', 'model') mesh) stays under automatic partitioning, so
    # the batch keeps its P('data') sharding inside the body and DP×TP
    # composes without gathering the batch.
    fn = shard_map(
        partial(_mixer_local, d_state=d_state, dt_rank=dt_rank, axis=axis,
                scan_impl=scan_impl),
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        axis_names=frozenset({axis}),
        check_vma=False,
    )
    return fn(params, x)


# ---------------------------------------------------------------------------
# Tensor-parallel SSD mixer (opt-in mixer='ssd', ops/ssd.py)
# ---------------------------------------------------------------------------
# Heads are independent recurrences sharing one (B, C) group, so the split
# is even cleaner than Mamba-1's: z/x/dt project per-head-group (local),
# the tiny (2·d_state)-channel B/C projection+conv is computed redundantly
# on every shard, the chunked SSD runs on the local heads with NO
# communication, and two psums close the layer — a scalar sum-of-squares
# for the d_inner-wide gated RMSNorm and the row-sharded out_proj.


def shard_ssd_mixer_params(params: Dict[str, Any], mesh: Mesh, *,
                           n_heads: int, d_state: int, axis: str = "model"
                           ) -> Dict[str, Any]:
    """Split + device-put the packed ``ssd_mixer_apply`` params for TP.

    The packed in_proj output layout is [z (d_inner) | x (d_inner) |
    B (n) | C (n) | dt (h)] and conv covers [x | B | C]; heads shard in
    contiguous d_inner blocks, so n_heads % axis_size must be 0.
    """
    d_model, tot = params["in_proj_w"].shape
    d_inner = (tot - 2 * d_state - n_heads) // 2
    named = lambda *spec: NamedSharding(mesh, P(*spec))
    put = jax.device_put
    w = params["in_proj_w"]
    cw, cb = params["conv_w"], params["conv_b"]
    return {
        "in_proj_z": put(w[:, :d_inner], named(None, axis)),
        "in_proj_x": put(w[:, d_inner:2 * d_inner], named(None, axis)),
        "in_proj_bc": put(w[:, 2 * d_inner:2 * d_inner + 2 * d_state],
                          named(None, None)),
        "in_proj_dt": put(w[:, 2 * d_inner + 2 * d_state:], named(None, axis)),
        "conv_x_w": put(cw[:d_inner], named(axis, None)),
        "conv_x_b": put(cb[:d_inner], named(axis)),
        "conv_bc_w": put(cw[d_inner:], named(None, None)),
        "conv_bc_b": put(cb[d_inner:], named(None)),
        "dt_bias": put(params["dt_bias"], named(axis)),
        "A_log": put(params["A_log"], named(axis)),
        "D": put(params["D"], named(axis)),
        "norm_scale": put(params["norm_scale"], named(axis)),
        "out_proj_w": put(params["out_proj_w"], named(axis, None)),
    }


def _ssd_mixer_local(p, u, *, d_state: int, chunk: int, axis: str,
                     impl: str = "xla", _interpret: bool = False):
    from si_mamba_tpu.ops.ssd import ssd_chunked

    f32 = jnp.float32
    cdt = u.dtype
    wc = (lambda w: w.astype(cdt)) if cdt != f32 else (lambda w: w)
    b, l, _ = u.shape
    z = u @ wc(p["in_proj_z"])            # (b, l, di/M)
    xi = u @ wc(p["in_proj_x"])
    bc = u @ wc(p["in_proj_bc"])          # (b, l, 2n) redundant per shard
    dt_raw = u @ wc(p["in_proj_dt"])      # (b, l, h/M)
    xi = causal_conv1d(xi, wc(p["conv_x_w"]), wc(p["conv_x_b"]),
                       activation="silu")
    bc = causal_conv1d(bc, wc(p["conv_bc_w"]), wc(p["conv_bc_b"]),
                       activation="silu")
    Bm, Cm = bc[..., :d_state], bc[..., d_state:]
    dt = jax.nn.softplus(dt_raw.astype(f32) + p["dt_bias"][None, None, :])
    A = -jnp.exp(p["A_log"].astype(f32))

    pad = (-l) % chunk
    if pad:
        xi, Bm, Cm = (jnp.pad(t, ((0, 0), (0, pad), (0, 0)))
                      for t in (xi, Bm, Cm))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
    h_loc = p["A_log"].shape[0]
    di_loc = xi.shape[-1]
    xh = xi.reshape(b, l + pad, h_loc, di_loc // h_loc)
    # per-shard fused-kernel route (each device runs the Pallas kernel on
    # its local heads; B/C are shard-local copies) — the shared
    # ssd_fused_route predicate
    from si_mamba_tpu.ops.ssd import ssd_fused_route

    if ssd_fused_route(impl, l + pad, chunk, d_state, di_loc // h_loc,
                       _interpret):
        from si_mamba_tpu.ops.pallas.ssd_kernel import ssd_chunked_pallas

        y = ssd_chunked_pallas(xh, dt, A, Bm, Cm, p["D"].astype(f32),
                               chunk=chunk, interpret=_interpret)
    else:
        y = ssd_chunked(xh, dt, A, Bm, Cm, p["D"].astype(f32), chunk=chunk)
    y = y.reshape(b, l + pad, di_loc)[:, :l]

    # gated RMSNorm over the FULL d_inner: one scalar-field psum
    g = y.astype(f32) * jax.nn.silu(z.astype(f32))
    ssq = lax.psum(jnp.sum(jnp.square(g), axis=-1, keepdims=True), axis)
    d_full = di_loc * lax.axis_size(axis)
    g = g * lax.rsqrt(ssq / d_full + 1e-5) * p["norm_scale"].astype(f32)
    return lax.psum(g.astype(cdt) @ wc(p["out_proj_w"]), axis)


def ssd_mixer_tp(params: Dict[str, Any], u: jax.Array, *,
                 mesh: Mesh | None = None, n_heads: int, d_state: int,
                 chunk: int = 128, axis: str = "model",
                 impl: str = "xla", _interpret: bool = False) -> jax.Array:
    """Tensor-parallel SSD mixer — params from ``shard_ssd_mixer_params``;
    u replicated over ``axis``. Matches ``ssd_mixer_apply`` on the packed
    params (oracle-pinned in tests/test_ssd.py). Heads shard in contiguous
    blocks, so n_heads must divide by the axis size."""
    # resolve the axis size from the explicit mesh or the context mesh
    # (jax.set_mesh) so the divisibility guard fires on BOTH call paths —
    # without it a bad head count surfaces as a cryptic shard_map
    # uneven-axis error deep inside _ssd_mixer_local
    if mesh is not None:
        axis_size = mesh.shape[axis]
    else:
        ctx = jax.sharding.get_abstract_mesh()
        axis_size = ctx.shape[axis] if (not ctx.empty and axis in
                                        ctx.axis_names) else None
    if axis_size is not None and n_heads % axis_size != 0:
        raise ValueError(
            f"ssd_mixer_tp shards whole heads: n_heads={n_heads} must be "
            f"divisible by the '{axis}' axis size {axis_size}")
    pspec = {
        "in_proj_z": P(None, axis), "in_proj_x": P(None, axis),
        "in_proj_bc": P(None, None), "in_proj_dt": P(None, axis),
        "conv_x_w": P(axis, None), "conv_x_b": P(axis),
        "conv_bc_w": P(None, None), "conv_bc_b": P(None),
        "dt_bias": P(axis), "A_log": P(axis), "D": P(axis),
        "norm_scale": P(axis), "out_proj_w": P(axis, None),
    }
    fn = shard_map(
        partial(_ssd_mixer_local, d_state=d_state, chunk=chunk, axis=axis,
                impl=impl, _interpret=_interpret),
        mesh=mesh,
        in_specs=(pspec, P()),
        out_specs=P(),
        axis_names=frozenset({axis}),
        check_vma=False,
    )
    return fn(params, u)
