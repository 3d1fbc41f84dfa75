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
