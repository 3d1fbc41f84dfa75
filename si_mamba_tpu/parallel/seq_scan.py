"""Sequence-parallel selective scan over a ``seq`` mesh axis.

SURVEY.md §5.7: the reference has no long-sequence capability beyond
traversal concatenation; the TPU-native extension point is sharding the scan
itself. The recurrence is an affine composition, so cross-device
parallelization mirrors the in-kernel chunking one level up:

1. each device runs a LOCAL inclusive associative scan of its L/P time slice
   (from a zero state), producing per-step (acc_a, acc_b) and its slice's
   total affine map (A_i, B_i) = (prod a, final h from 0);
2. ``all_gather`` of the P tiny (b, d, n) carries over the seq axis (ICI);
3. every device composes the exclusive prefix of the earlier devices' maps
   locally (P is small) to get its entry state h_in;
4. local outputs are fixed up as h_t = acc_a_t · h_in + acc_b_t — no second
   pass over the data.

Communication: one all_gather of 2·b·d·n floats — independent of L.

Autodiff note: replicated (P()) shard_map inputs hit an XLA sharding
assertion in the transpose on this jax version, so the per-channel params
(A, D, dt_bias) are passed tiled along the seq axis — each shard consumes
its local copy and their cotangents come back shard-stacked and are summed
outside. Values are identical; gradients match the sequential oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map


def _compose_exclusive_prefix(decay, state, axis_name: str, apply_decay):
    """Cross-device affine carry shared by both seq-parallel recurrences:
    all_gather each shard's slice map (decay, state-from-zero) and compose
    the exclusive prefix of EARLIER shards locally (P is small), returning
    this shard's entry state. ``apply_decay(d, h)`` broadcasts the decay
    onto the carried state (per-(d,n) for Mamba-1, per-head scalar for SSD).
    """
    my = jax.lax.axis_index(axis_name)
    nshards = jax.lax.axis_size(axis_name)
    all_d = lax.all_gather(decay, axis_name)
    all_s = lax.all_gather(state, axis_name)

    def step(h, i):
        h = jnp.where(i < my, apply_decay(all_d[i], h) + all_s[i], h)
        return h, None

    h_in, _ = lax.scan(step, jnp.zeros_like(state), jnp.arange(nshards))
    return h_in


def _local_scan(u, delta, A_t, B, C, D_t, z, dtb_t, axis_name: str):
    A = A_t[0]  # (d, n) local copy of the seq-tiled params
    D = D_t[0]
    delta_bias = dtb_t[0]

    delta32 = delta.astype(jnp.float32)
    delta32 = delta32 + delta_bias.astype(jnp.float32)[None, None, :]
    delta32 = jax.nn.softplus(delta32)
    u32 = u.astype(jnp.float32)
    dA = jnp.exp(delta32[..., None] * A.astype(jnp.float32)[None, None])
    dBu = (delta32 * u32)[..., None] * B.astype(jnp.float32)[:, :, None, :]

    def combine(x, y):
        a1, b1 = x
        a2, b2 = y
        return a1 * a2, a2 * b1 + b2

    acc_a, acc_b = lax.associative_scan(combine, (dA, dBu), axis=1)

    # cross-device carry: compose the exclusive prefix of earlier slices
    h_in = _compose_exclusive_prefix(acc_a[:, -1], acc_b[:, -1], axis_name,
                                     lambda d, h: d * h)

    hs = acc_a * h_in[:, None] + acc_b
    y = jnp.einsum("bldn,bln->bld", hs, C.astype(jnp.float32))
    y = y + u32 * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(u.dtype)


def selective_scan_seq_parallel(u, delta, A, B, C, D=None, z=None,
                                delta_bias=None, *, mesh: Mesh,
                                axis: str = "seq"):
    """Selective scan with the TIME dimension sharded over ``axis``.

    u, delta, z: (b, L, d); B, C: (b, L, n) — all sharded on L; A (d, n),
    D (d,), delta_bias (d,) replicated. L must divide by the axis size.
    """
    nshards = mesh.shape[axis]
    d = u.shape[-1]
    if D is None:
        D = jnp.zeros((d,), jnp.float32)
    if delta_bias is None:
        delta_bias = jnp.zeros((d,), jnp.float32)
    from jax.sharding import NamedSharding

    shard = NamedSharding(mesh, P(axis))

    def tile(x):
        # materialize + pin the sharding: a broadcast_to would let XLA mark
        # the array replicated, tripping the shard_map transpose assertion
        t = jnp.tile(x[None], (nshards,) + (1,) * x.ndim)
        return jax.lax.with_sharding_constraint(t, shard)

    seq_spec = P(None, axis, None)
    shard_lead = P(axis)
    fn = shard_map(
        partial(_local_scan, axis_name=axis),
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, shard_lead, seq_spec, seq_spec,
                  shard_lead, seq_spec, shard_lead),
        out_specs=seq_spec,
        check_vma=False,
    )
    return fn(u, delta, tile(A), B, C, tile(D), z, tile(delta_bias))


def _ssd_local(x, dt, A_t, Bm, Cm, D_t, *, axis_name: str, chunk: int,
               impl: str = "xla", _interpret: bool = False):
    from si_mamba_tpu.ops.ssd import ssd_chunked, ssd_fused_route

    A, D = A_t[0], D_t[0]
    # local pass from a zero state + this slice's affine map (decay, state);
    # per-shard fused-kernel route (the shared ssd_fused_route predicate)
    if ssd_fused_route(impl, x.shape[1], chunk, Bm.shape[-1], x.shape[-1],
                       _interpret):
        from si_mamba_tpu.ops.pallas.ssd_kernel import ssd_chunked_pallas

        y0, dec_dev, st_dev = ssd_chunked_pallas(
            x, dt, A, Bm, Cm, D, chunk=chunk, return_carry=True,
            interpret=_interpret)
    else:
        y0, dec_dev, st_dev = ssd_chunked(x, dt, A, Bm, Cm, D, chunk=chunk,
                                          return_carry=True)

    # cross-device carry: compose the exclusive prefix of earlier slices
    h_in = _compose_exclusive_prefix(
        dec_dev, st_dev, axis_name, lambda d, h: d[..., None, None] * h)

    # the recurrence is affine in the entry state: fix the local outputs up
    # as y += C[t] · exp(S_local[t]) · h_in — no second pass over the data
    S_loc = jnp.cumsum(dt.astype(jnp.float32)
                       * A.astype(jnp.float32)[None, None, :], axis=1)  # (b,l,h)
    corr = jnp.einsum("bln,bhnp->blhp", Cm.astype(jnp.float32),
                      h_in) * jnp.exp(S_loc)[..., None]
    return y0 + corr.astype(y0.dtype)


def ssd_seq_parallel(x, dt, A, Bm, Cm, D, *, mesh: Mesh, axis: str = "seq",
                     chunk: int = 64, impl: str = "xla",
                     _interpret: bool = False):
    """Chunked SSD (`ops/ssd.ssd_chunked`) with TIME sharded over ``axis``.

    Same decomposition as ``selective_scan_seq_parallel`` one level up: each
    device runs the local chunked-matmul SSD from a zero state, one
    all_gather of the P per-slice affine maps (decay (b,h), state
    (b,h,n,p)) crosses the seq axis on ICI, and the scalar-decay structure
    makes the fix-up a single einsum — communication independent of L.

    x: (b, L, h, p); dt: (b, L, h); Bm/Cm: (b, L, n) — sharded on L;
    A (h,), D (h,) replicated (passed seq-tiled for the same shard_map
    transpose reason as above). L/axis_size must be a chunk multiple.
    """
    nshards = mesh.shape[axis]
    l_local = x.shape[1] // nshards
    assert x.shape[1] % nshards == 0 and l_local % chunk == 0, (
        x.shape, nshards, chunk)
    from jax.sharding import NamedSharding

    shard = NamedSharding(mesh, P(axis))

    def tile(v):
        t = jnp.tile(v[None], (nshards,) + (1,) * v.ndim)
        return jax.lax.with_sharding_constraint(t, shard)

    seq3 = P(None, axis, None)
    seq4 = P(None, axis, None, None)
    fn = shard_map(
        partial(_ssd_local, axis_name=axis, chunk=chunk, impl=impl,
                _interpret=_interpret),
        mesh=mesh,
        in_specs=(seq4, seq3, P(axis), seq3, seq3, P(axis)),
        out_specs=seq4,
        check_vma=False,
    )
    return fn(x, dt, tile(A), Bm, Cm, tile(D))
