"""Device mesh + sharding helpers — the TPU-native replacement for the
reference's NCCL/DDP stack (utils/dist_utils.py, SURVEY.md §2.2).

Strategy: one ``data`` mesh axis over ICI (extendable to ('data', 'model')
for future tensor sharding). The train step is a single jitted function over
globally-sharded arrays; XLA inserts the gradient psum — there are no
explicit collectives to maintain. BatchNorm statistics are computed on the
global batch by construction (== the reference's --sync_bn).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Sequence[jax.Device] | None = None,
              axis_names: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    """Build a Mesh over all (or the given) devices.

    Default: 1-D ('data',) mesh. Pass shape + axis_names for multi-axis
    layouts, e.g. shape=(4, 2), axis_names=('data', 'model').
    """
    if devices is None:
        devices = jax.devices()
    devs = np.asarray(devices)
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(devs.reshape(shape), axis_names)


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Commit every leaf of a pytree (train state / variables) to the mesh,
    replicated on all devices — the DDP 'same weights everywhere' invariant."""
    return jax.device_put(tree, replicated_sharding(mesh))


def dp_train_jit(step_fn, mesh: Mesh, n_batch: int = 2, n_extra: int = 1):
    """Jit a train step ``(state, *batch, *extra) -> (state, metrics)`` with
    explicit data-parallel shardings: state replicated (and donated), batch
    args sharded on 'data', trailing extras (rng key, scalars) replicated.
    XLA inserts the gradient/metric all-reduces. Mirrors the reference's DDP
    wrap (tools/runner_finetune.py:124-129) the TPU way."""
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    return jax.jit(
        step_fn,
        in_shardings=(repl,) + (data,) * n_batch + (None,) * n_extra,
        out_shardings=(repl, repl),
        donate_argnums=(0,))


def dp_eval_jit(step_fn, mesh: Mesh, n_batch: int = 1, n_extra: int = 0):
    """Wrap an eval/feature step ``(state, *batch, *extra) -> per-example
    out`` with explicit DP shardings: state replicated, batch sharded,
    output sharded on 'data' (gathered on host readback).

    Eval loaders run with ``drop_last=False`` (reference tools/builder.py:
    24-41), so the FINAL batch of an epoch is usually ragged — and a
    ``P('data')`` sharding rejects a batch axis not divisible by the mesh.
    The wrapper therefore pads every batch arg up to the next multiple of
    the device count (repeating the last row — eval has no cross-example
    coupling), runs the jitted sharded step, and slices outputs back to the
    true length. Padding quantizes to at most one extra compiled shape."""
    repl, data = replicated_sharding(mesh), batch_sharding(mesh)
    ndev = mesh.devices.size
    jitted = jax.jit(
        step_fn,
        in_shardings=(repl,) + (data,) * n_batch + (None,) * n_extra,
        out_shardings=data)

    def call(state, *args):
        batch, extras = args[:n_batch], args[n_batch:]
        n = np.asarray(batch[0]).shape[0]
        n_pad = -(-n // ndev) * ndev
        if n_pad != n:
            batch = tuple(
                jnp.concatenate(
                    [jnp.asarray(b),
                     jnp.repeat(jnp.asarray(b)[-1:], n_pad - n, axis=0)], 0)
                for b in batch)
        out = jitted(state, *batch, *extras)
        if n_pad != n:
            out = jax.tree.map(lambda o: o[:n], out)
        return out

    return call


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every leaf of a batch pytree on its leading (batch) dim.

    Single-host: a plain sharded device_put. Multi-host: each process holds
    its 1/process_count slice of the GLOBAL batch (the Loader shards the
    index space per process), so the global array must be assembled from
    process-local data — device_put with a global sharding would silently
    reinterpret each local array as the global one.
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def to_global(x):
        global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sh, np.asarray(x),
                                                      global_shape)

    return jax.tree.map(to_global, batch)
