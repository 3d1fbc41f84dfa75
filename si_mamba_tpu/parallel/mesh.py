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


def maybe_initialize_distributed(logger=None) -> bool:
    """Multi-host bring-up (reference utils/dist_utils.py:9-24 init_dist).

    Env-gated: set ``SI_MAMBA_MULTIHOST=1`` on every process of a multi-host
    launch (a TPU pod slice, or GPUs/CPUs with the standard JAX coordinator
    env vars ``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/
    ``JAX_PROCESS_ID``) and ``jax.distributed.initialize()`` runs before the
    first backend use, making ``jax.process_count() == P`` real — which in
    turn activates the per-process loader shard (data/loader.py) and the
    global-batch assembly (shard_batch). Single-host runs skip it entirely
    (the reference's ``--launcher none`` path). Returns True if initialized.
    """
    import os

    if os.environ.get("SI_MAMBA_MULTIHOST", "").lower() not in ("1", "true"):
        return False
    jax.distributed.initialize()  # TPU pods auto-discover; else env vars
    if logger is not None:
        logger.info("jax.distributed initialized: process %d/%d, %d/%d devices",
                    jax.process_index(), jax.process_count(),
                    jax.local_device_count(), jax.device_count())
    return True


def per_process_batch(total_bs: int, process_count: int | None = None) -> int:
    """Split the GLOBAL batch size across processes (reference main.py:72-86:
    ``assert config.total_bs % world_size == 0``, per-rank bs = total/world).

    Each process's Loader yields this many samples; ``shard_batch`` assembles
    them into the global ``total_bs`` batch, so the effective hyperparameters
    (LR-vs-batch pairing) are identical at any P.
    """
    P = jax.process_count() if process_count is None else process_count
    if total_bs % P != 0:
        raise ValueError(
            f"total_bs={total_bs} must divide evenly over "
            f"{P} processes (reference main.py:73 asserts the same)")
    return total_bs // P


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
