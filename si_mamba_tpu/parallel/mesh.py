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
            # pad on the HOST (numpy): jnp.concatenate here would run under
            # the caller's installed mesh context (jax.set_mesh(global) in
            # the runners) and commit the batch replicated on that mesh —
            # the 'data'-sharded jit then rejects it ("Sharding passed to
            # jit does not match...") instead of sharding it. Uncommitted
            # numpy inputs let the jit place them per in_shardings.
            hosted = [np.asarray(b) for b in batch]
            batch = tuple(
                np.concatenate([h, np.repeat(h[-1:], n_pad - n, axis=0)], 0)
                for h in hosted)
        # run under THIS mesh's context: the runner installs the global
        # mesh via jax.set_mesh, but multi-host eval uses the per-process
        # local_eval_mesh — a mismatched context mesh fails the jit with
        # "incompatible devices" (and in-model shard_map needs the right one)
        ctx = jax.set_mesh(mesh)
        try:
            out = jitted(state, *batch, *extras)
        finally:
            ctx.__exit__(None, None, None)
        if n_pad != n:
            out = jax.tree.map(lambda o: o[:n], out)
        return out

    return call


def local_eval_mesh(mesh: Mesh) -> Mesh:
    """Mesh for eval/metric loops: the global mesh on single-process runs,
    a per-process mesh over ``jax.local_devices()`` on multi-host runs.

    Eval consumes process-local loader shards and reads back per-example
    outputs — the reference evaluates per rank and all-reduces the counts
    (tools/runner_finetune.py:328-330, utils/dist_utils.py:41-54). A
    global-mesh eval program would instead require globally-assembled
    ragged batches and non-addressable output readbacks for no benefit.

    Non-data axes (e.g. a tensor-parallel 'model' axis) keep their extent —
    only the 'data' axis shrinks by the process count — so in-model
    shard_map collectives still resolve. This assumes each model-parallel
    group fits within one host (the standard layout).
    """
    if jax.process_count() == 1:
        return mesh
    local = jax.local_devices()
    shape = dict(zip(mesh.axis_names, mesh.devices.shape))
    rest = 1
    for k, v in shape.items():
        if k != "data":
            rest *= int(v)
    if len(local) % rest != 0:
        raise ValueError(
            f"local device count {len(local)} not divisible by the non-data "
            f"axis extents {shape} — shrink tp_size or realign hosts")
    new_shape = tuple(len(local) // rest if k == "data" else int(v)
                      for k, v in shape.items())
    return make_mesh(local, axis_names=mesh.axis_names, shape=new_shape)


def localize(tree: Any, mesh: Mesh) -> Any:
    """Copy a fully-replicated pytree (train state) onto another mesh,
    replicated — hands the state to the per-process ``local_eval_mesh``.
    Replicated leaves are addressable everywhere, so a host round-trip is
    always legal; called once per validation, not per batch."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(np.asarray(x), sh), tree)


def global_host_sum(x: Any) -> np.ndarray:
    """Sum a host-side metric array across processes (the reference's
    ``reduce_tensor``, utils/dist_utils.py:41-48). No-op single-process."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(jnp.asarray(x))).sum(0)


def global_host_concat(x: np.ndarray) -> np.ndarray:
    """Concatenate per-process host arrays along axis 0 across processes
    (the reference's ``gather_tensor``, utils/dist_utils.py:50-54), allowing
    ragged per-process row counts (eval loaders drop_last=False). No-op
    single-process."""
    x = np.asarray(x)
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    counts = np.asarray(multihost_utils.process_allgather(
        jnp.asarray([x.shape[0]]))).reshape(-1)
    n_max = int(counts.max())
    if x.shape[0] < n_max:
        pad = np.zeros((n_max - x.shape[0],) + x.shape[1:], x.dtype)
        x = np.concatenate([x, pad], axis=0)
    gathered = np.asarray(multihost_utils.process_allgather(jnp.asarray(x)))
    return np.concatenate([gathered[p, :counts[p]] for p in range(len(counts))],
                          axis=0)


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
