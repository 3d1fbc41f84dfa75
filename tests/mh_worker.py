"""Worker for tests/test_multihost.py: one of two real `jax.distributed`
processes (4 virtual CPU devices each → an 8-device 2-host mesh) driving the
ACTUAL finetune runner end-to-end — loader index-space sharding, global-batch
assembly via shard_batch, the jitted DP train step over the multi-host mesh,
per-process local-mesh validation with cross-host count reduction, and the
rank-0-gated checkpoint/scalars writes.

Usage: python tests/mh_worker.py <proc_id> <port> <exp_dir> [tp]
``tp`` composes 2-way tensor parallelism with the data axis — the global
mesh becomes ('data', 'model') = (4, 2) across the two hosts, with every
mixer's d_inner sharded over 'model' (runner path runner_finetune.py:181).
Writes <exp_dir>/result_<proc_id>.json for the parent test to compare.
"""

import json
import os
import sys

proc_id, port, exp_dir = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
use_tp = len(sys.argv) > 4 and sys.argv[4] == "tp"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=2, process_id=proc_id)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8 and jax.local_device_count() == 4

import numpy as np  # noqa: E402
import yaml  # noqa: E402

from si_mamba_tpu.data.loader import Loader  # noqa: E402
from si_mamba_tpu.parallel import per_process_batch  # noqa: E402
from si_mamba_tpu.train.config import ConfigDict, _to_config  # noqa: E402
from si_mamba_tpu.train.runner_finetune import finetune_run  # noqa: E402


class _CloudDataset:
    """Deterministic synthetic clouds — identical on both processes (the
    loader's process sharding decides who sees which rows)."""

    def __init__(self, n=16, npoints=1100, classes=4, seed=0):
        r = np.random.default_rng(seed)
        self.pts = r.standard_normal((n, npoints, 3)).astype(np.float32)
        self.labels = r.integers(0, classes, n).astype(np.int32)

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, i):
        return self.pts[i], self.labels[i]


cfg = _to_config(ConfigDict(yaml.safe_load("""
optimizer: {type: AdamW, kwargs: {lr: 0.001, weight_decay: 0.05}}
scheduler: {type: CosLR, kwargs: {epochs: 2, initial_epochs: 1}}
model: {NAME: PointMamba, trans_dim: 32, depth: 2, cls_dim: 4, group_size: 8,
        num_group: 16, encoder_dims: 32, knn_graph: 4, drop_path: 0.0,
        method: SAST}
npoints: 1024
total_bs: 8
max_epoch: 0
grad_norm_clip: 10
""")))
if use_tp:
    cfg["tp_size"] = 2
    cfg.model["tp_axis"] = "model"
    # also exercise ASYNC collective checkpointing across real processes
    # (orbax's commit barrier runs on its background thread; every process
    # still calls save — the deadlock-prone pattern is rank-GATING, not
    # async)
    cfg["async_ckpt"] = True

ds = _CloudDataset()
bs = per_process_batch(int(cfg.total_bs))  # 8 global -> 4 per process
assert bs == 4, bs
train = Loader(ds, bs, shuffle=True, drop_last=True, seed=1,
               process_index=jax.process_index(),
               process_count=jax.process_count())
val = Loader(ds, bs, shuffle=False,
             process_index=jax.process_index(),
             process_count=jax.process_count())

state, best = finetune_run(cfg, train, val, exp_dir, seed=0)

# replicated-state checksum: must be identical across processes after the
# globally-jitted train step (XLA's gradient psum is the sync)
psum = float(sum(float(jax.numpy.sum(jax.numpy.abs(l).astype(jax.numpy.float64)))
                 for l in jax.tree.leaves(state.params)))
result = {"proc": proc_id, "acc": float(best.acc), "step": int(state.step),
          "param_checksum": psum,
          "ckpt_last_exists": os.path.exists(os.path.join(exp_dir, "ckpt-last"))}
with open(os.path.join(exp_dir, f"result_{proc_id}.json"), "w") as f:
    json.dump(result, f)
print("WORKER", proc_id, "DONE", json.dumps(result), flush=True)
