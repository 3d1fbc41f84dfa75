"""Measure the CPU-baseline training throughput the perf target is defined
against (BASELINE.json: ">=5x CPU-baseline clouds/sec/chip").

Runs the bench workload shapes (ModelNet40 config, B=32, N=1024, SAST,
12 layers, d=384) at the PARITY configuration — fp32 + exact eigh, the
PointMambaConfig defaults — on the JAX CPU backend and prints one JSON
line. Note bench.py additionally enables the accuracy-neutral perf config
on TPU (bf16 mixed precision + subspace eigensolver), so vs_cpu_baseline
compounds hardware speedup with those algorithm choices; vs_ref_gpu is the
like-for-like model comparison. The measured number is recorded as
``CPU_BASELINE_CLOUDS_PER_SEC`` in bench.py; re-run this script to refresh
it.

Usage:  python scripts/measure_cpu_baseline.py [--steps 3]
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step

    B, N = 32, 1024
    cfg = PointMambaConfig()
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))

    variables = model.init(jax.random.key(0), pts[:2], train=False)
    tx, _ = build_optimizer(variables["params"], lr=3e-4, epochs=300,
                            warmup_epochs=10, steps_per_epoch=300)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = jax.jit(make_classifier_train_step(model), donate_argnums=0)
    key = jax.random.key(1)

    state, m = step_fn(state, pts, labels, key)  # compile
    jax.block_until_ready(m["loss"])
    lat = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, m = step_fn(state, pts, labels, key)
        jax.block_until_ready(m["loss"])
        lat.append(time.perf_counter() - t0)
    dt = float(np.median(lat))
    print(json.dumps({
        "metric": "cpu_baseline_train_clouds_per_sec",
        "value": round(B / dt, 3),
        "unit": "clouds/s",
        "extra": {"train_step_ms": round(dt * 1e3, 1), "batch": B,
                  "backend": jax.default_backend(),
                  "scan_impl_resolved": "chunked (auto on cpu)"},
    }))


if __name__ == "__main__":
    main()
