"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: ModelNet40-config training throughput, clouds/sec/chip
(forward + backward + AdamW on B=32, N=1024, SAST, 12 layers, d=384 — the
reference logs ≈140 clouds/s on its GPU, BASELINE.md). Also reports the
spectral (graph+eigh+orders) p50 latency and eval-forward throughput.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_CLOUDS_PER_SEC = 140.0  # reference logs/finetuned_modelnet40.log


def main():
    import jax
    import jax.numpy as jnp

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.models.point_mamba import spectral_eigvecs
    from si_mamba_tpu.ops import fps, gather_points
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
    step = jax.jit(make_classifier_train_step(model), donate_argnums=(0,))

    # warmup/compile
    key = jax.random.key(1)
    state, m = step(state, pts, labels, key)
    jax.block_until_ready(m)

    # per-step sync: under the axon tunnel, block_until_ready on a chained
    # async loop under-reports by orders of magnitude — sync every step.
    n_iter = 5
    lat = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        state, m = step(state, pts, labels, key)
        jax.block_until_ready(m)
        lat.append(time.perf_counter() - t0)
    dt = float(np.median(lat))
    clouds_per_sec = B / dt

    # spectral stage p50 (graph + batched eigh + top-k)
    spec = jax.jit(lambda c: spectral_eigvecs(c, cfg))
    centers = gather_points(pts, fps(pts, cfg.num_group))
    jax.block_until_ready(spec(centers))
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        jax.block_until_ready(spec(centers))
        lat.append(time.perf_counter() - t0)
    spectral_p50_ms = float(np.median(lat) * 1e3)

    # eval forward throughput (per-call sync)
    fwd = jax.jit(lambda v, p: model.apply(v, p, train=False))
    ev = {"params": state.params, "batch_stats": state.batch_stats}
    jax.block_until_ready(fwd(ev, pts))
    elat = []
    for _ in range(n_iter):
        t0 = time.perf_counter()
        jax.block_until_ready(fwd(ev, pts))
        elat.append(time.perf_counter() - t0)
    eval_dt = float(np.median(elat))

    print(json.dumps({
        "metric": "modelnet40_train_clouds_per_sec_per_chip",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/s",
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
        "extra": {
            "train_step_ms": round(dt * 1e3, 2),
            "eval_clouds_per_sec": round(B / eval_dt, 2),
            "spectral_p50_ms": round(spectral_p50_ms, 3),
            "batch": B,
            "scan_impl": cfg.scan_impl,
        },
    }))


if __name__ == "__main__":
    main()
