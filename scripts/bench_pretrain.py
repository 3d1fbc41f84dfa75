"""MAE pretrain-step benchmark: wavelet_solver='eigh' vs 'jacobi' on the chip.

The round-2 per-op profile attributed ~27 ms of the ~290 ms pretrain step to
tiny batched eighs inside the diffusion-wavelet stage (ROADMAP round-3
candidates); ops/jacobi.py replaces them with matmul-only parallel-ordered
Jacobi sweeps + a Taylor scaling-squaring expm. This script measures the
end-to-end delta at the published pretrain shape (B=128, N=1024,
cfgs/pretrain.yaml) and writes benchmarks/bench_pretrain.json.

Run (axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    JAX_PLATFORMS=tpu timeout 3600 python scripts/bench_pretrain.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_STEPS = 4
B, N = 128, 1024


def time_step(cfg) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.models.point_mae import PointMAEMamba
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.runner_pretrain import make_pretrain_step
    from si_mamba_tpu.train.train_state import TrainState

    model = PointMAEMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "gumbel": jax.random.key(2)}, pts[:2], train=False)
    tx, _ = build_optimizer(variables["params"], lr=1e-3, epochs=300,
                            warmup_epochs=10, steps_per_epoch=400)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_pretrain_step(model)

    @jax.jit
    def multi_step(state, pts, key):
        def body(st, _):
            st, m = step_fn(st, pts, key, 0.5)
            return st, m["loss"]

        state, losses = lax.scan(body, state, jnp.arange(K_STEPS))
        return state, losses

    key = jax.random.key(3)
    state, losses = multi_step(state, pts, key)
    np.asarray(losses)  # compile + sync fence (host readback)
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = multi_step(state, pts, key)
        np.asarray(losses)
        lat.append((time.perf_counter() - t0) / K_STEPS)
    return float(np.median(lat) * 1e3)


def main():
    from si_mamba_tpu.models.point_mae import PointMAEConfig

    base = PointMAEConfig(dtype="bfloat16")
    out = {}
    for solver in ("eigh", "jacobi"):
        ms = time_step(dataclasses.replace(base, wavelet_solver=solver))
        out[f"pretrain_step_ms_{solver}"] = round(ms, 2)
        out[f"pretrain_clouds_per_sec_{solver}"] = round(B / ms * 1e3, 1)
        print(f"wavelet_solver={solver}: {ms:.2f} ms/step "
              f"({B / ms * 1e3:.1f} clouds/s)")
    out["batch"] = B
    out["amortized_over"] = K_STEPS
    # reference: ~195 clouds/s on its GPU (logs/pretrain_part_2.log,
    # EpochTime 266.7 s over 52,470 shapes, SURVEY.md §6)
    out["vs_ref_gpu"] = round(out["pretrain_clouds_per_sec_jacobi"] / 195.0, 2)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "bench_pretrain.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"written: {dst}")


if __name__ == "__main__":
    main()
