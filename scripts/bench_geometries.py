"""Secondary-geometry benchmarks: MAE pretrain (B=128) and the hardest
finetune config (N=2048, G=128), each Mamba-1 vs the opt-in ssd_fused
preset. These are the two workloads VERDICT r3 flagged as the thinnest
margins vs the reference GPU (pretrain 195 clouds/s, hardest ~125 — see
BASELINE.md); bench.py keeps the primary ModelNet40 workload, this script
records the rest into benchmarks/bench_geometries.json.

Run (axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    timeout 3600 python scripts/bench_geometries.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _amortized_ms(multi, args, k):
    state, losses = multi(*args)
    np.asarray(losses)  # compile + sync (block_until_ready under-reports
    lat = []            # through the axon relay — host readback fences)
    for _ in range(3):  # median of 3: one relay stall must not become
        t0 = time.perf_counter()  # the recorded number
        state, losses = multi(*args)
        np.asarray(losses)
        lat.append((time.perf_counter() - t0) / k * 1e3)
    return float(np.median(lat))


def bench_pretrain(impl_mixer) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.models.point_mae import PointMAEConfig, PointMAEMamba
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.runner_pretrain import make_pretrain_step
    from si_mamba_tpu.train.train_state import TrainState

    impl, mixer = impl_mixer
    B, N, K = 128, 1024, 4
    cfg = dataclasses.replace(PointMAEConfig(dtype="bfloat16"),
                              wavelet_solver="jacobi", scan_impl=impl,
                              mixer=mixer)
    model = PointMAEMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.key(0), "mask": jax.random.key(1),
         "gumbel": jax.random.key(2)}, pts[:2], train=False)
    tx, _ = build_optimizer(variables["params"], lr=1e-3, epochs=300,
                            warmup_epochs=10, steps_per_epoch=400)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step_fn = make_pretrain_step(model)

    @jax.jit
    def multi(state, pts, key):
        def body(st, _):
            st, m = step_fn(st, pts, key, 0.5)
            return st, m["loss"]
        return lax.scan(body, state, jnp.arange(K))

    ms = _amortized_ms(multi, (state, pts, jax.random.key(3)), K)
    return ms, B


def bench_hardest(impl_mixer) -> float:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import (
        TrainState,
        make_classifier_train_step,
    )

    impl, mixer = impl_mixer
    B, N, K = 32, 2048, 6
    kw = {}
    if impl == "ssd_fused":
        # match cfgs/finetune_scan_hardest_ssd_fused.yaml: 256-token chunks
        # won the round-5 hardest-geometry A/B (78.4 vs 86.9 ms/step)
        kw["ssd_chunk"] = 256
    cfg = PointMambaConfig(dtype="bfloat16", spectral_method="subspace",
                           num_group=128, cls_dim=15, mixer=mixer,
                           scan_impl=impl, **kw)
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 15, B).astype(np.int32))
    variables = model.init(jax.random.key(0), pts[:2], train=False)
    tx, _ = build_optimizer(variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    step_fn = make_classifier_train_step(model)

    @jax.jit
    def multi(state, pts, labels, key):
        def body(st, _):
            st, m = step_fn(st, pts, labels, key)
            return st, m["loss"]
        return lax.scan(body, state, jnp.arange(K))

    ms = _amortized_ms(multi, (state, pts, labels, jax.random.key(1)), K)
    return ms, B


def main() -> None:
    out = {}
    for name, fn, variants in (
        ("pretrain_b128", bench_pretrain,
         {"mamba1": ("auto", "mamba"), "ssd_fused": ("ssd_fused", "ssd")}),
        ("hardest_n2048_g128", bench_hardest,
         {"mamba1": ("auto", "mamba"), "ssd_fused": ("ssd_fused", "ssd")}),
    ):
        out[name] = {}
        for vname, impl_mixer in variants.items():
            ms, b = fn(impl_mixer)
            out[name][vname] = {"step_ms": round(ms, 1),
                                "clouds_per_sec": round(b / ms * 1e3, 1)}
            print(name, vname, out[name][vname], flush=True)
    out["note"] = (
        "every entry: median of 3 timed runs of a K-step in-graph scan with "
        "host-readback fences (one axon relay stall must not become the "
        "recorded number), captured solo on the 1-core host. vs ref GPU: "
        "pretrain 195 clouds/s (logs/pretrain_part_2.log), hardest ~125.")
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "bench_geometries.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("written:", dst)


if __name__ == "__main__":
    main()
