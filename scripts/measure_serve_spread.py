"""Serving throughput with SPREAD — explains the BENCH_r03→r04 serve delta.

VERDICT r4 weak #6: the driver-captured serve numbers moved 486→360
clouds/s between rounds with nothing in the repo explaining it. bench.py
measures serve once (3 batched + 8 single dispatches, one aggregate);
over the axon relay a single stalled dispatch poisons that aggregate.
This script repeats the whole serve measurement R times at HEAD and
records min/median/max for both modes into benchmarks/serve_spread.json,
so cross-round deltas can be read against the relay's session variance
instead of being taken as regressions.

Run (axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    timeout 1800 python scripts/measure_serve_spread.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROUNDS = 5
B, N = 32, 1024


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.serving import Predictor

    rng = np.random.default_rng(0)
    pts_np = rng.standard_normal((B, N, 3)).astype(np.float32)

    def measure(cfg):
        model = PointMamba(cfg)
        pts = jnp.asarray(pts_np)
        variables = model.init(jax.random.key(0), pts[:2], train=False)
        ev = {"params": variables["params"],
              "batch_stats": variables["batch_stats"]}
        pred = Predictor(model=model, variables=ev, npoints=N, max_batch=B)
        one, big = pts_np[:1], pts_np
        pred.logits(big), pred.logits(one)  # compile both buckets

        batch_cps, single_ms = [], []
        for r in range(ROUNDS):
            t0 = time.perf_counter()
            for _ in range(3):
                pred.logits(big)
            batch_cps.append(B / ((time.perf_counter() - t0) / 3))
            t0 = time.perf_counter()
            for _ in range(8):
                pred.logits(one)
            single_ms.append((time.perf_counter() - t0) / 8 * 1e3)
            print(f"round {r}: batch {batch_cps[-1]:.1f} clouds/s, "
                  f"single {single_ms[-1]:.1f} ms", flush=True)
        return batch_cps, single_ms

    def spread(xs):
        return {"min": round(min(xs), 1), "median": round(float(np.median(xs)), 1),
                "max": round(max(xs), 1)}

    batch_cps, single_ms = measure(
        PointMambaConfig(dtype="bfloat16", spectral_method="subspace"))

    # same serve protocol on the framework's fastest opt-in config (the
    # fused-SSD preset, cfgs/finetune_modelnet_ssd_fused.yaml) — serving
    # inherits the training-side kernel wins through the same Predictor
    ssd_batch_cps, ssd_single_ms = measure(
        PointMambaConfig(dtype="bfloat16", spectral_method="subspace",
                         mixer="ssd", scan_impl="ssd_fused", ssd_chunk=256))

    out = {
        "rounds": ROUNDS,
        "serve_batch_clouds_per_sec": spread(batch_cps),
        "serve_single_p50_ms": spread(single_ms),
        # speedup = single-dispatch latency / batched per-cloud latency
        #         = (single_ms/1e3) * (batch clouds/s)  [bench.py semantics]
        "serve_batching_speedup_median": round(
            float(np.median(single_ms)) / 1e3 * float(np.median(batch_cps)), 1),
        "ssd_fused_serve_batch_clouds_per_sec": spread(ssd_batch_cps),
        "ssd_fused_serve_single_p50_ms": spread(ssd_single_ms),
        "note": ("each round = bench.py's serve measurement repeated at HEAD; "
                 "spread over rounds isolates axon-relay session variance "
                 "from real regressions (BENCH_r03 486.3 vs r04 360.0). "
                 "ssd_fused_* = the same protocol through the fused-SSD "
                 "preset config. NB: serve dispatches one program per "
                 "request over the relay (~28 ms RTT each), so these "
                 "numbers are RTT-bound and the fused kernel's device-side "
                 "advantage (amortized eval 2020 vs 1333 clouds/s, "
                 "bench_full_extras_r5.json) is mostly masked — the two "
                 "configs' spreads overlap; on a non-tunneled deployment "
                 "the device times (15.8 vs 24 ms per B=32 forward) set "
                 "the batched ceiling"),
    }
    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "benchmarks", "serve_spread.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
