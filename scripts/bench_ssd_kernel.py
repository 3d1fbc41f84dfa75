"""Kernel-level A/B: XLA chunked SSD vs the fused Pallas SSD kernel.

Isolates the mixer-core recurrence (ops/ssd.ssd_chunked vs
ops/pallas/ssd_kernel.ssd_chunked_pallas) at the production bench geometry
(B=32, L=512, 12 layers' worth of calls amortized in one lax.scan), fwd-only
and fwd+bwd, so the full-step bench delta can be attributed. Timing follows
the repo rule: host readback as the fence, K in-graph iterations
(tpu-harness-gotchas).

Run on the chip:
    PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
      JAX_PLATFORMS=tpu timeout 3600 python scripts/bench_ssd_kernel.py
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.ops.pallas.ssd_kernel import ssd_chunked_pallas
    from si_mamba_tpu.ops.ssd import ssd_chunked

    B, L, H, P, N, CHUNK, LAYERS, K = 32, 512, 6, 128, 128, 128, 12, 5
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    x = mk(B, L, H, P).astype(jnp.bfloat16)
    dt = jax.nn.softplus(mk(B, L, H))
    A = -jnp.exp(mk(H) * 0.3)
    Bm, Cm = mk(B, L, N).astype(jnp.bfloat16), mk(B, L, N).astype(jnp.bfloat16)
    D = mk(H)

    impls = {
        "xla": lambda *a: ssd_chunked(*a, chunk=CHUNK),
        "pallas": lambda *a: ssd_chunked_pallas(*a, chunk=CHUNK),
        # chunk sweep: larger q amortizes the per-head B/C re-reads and
        # halves grid steps at the cost of q^2-scaled intra-chunk FLOPs
        "pallas_q256": lambda *a: ssd_chunked_pallas(*a, chunk=256),
    }
    out = {}
    for name, f in impls.items():
        # LAYERS sequential calls inside one program ~ the 12-layer stack
        @jax.jit
        def fwd_many(x, dt, A, Bm, Cm, D, f=f):
            def body(h, _):
                return f(h, dt, A, Bm, Cm, D), ()
            h, _ = lax.scan(body, x, jnp.arange(LAYERS))
            return jnp.sum(h.astype(jnp.float32))

        @jax.jit
        def step_many(x, dt, A, Bm, Cm, D, f=f):
            def loss(x, dt, A, Bm, Cm):
                def body(h, _):
                    return f(h, dt, A, Bm, Cm, D), ()
                h, _ = lax.scan(body, x, jnp.arange(LAYERS))
                return jnp.sum(h.astype(jnp.float32))
            l, g = jax.value_and_grad(loss, argnums=(0, 1, 3, 4))(
                x, dt, A, Bm, Cm)
            return l + sum(jnp.sum(t.astype(jnp.float32)) for t in g)

        for tag, fn in (("fwd", fwd_many), ("fwdbwd", step_many)):
            t0 = time.perf_counter()
            np.asarray(fn(x, dt, A, Bm, Cm, D))
            out[f"{name}_{tag}_compile_s"] = round(time.perf_counter() - t0, 1)
            lat = []
            for _ in range(K):
                t0 = time.perf_counter()
                np.asarray(fn(x, dt, A, Bm, Cm, D))
                lat.append(time.perf_counter() - t0)
            ms = float(np.median(lat)) * 1e3
            out[f"{name}_{tag}_ms_12layer"] = round(ms, 2)
    if "xla_fwdbwd_ms_12layer" in out and "pallas_fwdbwd_ms_12layer" in out:
        out["fwdbwd_speedup"] = round(
            out["xla_fwdbwd_ms_12layer"] / out["pallas_fwdbwd_ms_12layer"], 2)
    print(json.dumps(out, indent=1))
    import os

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "ssd_kernel_ab.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print("written:", dst)


if __name__ == "__main__":
    main()
