"""Per-op microbenchmarks: spectral eigh+scan p50 and friends (the
BASELINE.json latency metrics). Prints one JSON object.

Amortizes K iterations inside one jitted lax.scan per op (see bench.py notes
on the harness relay latency). Run: python benchmarks/microbench.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 10


def _amortized(fn, *args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def multi(*a):
        def body(acc, _):
            out = fn(*((a[0] + acc * 1e-30,) + a[1:]))
            s = jnp.sum(jax.tree.leaves(out)[0]).astype(jnp.float32)
            return s, s

        _, outs = lax.scan(body, jnp.float32(0), jnp.arange(K))
        return outs

    np.asarray(multi(*args))
    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(multi(*args))
        lat.append((time.perf_counter() - t0) / K)
    return float(np.median(lat) * 1e3)


def main():
    import jax.numpy as jnp

    from si_mamba_tpu.ops import (
        chamfer_l2,
        fps,
        gather_points,
        knn,
        knn_adjacency,
        rw_laplacian,
        topk_eigh,
    )
    from si_mamba_tpu.ops.pallas.selective_scan_kernel import selective_scan_pallas
    from si_mamba_tpu.ops.spectral import topk_smallest_subspace

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    B, N, G = 32, 1024, 64
    pts = mk(B, N, 3)
    centers = mk(B, G, 3)

    results = {}
    results["fps_1024to64_ms"] = _amortized(lambda p: fps(p, G), pts)
    results["knn_group_ms"] = _amortized(lambda p: knn(p[:, :G], p, 32), pts)
    A = knn_adjacency(centers, k=20, symmetric=True, binary=True)
    L = rw_laplacian(A)
    results["graph_adjacency_ms"] = _amortized(
        lambda c: knn_adjacency(c, k=20, symmetric=True, binary=True), centers)
    results["eigh_64_ms"] = _amortized(lambda M: topk_eigh(M, 4)[1], L)
    results["subspace_64_ms"] = _amortized(lambda M: topk_smallest_subspace(M, 4)[1], L)
    results["chamfer_ms"] = _amortized(lambda a: chamfer_l2(a, a + 0.1), mk(64, 512, 3))

    l, d, n = 512, 768, 16
    u, dt, z = mk(B, l, d), mk(B, l, d) * 0.5, mk(B, l, d)
    Am = -jnp.exp(mk(d, n))
    Bc, Cc, D, db = mk(B, l, n), mk(B, l, n), mk(d), mk(d) * 0.1
    results["scan_fwd_L512_ms"] = _amortized(
        lambda u: selective_scan_pallas(u, dt, Am, Bc, Cc, D=D, z=z, delta_bias=db), u)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
