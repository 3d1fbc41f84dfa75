"""Native C++ preprocessing library vs numpy/jax oracles."""

import numpy as np

from si_mamba_tpu.native import fps_cpu, knn_cpu, native_available


def test_native_builds():
    assert native_available(), "g++ build of libpointops.so failed"


def test_fps_cpu_matches_jax_op():
    from si_mamba_tpu.ops import fps

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((3, 128, 3)).astype(np.float32)
    got = fps_cpu(pts, 16)
    ref = np.asarray(fps(pts, 16))
    np.testing.assert_array_equal(got, ref)


def test_fps_cpu_single_cloud():
    rng = np.random.default_rng(1)
    pts = rng.standard_normal((64, 3)).astype(np.float32)
    idx = fps_cpu(pts, 8)
    assert idx.shape == (8,) and idx[0] == 0
    assert len(set(idx.tolist())) == 8


def test_knn_cpu_matches_numpy():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((2, 10, 3)).astype(np.float32)
    p = rng.standard_normal((2, 50, 3)).astype(np.float32)
    got = knn_cpu(q, p, 5)
    for b in range(2):
        d = ((q[b][:, None] - p[b][None]) ** 2).sum(-1)
        ref = np.argsort(d, -1, kind="stable")[:, :5]
        for i in range(10):
            assert set(got[b, i].tolist()) == set(ref[i].tolist())
