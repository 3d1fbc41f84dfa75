import numpy as np

from si_mamba_tpu.ops import chamfer_l1, chamfer_l2


def _np_chamfer(x, y, squared=True):
    d = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
    if not squared:
        d = np.sqrt(d)
    return d.min(-1).mean(-1) + d.min(-2).mean(-1)


def test_chamfer_l2_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 32, 3)).astype(np.float32)
    y = rng.standard_normal((4, 48, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(chamfer_l2(x, y, batch_reduction=None)), _np_chamfer(x, y), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(chamfer_l2(x, y)), _np_chamfer(x, y).mean(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(chamfer_l1(x, y, batch_reduction=None)),
        _np_chamfer(x, y, squared=False),
        rtol=1e-5,
    )


def test_chamfer_zero_for_identical():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 3)).astype(np.float32)
    assert float(chamfer_l2(x, x)) < 1e-10


def test_emd_sinkhorn():
    from si_mamba_tpu.ops.emd import emd_sinkhorn

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 16, 3)).astype(np.float32)
    # identical clouds -> near-zero EMD; shifted clouds -> larger
    near = float(emd_sinkhorn(x, x + 1e-4))
    far = float(emd_sinkhorn(x, x + 1.0))
    assert near < 0.05 and far > near * 10
    per = emd_sinkhorn(x, x, batch_reduction=None)
    assert per.shape == (2,)
