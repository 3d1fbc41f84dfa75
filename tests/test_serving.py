"""Serving surface (si_mamba_tpu/serving.py): checkpoint -> bucketed jitted
batch predictor, consistent with the training-time eval forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from si_mamba_tpu.models import PointMamba, PointMambaConfig
from si_mamba_tpu.serving import Predictor, _buckets


def test_buckets():
    assert _buckets(64) == [2, 4, 8, 16, 32, 64]
    # floor is 2 even at max_batch=1 (batch-1 XLA TPU compiler crash guard)
    assert _buckets(1) == [2]


def _small_predictor(max_batch=8):
    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0)
    model = PointMamba(cfg)
    pts = jnp.zeros((2, 128, 3))
    variables = model.init(jax.random.key(0), pts, train=False)
    return Predictor(model=model, variables=variables, npoints=128,
                     max_batch=max_batch), model, variables


def test_predictor_matches_direct_forward_and_pads():
    p, model, variables = _small_predictor()
    rng = np.random.default_rng(0)
    clouds = rng.standard_normal((11, 128, 3)).astype(np.float32)  # ragged

    logits = p.logits(clouds)
    assert logits.shape == (11, 4)
    # padding/bucketing must not change the per-example result
    direct = np.asarray(model.apply(variables, jnp.asarray(clouds[:8]),
                                    train=False))
    np.testing.assert_allclose(logits[:8], direct, rtol=2e-5, atol=2e-5)

    probs = p.predict_proba(clouds)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert (p.predict(clouds) == logits.argmax(-1)).all()


def test_predictor_fps_resamples_oversized_clouds():
    p, model, variables = _small_predictor(max_batch=4)
    rng = np.random.default_rng(1)
    clouds = rng.standard_normal((2, 200, 3)).astype(np.float32)  # > npoints
    # unexpected N raises (each new N is a serve-time recompile) ...
    import pytest as _pytest

    with _pytest.raises(ValueError):
        p.logits(clouds)
    # ... unless the predictor is built for that request shape
    p200 = Predictor(model=p.model, variables=p.variables, npoints=128,
                     max_batch=4, input_points=200)
    logits = p200.logits(clouds)
    assert logits.shape == (2, 4)
    assert np.isfinite(logits).all()

    # empty requests return an empty result, not a crash
    assert p.logits(np.zeros((0, 128, 3), np.float32)).shape == (0, 4)


def test_predictor_multiple_n_buckets():
    """input_points=(N1, N2): both request shapes serve without
    allow_recompile, per-example results match the single-N predictor, and
    N < npoints is rejected up front (the serve path cannot upsample)."""
    import pytest as _pytest

    p, model, variables = _small_predictor(max_batch=4)
    p2 = Predictor(model=model, variables=variables, npoints=128,
                   max_batch=4, input_points=(128, 200))
    rng = np.random.default_rng(3)
    for n_pts in (128, 200):
        clouds = rng.standard_normal((3, n_pts, 3)).astype(np.float32)
        logits = p2.logits(clouds)
        assert logits.shape == (3, 4)
        assert np.isfinite(logits).all()
        if n_pts == 128:
            np.testing.assert_allclose(logits, p.logits(clouds),
                                       rtol=2e-5, atol=2e-5)
    with _pytest.raises(ValueError, match="cannot upsample"):
        Predictor(model=model, variables=variables, npoints=128,
                  max_batch=4, input_points=(128, 64))
    p2.warmup()  # tuple input_points must warm every (bucket, N) pair


def test_predictor_from_orbax_checkpoint(tmp_path):
    from si_mamba_tpu.train import checkpoint as ckpt
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState

    cfg = dict(trans_dim=32, depth=2, cls_dim=4, group_size=8, num_group=16,
               encoder_dims=32, knn_graph=4, drop_path=0.0)
    model = PointMamba(PointMambaConfig.from_dict(cfg))
    variables = model.init(jax.random.key(0), jnp.zeros((2, 128, 3)),
                           train=False)
    tx, _ = build_optimizer(variables["params"])
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    ckpt.save_checkpoint(str(tmp_path), "ckpt-best", state, epoch=0, metrics={})

    p = Predictor.from_checkpoint(str(tmp_path / "ckpt-best"), model_cfg=cfg,
                                  npoints=128, max_batch=4)
    p.warmup()
    clouds = np.random.default_rng(2).standard_normal((3, 128, 3)).astype(np.float32)
    direct = np.asarray(model.apply(variables, jnp.asarray(clouds), train=False))
    np.testing.assert_allclose(p.logits(clouds), direct, rtol=2e-5, atol=2e-5)


def test_predictor_ssd_mixer():
    """The serving Predictor works with the opt-in SSD mixer and matches the
    direct SSD forward (config flows through PointMambaConfig.mixer)."""
    cfg = PointMambaConfig(trans_dim=32, depth=2, cls_dim=4, group_size=8,
                           num_group=16, encoder_dims=32, knn_graph=4,
                           drop_path=0.0, mixer="ssd")
    model = PointMamba(cfg)
    pts = jnp.zeros((2, 128, 3))
    variables = model.init(jax.random.key(0), pts, train=False)
    p = Predictor(model=model, variables=variables, npoints=128, max_batch=4)
    rng = np.random.default_rng(2)
    clouds = rng.standard_normal((3, 128, 3)).astype(np.float32)
    logits = p.logits(clouds)
    direct = np.asarray(model.apply(variables, jnp.asarray(clouds[:2]),
                                    train=False))
    np.testing.assert_allclose(logits[:2], direct, rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# MicroBatcher (deadline-driven request coalescing)
# ---------------------------------------------------------------------------

def test_microbatcher_coalesces_deterministically():
    """While the dispatcher is blocked inside fn on batch 1, four more
    same-N requests queue up — they MUST coalesce into a single batch 2."""
    import threading

    from si_mamba_tpu.serving import MicroBatcher

    entered, release = threading.Event(), threading.Event()
    sizes = []

    def fn(batch):
        sizes.append(len(batch))
        entered.set()
        release.wait(timeout=30)
        return batch.sum(axis=(1, 2))

    rng = np.random.default_rng(0)
    clouds = [rng.standard_normal((16, 3)).astype(np.float32) for _ in range(5)]
    with MicroBatcher(fn, max_batch=4, max_delay_ms=50) as mb:
        futs = [mb.submit(clouds[0])]
        assert entered.wait(timeout=30)  # dispatcher is inside fn w/ batch 1
        futs += [mb.submit(c) for c in clouds[1:]]
        release.set()
        results = [f.result(timeout=30) for f in futs]

    assert sizes == [1, 4]
    assert mb.n_batches == 2 and mb.n_requests == 5
    assert mb.mean_batch_size == 2.5
    for c, r in zip(clouds, results):
        np.testing.assert_allclose(r, c.sum(), rtol=1e-6)


def test_microbatcher_never_mixes_different_n():
    import threading

    from si_mamba_tpu.serving import MicroBatcher

    entered, release = threading.Event(), threading.Event()
    shapes = []

    def fn(batch):
        shapes.append(batch.shape)
        entered.set()
        release.wait(timeout=30)
        return batch.sum(axis=(1, 2))

    rng = np.random.default_rng(1)
    a = [rng.standard_normal((16, 3)).astype(np.float32) for _ in range(2)]
    b = [rng.standard_normal((32, 3)).astype(np.float32) for _ in range(2)]
    with MicroBatcher(fn, max_batch=8, max_delay_ms=50) as mb:
        f0 = mb.submit(a[0])
        assert entered.wait(timeout=30)
        # interleave Ns while the dispatcher is blocked: must split batches
        futs = [mb.submit(a[1]), mb.submit(b[0]), mb.submit(b[1])]
        release.set()
        res = [f.result(timeout=30) for f in [f0] + futs]

    # every fired batch stacked a single N (np.stack would raise otherwise)
    assert all(s[1] in (16, 32) for s in shapes)
    for c, r in zip([a[0], a[1], b[0], b[1]], res):
        np.testing.assert_allclose(r, c.sum(), rtol=1e-6)
    # at least one flush happened because of the N change
    assert mb.n_batches >= 2


def test_microbatcher_exception_propagates_and_stop_drains():
    from si_mamba_tpu.serving import MicroBatcher

    def boom(batch):
        raise ValueError("bad batch")

    mb = MicroBatcher(boom, max_batch=2, max_delay_ms=1)
    f = mb.submit(np.zeros((8, 3), np.float32))
    with pytest.raises(ValueError, match="bad batch"):
        f.result(timeout=30)
    mb.stop()
    mb.stop()  # idempotent
    with pytest.raises(RuntimeError, match="stopped"):
        mb.submit(np.zeros((8, 3), np.float32))
    with pytest.raises(ValueError, match=r"\(N, 3\) cloud"):
        MicroBatcher(boom).submit(np.zeros((4, 2), np.float32))


def test_microbatcher_with_real_predictor():
    from si_mamba_tpu.serving import MicroBatcher

    p, _, _ = _small_predictor(max_batch=4)
    rng = np.random.default_rng(3)
    clouds = rng.standard_normal((5, 128, 3)).astype(np.float32)
    with MicroBatcher(p.predict_proba, max_batch=4, max_delay_ms=20) as mb:
        futs = [mb.submit(c) for c in clouds]
        got = np.stack([f.result(timeout=300) for f in futs])
    want = p.predict_proba(clouds)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)
