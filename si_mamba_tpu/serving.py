"""Batch inference / serving surface for the classification models.

The reference has no serving path beyond ``--test`` (tools/runner_finetune.py
:409-467); production point-cloud classification needs a stable API:
checkpoint in → jitted padded-batch predictor out. TPU-first choices:

- ONE compiled program per (batch-bucket) shape: requests are padded up to a
  fixed bucket so XLA never recompiles at serve time (buckets are powers of
  two up to ``max_batch``);
- optional bf16 mixed precision + subspace eigensolver (the accuracy-neutral
  perf config, cfgs/finetune_modelnet_perf.yaml);
- accepts either an orbax experiment checkpoint (``ckpt-best``/``ckpt-last``)
  or a reference-format torch ``.pth`` via the importer;
- deterministic: eval-mode forward, fixed FPS start (reference validate
  semantics), no RNG.

Usage::

    from si_mamba_tpu.serving import Predictor
    p = Predictor.from_checkpoint("experiments/.../ckpt-best",
                                  model_cfg=dict(cls_dim=40))
    probs = p.predict_proba(clouds)      # (n, npoints, 3) any n
    labels = p.predict(clouds)
"""

from __future__ import annotations

import dataclasses
from typing import Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from si_mamba_tpu.models import PointMamba, PointMambaConfig


def _buckets(max_batch: int) -> list[int]:
    # Smallest bucket is ALWAYS 2 (even for max_batch=1): compiling the full
    # model at batch 1 trips the XLA TPU FusedSpatialMajorConvolution
    # cost-analysis CHECK (the same compiler bug family as the rank-4
    # Dense→BN→reduce crash, see models/embed.py) — single requests are
    # padded to 2 and trimmed.
    out = [2]
    while out[-1] < max_batch:
        out.append(min(out[-1] * 2, max_batch))
    return out


@dataclasses.dataclass
class Predictor:
    """Jitted, shape-bucketed batch predictor for ``PointMamba``."""

    model: PointMamba
    variables: Mapping
    npoints: int = 1024
    max_batch: int = 64
    # Accepted request N(s): an int or a sequence of ints (e.g. (1024, 2048)
    # compiles one program family per N — jit caches by shape, so extra
    # N-buckets cost only warmup compiles, not serve-time latency).
    input_points: Optional[object] = None  # default: (npoints,)
    allow_recompile: bool = False

    def __post_init__(self):
        from si_mamba_tpu.train.runner_finetune import _fps_to_npoints

        # commit params to device ONCE — orbax restores host numpy arrays,
        # and jit would re-upload the whole tree on every call otherwise
        self.variables = jax.device_put(self.variables)
        if self.input_points is None:
            self.input_points = self.npoints
        if isinstance(self.input_points, int):
            self.input_points = (self.input_points,)
        self.input_points = tuple(int(n) for n in self.input_points)
        bad = [n for n in self.input_points if n < self.npoints]
        if bad:
            raise ValueError(
                f"input_points {bad} < npoints={self.npoints}: the serve path "
                f"FPS-downsamples each request to npoints and cannot upsample")
        model, npoints = self.model, self.npoints

        @jax.jit
        def fwd(variables, pts):
            pts = _fps_to_npoints(pts, npoints)
            return model.apply(variables, pts, train=False)

        self._fwd = fwd
        self._bucket_list = _buckets(self.max_batch)

    # -- constructors -----------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, model_cfg: Optional[dict] = None,
                        npoints: int = 1024, max_batch: int = 64,
                        perf: bool = False,
                        input_points: Optional[int] = None,
                        allow_recompile: bool = False) -> "Predictor":
        """``path``: an orbax checkpoint dir (ckpt-best/ckpt-last) or a
        reference-format torch ``.pth``. ``model_cfg``: PointMambaConfig
        overrides (cls_dim etc.). ``perf=True`` enables bf16 + subspace.
        ``input_points``/``allow_recompile``: the N != npoints escape hatch
        (see ``Predictor.logits``), forwarded to the constructor."""
        import os

        over = dict(model_cfg or {})
        if perf:
            over.setdefault("dtype", "bfloat16")
            over.setdefault("spectral_method", "subspace")
        cfg = PointMambaConfig.from_dict(over)
        model = PointMamba(cfg)

        if path.endswith(".pth"):
            from si_mamba_tpu.utils.torch_import import load_pointmamba_checkpoint

            variables, _ = load_pointmamba_checkpoint(path, depth=cfg.depth)
        else:
            from si_mamba_tpu.train.checkpoint import load_checkpoint

            payload = load_checkpoint(os.path.dirname(path) or ".",
                                      os.path.basename(path))
            if payload is None:
                raise FileNotFoundError(path)
            variables = {"params": payload["params"],
                         "batch_stats": payload["batch_stats"]}
        return cls(model=model, variables=variables, npoints=npoints,
                   max_batch=max_batch, input_points=input_points,
                   allow_recompile=allow_recompile)

    # -- inference --------------------------------------------------------
    def _bucket(self, n: int) -> int:
        for b in self._bucket_list:
            if n <= b:
                return b
        return self.max_batch

    def logits(self, clouds: np.ndarray) -> np.ndarray:
        """clouds: (n, N, 3), any n — padded to the nearest bucket, chunked
        at max_batch. Returns (n, cls_dim).

        N must be one of ``input_points`` (each distinct N is a fresh XLA
        compile — minutes on a tunneled chip — so an unexpected shape
        raises unless ``allow_recompile=True``)."""
        clouds = np.asarray(clouds, np.float32)
        n = clouds.shape[0]
        if n == 0:
            return np.zeros((0, self.model.config.cls_dim), np.float32)
        if clouds.shape[1] < self.npoints:
            # independent of allow_recompile: _fps_to_npoints only
            # downsamples, so the model would silently run on too few points
            raise ValueError(
                f"request has {clouds.shape[1]} points < npoints="
                f"{self.npoints}: the serve path cannot upsample — resample "
                f"on the host")
        if clouds.shape[1] not in self.input_points and not self.allow_recompile:
            raise ValueError(
                f"request has {clouds.shape[1]} points but the predictor was "
                f"compiled for {self.input_points}; resample on the host or "
                f"construct with allow_recompile=True / input_points="
                f"{self.input_points + (clouds.shape[1],)}")
        outs = []
        for s0 in range(0, n, self.max_batch):
            part = clouds[s0:s0 + self.max_batch]
            b = self._bucket(len(part))
            if len(part) < b:
                pad = np.repeat(part[-1:], b - len(part), axis=0)
                part = np.concatenate([part, pad], axis=0)
            out = np.asarray(self._fwd(self.variables, jnp.asarray(part)),
                             np.float32)
            outs.append(out[:min(self.max_batch, n - s0)])
        return np.concatenate(outs, axis=0)

    def predict_proba(self, clouds: np.ndarray) -> np.ndarray:
        logits = self.logits(clouds)
        e = np.exp(logits - logits.max(axis=-1, keepdims=True))
        return e / e.sum(axis=-1, keepdims=True)

    def predict(self, clouds: np.ndarray) -> np.ndarray:
        return self.logits(clouds).argmax(axis=-1)

    def warmup(self) -> None:
        """Pre-compile every (batch-bucket, N-bucket) shape (call once
        before serving)."""
        for n_pts in self.input_points:
            for b in self._bucket_list:
                dummy = np.zeros((b, n_pts, 3), np.float32)
                np.asarray(self._fwd(self.variables, jnp.asarray(dummy)))


class MicroBatcher:
    """Deadline-driven request coalescing in front of a batch predictor.

    Production serving receives SINGLE clouds from many concurrent clients;
    dispatching each alone wastes the chip (a batch-1 program pays nearly the
    full step latency of a batch-64 one — see PARITY.md serving numbers).
    ``submit`` enqueues a request and returns a ``concurrent.futures.Future``;
    one dispatcher thread coalesces requests into a batch and fires when
    either ``max_batch`` are waiting or the oldest has waited
    ``max_delay_ms`` — the standard latency/throughput knob.

    ``fn`` is any ``(b, N, 3) ndarray -> (b, ...)`` batch function (e.g.
    ``Predictor.predict_proba``). Requests with different N are never mixed
    into one batch (they can't stack): an N change flushes the current batch
    and starts the next — keep per-N traffic on separate batchers if N varies
    wildly. Thread-safe; use as a context manager or call ``stop()``.
    """

    _STOP = object()

    def __init__(self, fn, *, max_batch: int = 64, max_delay_ms: float = 5.0):
        import queue as _queue
        import threading

        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self._fn = fn
        self._max_batch = int(max_batch)
        self._delay = float(max_delay_ms) / 1e3
        self._q: "_queue.Queue" = _queue.Queue()
        self.n_requests = 0
        self.n_batches = 0
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._stopped = False
        self._thread.start()

    def submit(self, cloud: np.ndarray):
        """Enqueue one (N, 3) cloud; returns a Future of ``fn``'s row for it."""
        from concurrent.futures import Future

        cloud = np.asarray(cloud, np.float32)
        if cloud.ndim != 2 or cloud.shape[-1] != 3:
            raise ValueError(f"expected one (N, 3) cloud, got {cloud.shape}")
        if self._stopped:
            raise RuntimeError("MicroBatcher is stopped")
        fut: Future = Future()
        self._q.put((cloud, fut))
        return fut

    def _fire(self, batch) -> None:
        self.n_batches += 1
        self.n_requests += len(batch)
        try:
            out = self._fn(np.stack([c for c, _ in batch]))
        except BaseException as e:  # propagate to every waiter in the batch
            for _, f in batch:
                if not f.cancelled():
                    f.set_exception(e)
            return
        for i, (_, f) in enumerate(batch):
            if not f.cancelled():
                f.set_result(np.asarray(out[i]))

    def _loop(self) -> None:
        import queue as _queue
        import time

        carry = None  # an item whose N didn't match the batch being built
        while True:
            item = carry if carry is not None else self._q.get()
            carry = None
            if item is self._STOP:
                break
            batch = [item]
            n_pts = item[0].shape[0]
            deadline = time.monotonic() + self._delay
            while len(batch) < self._max_batch:
                left = deadline - time.monotonic()
                if left <= 0:
                    break
                try:
                    nxt = self._q.get(timeout=left)
                except _queue.Empty:
                    break
                if nxt is self._STOP or nxt[0].shape[0] != n_pts:
                    carry = nxt  # flush now; handle the stop/new-N item next
                    break
                batch.append(nxt)
            self._fire(batch)
            if carry is self._STOP:
                break
        self._drain()

    def _drain(self) -> None:
        """Fail anything still queued after stop (no silent hangs)."""
        import queue as _queue

        while True:
            try:
                item = self._q.get_nowait()
            except _queue.Empty:
                break
            if item is not self._STOP and not item[1].cancelled():
                item[1].set_exception(RuntimeError("MicroBatcher stopped"))

    @property
    def mean_batch_size(self) -> float:
        return self.n_requests / max(self.n_batches, 1)

    def stop(self) -> None:
        """Drain in-flight work, then stop the dispatcher (idempotent)."""
        if not self._stopped:
            self._stopped = True
            self._q.put(self._STOP)
        self._thread.join()
        self._drain()  # catch submits that raced the stop flag

    def __enter__(self) -> "MicroBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.stop()
