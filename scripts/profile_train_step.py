"""Per-op device-time profile of the ModelNet40 train step on the real TPU.

Captures a jax.profiler trace of the bench.py workload (B=32 bf16+subspace
train step), parses the xplane proto, and writes a sorted per-op table with
a category breakdown (scan kernels / conv kernels / matmul / eigh / fusion
glue) to ``benchmarks/profile_train_step.json``. With ``--pretrain``,
profiles the MAE pretrain step instead (B=128, cfgs/pretrain.yaml shape,
bf16 + jacobi wavelet solver) into ``profile_pretrain_step.json``. With
``--ssd``, profiles the opt-in SSD-mixer train step (same bench shape)
into ``profile_ssd_step.json``; ``--ssd-fused`` routes it through the
fused Pallas SSD kernel (profile_ssd_fused_step.json).

Run (axon tunnel):
  PYTHONPATH=/root/repo:/root/.axon_site JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache \
    JAX_PLATFORMS=tpu timeout 1800 python scripts/profile_train_step.py \
    [--pretrain | --ssd | --ssd-fused]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_STEPS = 10


def capture(tracedir: str, mixer: str = "mamba",
            scan_impl: str | None = None, hardest: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step

    B, N = 32, 1024
    kw = {"scan_impl": scan_impl} if scan_impl else {}
    if scan_impl == "ssd_fused":
        # match the measured preset configs (bench.py measure_ssd override,
        # cfgs/finetune_modelnet_ssd_fused.yaml + finetune_scan_hardest_
        # ssd_fused.yaml): 256-token chunks won the round-4 flagship A/B
        # (benchmarks/ssd_kernel_ab.json) AND the round-5 hardest A/B
        kw["ssd_chunk"] = 256
    if hardest:
        # cfgs/finetune_scan_hardest.yaml geometry: N=2048, G=128, 15-way
        # (the thinnest perf margin vs the reference GPU — VERDICT r3 #4)
        N = 2048
        kw.update(num_group=128, cls_dim=15)
    cfg = PointMambaConfig(dtype="bfloat16", spectral_method="subspace",
                           mixer=mixer, **kw)
    if scan_impl == "ssd_fused":
        from si_mamba_tpu.ops.ssd import ssd_fused_engaged

        seq_tokens = cfg.k_top_eigenvectors * cfg.num_group * 2
        if not ssd_fused_engaged(seq_tokens, chunk=cfg.ssd_chunk):
            raise RuntimeError(
                "--ssd-fused would profile the XLA fallback (not on a TPU "
                "backend or geometry misses the Mosaic tiles) — refusing "
                "to write an A/A trace as profile_ssd_fused_step.json")
    model = PointMamba(cfg)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 40, B).astype(np.int32))
    variables = model.init(jax.random.key(0), pts[:2], train=False)
    tx, _ = build_optimizer(variables["params"], lr=3e-4, epochs=300,
                            warmup_epochs=10, steps_per_epoch=300)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step_fn = make_classifier_train_step(model)

    @jax.jit
    def multi_step(state, pts, labels, key):
        def body(st, _):
            st, m = step_fn(st, pts, labels, key)
            return st, m["loss"]

        state, losses = lax.scan(body, state, jnp.arange(K_STEPS))
        return state, losses

    key = jax.random.key(1)
    state, losses = multi_step(state, pts, labels, key)
    np.asarray(losses)  # warm compile + sync
    t0 = time.perf_counter()
    state, losses = multi_step(state, pts, labels, key)
    np.asarray(losses)
    wall_ms = (time.perf_counter() - t0) / K_STEPS * 1e3
    print(f"step wall (amortized): {wall_ms:.2f} ms")

    jax.profiler.start_trace(tracedir)
    state, losses = multi_step(state, pts, labels, key)
    np.asarray(losses)
    jax.profiler.stop_trace()
    return wall_ms


def capture_pretrain(tracedir: str, mixer: str = "mamba",
                     scan_impl: str | None = None) -> float:
    global K_STEPS
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.models.point_mae import PointMAEConfig, PointMAEMamba
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.runner_pretrain import make_pretrain_step
    from si_mamba_tpu.train.train_state import TrainState

    B, N = 128, 1024
    kw = {"scan_impl": scan_impl} if scan_impl else {}
    cfg = dataclasses.replace(PointMAEConfig(dtype="bfloat16"),
                              wavelet_solver="jacobi", mixer=mixer, **kw)
    if scan_impl == "ssd_fused":
        from si_mamba_tpu.ops.ssd import ssd_fused_engaged

        # ssd_fused_engaged pads the length to a chunk multiple before the
        # tile check, so engagement depends only on backend + the model's
        # (chunk, d_state, head_dim) geometry — in practice this guards
        # against profiling the XLA fallback off-TPU. Pass the model's own
        # chunk knob, not the default.
        if not ssd_fused_engaged(cfg.num_group, chunk=cfg.ssd_chunk):
            raise RuntimeError(
                "--pretrain --ssd-fused would profile the XLA fallback — "
                "refusing to write an A/A trace")
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
    k = max(1, K_STEPS // 2)  # the pretrain step is ~4x the finetune step

    @jax.jit
    def multi_step(state, pts, key):
        def body(st, _):
            st, m = step_fn(st, pts, key, 0.5)
            return st, m["loss"]

        state, losses = lax.scan(body, state, jnp.arange(k))
        return state, losses

    key = jax.random.key(3)
    state, losses = multi_step(state, pts, key)
    np.asarray(losses)
    t0 = time.perf_counter()
    state, losses = multi_step(state, pts, key)
    np.asarray(losses)
    wall_ms = (time.perf_counter() - t0) / k * 1e3
    print(f"pretrain step wall (amortized): {wall_ms:.2f} ms")

    jax.profiler.start_trace(tracedir)
    state, losses = multi_step(state, pts, key)
    np.asarray(losses)
    jax.profiler.stop_trace()
    K_STEPS = k  # parse() amortizes by the actual in-graph step count
    return wall_ms


def parse(tracedir: str) -> dict:
    """Aggregate per-op device time from the xplane proto ('XLA Ops' line of
    the TPU plane)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane under {tracedir}"
    ops = {}
    wrappers_ps = 0
    total_ps = 0
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta.get(ev.metadata_id, "?")
                    # Control-flow wrapper ops (the outer K-step lax.scan
                    # while, conditionals, calls) report durations that
                    # INCLUDE their children, which appear on the same
                    # line — counting them double-books every leaf op
                    # (the round-2 artifact's 130 ms "total" for a 68 ms
                    # step). Track them separately; totals are leaf-only.
                    if name.lstrip("%").startswith(("while", "conditional",
                                                    "call")):
                        wrappers_ps += ev.duration_ps
                        continue
                    ops[name] = ops.get(name, 0) + ev.duration_ps
                    total_ps += ev.duration_ps
    return ops, total_ps, wrappers_ps


CATS = [
    ("scan_bwd", lambda n: "bwd" in n and ("fusion" in n or "custom-call" in n)
        and "scan" in n),
    ("pallas_scan", lambda n: "tpu_custom_call" in n or "custom-call" in n),
    ("matmul", lambda n: n.startswith(("dot", "convolution"))
        or ".dot" in n or "gemm" in n),
    ("eigh_qr", lambda n: any(k in n for k in ("eigh", "qr", "cholesky",
                                               "triangular"))),
    ("sort_topk", lambda n: "sort" in n or "top-k" in n or "topk" in n),
    ("fusion", lambda n: n.startswith("fusion")),
    ("copy_reshape", lambda n: any(k in n for k in ("copy", "transpose",
                                                    "reshape", "bitcast"))),
]


def categorize(name: str) -> str:
    name = name.lstrip("%")
    for cat, pred in CATS:
        if pred(name):
            return cat
    return "other"


def main():
    pretrain = "--pretrain" in sys.argv[1:]
    ssd = "--ssd" in sys.argv[1:]
    ssd_fused = "--ssd-fused" in sys.argv[1:]  # fused Pallas SSD kernel
    hardest = "--hardest" in sys.argv[1:]  # finetune_scan_hardest geometry
    tracedir = "/tmp/si_mamba_trace"
    # Each start_trace writes a new plugins/profile/<ts>/*.xplane.pb; stale
    # files from earlier runs would be summed by the glob (leaf totals came
    # out exactly 2x wall when two runs accumulated) — start clean.
    import shutil
    shutil.rmtree(tracedir, ignore_errors=True)
    os.makedirs(tracedir, exist_ok=True)
    if pretrain:
        wall_ms = capture_pretrain(
            tracedir, mixer="ssd" if (ssd or ssd_fused) else "mamba",
            scan_impl="ssd_fused" if ssd_fused else None)
    else:
        wall_ms = capture(
            tracedir, mixer="ssd" if (ssd or ssd_fused) else "mamba",
            scan_impl="ssd_fused" if ssd_fused else None, hardest=hardest)
    ops, total_ps, wrappers_ps = parse(tracedir)
    rows = sorted(ops.items(), key=lambda kv: -kv[1])
    per_step = lambda ps: ps / 1e9 / K_STEPS  # ps -> ms, amortized
    cats = {}
    for name, ps in rows:
        c = categorize(name)
        cats[c] = cats.get(c, 0.0) + per_step(ps)
    out = {
        "step_wall_ms": round(wall_ms, 3),
        "leaf_device_ms_per_step": round(per_step(total_ps), 3),
        "control_flow_wrapper_ms_per_step": round(per_step(wrappers_ps), 3),
        "note": "wrapper ops (outer lax.scan while etc) include their "
                "children's time and are excluded from leaf totals/categories",
        "categories_ms": {k: round(v, 3) for k, v in
                          sorted(cats.items(), key=lambda kv: -kv[1])},
        "top_ops_ms": [
            {"op": name[:120], "ms": round(per_step(ps), 4)}
            for name, ps in rows[:60]
        ],
        # per-category leaders: the global top-60 under-represents diffuse
        # categories (e.g. many small relayout copies)
        "top_ops_by_category": {
            cat: [{"op": name[:120], "ms": round(per_step(ps), 4)}
                  for name, ps in rows if categorize(name) == cat][:40]
            for cat in {categorize(n) for n, _ in rows}
        },
    }
    # filename = geometry x variant, so no flag combination can overwrite
    # another combination's artifact (e.g. --pretrain --ssd must never
    # clobber the Mamba-1 profile_pretrain_step.json baseline)
    geo = "pretrain" if pretrain else "hardest" if hardest else None
    variant = "ssd_fused" if ssd_fused else "ssd" if ssd else None
    if geo and variant:
        name = f"profile_{geo}_{variant}_step.json"
    elif geo:
        name = f"profile_{geo}_step.json"
    elif variant:
        name = f"profile_{variant}_step.json"
    else:
        name = "profile_train_step.json"
    dst = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "benchmarks", name)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"step_wall_ms": out["step_wall_ms"],
                      "leaf_ms": out["leaf_device_ms_per_step"],
                      "categories": out["categories_ms"]}, indent=1))
    print(f"written: {dst}")


if __name__ == "__main__":
    main()
