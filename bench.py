"""Benchmark harness — prints ONE JSON line for the driver.

Primary metric: ModelNet40-config training throughput, clouds/sec/chip
(forward + backward + AdamW on B=32, N=1024, SAST, 12 layers, d=384 — the
reference logs ≈140 clouds/s on its GPU, BASELINE.md). Also reports the
spectral (graph+eigh+orders) p50 latency and eval-forward throughput.

Measurement notes (this harness environment): the axon relay adds ~28 ms of
round-trip latency to EVERY dispatched program, and ``block_until_ready``
can return before remote execution finishes. Device time is therefore
measured AMORTIZED — K steps chained inside one jitted ``lax.scan`` — with a
host readback as the fence.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

BASELINE_CLOUDS_PER_SEC = 140.0  # reference logs/finetuned_modelnet40.log (GPU)
# Identical workload on the JAX CPU backend (scripts/measure_cpu_baseline.py,
# measured 2026-08-16 in this environment: 471.7 s/step). BASELINE.json's
# primary perf criterion is ">=5x CPU-baseline clouds/sec/chip".
CPU_BASELINE_CLOUDS_PER_SEC = 0.068
V5E_BF16_PEAK_FLOPS = 197e12  # per chip
# v5e VPU fp32 FMA roofline, measured in this harness (benchmarks/
# microbench VPU facts, ROADMAP round-2): ~1.25 Tops/s/chip. The train
# step is VPU-bound (the selective-scan recurrence cannot use the MXU —
# Mamba-1's per-(d,n) decay blocks a matmul reformulation), so MXU-peak
# MFU is the wrong denominator; report VPU-roofline utilization too.
V5E_VPU_FP32_OPS = 1.25e12
K_STEPS = 10
# Guard overrides (cache-warmup runs set both to huge values so every
# program compiles and lands in the persistent cache; the driver's plain
# run keeps the defaults and starts warm):
#   SI_MAMBA_BENCH_BUDGET_S      elapsed gate for post-flagship extras
#   SI_MAMBA_BENCH_COLD_GUARD_S  primary-compile-time cold-cache guard
BUDGET_S = float(os.environ.get("SI_MAMBA_BENCH_BUDGET_S", "900"))
COLD_GUARD_S = float(os.environ.get("SI_MAMBA_BENCH_COLD_GUARD_S", "120"))


def scan_vpu_gops(B, L, d_model, n_layer, d_state=16, expand=2):
    """Analytic VPU op count of the 12-layer scan fwd+bwd per train step.

    Per (b, l, d_inner, n) element: fwd ≈ 6 ops (exp(Δ·A), Δ·x·B products,
    2-op scan FMA, C-contraction), bwd ≈ 14 (state recompute 6, reverse
    scan 4, dΔ/dx/dB/dC partials 6) — counted from the kernel bodies in
    ops/pallas/selective_scan_kernel.py. Elementwise gate/D/conv terms are
    O(B·L·d_inner) and add ~3%."""
    E = B * L * (expand * d_model) * d_state
    return n_layer * (6 + 14) * E / 1e9


def main():
    import jax

    # Persistent compile cache: full-model compiles over the axon relay take
    # 5-15 min; with the cache warm (any prior run on this host) the whole
    # bench starts in seconds. Harmless on a cold cache.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    from jax import lax

    from si_mamba_tpu.models import PointMamba, PointMambaConfig
    from si_mamba_tpu.models.point_mamba import spectral_eigvecs
    from si_mamba_tpu.ops import fps, gather_points
    from si_mamba_tpu.train.optim import build_optimizer
    from si_mamba_tpu.train.train_state import TrainState, make_classifier_train_step

    B, N = 32, 1024
    # Perf configuration (accuracy-neutral, both opt-in via the same model
    # config keys in training): bf16 mixed precision — activations + matmul
    # weights bf16, fp32 params/BN/scan state (tests/test_harness.py
    # bf16 loss-decrease test) — and the MXU-only subspace eigensolver
    # (>=99% SAST order agreement with exact eigh,
    # tests/test_graph_spectral.py::test_subspace_ordering_neutrality).
    # Parity tests still run the fp32+eigh defaults.
    cfg = PointMambaConfig(dtype="bfloat16", spectral_method="subspace")
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
    # single AOT compile reused for cost analysis AND the timing loop (the
    # K-step program's flops / K = per-step flops for the MFU estimate)
    t_compile0 = time.perf_counter()
    compiled = multi_step.lower(state, pts, labels, key).compile()
    primary_compile_s = time.perf_counter() - t_compile0
    try:
        step_flops = float(compiled.cost_analysis()["flops"]) / K_STEPS
    except Exception:
        step_flops = float("nan")
    state, losses = compiled(state, pts, labels, key)
    np.asarray(losses)  # full sync (host readback)

    lat = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, losses = compiled(state, pts, labels, key)
        np.asarray(losses)
        _ = float(jnp.sum(jax.tree.leaves(state.params)[0]))
        lat.append((time.perf_counter() - t0) / K_STEPS)
    dt = float(np.median(lat))
    clouds_per_sec = B / dt
    mfu = step_flops / dt / V5E_BF16_PEAK_FLOPS

    extras = {}

    def within_budget(limit_s=BUDGET_S):
        """Elapsed gate for everything AFTER the flagship measurements —
        rounds 3 and 4 both lost the newest number to compile-budget
        starvation (VERDICT r4 weak #2), so the measurement ORDER is now
        primary -> ssd_fused -> gated extras."""
        return time.perf_counter() - t_compile0 < limit_s

    # opt-in SSD mixer (ops/ssd.py — chunked scalar-decay SSM in pure MXU
    # matmuls; Mamba-2 structure, no reference-parity claim): same train
    # step at the same shape. Fail-soft: the headline metric above never
    # depends on this block — and on a COLD compile cache (primary compile
    # over the relay took minutes) it is skipped entirely so the extra
    # full-model compile cannot push the whole bench past a driver timeout.
    def measure_ssd(scan_impl=None, prefix="ssd", eval_vote=False, out=None):
        """Writes each sub-measurement into ``out`` (default: new dict) AS IT
        COMPLETES, so a failure in a later sub-measurement (e.g. vote) cannot
        discard an already-captured train number at the call site."""
        import dataclasses as _dc

        if out is None:
            out = {}
        overrides = {"mixer": "ssd"}
        if scan_impl is not None:
            overrides["scan_impl"] = scan_impl
        if scan_impl == "ssd_fused":
            # measured best chunk at this geometry (seq 512): 256-token
            # chunks 47.1 -> 44.6 ms/step (cfgs/finetune_modelnet_ssd_fused
            # .yaml carries the same setting + the A/B citation)
            overrides["ssd_chunk"] = 256
        ssd_model = PointMamba(_dc.replace(cfg, **overrides))
        ssd_vars = ssd_model.init(jax.random.key(0), pts[:2], train=False)
        ssd_tx, _ = build_optimizer(ssd_vars["params"], lr=3e-4, epochs=300,
                                    warmup_epochs=10, steps_per_epoch=300)
        ssd_state = TrainState.create(ssd_vars["params"],
                                      ssd_vars["batch_stats"], ssd_tx)
        ssd_step = make_classifier_train_step(ssd_model)

        @jax.jit
        def ssd_multi(st, pts, labels, key):
            def body(s, _):
                s, m = ssd_step(s, pts, labels, key)
                return s, m["loss"]

            return lax.scan(body, st, jnp.arange(K_STEPS))

        st, sl = ssd_multi(ssd_state, pts, labels, key)
        np.asarray(sl)
        slat2 = []
        for _ in range(3):
            t0 = time.perf_counter()
            st, sl = ssd_multi(st, pts, labels, key)
            np.asarray(sl)
            slat2.append((time.perf_counter() - t0) / K_STEPS)
        ssd_dt = float(np.median(slat2))
        out[f"{prefix}_train_step_ms"] = round(ssd_dt * 1e3, 2)
        out[f"{prefix}_clouds_per_sec"] = round(B / ssd_dt, 2)
        if not eval_vote:
            return out
        if not within_budget():
            out[f"{prefix}_eval_vote_skipped_elapsed_s"] = round(
                time.perf_counter() - t_compile0, 1)
            return out

        # eval + 10-pass vote on the fastest opt-in config (the vote
        # protocol is 10 independent stochastic forwards, so vote ≈
        # eval/10 structurally — these extras record what the fused-SSD
        # path buys both; VERDICT r3 item 7 context in make_vote_step)
        sev = {"params": st.params, "batch_stats": st.batch_stats}

        @jax.jit
        def ssd_eval(v, p):
            def body(acc, _):
                logits = ssd_model.apply(v, p + acc * 1e-30, train=False)
                s = jnp.sum(logits).astype(jnp.float32)
                return s, s

            return lax.scan(body, jnp.float32(0), jnp.arange(K_STEPS))[1]

        np.asarray(ssd_eval(sev, pts))
        elat2 = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(ssd_eval(sev, pts))
            elat2.append((time.perf_counter() - t0) / K_STEPS)
        out[f"{prefix}_eval_clouds_per_sec"] = round(
            B / float(np.median(elat2)), 2)

        from si_mamba_tpu.train.runner_finetune import make_vote_step

        svote = jax.jit(make_vote_step(ssd_model, N, rotation=False,
                                       times=10))
        np.asarray(svote(st, pts, jax.random.key(7)))
        vlat2 = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(svote(st, pts, jax.random.key(7)))
            vlat2.append(time.perf_counter() - t0)
        vdt = float(np.median(vlat2))
        out[f"{prefix}_vote10_ms_per_batch"] = round(vdt * 1e3, 1)
        out[f"{prefix}_vote_clouds_per_sec"] = round(B / vdt, 1)
        return out

    # --- flagship extra FIRST: the fused Pallas SSD kernel train step
    # (ops/pallas/ssd_kernel.py — VMEM-resident chunk recurrence). Rounds 3
    # and 4 ran it LAST and the driver-captured record never contained a
    # working number (r3: MosaicError before the fix landed; r4: skipped on
    # the elapsed gate after ~20 min of other compiles — VERDICT r4 next #1).
    # It now runs immediately after the primary; only the cold-cache guard
    # and the engaged-predicate guard apply to it.
    from si_mamba_tpu.ops.ssd import ssd_fused_engaged

    # ssd_fused_engaged pads the length to a chunk multiple first, so this
    # is in practice a backend + tile-geometry guard (off-TPU the mixer
    # silently falls back to XLA); pass the chunk the measured config uses
    # (256 — the measure_ssd override below), not the default.
    seq_tokens = cfg.k_top_eigenvectors * cfg.num_group * 2
    if primary_compile_s > COLD_GUARD_S:
        extras["ssd_fused_skipped_cold_cache_compile_s"] = round(
            primary_compile_s, 1)
    elif not ssd_fused_engaged(seq_tokens, chunk=256):
        # off-TPU / off-tile: the mixer would fall back to XLA and the
        # "fused" number would be an A/A of the XLA-SSD line — say so
        # instead of reporting it
        extras["ssd_fused_skipped_not_engaged"] = True
    else:
        try:
            measure_ssd("ssd_fused", "ssd_fused", eval_vote=True, out=extras)
        except Exception as e:  # pragma: no cover - depends on backend
            extras["ssd_fused_error"] = f"{type(e).__name__}"

    # --- elapsed-gated extras, in decreasing importance ---

    # XLA-path SSD mixer (the chunked matmul formulation without the
    # Pallas kernel — the fused line's A/B partner)
    if primary_compile_s > COLD_GUARD_S:
        extras["ssd_skipped_cold_cache_compile_s"] = round(
            primary_compile_s, 1)
    elif not within_budget():
        extras["ssd_skipped_elapsed_s"] = round(
            time.perf_counter() - t_compile0, 1)
    else:
        try:
            measure_ssd(out=extras)
        except Exception as e:  # pragma: no cover - depends on backend
            extras["ssd_error"] = f"{type(e).__name__}"

    # spectral stage p50 (graph + batched eigh + top-k), amortized; both the
    # exact eigh solver and the MXU-only subspace-iteration alternative
    # (VERDICT r1 #5 — ops/spectral.py:88). Small programs — cheap compiles.
    centers = gather_points(pts, fps(pts, cfg.num_group))

    def spectral_p50(cfg_s):
        @jax.jit
        def multi_spec(c):
            def body(acc, _):
                # acc*1e-30 keeps a real loop-carried data dependency so XLA
                # cannot hoist the body out of the scan (acc*0 would fold away)
                _, vecs = spectral_eigvecs(c + acc * 1e-30, cfg_s)
                return jnp.sum(vecs), jnp.sum(vecs)

            acc, outs = lax.scan(body, jnp.float32(0), jnp.arange(K_STEPS))
            return outs

        np.asarray(multi_spec(centers))
        slat = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(multi_spec(centers))
            slat.append((time.perf_counter() - t0) / K_STEPS)
        return float(np.median(slat) * 1e3)

    import dataclasses
    if within_budget():
        extras["spectral_p50_ms"] = round(spectral_p50(
            dataclasses.replace(cfg, spectral_method="eigh")), 3)
        extras["spectral_subspace_p50_ms"] = round(spectral_p50(
            dataclasses.replace(cfg, spectral_method="subspace")), 3)
    else:
        extras["spectral_skipped_elapsed_s"] = round(
            time.perf_counter() - t_compile0, 1)

    # eval forward throughput, amortized
    ev = {"params": state.params, "batch_stats": state.batch_stats}
    if within_budget():
        @jax.jit
        def multi_eval(v, p):
            def body(acc, _):
                logits = model.apply(v, p + acc * 1e-30, train=False)
                s = jnp.sum(logits).astype(jnp.float32)
                return s, s

            _, outs = lax.scan(body, jnp.float32(0), jnp.arange(K_STEPS))
            return outs

        np.asarray(multi_eval(ev, pts))
        elat = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(multi_eval(ev, pts))
            elat.append((time.perf_counter() - t0) / K_STEPS)
        extras["eval_clouds_per_sec"] = round(B / float(np.median(elat)), 2)
    else:
        extras["eval_skipped_elapsed_s"] = round(
            time.perf_counter() - t_compile0, 1)

    # vote path: ALL 10 stochastic passes in ONE compiled program
    # (runner_finetune.make_vote_step lax.scan — VERDICT r2 #7); the
    # reference dispatches them separately (tools/runner_finetune.py:388-396)
    if within_budget():
        from si_mamba_tpu.train.runner_finetune import make_vote_step

        vote_step = jax.jit(make_vote_step(model, N, rotation=False,
                                           times=10))
        np.asarray(vote_step(state, pts, jax.random.key(7)))
        vlat = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(vote_step(state, pts, jax.random.key(7)))
            vlat.append(time.perf_counter() - t0)
        vote10_dt = float(np.median(vlat))
        extras["vote10_ms_per_batch"] = round(vote10_dt * 1e3, 1)
        extras["vote_clouds_per_sec"] = round(B / vote10_dt, 1)
    else:
        extras["vote_skipped_elapsed_s"] = round(
            time.perf_counter() - t_compile0, 1)

    # serving: batched vs single-request dispatch through the Predictor
    # (the gap is what serving.MicroBatcher recovers by coalescing
    # concurrent clients into one program dispatch — each single request
    # otherwise pays the full program + relay-RTT latency). Two more
    # full-model compiles (bucket 64 + 2).
    def measure_serve():
        from si_mamba_tpu.serving import Predictor

        pred = Predictor(model=model, variables=ev, npoints=N, max_batch=B)
        one = np.asarray(pts[:1])
        big = np.asarray(pts)
        pred.logits(big), pred.logits(one)  # compile both buckets
        t0 = time.perf_counter()
        for _ in range(3):
            pred.logits(big)
        batch_dt = (time.perf_counter() - t0) / 3
        t0 = time.perf_counter()
        for _ in range(8):
            pred.logits(one)
        single_dt = (time.perf_counter() - t0) / 8
        return {"serve_batch_clouds_per_sec": round(B / batch_dt, 1),
                "serve_single_p50_ms": round(single_dt * 1e3, 1),
                "serve_batching_speedup": round(single_dt * B / batch_dt, 1)}

    if primary_compile_s <= COLD_GUARD_S and within_budget():
        try:
            extras.update(measure_serve())
        except Exception as e:  # pragma: no cover - depends on backend
            extras["serve_error"] = f"{type(e).__name__}"
    elif primary_compile_s <= COLD_GUARD_S:
        extras["serve_skipped_elapsed_s"] = round(
            time.perf_counter() - t_compile0, 1)
    else:
        extras["serve_skipped_cold_cache_compile_s"] = round(
            primary_compile_s, 1)

    # Best train throughput across the measured configs: the headline
    # `value` stays the reference-architecture (Mamba-1) workload for
    # cross-round comparability; this extra records what the framework's
    # fastest opt-in configuration achieves on the same shape.
    best_cfg, best_cps = "mamba1", clouds_per_sec
    for k in ("ssd_clouds_per_sec", "ssd_fused_clouds_per_sec"):
        if extras.get(k, 0) > best_cps:
            best_cfg, best_cps = k.replace("_clouds_per_sec", ""), extras[k]
    extras["best_train_clouds_per_sec"] = round(best_cps, 2)
    extras["best_train_config"] = best_cfg

    print(json.dumps({
        "metric": "modelnet40_train_clouds_per_sec_per_chip",
        "value": round(clouds_per_sec, 2),
        "unit": "clouds/s",
        # vs_baseline keeps the BENCH_r01 semantic (vs the reference GPU's
        # 140 clouds/s) for cross-round comparability; the CPU multiple is
        # vs_cpu_baseline below (CPU measured at the fp32+eigh parity
        # config — see scripts/measure_cpu_baseline.py)
        "vs_baseline": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
        "extra": {
            "train_step_ms": round(dt * 1e3, 2),
            "vs_cpu_baseline": round(clouds_per_sec / CPU_BASELINE_CLOUDS_PER_SEC, 1),
            "vs_ref_gpu": round(clouds_per_sec / BASELINE_CLOUDS_PER_SEC, 3),
            "mfu_bf16_est": round(mfu, 4),
            # VPU-roofline view: fraction of the step spent doing scan math
            # at the measured v5e VPU fp32 peak — the honest utilization
            # number for this VPU-bound workload (profile:
            # benchmarks/profile_train_step.json — scan kernels are 46 of
            # the 65 device-ms, each within ~15% of this roofline)
            "vpu_roofline_util_est": round(
                scan_vpu_gops(B, cfg.seq_len, cfg.trans_dim, cfg.depth) * 1e9
                / dt / V5E_VPU_FP32_OPS, 3),
            "scan_vpu_gops_est": round(
                scan_vpu_gops(B, cfg.seq_len, cfg.trans_dim, cfg.depth), 1),
            "step_tflops_xla_est": round(step_flops / 1e12, 3),
            "batch": B,
            "scan_impl": cfg.scan_impl,
            "amortized_over": K_STEPS,
            **extras,
        },
    }))


if __name__ == "__main__":
    main()
