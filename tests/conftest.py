"""Test config: force CPU backend with an 8-device virtual mesh so sharding
tests run anywhere (SURVEY.md §4 — capabilities the reference lacks)."""

import os

# The harness environment pre-sets JAX_PLATFORMS=axon (the tunneled TPU) and
# a sitecustomize hook imports jax at interpreter startup — so env vars alone
# are too late. jax.config.update still works until the backend is first
# used; unit tests run on the virtual 8-device CPU backend regardless.
#
# Exception: SI_MAMBA_TPU_TESTS=1 keeps the real (TPU) backend so the
# `-m tpu` native-lowering tests (test_pallas_tpu.py) can run on-device.
if os.environ.get("SI_MAMBA_TPU_TESTS") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

if os.environ.get("SI_MAMBA_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compilation cache: XLA:CPU compiles dominate the suite's wall
# clock (single-core LLVM); caching them makes repeat runs start from disk
# instead of recompiling (measured: 56 min cold -> 27:42 warm), and slashes
# the per-process LLVM churn behind the intermittent late-suite segfault
# (see the fixture below). Opt out with SI_MAMBA_TEST_COMPILE_CACHE=0. The
# 0.5 s threshold keeps thousands of trivial sub-second compiles from
# paying disk-IO overhead.
if os.environ.get("SI_MAMBA_TEST_COMPILE_CACHE") != "0":
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("SI_MAMBA_TEST_COMPILE_CACHE_DIR",
                       "/tmp/si_mamba_tpu_test_compile_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


# Compile-heavy tests (>~30 s each; full-size parity, end-to-end runners,
# multi-step training) — `pytest -m 'not slow'` is the quick loop (~13 min),
# the full suite (~34 min) stays the merge gate.
_SLOW = {
    "test_seg_forward_shapes", "test_seg_train_grads",
    "test_mae_train_step_on_mesh", "test_finetune_mini_run",
    "test_finetune_run_multichip_and_resume", "test_seg_run_multichip",
    "test_pretrain_run_multichip",
    "test_point_mae_legacy_mamba_method", "test_point_mae_train_backward",
    "test_point_mae_vis_output",
    "test_full_pointmamba_logits_match_torch_oracle",
    "test_full_point_mae_loss_matches_torch_oracle",
    "test_train_step_reduces_loss", "test_train_step_reduces_loss_bf16",
    "test_dryrun_multichip_8dev", "test_point_mamba_train_grads",
    "test_golden_mae_loss", "test_golden_point_mamba_logits",
    "test_pipeline_matches_sequential", "test_pipeline_grads_match_sequential",
    "test_finetune_run_lambda_lr", "test_full_partseg_logp_matches_torch_oracle",
    "test_full_pointmamba_logits_match_torch_oracle_hlt",
    "test_full_train_step_matches_torch_oracle",
    "test_dp_tp_composed_train_step_matches_dp_only",
    "test_vote_step_in_graph_matches_eager_loop",
    "test_pointmamba_ssd_mixer_trains",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.name.split("[")[0] in _SLOW:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled-executable caches after each test module.

    The full one-process suite (200+ tests, thousands of XLA:CPU
    executables) intermittently SEGFAULTS late in the run (observed twice
    at the ~90% mark in backend_compile_and_load cold; reproduced once
    with a WARM disk cache when this fixture was gated off — so the crash
    follows the accumulated in-memory executable state, NOT the LLVM
    compile count; the same files pass in isolation or in fresh-process
    slices). Clearing jax's caches at module boundaries bounds that
    accumulation and has kept every full run green. With the persistent
    compilation cache above, the post-clear recompiles deserialize from
    disk, so the fixture's cost on a warm cache is near zero (full suite:
    56 min cold, 27:42 warm, fixture active in both).

    The clear also runs under pytest-xdist workers: with small -n each
    worker still executes a large share of the suite's modules, so the
    accumulation bound is needed there too (and under `--dist load` a
    module's tests can interleave across modules, which only makes the
    module-scope teardown fire more often — harmless on a warm cache).
    Recommended multi-core runner: `python -m pytest tests/ -q -n 4
    --dist loadscope` (loadscope keeps each module on one worker,
    matching this fixture's module-scope semantics)."""
    yield
    jax.clear_caches()
