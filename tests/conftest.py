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

if os.environ.get("SI_MAMBA_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
