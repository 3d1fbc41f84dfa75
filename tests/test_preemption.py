"""Preemption-safety integration test: SIGKILL a real CLI training
subprocess mid-run, relaunch the IDENTICAL command with --auto_resume, and
require it to pick up from ckpt-last and finish. This is the contract a
requeued/preempted job relies on (beyond-reference; decision logic is
unit-tested in test_cli.py — this drives the whole kill → relaunch cycle
including the orbax ckpt-last written by the partial run)."""

import json
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _acc_epochs(scal) -> set:
    # SIGKILL can truncate the final jsonl line — skip unparsable tails
    out = set()
    for line in scal.read_text().splitlines():
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if rec.get("tag") == "Metric/ACC":
            out.add(rec["step"])
    return out


def _launch(cfg_yaml, cwd, env):
    return subprocess.Popen(
        [sys.executable, "-m", "si_mamba_tpu.train.cli", "--config",
         str(cfg_yaml), "--exp_name", "pre", "--way", "5", "--shot", "10",
         "--fold", "0", "--scratch_model", "--auto_resume", "--seed", "0",
         "--num_workers", "0"],
        cwd=cwd, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True)


@pytest.mark.slow
def test_sigkill_then_auto_resume(tmp_path):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "prep", os.path.join(REPO, "scripts", "prepare_data.py"))
    prep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prep)
    prep.write_fewshot(str(tmp_path), np.random.default_rng(0), 1024, 3,
                       learnable=True)

    ds_yaml = tmp_path / "fewshot_ds.yaml"
    ds_yaml.write_text(
        f"NAME: ModelNetFewShot\nDATA_PATH: {tmp_path}/ModelNetFewshot\n")
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "_base_: cfgs/dev/tiny_fewshot_cpu.yaml\n"
        "scheduler: {type: CosLR, kwargs: {epochs: 3, initial_epochs: 1}}\n"
        "max_epoch: 3\n"
        "dataset:\n"
        f"  train: {{_base_: {ds_yaml}, others: {{subset: 'train'}}}}\n"
        f"  val:   {{_base_: {ds_yaml}, others: {{subset: 'test'}}}}\n"
        f"  test:  {{_base_: {ds_yaml}, others: {{subset: 'test'}}}}\n")
    os.symlink(os.path.join(REPO, "cfgs"), tmp_path / "cfgs")

    # subprocess env: CPU backend via env var — works because PYTHONPATH
    # skips /root/.axon_site (no sitecustomize re-pinning the platform)
    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": REPO,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "JAX_COMPILATION_CACHE_DIR": "/tmp/jaxcache_cpu_preempt"}

    exp = tmp_path / "experiments" / "cfg" / "pre"
    scal = exp / "scalars.jsonl"

    proc = _launch(cfg_yaml, str(tmp_path), env)
    try:
        # wait until at least one epoch has been validated AND checkpointed
        deadline = time.time() + 900
        while time.time() < deadline:
            if scal.exists() and (exp / "ckpt-last").is_dir() and _acc_epochs(scal):
                break
            if proc.poll() is not None:  # died before first ckpt
                pytest.fail(f"run exited early:\n{proc.stdout.read()[-2000:]}")
            time.sleep(2)
        else:
            pytest.fail("no checkpointed epoch within deadline")
        proc.send_signal(signal.SIGKILL)  # preemption
        proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()

    epochs_before = _acc_epochs(scal)

    proc2 = _launch(cfg_yaml, str(tmp_path), env)
    out, _ = proc2.communicate(timeout=900)
    assert proc2.returncode == 0, out[-2000:]
    assert "[AUTO-RESUME]" in out, out[-2000:]

    epochs_after = _acc_epochs(scal)
    # the relaunch continued to the final epoch (runners train epochs
    # 0..max_epoch inclusive, reference-faithfully) instead of starting over
    assert max(epochs_after) == 3, sorted(epochs_after)
    assert epochs_before <= epochs_after
    assert (exp / "ckpt-last").is_dir()
