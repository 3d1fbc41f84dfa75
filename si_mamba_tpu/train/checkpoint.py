"""Orbax checkpointing: {params, batch_stats, opt_state, epoch, metrics}
with best/last/best_vote variants and resume (reference tools/builder.py:
112-205 + SURVEY.md §5.4), plus cross-stage pretrain→finetune transfer with
missing/unexpected reporting (reference models/point_mamba.py:574-604)."""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


def _path(exp_dir: str, prefix: str) -> str:
    return os.path.abspath(os.path.join(exp_dir, prefix))


def _path_flatten(tree: Any) -> dict:
    """Flatten an arbitrary pytree (namedtuples, tuples, None) to a dict
    keyed by jax keypath strings — serialization-order independent."""
    leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(kp): leaf for kp, leaf in leaves}


def _path_unflatten(template: Any, flat: dict) -> Any:
    leaves_t, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for kp, t in leaves_t:
        key = jax.tree_util.keystr(kp)
        if key not in flat:
            raise KeyError(f"checkpoint missing opt_state leaf {key}")
        leaves.append(np.asarray(flat[key], np.asarray(t).dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(template), leaves)


_ASYNC_CKPTR: ocp.AsyncCheckpointer | None = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTR


def wait_for_saves() -> None:
    """Block until any in-flight async checkpoint save has committed.
    Call before reading a just-saved checkpoint and at end of training."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def save_checkpoint(exp_dir: str, prefix: str, state, epoch: int,
                    metrics: dict | None = None,
                    best_metrics: dict | None = None,
                    async_save: bool = False) -> None:
    # Multi-host: EVERY process must call this (orbax's save is a
    # collective — its internal global-sync barrier deadlocks a process
    # that skips the call; only the primary host actually persists the
    # replicated host-numpy payload). This mirrors the reference's
    # rank-0-only torch.save (tools/builder.py:154) in effect, not in
    # call pattern. Verified by tests/test_multihost.py.
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        # path-keyed dict: optax states are namedtuples whose orbax dict
        # round-trip reorders fields alphabetically — keying by path makes
        # restore order-independent
        "opt_state": jax.device_get(_path_flatten(state.opt_state)),
        "meta": {"epoch": epoch, "step": int(state.step),
                 "metrics": metrics or {},
                 "best_metrics": best_metrics or {}},
    }
    if async_save:
        # serialization/commit happens on orbax's background thread while
        # the next epoch trains (the device_get above already snapshotted
        # the host payload). orbax serializes back-to-back saves itself
        # (AsyncCheckpointer.save blocks on the previous in-flight save).
        #
        # CRASH SAFETY: orbax's force=True rmtree's the committed final dir
        # in the FOREGROUND while the new commit (tmp→final rename) happens
        # in the background — a preemption in that window would destroy the
        # only resume point. Atomically rename the committed dir to
        # <prefix>.bak instead; load_checkpoint falls back to it if the
        # final dir is missing. The .bak is replaced on the next save of
        # the same prefix (disk cost: one extra checkpoint copy).
        import shutil

        path = _path(exp_dir, prefix)
        c = _async_ckptr()
        # the wait is REQUIRED here (not just orbax's internal one): an
        # in-flight commit of this same path must land before the
        # exists-check/rename below, or the rename parks a half-written
        # dir / the save collides with the late commit
        c.wait_until_finished()
        if os.path.exists(path):
            bak = path + ".bak"
            shutil.rmtree(bak, ignore_errors=True)
            os.rename(path, bak)
        c.save(path, payload)
        return
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(_path(exp_dir, prefix), payload, force=True)


def load_checkpoint(exp_dir: str, prefix: str) -> dict | None:
    wait_for_saves()  # a just-written async ckpt must be committed first
    path = _path(exp_dir, prefix)
    if not os.path.exists(path):
        # async-save crash window: the previous committed checkpoint is
        # parked at <prefix>.bak (see save_checkpoint) — resume from it
        if os.path.exists(path + ".bak"):
            return ocp.PyTreeCheckpointer().restore(path + ".bak")
        return None
    return ocp.PyTreeCheckpointer().restore(path)


def resume_state(exp_dir: str, state):
    """Restore ckpt-last into a TrainState. Returns (state, start_epoch,
    best_metrics) or (state, 0, {}) when absent."""
    payload = load_checkpoint(exp_dir, "ckpt-last")
    if payload is None:
        return state, 0, {}

    def restore_like(template, restored):
        """Rebuild the template dict tree from restored leaves (dicts
        round-trip orbax with stable keys)."""
        return jax.tree.map(lambda t, r: np.asarray(r, np.asarray(t).dtype),
                            template, restored)

    meta = payload["meta"]
    state = state.replace(
        params=restore_like(state.params, payload["params"]),
        batch_stats=restore_like(state.batch_stats, payload["batch_stats"]),
        opt_state=_path_unflatten(state.opt_state, payload["opt_state"]),
        step=jnp.asarray(int(meta.get("step", 0)), jnp.int32),
    )
    return state, int(meta["epoch"]) + 1, dict(meta.get("best_metrics", {}))


def _flatten(tree: Any, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = v
    return out


def transfer_pretrained(variables: dict, pretrained: dict, logger=None) -> dict:
    """Copy overlapping leaves from a pretrain checkpoint's variables into a
    finetune model's variables (strict=False semantics with reporting)."""
    from si_mamba_tpu.train.logging_utils import print_log

    flat_new = _flatten(variables["params"])
    flat_old = _flatten(pretrained["params"])
    missing = sorted(set(flat_new) - set(flat_old))
    unexpected = sorted(set(flat_old) - set(flat_new))
    mismatched = [k for k in set(flat_new) & set(flat_old)
                  if np.shape(flat_new[k]) != np.shape(flat_old[k])]

    def merge(dst, src):
        out = {}
        for k, v in dst.items():
            if isinstance(v, dict):
                out[k] = merge(v, src.get(k, {})) if isinstance(src.get(k), dict) else v
            elif k in src and np.shape(src[k]) == np.shape(v):
                out[k] = np.asarray(src[k], np.asarray(v).dtype)
            else:
                out[k] = v
        return out

    new_vars = dict(variables)
    new_vars["params"] = merge(variables["params"], pretrained["params"])
    if "batch_stats" in variables and "batch_stats" in pretrained:
        new_vars["batch_stats"] = merge(variables["batch_stats"],
                                        pretrained["batch_stats"])
    if missing:
        print_log(f"missing_keys ({len(missing)}): {missing[:20]}...", logger)
    if unexpected:
        print_log(f"unexpected_keys ({len(unexpected)}): {unexpected[:20]}...", logger)
    if mismatched:
        print_log(f"shape-mismatched (kept new init): {mismatched}", logger)
    return new_vars
