"""MAE reconstruction visualization runner (reference tools/runner.py:14-111):
load a pretrain checkpoint, reconstruct masked patches on test clouds, dump
gt/rebuilt renders + txt clouds per sample."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from si_mamba_tpu.models import PointMAEMamba, PointMAEConfig
from si_mamba_tpu.utils.visualization import save_reconstruction


def vis_run(cfg: PointMAEConfig, variables: dict, loader, out_dir: str,
            max_samples: int = 16, seed: int = 0) -> list[str]:
    """Returns the list of dumped sample tags."""
    model = PointMAEMamba(cfg)
    step = jax.jit(lambda v, p, k: model.apply(
        v, p, train=False, vis=True, rngs={"mask": k}))
    tags = []
    for pts, _ in loader.epoch(0):
        loss, rec = step(variables, jnp.asarray(pts), jax.random.key(seed))
        rebuild = np.asarray(rec["rebuild"])  # (B, M, gs, 3)
        gt = np.asarray(rec["gt"])
        for b in range(rebuild.shape[0]):
            tag = f"sample_{len(tags):04d}"
            save_reconstruction(out_dir, tag,
                                rebuild[b].reshape(-1, 3), gt[b].reshape(-1, 3))
            tags.append(tag)
            if len(tags) >= max_samples:
                return tags
    return tags
