"""Point-cloud file IO: npy / h5 / txt (reference datasets/io.py:7-43)."""

from __future__ import annotations

import os

import numpy as np


def read_pointcloud(file_path: str) -> np.ndarray:
    ext = os.path.splitext(file_path)[1]
    if ext == ".npy":
        return np.load(file_path)
    if ext == ".h5":
        import h5py

        with h5py.File(file_path, "r") as f:
            return f["data"][()]
    if ext == ".txt":
        return np.loadtxt(file_path)
    raise ValueError(f"Unsupported file extension: {ext}")


def pc_normalize(pc: np.ndarray) -> np.ndarray:
    """Center to centroid, scale to unit max radius (reference pc_norm)."""
    pc = pc - pc.mean(axis=0)
    m = np.max(np.sqrt(np.sum(pc**2, axis=1)))
    return pc / m
