"""Dataset classes for the five workloads (torch-free, numpy-native).

Replicates the reference loaders' on-disk formats and per-sample semantics:
- ShapeNet55 (reference datasets/ShapeNet55Dataset.py): npy clouds listed in
  {train,test}.txt, random-subsample then unit-sphere normalize; ``whole``
  prepends the test list for pretraining.
- ModelNet (datasets/ModelNetDataset.py): txt point files, offline FPS to
  N_POINTS cached in a pickle ``modelnet40_{split}_{N}pts_fps.dat``
  (cache-compatible with the reference's), normalize, optional train-time
  point shuffle.
- ModelNet40SVM (datasets/ModelNetDataset.py:18-49): ply_data_*.h5 shards.
- ScanObjectNN / _hardest (datasets/ScanObjectNNDataset.py): h5 splits,
  train-time point shuffle.
- ModelNetFewShot: the Point-MAE few-shot pickle protocol
  (``{k}way_{m}shot/{fold}.pkl``) — the dataset class is absent at reference
  HEAD (README.md:181 points at a missing file); rebuilt from the config
  stub + CLI flags (utils/parser.py:68-73).
"""

from __future__ import annotations

import glob
import os
import pickle
from typing import Any

import numpy as np

from si_mamba_tpu.data.io import pc_normalize, read_pointcloud


class PointDataset:
    """Minimal map-style dataset: __len__ + __getitem__ -> (points, label)."""

    def __len__(self):  # pragma: no cover - interface
        raise NotImplementedError

    def __getitem__(self, idx):  # pragma: no cover - interface
        raise NotImplementedError


class ShapeNet55(PointDataset):
    def __init__(self, data_path: str, pc_path: str, subset: str = "train",
                 npoints: int = 1024, whole: bool = False, seed: int | None = None):
        self.pc_path = pc_path
        self.npoints = npoints
        self.subset = subset
        lines = open(os.path.join(data_path, f"{subset}.txt")).read().splitlines()
        if whole:
            lines = open(os.path.join(data_path, "test.txt")).read().splitlines() + lines
        self.file_list = [ln.strip() for ln in lines if ln.strip()]
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return len(self.file_list)

    def __getitem__(self, idx):
        data = read_pointcloud(os.path.join(self.pc_path, self.file_list[idx]))
        data = data.astype(np.float32)
        sel = self.rng.permutation(data.shape[0])[: self.npoints]
        data = pc_normalize(data[sel])
        return data.astype(np.float32), 0


def _numpy_fps(points: np.ndarray, npoint: int, start: int = 0) -> np.ndarray:
    """Host-side FPS for the ModelNet preprocessing cache (deterministic
    start; the reference uses a random start — cache format is identical).
    Dispatches to the native C++ library when available (~100x the
    reference's per-sample numpy loop)."""
    from si_mamba_tpu.native import fps_cpu

    idxs = fps_cpu(points[:, :3].astype(np.float32), npoint, start=start)
    return points[idxs]


class ModelNet(PointDataset):
    def __init__(self, data_path: str, subset: str = "train", npoints: int = 8192,
                 num_category: int = 40, use_normals: bool = False,
                 seed: int | None = None):
        self.root = data_path
        self.subset = subset
        self.use_normals = use_normals
        self.rng = np.random.default_rng(seed)
        prefix = f"modelnet{num_category}"
        cat = [l.rstrip() for l in open(os.path.join(data_path, f"{prefix}_shape_names.txt"))]
        self.classes = {c: i for i, c in enumerate(cat)}
        ids = [l.rstrip() for l in open(os.path.join(data_path, f"{prefix}_{subset}.txt"))]
        names = ["_".join(x.split("_")[:-1]) for x in ids]
        self.datapath = [(names[i], os.path.join(data_path, names[i], ids[i]) + ".txt")
                         for i in range(len(ids))]

        cache = os.path.join(data_path, f"{prefix}_{subset}_{npoints}pts_fps.dat")
        if os.path.exists(cache):
            with open(cache, "rb") as f:
                self.points, self.labels = pickle.load(f)
        else:
            self.points, self.labels = [], []
            for name, fn in self.datapath:
                pts = np.loadtxt(fn, delimiter=",").astype(np.float32)
                self.points.append(_numpy_fps(pts, npoints))
                self.labels.append(np.array([self.classes[name]], dtype=np.int32))
            with open(cache, "wb") as f:
                pickle.dump([self.points, self.labels], f)

    def __len__(self):
        return len(self.datapath)

    def __getitem__(self, idx):
        pts = self.points[idx].copy()
        label = int(np.asarray(self.labels[idx]).reshape(-1)[0])
        pts[:, :3] = pc_normalize(pts[:, :3])
        if not self.use_normals:
            pts = pts[:, :3]
        if self.subset == "train":
            pts = pts[self.rng.permutation(pts.shape[0])]
        return pts.astype(np.float32), label


class ModelNet40SVM(PointDataset):
    def __init__(self, data_path: str, partition: str = "train", num_points: int = 2048):
        import h5py

        files = sorted(glob.glob(os.path.join(
            data_path, "modelnet40_ply_hdf5_2048", f"ply_data_{partition}*.h5")))
        data, labels = [], []
        for fn in files:
            with h5py.File(fn, "r") as f:
                data.append(f["data"][:].astype(np.float32))
                labels.append(f["label"][:].astype(np.int64))
        self.data = np.concatenate(data, 0)
        self.labels = np.concatenate(labels, 0).reshape(-1)
        self.num_points = num_points

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, idx):
        return self.data[idx][: self.num_points], int(self.labels[idx])


class ScanObjectNN(PointDataset):
    FILES = {"train": "training_objectdataset.h5", "test": "test_objectdataset.h5"}

    def __init__(self, root: str, subset: str = "train", seed: int | None = None):
        import h5py

        self.subset = subset
        with h5py.File(os.path.join(root, self.FILES[subset]), "r") as f:
            self.points = np.array(f["data"]).astype(np.float32)
            self.labels = np.array(f["label"]).astype(np.int64)
        self.rng = np.random.default_rng(seed)

    def __len__(self):
        return self.points.shape[0]

    def __getitem__(self, idx):
        pts = self.points[idx]
        if self.subset == "train":
            pts = pts[self.rng.permutation(pts.shape[0])]
        return pts.copy(), int(self.labels[idx])


class ScanObjectNNHardest(ScanObjectNN):
    FILES = {"train": "training_objectdataset_augmentedrot_scale75.h5",
             "test": "test_objectdataset_augmentedrot_scale75.h5"}


class ModelNetFewShot(PointDataset):
    """Point-MAE few-shot protocol: data/ModelNetFewshot/{way}way_{shot}shot/{fold}.pkl
    holding {'train': [(points, label), ...], 'test': [...]}."""

    def __init__(self, data_path: str, subset: str = "train", way: int = 5,
                 shot: int = 10, fold: int = 0, npoints: int = 1024):
        pkl = os.path.join(data_path, f"{way}way_{shot}shot", f"{fold}.pkl")
        with open(pkl, "rb") as f:
            dataset = pickle.load(f)[subset]
        self.samples = dataset
        self.npoints = npoints

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, idx):
        points, label = self.samples[idx][0], self.samples[idx][1]
        points = np.asarray(points, np.float32)[: self.npoints, :3]
        points = pc_normalize(points)
        return points.astype(np.float32), int(np.asarray(label).reshape(-1)[0])


_DATASETS = {
    "ShapeNet": ShapeNet55,
    "ModelNet": ModelNet,
    "ModelNet40SVM": ModelNet40SVM,
    "ScanObjectNN": ScanObjectNN,
    "ScanObjectNN_hardest": ScanObjectNNHardest,
    "ModelNetFewShot": ModelNetFewShot,
}


def build_dataset(name: str, **kwargs: Any) -> PointDataset:
    """Registry-style dataset construction by the reference's NAME strings."""
    if name not in _DATASETS:
        raise KeyError(f"unknown dataset {name!r}; have {sorted(_DATASETS)}")
    return _DATASETS[name](**kwargs)
