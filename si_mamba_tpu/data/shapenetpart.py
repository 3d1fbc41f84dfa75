"""ShapeNetPart dataset (reference part_segmentation/dataset.py:64-163
PartNormalDataset) + the numpy augmentations its trainer uses
(provider.py random_scale_point_cloud / shift_point_cloud)."""

from __future__ import annotations

import json
import os

import numpy as np

from si_mamba_tpu.data.io import pc_normalize

SEG_CLASSES = {
    "Earphone": [16, 17, 18], "Motorbike": [30, 31, 32, 33, 34, 35],
    "Rocket": [41, 42, 43], "Car": [8, 9, 10, 11], "Laptop": [28, 29],
    "Cap": [6, 7], "Skateboard": [44, 45, 46], "Mug": [36, 37],
    "Guitar": [19, 20, 21], "Bag": [4, 5], "Lamp": [24, 25, 26, 27],
    "Table": [47, 48, 49], "Airplane": [0, 1, 2, 3], "Pistol": [38, 39, 40],
    "Chair": [12, 13, 14, 15], "Knife": [22, 23],
}


class PartNormalDataset:
    def __init__(self, root: str, npoints: int = 2048, split: str = "trainval",
                 normal_channel: bool = False, seed: int | None = None):
        self.npoints = npoints
        self.normal_channel = normal_channel
        self.split = split
        self.rng = np.random.default_rng(seed)

        cat = {}
        with open(os.path.join(root, "synsetoffset2category.txt")) as f:
            for line in f:
                name, offset = line.strip().split()
                cat[name] = offset
        self.classes = {name: i for i, name in enumerate(cat)}

        def ids(which):
            with open(os.path.join(root, "train_test_split",
                                   f"shuffled_{which}_file_list.json")) as f:
                return {d.split("/")[2] for d in json.load(f)}

        allowed = {
            "train": ids("train"),
            "val": ids("val"),
            "trainval": ids("train") | ids("val"),
            "test": ids("test"),
        }[split]

        self.datapath = []
        for name, offset in cat.items():
            d = os.path.join(root, offset)
            for fn in sorted(os.listdir(d)):
                if os.path.splitext(fn)[0] in allowed:
                    self.datapath.append((name, os.path.join(d, fn)))
        self._cache: dict[int, tuple] = {}

    def __len__(self):
        return len(self.datapath)

    def __getitem__(self, idx):
        if idx in self._cache:
            cat_name, data = self._cache[idx]
        else:
            cat_name, fn = self.datapath[idx]
            data = np.loadtxt(fn).astype(np.float32)
            if len(self._cache) < 20000:
                self._cache[idx] = (cat_name, data)
        cls = self.classes[cat_name]
        pts = data[:, :6] if self.normal_channel else data[:, :3]
        seg = data[:, -1].astype(np.int32)
        pts = pts.copy()
        pts[:, :3] = pc_normalize(pts[:, :3])
        # resample to npoints with replacement (reference __getitem__)
        choice = self.rng.choice(len(seg), self.npoints, replace=True)
        return pts[choice], cls, seg[choice]


def random_scale_point_cloud(batch, rng, lo=0.8, hi=1.25):
    scales = rng.uniform(lo, hi, (batch.shape[0], 1, 1)).astype(np.float32)
    return batch * scales


def shift_point_cloud(batch, rng, shift_range=0.1):
    shifts = rng.uniform(-shift_range, shift_range,
                         (batch.shape[0], 1, 3)).astype(np.float32)
    return batch + shifts


class PartSegLoader:
    """Batches (points, cls, seg) triples with host sharding."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0,
                 process_index: int = 0, process_count: int = 1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self):
        n = len(self.dataset) // self.process_count if self.process_count > 1 \
            else len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch(self, epoch: int = 0):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            idx = np.random.default_rng(self.seed + epoch).permutation(n)
        if self.process_count > 1:
            per = -(-n // self.process_count)
            idx = np.concatenate([idx, idx[: per * self.process_count - n]])
            idx = idx[self.process_index::self.process_count]
        nb = len(idx) // self.batch_size if self.drop_last \
            else -(-len(idx) // self.batch_size)
        for bi in range(nb):
            sel = idx[bi * self.batch_size : (bi + 1) * self.batch_size]
            pts, cls, seg = zip(*(self.dataset[int(i)] for i in sel))
            yield (np.stack(pts).astype(np.float32),
                   np.asarray(cls, np.int32), np.stack(seg).astype(np.int32))
