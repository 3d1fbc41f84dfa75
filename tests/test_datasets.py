"""Dataset-class tests over synthetic on-disk fixtures matching the
reference's file formats (npy lists, txt+FPS cache, h5, few-shot pickle)."""

import os
import pickle

import numpy as np
import pytest

from si_mamba_tpu.data.datasets import (
    ModelNet,
    ModelNet40SVM,
    ModelNetFewShot,
    ScanObjectNN,
    ShapeNet55,
    build_dataset,
)


def test_shapenet55(tmp_path):
    rng = np.random.default_rng(0)
    pc_dir = tmp_path / "pc"
    pc_dir.mkdir()
    names = []
    for i in range(4):
        name = f"02691156-model{i}.npy"
        np.save(pc_dir / name, rng.standard_normal((500, 3)).astype(np.float32))
        names.append(name)
    (tmp_path / "train.txt").write_text("\n".join(names[:3]) + "\n")
    (tmp_path / "test.txt").write_text(names[3] + "\n")

    ds = ShapeNet55(str(tmp_path), str(pc_dir), subset="train", npoints=128, seed=0)
    assert len(ds) == 3
    pts, _ = ds[0]
    assert pts.shape == (128, 3)
    # normalized: centroid ~0, max radius ~1
    assert abs(pts.mean(0)).max() < 0.2
    np.testing.assert_allclose(np.linalg.norm(pts, axis=1).max(), 1.0, rtol=1e-5)

    whole = ShapeNet55(str(tmp_path), str(pc_dir), subset="train", npoints=128,
                       whole=True)
    assert len(whole) == 4


def test_modelnet_fps_cache(tmp_path):
    rng = np.random.default_rng(1)
    names = ["airplane", "bed"]
    (tmp_path / "modelnet40_shape_names.txt").write_text("\n".join(names) + "\n")
    ids = []
    for n in names:
        (tmp_path / n).mkdir()
        for j in range(2):
            sid = f"{n}_{j:04d}"
            pts = rng.standard_normal((300, 6)).astype(np.float32)
            np.savetxt(tmp_path / n / f"{sid}.txt", pts, delimiter=",")
            ids.append(sid)
    (tmp_path / "modelnet40_train.txt").write_text("\n".join(ids) + "\n")
    (tmp_path / "modelnet40_test.txt").write_text("\n".join(ids[:1]) + "\n")

    ds = ModelNet(str(tmp_path), subset="train", npoints=64, seed=0)
    assert len(ds) == 4
    pts, label = ds[0]
    assert pts.shape == (64, 3) and label in (0, 1)
    cache = tmp_path / "modelnet40_train_64pts_fps.dat"
    assert cache.exists()
    # cache is reference-format: [list_of_points, list_of_labels]
    with open(cache, "rb") as f:
        points_list, labels_list = pickle.load(f)
    assert len(points_list) == 4 and points_list[0].shape == (64, 6)
    # reload path uses the cache
    ds2 = ModelNet(str(tmp_path), subset="train", npoints=64, seed=0)
    assert len(ds2) == 4


def test_scanobjectnn(tmp_path):
    import h5py

    rng = np.random.default_rng(2)
    with h5py.File(tmp_path / "training_objectdataset.h5", "w") as f:
        f["data"] = rng.standard_normal((5, 64, 3)).astype(np.float32)
        f["label"] = np.arange(5, dtype=np.int64)
    ds = ScanObjectNN(str(tmp_path), subset="train", seed=0)
    pts, label = ds[2]
    assert pts.shape == (64, 3) and label == 2
    ds_reg = build_dataset("ScanObjectNN", root=str(tmp_path), subset="train")
    assert len(ds_reg) == 5


def test_modelnet_fewshot(tmp_path):
    rng = np.random.default_rng(3)
    d = tmp_path / "5way_10shot"
    d.mkdir()
    samples = {
        "train": [(rng.standard_normal((200, 3)).astype(np.float32),
                   np.array([i % 5])) for i in range(10)],
        "test": [(rng.standard_normal((200, 3)).astype(np.float32),
                  np.array([i % 5])) for i in range(5)],
    }
    with open(d / "2.pkl", "wb") as f:
        pickle.dump(samples, f)
    ds = ModelNetFewShot(str(tmp_path), subset="train", way=5, shot=10, fold=2,
                         npoints=128)
    assert len(ds) == 10
    pts, label = ds[3]
    assert pts.shape == (128, 3) and label == 3


def test_build_dataset_unknown():
    with pytest.raises(KeyError):
        build_dataset("NopeDataset")


def test_prepare_data_synthetic_loads_everywhere(tmp_path):
    """scripts/prepare_data.py --synthetic writes trees every dataset class
    can actually load (the real-data-readiness path, reference README.md
    dataset section)."""
    import subprocess
    import sys

    root = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, "scripts/prepare_data.py", "--synthetic", "--check",
         "--root", str(root), "--npoints", "128", "--n-train", "3",
         "--n-test", "1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "ALL PRESENT" in r.stdout, r.stdout + r.stderr
    # present-but-SYNTHETIC is reported distinctly (exit 2, not 0) so
    # real-data watchers keyed on rc==0 don't fire on fixture trees
    assert "SYNTHETIC" in r.stdout and r.returncode == 2, (
        r.returncode, r.stdout)

    mn = root / "ModelNet" / "modelnet40_normal_resampled"
    ds = ModelNet(str(mn), subset="train", npoints=64, num_category=40)
    pts, label = ds[0]
    assert pts.shape == (64, 3)

    so = ScanObjectNN(str(root / "ScanObjectNN" / "main_split"), subset="train")
    pts, label = so[0]
    assert pts.shape[-1] == 3 and 0 <= label < 15

    sn = ShapeNet55(str(root / "ShapeNet55-34" / "ShapeNet-55"),
                    str(root / "ShapeNet55-34" / "shapenet_pc"),
                    subset="train", npoints=64)
    pts, _ = sn[0]
    assert pts.shape == (64, 3)

    from si_mamba_tpu.data.shapenetpart import PartNormalDataset

    sp = PartNormalDataset(
        str(root / "shapenetcore_partanno_segmentation_benchmark_v0_normal"),
        npoints=64, split="trainval")
    pts, cls_idx, seg = sp[0]
    assert pts.shape == (64, 3) and seg.shape == (64,)

    svm = ModelNet40SVM(str(root), partition="train", num_points=256)
    pts, label = svm[0]
    assert pts.shape == (256, 3) and 0 <= label < 40


def test_prepare_data_learnable_class_structure(tmp_path):
    """--learnable writes class-structured geometry: same-class clouds share
    blob count, so a soak run can actually converge (dev-rig evidence for
    the blocked real-data north star)."""
    import subprocess
    import sys

    root = tmp_path / "data"
    r = subprocess.run(
        [sys.executable, "scripts/prepare_data.py", "--synthetic",
         "--learnable", "--check", "--root", str(root), "--npoints", "128",
         "--n-train", "3", "--n-test", "1"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert "ALL PRESENT" in r.stdout, r.stdout + r.stderr

    # Part labels must be recoverable from geometry: points with the same
    # seg id sit in one tight blob (max radius << inter-blob distance).
    from si_mamba_tpu.data.shapenetpart import PartNormalDataset

    sp = PartNormalDataset(
        str(root / "shapenetcore_partanno_segmentation_benchmark_v0_normal"),
        npoints=128, split="trainval")
    pts, _, seg = sp[0]
    for part in np.unique(seg):
        blob = pts[seg == part]
        centroid = blob.mean(0)
        assert np.linalg.norm(blob - centroid, axis=1).max() < 0.5

    # SVM shards: labels span the learnable class range, data is structured.
    svm = ModelNet40SVM(str(root), partition="test", num_points=512)
    assert len(svm) >= 1
    pts, label = svm[0]
    assert pts.shape == (512, 3) and 0 <= label < 15
