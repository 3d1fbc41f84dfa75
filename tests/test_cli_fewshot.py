"""End-to-end CLI few-shot run (reference README.md:181 protocol,
utils/parser.py:68-73 --way/--shot/--fold): stages the ModelNetFewshot
pickles prepare_data writes, drives ``cli.main`` through the finetune
runner at toy dims, and checks the artifacts a real few-shot job produces —
the one CLI mode no other test runs through ``main``."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_cli_fewshot_end_to_end(tmp_path, monkeypatch):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "prep", os.path.join(REPO, "scripts", "prepare_data.py"))
    prep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prep)
    # 1024 stored points: the runner's _point_all table (a deliberate
    # reference dead-config guard) only admits npoints in {1024,2048,...}
    prep.write_fewshot(str(tmp_path), np.random.default_rng(0), 1024, 3,
                       learnable=True)

    ds_yaml = tmp_path / "fewshot_ds.yaml"
    ds_yaml.write_text(
        f"NAME: ModelNetFewShot\nDATA_PATH: {tmp_path}/ModelNetFewshot\n")
    cfg_yaml = tmp_path / "cfg.yaml"
    cfg_yaml.write_text(
        "_base_: cfgs/dev/tiny_fewshot_cpu.yaml\n"
        "dataset:\n"
        f"  train: {{_base_: {ds_yaml}, others: {{subset: 'train'}}}}\n"
        f"  val:   {{_base_: {ds_yaml}, others: {{subset: 'test'}}}}\n"
        f"  test:  {{_base_: {ds_yaml}, others: {{subset: 'test'}}}}\n")

    from si_mamba_tpu.train import cli

    # CWD anchors both the cfgs/ _base_ refs (symlinked) and the
    # experiments/ output tree (stays under tmp_path — hermetic)
    os.symlink(os.path.join(REPO, "cfgs"), tmp_path / "cfgs")
    monkeypatch.chdir(tmp_path)
    cli.main(["--config", str(cfg_yaml), "--exp_name", "fs", "--way", "5",
              "--shot", "10", "--fold", "0", "--scratch_model", "--seed", "0",
              "--num_workers", "0"])

    exp = tmp_path / "experiments" / "cfg" / "fs"
    assert (exp / "ckpt-last").is_dir() and (exp / "config.yaml").is_file()
    # --way overrode the classifier width (the config SNAPSHOT keeps the
    # file's cls_dim, reference-faithfully — the override re-applies on
    # resume from the flags): the trained head must be 5-wide
    from si_mamba_tpu.train.checkpoint import load_checkpoint

    payload = load_checkpoint(str(exp), "ckpt-last")
    assert payload["params"]["cls_head_finetune"]["out"]["bias"].shape == (5,)
    # scalars.jsonl carries per-epoch val accuracy over the 5-way queries
    recs = [json.loads(l) for l in
            (exp / "scalars.jsonl").read_text().splitlines()]
    accs = [r["value"] for r in recs if r.get("tag") == "Metric/ACC"]
    assert accs and all(np.isfinite(a) for a in accs), recs[:5]

    # --test reload path on the trained few-shot experiment
    cli.main(["--config", str(cfg_yaml), "--exp_name", "fs_eval", "--way",
              "5", "--shot", "10", "--fold", "0", "--test", "--ckpts",
              str(exp / "ckpt-last"), "--seed", "0", "--num_workers", "0"])
