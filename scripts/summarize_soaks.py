"""Summarize the round-4 paired SSD-vs-Mamba-1 soak twins (VERDICT r3 #5).

Reads each twin's scalars.jsonl (written by the runners through
si_mamba_tpu/train/logging_utils.py) and emits benchmarks/soaks_r4.json:
per-run metric curves (downsampled) plus best/final values, so the
convergence-parity claim in PARITY.md is backed by a checked-in artifact.

Each run is looked up under the first experiment name (of --exp's
comma-separated list) that exists: the classification twins completed on
the real TPU (soak_r4_tpu) before the axon tunnel dropped; the pretrain
and part-seg twins were re-run on XLA:CPU (soak_r4_cpu) during the
outage — same configs, seeds, and synthetic data, only the backend
differs, and the JSON records which was used per run.

  python scripts/summarize_soaks.py [--exp soak_r4_tpu,soak_r4_cpu]
"""

from __future__ import annotations

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (family, variant) -> experiment dir; the paired twins share data, seed,
# and schedule — only mixer/scan_impl differ (see cfgs/dev/*_48/_60/_24).
RUNS = {
    ("classification", "mamba1"): "tiny_scan_objbg_cpu_48",
    ("classification", "ssd"): "tiny_scan_objbg_ssd_cpu_48",
    ("part_segmentation", "mamba1"): "tiny_partseg_cpu_60",
    ("part_segmentation", "ssd"): "tiny_partseg_ssd_cpu_60",
    ("mae_pretrain", "mamba1"): "tiny_pretrain_cpu_24",
    ("mae_pretrain", "ssd"): "tiny_pretrain_ssd_cpu_24",
}

# Round-5 set (VERDICT r4 #6): a BIGGER classification twin (2.7x width,
# 2x depth, 2x data, 64 epochs — cfgs/dev/mid_scan_objbg*.yaml) and the
# pretrain/part-seg twins re-run ON-CHIP (round 4 ran them on XLA:CPU
# during the tunnel outage). Select with --round 5.
RUNS_R5 = {
    ("classification", "mamba1"): "mid_scan_objbg",
    ("classification", "ssd"): "mid_scan_objbg_ssd",
    ("part_segmentation", "mamba1"): "tiny_partseg_cpu_60",
    ("part_segmentation", "ssd"): "tiny_partseg_ssd_cpu_60",
    ("mae_pretrain", "mamba1"): "tiny_pretrain_cpu_24",
    ("mae_pretrain", "ssd"): "tiny_pretrain_ssd_cpu_24",
}

# family -> (curve tag, higher_is_better)
METRIC = {
    "classification": ("Metric/ACC", True),
    "part_segmentation": ("Seg/instance_miou", True),
    "mae_pretrain": ("Loss/Epoch/Loss", False),
}
# secondary curves recorded alongside (not used for the best/Δ headline)
EXTRA_METRICS = {
    "mae_pretrain": [("Metric/SVM_ACC", True)],
}


def read_curve(path: str, tag: str) -> list[tuple[int, float]]:
    out = []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if row["tag"] == tag:
                out.append((row["step"], row["value"]))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default=None)
    ap.add_argument("--round", type=int, default=4, choices=(4, 5))
    args = ap.parse_args()
    if args.exp is None:
        args.exp = "soak_r5_tpu" if args.round == 5 else "soak_r4_tpu,soak_r4_cpu"
    exp_names = [e.strip() for e in args.exp.split(",") if e.strip()]
    runs_map = RUNS_R5 if args.round == 5 else RUNS

    result: dict = {"exp_names": exp_names, "families": {}}
    for (family, variant), cfg in runs_map.items():
        tag, hib = METRIC[family]
        # of the candidate experiments, keep the LONGEST curve (an
        # interrupted run under one exp name must not shadow a completed
        # re-run under another)
        curve, exp = [], None
        for cand in exp_names:
            p = os.path.join(REPO, "experiments", cfg, cand, "scalars.jsonl")
            if not os.path.exists(p):
                continue
            c = read_curve(p, tag)
            if len(c) > len(curve):
                curve, exp = c, cand
        if exp is None:
            print(f"MISSING {family}/{variant}: experiments/{cfg}/"
                  f"{{{','.join(exp_names)}}}/scalars.jsonl")
            continue
        if not curve:
            print(f"EMPTY curve {family}/{variant} tag={tag}")
            continue
        vals = [v for _, v in curve]
        best = max(vals) if hib else min(vals)
        fam = result["families"].setdefault(
            family, {"metric": tag, "higher_is_better": hib, "runs": {}})
        run = {
            "config": f"cfgs/dev/{cfg}.yaml",
            "exp": exp,
            "backend": "tpu" if exp.endswith("tpu") else "cpu",
            "epochs": curve[-1][0],
            "best": round(best, 4),
            "final": round(vals[-1], 4),
            "curve": [[s, round(v, 4)] for s, v in curve],
        }
        p = os.path.join(REPO, "experiments", cfg, exp, "scalars.jsonl")
        for etag, ehib in EXTRA_METRICS.get(family, []):
            ec = read_curve(p, etag)
            if ec:
                evals = [v for _, v in ec]
                run[etag] = {
                    "best": round(max(evals) if ehib else min(evals), 4),
                    "final": round(evals[-1], 4),
                    "curve": [[s, round(v, 4)] for s, v in ec],
                }
        fam["runs"][variant] = run
        print(f"{family:18s} {variant:7s} epochs={curve[-1][0]:3d} "
              f"best={best:.4f} final={vals[-1]:.4f}")

    for family, fam in result["families"].items():
        runs = fam["runs"]
        if {"mamba1", "ssd"} <= runs.keys():
            m, s = runs["mamba1"]["best"], runs["ssd"]["best"]
            fam["ssd_minus_mamba1_best"] = round(s - m, 4)
            print(f"{family}: ssd - mamba1 (best) = {s - m:+.4f}")

    dst = os.path.join(REPO, "benchmarks", f"soaks_r{args.round}.json")
    with open(dst, "w") as f:
        json.dump(result, f, indent=1)
    print("written:", dst)


if __name__ == "__main__":
    main()
