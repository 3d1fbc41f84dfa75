#!/usr/bin/env python
"""Few-shot protocol sweep (reference README.md:181 table: mean/std over
folds for each way/shot setting — the reference runs its CLI once per fold
by hand; this drives the same runs and aggregates).

    python scripts/run_fewshot.py --config cfgs/fewshot.yaml \
        --way 5 --shot 10 --folds 10 [--finetune_model <pretrain ckpt>]

Each fold is one full `cli.main` train (experiment `fewshot/<exp>_f<fold>`),
reading data/ModelNetFewshot/<way>way_<shot>shot/<fold>.pkl. Prints a JSON
summary line {way, shot, folds, accs, mean, std} and writes it next to the
fold experiments."""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def best_acc(exp_path: str) -> float:
    accs = []
    with open(os.path.join(exp_path, "scalars.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("tag") == "Metric/ACC":
                accs.append(float(rec["value"]))
    if not accs:
        raise RuntimeError(f"no Metric/ACC records in {exp_path}")
    return max(accs)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="cfgs/fewshot.yaml")
    p.add_argument("--way", type=int, default=5)
    p.add_argument("--shot", type=int, default=10)
    p.add_argument("--folds", type=int, default=10)
    p.add_argument("--exp_name", default="sweep")
    p.add_argument("--finetune_model", default=None)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    from si_mamba_tpu.train import cli

    accs = []
    stem = os.path.splitext(os.path.basename(args.config))[0]
    for fold in range(args.folds):
        exp = f"{args.exp_name}_w{args.way}s{args.shot}_f{fold}"
        argv = ["--config", args.config, "--exp_name", exp,
                "--way", str(args.way), "--shot", str(args.shot),
                "--fold", str(fold), "--seed", str(args.seed)]
        argv += (["--finetune_model", args.finetune_model]
                 if args.finetune_model else ["--scratch_model"])
        cli.main(argv)
        acc = best_acc(os.path.join("experiments", stem, exp))
        accs.append(acc)
        print(f"[fewshot] fold {fold}: best acc {acc:.4f}")

    import numpy as np

    summary = {"way": args.way, "shot": args.shot, "folds": args.folds,
               "accs": accs, "mean": float(np.mean(accs)),
               "std": float(np.std(accs))}
    out = os.path.join("experiments", stem,
                       f"{args.exp_name}_w{args.way}s{args.shot}.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
