"""Export a trained orbax checkpoint to a reference-format torch ``.pth``.

Usage:
    python scripts/export_torch.py --exp_dir experiments/my_run \\
        [--prefix ckpt-best] [--out exported.pth]

The output loads into the reference's torch models via its own checkpoint
path (tools/builder.py:153-162 ``{'base_model': ...}`` format) — the reverse
direction of ``--finetune_model <reference .pth>``. The model family
(classifier vs MAE pretrain) is detected from the parameter tree.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--exp_dir", required=True,
                    help="experiment dir holding the orbax checkpoints")
    ap.add_argument("--prefix", default="ckpt-best",
                    help="checkpoint prefix (ckpt-best/ckpt-last/ckpt-best_vote/"
                         "ckpt-epoch-NNN)")
    ap.add_argument("--out", default=None,
                    help="output .pth path (default: <exp_dir>/<prefix>.pth)")
    args = ap.parse_args()

    from si_mamba_tpu.train.checkpoint import load_checkpoint
    from si_mamba_tpu.utils.torch_export import save_torch_checkpoint

    payload = load_checkpoint(args.exp_dir, args.prefix)
    if payload is None:
        raise SystemExit(f"no checkpoint '{args.prefix}' in {args.exp_dir}")
    params, stats = payload["params"], payload["batch_stats"]
    model = "point_mae" if "MAE_decoder" in params else "pointmamba"
    out = args.out or os.path.join(args.exp_dir, f"{args.prefix}.pth")
    meta = payload.get("meta", {})
    keys = save_torch_checkpoint(out, params, stats, model=model,
                                 epoch=int(meta.get("epoch", 0)),
                                 metrics=dict(meta.get("metrics", {})))
    print(f"wrote {out}: model={model}, {len(keys)} tensors, "
          f"epoch={meta.get('epoch', 0)}")


if __name__ == "__main__":
    main()
