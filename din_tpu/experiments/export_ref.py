"""CLI: export a din_tpu checkpoint to the reference framework's .pth format.

    python -m din_tpu.experiments.export_ref --preset volleyball_stage2_dynamic \
        --ckpt result/<exp>/stage2_epoch30_93.60%.ckpt --out for_reference.pth

The inverse of ``--ref-checkpoint-path`` on the runner: models trained here
can be evaluated or fine-tuned in the reference codebase
(nn/ref_export.py; formats train_net.py:120-127 / base_model.py:46-54).
Reads either of our on-disk layouts — a stage-2 full checkpoint
({'params', 'batch_stats', ...}) or a stage-1 component file
({'trunk', 'embed', 'fc_actions', 'fc_activities', 'batch_stats'}) —
and picks the matching reference format unless --format overrides it.
"""

from __future__ import annotations

import argparse

from din_tpu.experiments.presets import PRESETS
from din_tpu.nn.ref_export import save_reference_checkpoint
from din_tpu.train.checkpoint import load_checkpoint


def variables_from_checkpoint(ckpt):
    """Normalise either din_tpu checkpoint layout into a variables tree;
    returns (variables, kind) with kind in {'full', 'stage1'}."""
    if "params" in ckpt:
        return ({"params": ckpt["params"],
                 "batch_stats": ckpt.get("batch_stats", {})}, "full")
    if "trunk" in ckpt or "embed" in ckpt:
        params = {k: ckpt[k] for k in ("trunk", "embed", "fc_actions",
                                       "fc_activities") if ckpt.get(k)}
        return ({"params": params,
                 "batch_stats": ckpt.get("batch_stats", {})}, "stage1")
    raise ValueError("unrecognised din_tpu checkpoint layout: "
                     f"top-level keys {sorted(ckpt)}")


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", required=True, choices=sorted(PRESETS),
                        help="preset the checkpoint was trained with "
                             "(supplies geometry: crop_size/emb_features/"
                             "head layout)")
    parser.add_argument("--ckpt", required=True,
                        help="din_tpu .ckpt file (msgpack) or orbax dir")
    parser.add_argument("--out", required=True, help="output .pth path")
    parser.add_argument("--format", choices=("full", "stage1"), default=None,
                        help="reference on-disk format (default: inferred "
                             "from the checkpoint layout)")
    parser.add_argument("--epoch", type=int, default=0,
                        help="epoch stamp for the 'full' format")
    args = parser.parse_args(argv)

    cfg = PRESETS[args.preset]()
    variables, kind = variables_from_checkpoint(load_checkpoint(args.ckpt))
    fmt = args.format or kind
    save_reference_checkpoint(variables, cfg, args.out, fmt=fmt,
                              epoch=args.epoch)
    print(f"wrote {args.out} (reference {fmt} format)")


if __name__ == "__main__":
    main()
