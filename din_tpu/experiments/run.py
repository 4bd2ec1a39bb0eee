"""CLI entry: ``python -m din_tpu.experiments.run --preset <name> [...]``.

Replaces the reference's per-experiment scripts (scripts/train_*.py)."""

from __future__ import annotations

import argparse

from din_tpu.experiments.presets import PRESETS
from din_tpu.train.engine import train_net


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--preset", required=True, choices=sorted(PRESETS))
    parser.add_argument("--data-path", default=None)
    parser.add_argument("--max-epoch", type=int, default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--max-steps-per-epoch", type=int, default=None)
    parser.add_argument("--stage1-model-path", default=None)
    parser.add_argument("--stage2-model-path", default=None,
                        help="full stage-2 .ckpt to load (resume training "
                             "from it, or score it with --eval-only)")
    parser.add_argument("--ref-checkpoint-path", default=None,
                        help=".pth saved by the reference framework to "
                             "graft in (nn/ref_import.py)")
    parser.add_argument("--ref-resume-optimizer", action="store_true",
                        help="also adopt the torch Adam moments/step/lr "
                             "from the reference full checkpoint and "
                             "resume at its epoch + 1")
    parser.add_argument("--result-root", default=None,
                        help="directory for result/<exp> output trees")
    parser.add_argument("--exp-name", default=None,
                        help="fixed result dir name (required for "
                             "--auto-resume across relaunches; default is "
                             "timestamped)")
    parser.add_argument("--auto-resume", action="store_true",
                        help="resume the newest checkpoint in the result "
                             "dir (incl. SIGTERM _preempt saves — "
                             "train/preempt.py)")
    parser.add_argument("--packed-frames-path", default=None,
                        help="pre-decoded mmap frame store "
                             "(python -m din_tpu.data.packed)")
    parser.add_argument("--train-to-epoch", type=int, default=None,
                        help="absolute stop epoch (overrides max_epoch; "
                             "pair with --auto-resume so relaunches "
                             "complete the original plan)")
    parser.add_argument("--grad-accum-steps", type=int, default=None,
                        help="micro-batches per optimizer update (large-"
                             "batch gradients at micro-batch memory)")
    parser.add_argument("--hflip-prob", type=float, default=None,
                        help="train-time horizontal-flip probability "
                             "(beyond-reference augmentation; keep unset "
                             "for parity)")
    parser.add_argument("--eval-only", action="store_true",
                        help="run one eval pass on the loaded weights "
                             "(e.g. --ref-checkpoint-path / "
                             "--stage1-model-path) and exit — no training")
    parser.add_argument("--pretrained-backbone-path", default=None,
                        help="torchvision state_dict file for ImageNet "
                             "backbone init (stage 1; nn/torch_port.py)")
    parser.add_argument("--shard-opt-state", action="store_true",
                        help="ZeRO-1: shard Adam moments over the 'data' "
                             "mesh axis (exact; per-chip optimizer memory "
                             "/ n_data; parallel/mesh.py)")
    args = parser.parse_args(argv)

    cfg = PRESETS[args.preset]()
    overrides = {}
    # `is not None`, not truthiness: an explicit `--max-epoch 0` (skip
    # training, keep test_before_train) must override the preset
    if args.data_path is not None:
        overrides["data_path"] = args.data_path
    if args.max_epoch is not None:
        overrides["max_epoch"] = args.max_epoch
    if args.batch_size is not None:
        overrides["batch_size"] = args.batch_size
    if args.stage1_model_path:
        overrides["stage1_model_path"] = args.stage1_model_path
    if args.stage2_model_path:
        overrides["stage2model"] = args.stage2_model_path
        overrides["load_stage2model"] = True
        overrides["load_backbone_stage2"] = False
    if args.ref_checkpoint_path:
        overrides["ref_checkpoint_path"] = args.ref_checkpoint_path
    if args.ref_resume_optimizer:
        overrides["ref_resume_optimizer"] = True
    if args.result_root:
        overrides["result_root"] = args.result_root
    if args.exp_name:
        overrides["exp_name"] = args.exp_name
    if args.auto_resume:
        overrides["auto_resume"] = True
    if args.packed_frames_path:
        overrides["packed_frames_path"] = args.packed_frames_path
    if args.train_to_epoch is not None:
        overrides["train_to_epoch"] = args.train_to_epoch
    if args.grad_accum_steps is not None:
        overrides["grad_accum_steps"] = args.grad_accum_steps
    if args.hflip_prob is not None:
        overrides["hflip_prob"] = args.hflip_prob
    if args.eval_only:
        overrides["eval_only"] = True
    if args.pretrained_backbone_path:
        overrides["pretrained_backbone_path"] = args.pretrained_backbone_path
    if args.shard_opt_state:
        overrides["shard_opt_state"] = True
    if overrides:
        cfg = cfg.replace(**overrides)
    best = train_net(cfg, max_steps_per_epoch=args.max_steps_per_epoch)
    print("Best:", {k: v for k, v in best.items()
                    if not hasattr(v, "shape")})


if __name__ == "__main__":
    main()
