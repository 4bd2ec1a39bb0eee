"""Serving path: jitted inference on a trained stage-2 checkpoint.

The reference has no inference/serving entry point at all (its drivers only
train+eval, train_net.py:28-137) — this exceeds parity: a single compiled
``predict`` program (backbone + RoIAlign + head, no loss/optimizer) that
maps a clip to activity/action posteriors.

Usage (library):
    predictor = Predictor.from_checkpoint(cfg, "stage2_epoch30.ckpt")
    out = predictor(images, boxes)           # dict of softmax posteriors

CLI demo (synthetic clip):
    python -m din_tpu.experiments.predict --preset volleyball_stage2_dynamic
        [--ckpt path.ckpt]
"""

from __future__ import annotations

import argparse
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


class Predictor:
    """Compiled inference wrapper for any registered model."""

    def __init__(self, cfg, variables):
        from din_tpu.models.registry import build_model

        self.cfg = cfg
        self.model = build_model(cfg)
        self._variables = variables

        def fwd(variables, images, boxes, bboxes_num):
            out = self.model.apply(variables, images, boxes,
                                   bboxes_num=bboxes_num, train=False)
            res = {"activities": jax.nn.softmax(
                out["activities"].astype(jnp.float32), axis=-1)}
            if "actions" in out:
                res["actions"] = jax.nn.softmax(
                    out["actions"].astype(jnp.float32), axis=-1)
            return res

        self._fwd = jax.jit(fwd)

    @classmethod
    def from_checkpoint(cls, cfg, ckpt_path: Optional[str] = None):
        """Build the model and (optionally) load a stage-2 checkpoint
        (params + batch_stats; optimizer state ignored)."""
        from din_tpu.train import checkpoint as ckpt_lib
        from din_tpu.train.engine import init_model

        cfg.init_config()
        from __graft_entry__ import _make_batch  # synthetic init shapes
        sample = _make_batch(cfg, batch_size=1)
        from din_tpu.models.registry import build_model
        model = build_model(cfg)
        variables = init_model(cfg, model, sample)
        if ckpt_path:
            variables, _, _, _ = ckpt_lib.load_stage2_model(variables,
                                                            ckpt_path)
        return cls(cfg, variables)

    def __call__(self, images, boxes, bboxes_num=None) -> Dict:
        """images [B,T,H,W,3] uint8; boxes [B,T,N,4] feature-map coords.
        Returns softmax posteriors ({'activities': [B,A], 'actions': ...})
        as numpy arrays."""
        out = self._fwd(self._variables, jnp.asarray(images),
                        jnp.asarray(boxes),
                        None if bboxes_num is None else jnp.asarray(bboxes_num))
        return {k: np.asarray(v) for k, v in out.items()}


def main(argv=None):
    from din_tpu.experiments.presets import PRESETS

    p = argparse.ArgumentParser(description="din_tpu inference demo")
    p.add_argument("--preset", default="volleyball_stage2_dynamic")
    p.add_argument("--ckpt", default=None,
                   help="stage-2 .ckpt (random init if omitted)")
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)

    cfg = PRESETS[args.preset]()
    predictor = Predictor.from_checkpoint(cfg, args.ckpt)
    from __graft_entry__ import _make_batch
    batch = _make_batch(cfg, batch_size=args.batch)
    out = predictor(batch["images"], batch["boxes"])
    top = out["activities"].argmax(-1)
    for b in range(args.batch):
        print(f"clip {b}: activity={int(top[b])} "
              f"p={float(out['activities'][b, top[b]]):.3f}")
    return out


if __name__ == "__main__":
    main()
