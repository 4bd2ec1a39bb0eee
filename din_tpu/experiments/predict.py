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


def chunked_padded_call(fwd, pad_to: int, images, boxes,
                        bboxes_num=None) -> Dict:
    """Answer a B-clip request with ceil(B/pad_to) fixed-shape calls to
    ``fwd(images, boxes, bboxes_num) -> dict`` (batch exactly ``pad_to``).

    Shared by the live Predictor and the StableHLO ExportedPredictor
    (export_serving.py).  Outputs may be flattened per clip (actions
    [B*N,A] / [B*T*MAX_N,A], collective activities [B*T,G]) — the leading
    dim is always a multiple m of the batch, so n valid clips occupy the
    first n*m rows.
    """
    images = np.asarray(images)
    boxes = np.asarray(boxes)
    if bboxes_num is not None:
        bboxes_num = np.asarray(bboxes_num)
    b_total, k = images.shape[0], pad_to
    if b_total == 0:
        raise ValueError("empty request: images.shape[0] == 0")
    chunks = []
    for s in range(0, b_total, k):
        n = min(k, b_total - s)

        def pad(x):
            sl = x[s:s + n]
            if n == k:
                return sl
            return np.concatenate(          # repeat a valid clip
                [sl] + [sl[:1]] * (k - n), axis=0)

        # host-side (numpy) padding; fwd owns device placement — the live
        # Predictor device_puts per its mesh, the exported program takes
        # numpy directly
        out = fwd(pad(images), pad(boxes),
                  None if bboxes_num is None else pad(bboxes_num))

        def _valid_rows(v):
            # Leading dim must be batch-major (a multiple of k) for the
            # first n*m rows to be exactly the valid clips; anything else
            # must fail loudly, not truncate to a plausible wrong answer.
            if v.shape[0] % k != 0:
                raise ValueError(
                    f"output leading dim {v.shape[0]} is not a multiple "
                    f"of the padded batch {k}; cannot un-pad")
            return np.asarray(v)[: n * (v.shape[0] // k)]

        chunks.append({kk: _valid_rows(v) for kk, v in out.items()})
    return {kk: np.concatenate([c[kk] for c in chunks], axis=0)
            for kk in chunks[0]}


class Predictor:
    """Compiled inference wrapper for any registered model.

    ``pad_to``: serving batch shape.  XLA compiles one program per input
    shape, so a production endpoint seeing ragged request sizes would pay
    a fresh compile per distinct batch size; with ``pad_to=k`` every
    request is padded up to k clips (larger requests run in k-sized
    chunks) and answered by the ONE compiled program — clips are
    independent in eval mode (batch_stats BN), so padding rows cannot
    alter real rows (sliced off before returning).

    ``mesh``: optional ``jax.sharding.Mesh`` for data-parallel serving —
    params replicate once at construction, each padded batch shards over
    the 'data' axis, and XLA runs the one program SPMD across the chips
    (``pad_to`` rounds up to a multiple of the data axis).  The reference
    has no multi-GPU inference at all (nn.DataParallel is train-only in
    its drivers, train_net.py:77-78).
    """

    def __init__(self, cfg, variables, pad_to: Optional[int] = None,
                 mesh=None):
        from din_tpu.models.registry import build_model

        if pad_to is not None and pad_to < 1:
            raise ValueError(f"pad_to must be >= 1, got {pad_to}")
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            # data-parallel serving: the padded batch shards over 'data'
            # (clips are independent in eval mode), params replicate once.
            # pad_to rounds UP to a multiple of the data axis so every
            # request shape divides the mesh.
            from din_tpu.parallel.mesh import replicated_sharding
            n_data = mesh.shape["data"]
            pad_to = max(pad_to or n_data, 1)
            pad_to = ((pad_to + n_data - 1) // n_data) * n_data
            variables = jax.device_put(variables, replicated_sharding(mesh))
        self.model = build_model(cfg)
        self._variables = variables
        self.pad_to = pad_to

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
    def from_checkpoint(cls, cfg, ckpt_path: Optional[str] = None,
                        pad_to: Optional[int] = None, mesh=None):
        """Build the model and (optionally) load a stage-2 checkpoint
        (params + batch_stats; optimizer state ignored)."""
        from din_tpu.train import checkpoint as ckpt_lib
        from din_tpu.train.engine import init_model

        cfg.init_config()
        from din_tpu.data.synthetic import make_synthetic_batch
        sample = make_synthetic_batch(cfg, batch_size=1)  # init shapes
        from din_tpu.models.registry import build_model
        model = build_model(cfg)
        variables = init_model(cfg, model, sample)
        if ckpt_path:
            variables, _, _, _ = ckpt_lib.load_stage2_model(variables,
                                                            ckpt_path)
        return cls(cfg, variables, pad_to=pad_to, mesh=mesh)

    def _run(self, images, boxes, bboxes_num) -> Dict:
        """One fixed-shape program invocation, owning device placement:
        single-chip puts inputs on the default device; with a mesh the
        batch axis shards over 'data' and the call runs under the ambient
        mesh (the trunk's sharding constraints resolve against it)."""
        if self.mesh is None:
            args = (jnp.asarray(images), jnp.asarray(boxes),
                    None if bboxes_num is None else jnp.asarray(bboxes_num))
            return self._fwd(self._variables, *args)
        from din_tpu.parallel.mesh import batch_sharding
        s = batch_sharding(self.mesh)
        args = (jax.device_put(np.asarray(images), s),
                jax.device_put(np.asarray(boxes), s),
                None if bboxes_num is None
                else jax.device_put(np.asarray(bboxes_num), s))
        with jax.set_mesh(self.mesh):
            return self._fwd(self._variables, *args)

    def __call__(self, images, boxes, bboxes_num=None) -> Dict:
        """images [B,T,H,W,3] uint8; boxes [B,T,N,4] feature-map coords.
        Returns softmax posteriors ({'activities': [B,A], 'actions': ...})
        as numpy arrays."""
        if self.pad_to is not None:
            return self._call_padded(images, boxes, bboxes_num)
        out = self._run(images, boxes, bboxes_num)
        return {k: np.asarray(v) for k, v in out.items()}

    def _call_padded(self, images, boxes, bboxes_num=None) -> Dict:
        return chunked_padded_call(self._run, self.pad_to, images, boxes,
                                   bboxes_num)


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
    from din_tpu.data.synthetic import make_synthetic_batch
    batch = make_synthetic_batch(cfg, batch_size=args.batch)
    out = predictor(batch["images"], batch["boxes"])
    acts = np.asarray(out["activities"])
    # some models emit frame-flattened activities ([B*T, G], see
    # chunked_padded_call docstring) — fold the per-clip multiple back out
    # and average the clip's rows, else row b would be frame b of clip 0
    m = acts.shape[0] // args.batch
    acts = acts.reshape(args.batch, m, -1).mean(axis=1)
    top = acts.argmax(-1)
    for b in range(args.batch):
        print(f"clip {b}: activity={int(top[b])} "
              f"p={float(acts[b, top[b]]):.3f}")
    return out


if __name__ == "__main__":
    main()
