"""Self-contained serving artifact: serialized StableHLO via ``jax.export``.

The reference has no deployment story at all (its drivers only train+eval,
train_net.py:28-137) — this exceeds parity.  ``export_predictor`` bakes the
trained weights into the inference program as constants and serializes ONE
fixed-batch-shape program (jax.export's versioned StableHLO format); the
artifact then runs with NO model code, config, or checkpoint — anything
that can load StableHLO (jax on any backend; PJRT C++ loaders) can serve
it.  ``ExportedPredictor`` answers ragged request sizes with the same
pad-to-k chunking as the live Predictor (predict.chunked_padded_call),
so one artifact serves any request size with zero recompiles.

CLI:
    python -m din_tpu.experiments.export_serving \
        --preset volleyball_stage2_dynamic --ckpt stage2_epoch30.ckpt \
        --out model.dinx --batch 4 [--platforms cpu,tpu]

Serving:
    from din_tpu.experiments.export_serving import ExportedPredictor
    pred = ExportedPredictor.load("model.dinx")
    out = pred(images, boxes)          # any batch size; softmax posteriors

File format: MAGIC + u64le header length + JSON header + exported bytes.
The header records the arg shapes/dtypes and output names so a loader can
validate requests without deserializing the program.
"""

from __future__ import annotations

import argparse
import json
import struct
from typing import Dict, Optional, Sequence

import jax
import numpy as np

_MAGIC = b"DINTPUX1"


def _example_args(cfg, batch: int):
    """Fixed-shape example arguments for the exported program (shapes from
    cfg exactly as the live Predictor sees them; values irrelevant)."""
    from din_tpu.data.synthetic import make_synthetic_batch

    sample = make_synthetic_batch(cfg, batch_size=batch)
    args = [sample["images"], sample["boxes"]]
    if "bboxes_num" in sample:          # collective: variable actor counts
        args.append(sample["bboxes_num"])
    return tuple(jax.numpy.asarray(a) for a in args)


def export_predictor(predictor, batch: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None) -> bytes:
    """Serialize ``predictor``'s inference program (weights baked in) at a
    fixed batch size into a self-contained artifact (bytes).

    ``platforms``: lowering targets, e.g. ("cpu", "tpu") for one artifact
    that serves both; None = the current backend only.  Multi-platform
    export requires every op to lower for every target — use the XLA
    RoIAlign paths (cfg.roi_align_impl != 'pallas') for portable artifacts.
    """
    if getattr(predictor, "mesh", None) is not None:
        raise ValueError("export a single-chip Predictor (mesh=None); the "
                         "exported artifact is a per-host program")
    k = batch or predictor.pad_to or 1
    args = _example_args(predictor.cfg, k)
    variables = predictor._variables
    inner = predictor._fwd              # fwd(variables, images, boxes, bn)

    if len(args) == 3:
        def fn(images, boxes, bboxes_num):
            return inner(variables, images, boxes, bboxes_num)
    else:
        def fn(images, boxes):
            return inner(variables, images, boxes, None)

    exported = jax.export.export(
        jax.jit(fn),
        platforms=tuple(platforms) if platforms else None)(*args)
    out_tree = jax.eval_shape(fn, *args)
    header = {
        "batch": k,
        "arg_shapes": [list(a.shape) for a in args],
        "arg_dtypes": [str(a.dtype) for a in args],
        "has_bboxes_num": len(args) == 3,
        "outputs": sorted(out_tree),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "model": getattr(predictor.cfg, "inference_module_name", ""),
    }
    blob = exported.serialize()
    hdr = json.dumps(header).encode()
    return _MAGIC + struct.pack("<Q", len(hdr)) + hdr + blob


class ExportedPredictor:
    """Serve a .dinx artifact: ragged batches via pad-to-k chunking against
    the single exported fixed-shape program."""

    def __init__(self, exported, header: Dict):
        self._exported = exported
        self.header = header
        self.pad_to = int(header["batch"])
        self._has_bn = bool(header["has_bboxes_num"])

    @classmethod
    def from_bytes(cls, data: bytes) -> "ExportedPredictor":
        if data[: len(_MAGIC)] != _MAGIC:
            raise ValueError("not a din_tpu serving artifact (bad magic)")
        off = len(_MAGIC)
        (hlen,) = struct.unpack_from("<Q", data, off)
        off += 8
        header = json.loads(data[off:off + hlen].decode())
        exported = jax.export.deserialize(data[off + hlen:])
        return cls(exported, header)

    @classmethod
    def load(cls, path: str) -> "ExportedPredictor":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    def __call__(self, images, boxes, bboxes_num=None) -> Dict:
        from din_tpu.experiments.predict import chunked_padded_call

        if self._has_bn and bboxes_num is None:
            raise ValueError("this artifact was exported with bboxes_num; "
                             "the request must provide it")

        def fwd(i, b, n):
            extra = (n,) if self._has_bn else ()
            return self._exported.call(i, b, *extra)

        return chunked_padded_call(fwd, self.pad_to, images, boxes,
                                   bboxes_num)


def main(argv=None):
    from din_tpu.experiments.predict import Predictor
    from din_tpu.experiments.presets import PRESETS

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--preset", default="volleyball_stage2_dynamic")
    p.add_argument("--ckpt", default=None,
                   help="stage-2 .ckpt (random init if omitted)")
    p.add_argument("--out", required=True, help="artifact path (.dinx)")
    p.add_argument("--batch", type=int, default=4,
                   help="fixed serving batch shape (pad-to-k at call time)")
    p.add_argument("--platforms", default=None,
                   help="comma list, e.g. cpu,tpu (default: current backend)")
    args = p.parse_args(argv)

    cfg = PRESETS[args.preset]()
    predictor = Predictor.from_checkpoint(cfg, args.ckpt)
    platforms = args.platforms.split(",") if args.platforms else None
    data = export_predictor(predictor, batch=args.batch, platforms=platforms)
    with open(args.out, "wb") as f:
        f.write(data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB, "
          f"batch={args.batch}, platforms={platforms or 'current'}")


if __name__ == "__main__":
    main()
