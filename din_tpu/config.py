"""Experiment configuration.

TPU-native re-design of the reference's plain-Python ``Config`` object
(reference: config.py:5-116).  Same field names and dataset-conditional
defaults so that every reference training script maps 1:1 onto a preset in
``din_tpu.experiments.presets``; adds TPU-specific knobs (mesh shape, compute
dtype, host prefetch depth).

Unlike the reference (which mutates a class instance field-by-field), this is
a dataclass: presets produce a new Config via ``replace``-style keyword
overrides, and derived paths are computed in ``init_config``.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

# Volleyball split (reference: config.py:28-30).
VOLLEYBALL_TRAIN_SEQS = [
    1, 3, 6, 7, 10, 13, 15, 16, 18, 22, 23, 31, 32, 36, 38, 39, 40, 41, 42,
    48, 50, 52, 53, 54, 0, 2, 8, 12, 17, 19, 24, 26, 27, 28, 30, 33, 46, 49, 51,
]
VOLLEYBALL_TEST_SEQS = [4, 5, 9, 11, 14, 20, 21, 25, 29, 34, 35, 37, 43, 44, 45, 47]

# Collective split (reference: config.py:33-34).
COLLECTIVE_TEST_SEQS = [5, 6, 7, 8, 9, 10, 11, 15, 16, 25, 28, 29]
COLLECTIVE_TRAIN_SEQS = [s for s in range(1, 45) if s not in COLLECTIVE_TEST_SEQS]


@dataclasses.dataclass
class Config:
    """All experiment knobs. Field semantics follow reference config.py:5-104."""

    dataset_name: str = "volleyball"

    # Global geometry (reference: config.py:12-15)
    image_size: Tuple[int, int] = (720, 1280)       # input image H, W
    batch_size: int = 32                            # train batch size
    test_batch_size: int = 8                        # eval batch size
    num_boxes: int = 12                             # max actors per frame (MAX_N)

    # Data paths / splits (reference: config.py:22-34)
    data_path: str = "data/volleyball/videos"
    train_seqs: Sequence[int] = dataclasses.field(default_factory=list)
    test_seqs: Sequence[int] = dataclasses.field(default_factory=list)

    # Backbone (reference: config.py:36-41)
    backbone: str = "res18"                         # inv3|vgg16|vgg19|res18|res50|alex
    crop_size: Tuple[int, int] = (5, 5)             # RoIAlign output K x K
    train_backbone: bool = False                    # finetune backbone weights
    out_size: Tuple[int, int] = (87, 157)           # backbone feature map OH, OW
    emb_features: int = 1056                        # backbone channel count D

    # Classes / losses (reference: config.py:44-48)
    num_actions: int = 9
    num_activities: int = 8
    actions_loss_weight: float = 1.0
    actions_weights: Optional[Sequence[float]] = None  # per-class CE weights

    # Frame sampling (reference: config.py:50-53)
    num_frames: int = 3
    num_before: int = 5
    num_after: int = 4

    # ARG head (reference: config.py:55-62)
    num_features_boxes: int = 1024                  # NFB
    num_features_relation: int = 256                # NFR
    num_graph: int = 16                             # NG
    num_features_gcn: int = 1024                    # NFG
    gcn_layers: int = 1
    tau_sqrt: bool = False
    pos_threshold: float = 0.2

    # Training (reference: config.py:64-72)
    train_random_seed: int = 0
    train_learning_rate: float = 1e-4
    lr_plan: Dict[int, float] = dataclasses.field(default_factory=lambda: {41: 1e-5})
    train_dropout_prob: float = 0.3
    weight_decay: float = 0.0
    max_epoch: int = 30
    # max_epoch counts epochs FROM the start epoch (reference semantics,
    # train_net.py:100 — where start is always 1).  On auto_resume that
    # means "N more epochs", which would extend a repeatedly-preempted
    # run; set train_to_epoch for an absolute target (consistent with the
    # absolute epoch keys of lr_plan) — it overrides max_epoch.
    train_to_epoch: Optional[int] = None
    test_interval_epoch: int = 1

    # Experiment control (reference: config.py:74-81)
    training_stage: int = 1
    stage1_model_path: str = ""
    test_before_train: bool = False
    # run exactly one eval pass on the loaded weights and return (no
    # training) — first-class form of the reference's closest equivalent,
    # test_before_train + max_epoch=0 (train_net.py:93-95)
    eval_only: bool = False
    exp_note: str = "Group-Activity-Recognition"
    exp_name: Optional[str] = None
    set_bn_eval: bool = False
    inference_module_name: str = "dynamic_volleyball"

    # Dynamic Inference / DIN (reference: config.py:83-97)
    stride: int = 1
    ST_kernel_size: Any = ((3, 3),)                 # tuple of (kh, kw) per DIM
    dynamic_sampling: bool = True
    sampling_ratio: Sequence[int] = (1, 3)
    group: int = 1
    scale_factor: bool = True
    beta_factor: bool = True
    load_backbone_stage2: bool = False
    parallel_inference: bool = False
    hierarchical_inference: bool = False
    lite_dim: Optional[int] = None
    num_DIM: int = 1
    load_stage2model: bool = False
    stage2model: Optional[str] = None
    # Migration: a .pth checkpoint written BY THE REFERENCE framework
    # (either its stage-1 component or full-model format) to graft into
    # the initialised variables via nn/ref_import.py.  Applied before the
    # din_tpu-native stage-1/stage-2 loaders.
    ref_checkpoint_path: str = ""
    # Also adopt the torch Adam moments/step/lr saved in a full-format
    # reference checkpoint (the reference saves but never restores them,
    # train_net.py:99,121-125) and resume at its epoch + 1 — exact
    # mid-training migration (nn/ref_import.py load_reference_optimizer).
    ref_resume_optimizer: bool = False

    # Actor Transformer (reference: config.py:99-100)
    temporal_pooled_first: bool = False

    # SACRF + BiUTE (reference: config.py:102-103)
    halting_penalty: float = 1e-4

    # ---- TPU-native additions (no reference counterpart) ----
    compute_dtype: str = "bfloat16"      # dtype for backbone/head matmuls
    param_dtype: str = "float32"
    mesh_shape: Dict[str, int] = dataclasses.field(default_factory=dict)  # e.g. {"data": 8}
    # Sequence(frame) parallelism: shard the flattened B*T frame axis over
    # BOTH mesh axes through the trunk (frames are independent there —
    # models/trunk.py), then gather to batch-over-'data' for the reasoning
    # head.  Scales the dominant backbone cost even at batch sizes the
    # reference's nn.DataParallel cannot split (e.g. bs1).  Params stay
    # replicated over 'model' (do not combine with tensor-parallel
    # param_sharding on the same axis).
    frame_parallel: bool = False
    # Gradient accumulation: split each batch into this many micro-batches,
    # scan them (one rematted fwd+bwd each, batch_stats carried
    # sequentially — the same DataParallel-analogue BN semantics as the
    # frame-chunk scan) and apply ONE optimizer update on the averaged
    # grads.  Gives large-batch gradient semantics at micro-batch memory:
    # e.g. bs8 = batch_size 8 + grad_accum_steps 2 keeps the fast 'early'
    # remat that bs8 in one step cannot fit (PERF.md bs8 negative result).
    # batch_size must be divisible by it.
    grad_accum_steps: int = 1
    # ZeRO-1 optimizer-state sharding: shard the Adam moments (2x param
    # bytes when replicated) over the 'data' mesh axis — exact semantics,
    # per-chip optimizer memory drops to 2x/n_data
    # (parallel/mesh.py opt_state_sharding).  No-op on a single device.
    shard_opt_state: bool = False
    prefetch_depth: int = 2              # host->device pipeline depth
    roi_align_impl: str = "auto"         # auto|onehot|gather|pallas
    frame_chunk: Optional[int] = None    # frames per backbone micro-batch
    # 'early' (two-segment, VGG) | 'full' | 'save_deep'.  NOTE memory: the
    # full-resolution budget assumes 'early', which stores all deep (conv3+)
    # activations per scan chunk (~6GB at bs4/chunk8); configs pushing batch
    # or frame counts beyond the flagship should fall back to 'full'
    # (one chunk's activations, more recompute) — measured trade in PERF.md.
    remat_policy: str = "early"
    remat_backbone: bool = True          # remat the scan body (False = let XLA decide)
    folded_stem: bool = True             # fold input stems (din_tpu/nn/stem.py)
    fuse_multiscale_roi: bool = True     # resize composed into RoIAlign rows
    # Shard-local frame-chunk packing under dp/frame-parallel meshes:
    # 'auto' = permute whenever numerics-preserving (no live trunk BN),
    # 'on' = force (live-BN chunks regroup, nn.DataParallel-style),
    # 'off' = keep the order-preserving packing.  models/trunk.py.
    shard_local_chunks: str = "auto"
    pretrained_backbone_path: Optional[str] = None  # torch state_dict file (optional)
    result_root: str = "result"
    num_workers: int = 4                 # host decode threads
    decode_cache_mb: int = 0             # decoded-frame LRU budget (0 = off;
    # ~2.7 MB per 720p frame — data/cache.py)
    hflip_prob: float = 0.0              # train-time horizontal flip with
    # l/r activity swap (data/augment.py) — beyond-reference augmentation;
    # keep 0 for parity runs (the reference never augments)
    packed_frames_path: Optional[str] = None  # mmap store of pre-decoded
    # frames (data/packed.py; pack via `python -m din_tpu.data.packed`) —
    # removes JPEG decode from the input path entirely; takes precedence
    # over decode_cache_mb
    donate_step_buffers: bool = True
    measure_mad: bool = False            # MAD diagnostics on DIN eval
    profile_dir: Optional[str] = None    # jax.profiler trace output dir
    debug_nans: bool = False             # jax nan-checking (debug runs)
    auto_resume: bool = False            # resume latest ckpt in result_path
    graceful_preemption: bool = True     # SIGTERM -> save full state at the
    # next step boundary + clean exit (train/preempt.py); pair with
    # auto_resume to survive spot/maintenance reclaims
    checkpoint_backend: str = "msgpack"  # 'msgpack' file | 'orbax' dir (pod-safe)
    keep_checkpoints: int = 0            # retain newest K regular stage-2
    # saves (+ the best-acc one; _preempt always kept); 0 = keep all like
    # the reference (train/checkpoint.py prune_checkpoints)

    # Derived at init_config()
    result_path: Optional[str] = None
    log_path: Optional[str] = None

    def __post_init__(self):
        assert self.dataset_name in ("volleyball", "collective")
        if not self.train_seqs or not self.test_seqs:
            if self.dataset_name == "volleyball":
                self.train_seqs = list(VOLLEYBALL_TRAIN_SEQS)
                self.test_seqs = list(VOLLEYBALL_TEST_SEQS)
                self.data_path = "data/volleyball/videos"
            else:
                self.train_seqs = list(COLLECTIVE_TRAIN_SEQS)
                self.test_seqs = list(COLLECTIVE_TEST_SEQS)
                self.data_path = "data/collective"
        if self.dataset_name == "collective" and self.num_boxes == 12:
            # collective presets always override, but keep a sane default
            pass

    # -- reference config.py:107-116 --------------------------------------
    def init_config(self, need_new_folder: bool = True) -> "Config":
        if self.exp_name is None:
            time_str = time.strftime("%Y-%m-%d_%H-%M-%S", time.localtime())
            if self.checkpoint_backend == "orbax":
                # tensorstore rejects []<> in kvstore paths; drop the
                # reference's decorative brackets for orbax runs
                self.exp_name = "%s_stage%d_%s" % (
                    self.exp_note, self.training_stage, time_str)
            else:
                self.exp_name = "[%s_stage%d]<%s>" % (self.exp_note, self.training_stage, time_str)
        self.result_path = os.path.join(self.result_root, self.exp_name)
        self.log_path = os.path.join(self.result_path, "log.txt")
        if need_new_folder:
            os.makedirs(self.result_path, exist_ok=True)
        return self

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)

    # Normalised views -----------------------------------------------------
    @property
    def kernel_sizes(self) -> List[Tuple[int, int]]:
        """ST_kernel_size normalised to a list of (kh, kw).

        The reference accepts both a list of tuples (scripts/
        train_volleyball_stage2_dynamic.py:33) and a bare tuple
        (scripts/train_collective_stage2_dynamic.py:47).
        """
        ks = self.ST_kernel_size
        if isinstance(ks, int):
            return [(ks, ks)]
        ks = tuple(ks)
        if len(ks) == 2 and all(isinstance(v, int) for v in ks):
            return [tuple(ks)]
        return [tuple(k) for k in ks]

    @property
    def action_weight_list(self) -> Optional[List[float]]:
        """actions_weights flattened.

        The reference scripts pass a nested list ``[[...]]``
        (scripts/train_volleyball_stage1.py:34); flatten by intent.
        """
        w = self.actions_weights
        if w is None:
            return None
        w = list(w)
        if len(w) and isinstance(w[0], (list, tuple)):
            w = list(w[0])
        return [float(v) for v in w]
