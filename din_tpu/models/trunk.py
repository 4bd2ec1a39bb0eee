"""Shared model trunk: images -> backbone -> multiscale -> RoIAlign -> actor
features.

All reference models share this trunk verbatim (e.g. base_model.py:85-115,
infer_model.py:161-186): reshape [B,T,...] to frames, normalise to [-1,1],
run the backbone, bilinear-resize every output map to (OH, OW) with
align_corners and channel-concat, RoIAlign each actor box to K x K, flatten.

TPU-native deltas: NHWC layout, uint8 frames normalised on device, bf16
compute dtype for the backbone, the RoIAlign is the Pallas/one-hot kernel
(din_tpu/ops/roi_align.py), and a frozen backbone is cut out of the autodiff
graph with stop_gradient (the reference's requires_grad=False,
infer_model.py:44-46).

RoI feature ordering: torch flattens [BTN, D, K, K] channel-major
(base_model.py:115); this trunk flattens [B,T,N,K,K,D] position-major.  The
fc_emb weight that consumes it is trained from scratch either way; the
torch-checkpoint port reorders the weight (din_tpu/nn/torch_port.py
``convert_fc_emb``).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from din_tpu.nn.backbones import BACKBONE_HAS_BN, BACKBONES, SAVEABLE_ACT
from din_tpu.nn.layers import kaiming_normal_init
from din_tpu.ops.image import prep_images, resize_bilinear_align_corners
from din_tpu.ops.roi_align import roi_align, roi_align_multiscale


class _BackboneStep(nn.Module):
    """scan body: one frame micro-batch through the (rematted) backbone.

    The chunk arrives uint8 with W and the 3 channels merged
    ([chunk, H, W*3]) — a 3-channel trailing dim would be tile-padded to 128
    lanes at the scan boundary (a 17x HBM blow-up at 720x1280); the packed
    form is padding-free and is unpacked/normalised inside the body.
    """

    backbone_name: str
    dtype: Any
    bn_train: bool
    remat: bool
    remat_policy: str = "full"   # 'full' | 'save_deep' | 'early'
    folded_stem: bool = True     # VGG-only stem fold (din_tpu/nn/stem.py)

    @nn.compact
    def __call__(self, carry, packed_chunk):
        chunk, H, W3 = packed_chunk.shape
        frames = prep_images(packed_chunk.reshape(chunk, H, W3 // 3, 3),
                             dtype=self.dtype)
        cls = BACKBONES[self.backbone_name]
        extra = ({"folded_stem": self.folded_stem}
                 if "folded_stem" in cls.__dataclass_fields__ else {})
        # 'early': the backbone remats ONLY its early stages internally
        # (two-segment body: recompute the activation-heavy cheap stages,
        # store the deep wgrad inputs) — supported by VGG; other backbones
        # fall back to whole-body remat.
        use_early = (self.remat and self.remat_policy == "early"
                     and "remat_early" in cls.__dataclass_fields__)
        if use_early:
            extra["remat_early"] = True
        if self.remat and not use_early:
            # static_argnums indexes (scope, frames, train): the train flag
            # must be static (BatchNorm branches on it).  'save_deep' keeps
            # the cheap deep-layer activations and recomputes only the
            # memory-heavy early blocks.
            policy = None
            if self.remat_policy == "save_deep":
                policy = jax.checkpoint_policies.save_only_these_names(
                    SAVEABLE_ACT)
            cls = nn.remat(cls, static_argnums=(2,), policy=policy)
        outs = cls(dtype=self.dtype, name="backbone",
                   **extra)(frames, self.bn_train)
        return carry, outs


class Trunk(nn.Module):
    backbone: str
    out_size: Tuple[int, int]
    crop_size: Tuple[int, int]
    train_backbone: bool
    compute_dtype: Any = jnp.bfloat16
    roi_align_impl: str = "auto"
    remat_backbone: bool = True
    remat_policy: str = "full"          # 'early' | 'full' | 'save_deep'
    frame_chunk: Optional[int] = None   # None = auto
    folded_stem: bool = True            # VGG stem fold A/B knob
    fuse_multiscale_roi: bool = True    # compose resize into RoIAlign rows
    # Sequence(frame) parallelism: mesh axis names the flattened B*T frame
    # axis is sharded over through the backbone + RoIAlign (frames are
    # independent until the reasoning head).  The first name is the batch
    # ('data') axis the per-clip features are gathered back to before the
    # head.  Requires an ambient mesh (jax.set_mesh) carrying these axes;
    # None (default) adds no constraints.  cfg.frame_parallel wires this.
    frame_axes: Optional[Tuple[str, ...]] = None
    # Shard-local chunk packing: 'auto' | 'on' | 'off' (see _pack_extent).
    shard_local_chunks: str = "auto"

    def _frame_mesh_ready(self) -> bool:
        """frame_axes constraints resolve only against an ambient mesh
        (jax.set_mesh — the engine installs it).  Outside one (Predictor,
        bare init, CPU tools) the constraints are silently skipped so a
        frame_parallel cfg stays usable everywhere."""
        if not self.frame_axes:
            return False
        mesh = jax.sharding.get_abstract_mesh()
        return not mesh.empty and \
            set(self.frame_axes) <= set(mesh.axis_names)

    def _shard_frames(self, x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
        """Constrain dim `axis` of x (the flattened frame axis) to the
        merged frame mesh axes, e.g. P(('data','model'), ...).  Dims that
        don't divide the mesh extent (e.g. a 4-frame chunk over 8 devices)
        are left unconstrained — XLA picks a layout instead of failing."""
        if not self._frame_mesh_ready():
            return x
        from jax.sharding import PartitionSpec as P
        mesh = jax.sharding.get_abstract_mesh()
        axes = tuple(self.frame_axes)
        extent = 1
        for a in axes:
            extent *= mesh.shape[a]
        if extent <= 1 or x.shape[axis] % extent:
            if extent > 1:
                # dropping the constraint lets SPMD fall back to REPLICATING
                # the trunk (the zero-speedup pathology PERF.md documents) —
                # make the silent degradation visible at trace time
                import warnings
                warnings.warn(
                    f"frame axis of extent {x.shape[axis]} does not divide "
                    f"the {axes} mesh extent {extent}; sharding constraint "
                    f"dropped — the trunk may replicate (pick batch_size*T "
                    f"divisible by the mesh)", stacklevel=2)
            return x
        spec = [None] * x.ndim
        spec[axis] = axes if len(axes) > 1 else axes[0]
        return jax.lax.with_sharding_constraint(x, P(*spec))

    def _pack_extent(self, n_frames: int, chunk: int, bn_train: bool) -> int:
        """Device extent E for shard-local chunk packing, or 1 to keep the
        order-preserving packing.

        The naive [B*T]->[chunks,chunk] reshape assigns CONTIGUOUS frames to
        each chunk, so a chunk spans multiple devices' batch shards and the
        SPMD partitioner moves the frame tensor across ICI every step to
        repack it (measured on the flagship dp step: ~290 MB/chip of
        all-gather/all-to-all/permute traffic, PERF.md).  Packing each
        device's OWN contiguous frame block into its slice of every chunk
        (``_pack_shard_local``) makes the packing a local
        reshape-transpose-reshape — zero resharding traffic.

        The regrouping changes which frames share a chunk, which only
        matters to live per-chunk BatchNorm statistics: for BN-free or
        frozen-BN trunks the outputs are frame-independent and the permuted
        program is numerically identical after unpacking.  'auto' therefore
        permutes exactly when BN is not live; 'on' forces it for live-BN
        trunks too (an nn.DataParallel-style analogue: each replica's BN
        normalises its own sub-batch, train_net.py:77-78); 'off' disables.
        """
        if self.shard_local_chunks == "off" or not self._frame_mesh_ready():
            return 1
        if self.shard_local_chunks == "auto" and bn_train and \
                BACKBONE_HAS_BN.get(self.backbone, True):
            return 1
        mesh = jax.sharding.get_abstract_mesh()
        extent = 1
        for a in self.frame_axes:
            extent *= mesh.shape[a]
        if extent <= 1 or n_frames % extent or chunk % extent:
            return 1
        return extent

    def _pack_shard_local(self, flat: jnp.ndarray, num_chunks: int,
                          E: int) -> jnp.ndarray:
        """[B*T, ...] -> [num_chunks, chunk, ...] with chunk c's slice
        [d*chunk_l, (d+1)*chunk_l) = frames [d*per + c*chunk_l, ...) — i.e.
        every device contributes its own frames to every chunk.  All three
        steps preserve the device partition (split at the shard boundary,
        transpose of a sharded dim, aligned merge), so SPMD lowers them
        without collectives.  Inverse: ``_unpack_shard_local``."""
        chunk_l = flat.shape[0] // (E * num_chunks)
        g = self._shard_frames(
            flat.reshape((E, num_chunks, chunk_l) + flat.shape[1:]), axis=0)
        g = self._shard_frames(
            g.transpose((1, 0) + tuple(range(2, g.ndim))), axis=1)
        return self._shard_frames(
            g.reshape((num_chunks, E * chunk_l) + g.shape[3:]), axis=1)

    def _unpack_shard_local(self, o: jnp.ndarray, n_frames: int,
                            E: int) -> jnp.ndarray:
        """[num_chunks, chunk, ...] scan outputs back to canonical frame
        order [B*T, ...] (identity reshape when E == 1)."""
        if E > 1:
            num_chunks, chunk = o.shape[:2]
            o = self._shard_frames(
                o.reshape((num_chunks, E, chunk // E) + o.shape[2:]), axis=1)
            o = self._shard_frames(
                o.transpose((1, 0) + tuple(range(2, o.ndim))), axis=0)
            o = o.reshape((E * num_chunks * (chunk // E),) + o.shape[3:])
        else:
            o = o.reshape((o.shape[0] * o.shape[1],) + o.shape[2:])
        assert o.shape[0] == n_frames
        return self._shard_frames(o)

    def _auto_chunk(self, n_frames: int, H: int, W: int) -> int:
        """Frames per backbone micro-batch.  At 720x1280 a single frame's
        early conv activations are ~0.5GB after TPU tile padding; chunking
        bounds the (rematted) backward working set to one chunk."""
        if self.frame_chunk:
            chunk = min(self.frame_chunk, n_frames)
            while n_frames % chunk:      # largest divisor <= requested
                chunk -= 1
            return chunk
        if not self.train_backbone:
            return n_frames
        budget_pixels = 8 * 768 * 1280          # ~8 full-HD frames
        per_chunk = max(1, budget_pixels // max(H * W, 1))
        if per_chunk >= n_frames:
            return n_frames
        # even split (one compiled body) + multiple-of-8 sublane alignment
        while n_frames % per_chunk or (per_chunk > 8 and per_chunk % 8):
            per_chunk -= 1
        return max(per_chunk, 1)

    @nn.compact
    def __call__(self, images: jnp.ndarray, boxes: jnp.ndarray,
                 bn_train: bool = False):
        """images [B,T,H,W,3] (uint8 or float 0..255); boxes [B,T,N,4]
        feature-map coords.  Returns (roi [B,T,N,KH,KW,D],
        multiscale [BT,OH,OW,D], raw_outputs list)."""
        B, T, H, W, _ = images.shape
        N = boxes.shape[2]
        OH, OW = self.out_size

        # Frames are independent through the backbone: scan over frame
        # micro-batches with rematted bodies so the backward holds only one
        # chunk's activations (lax.scan sequencing — an unrolled loop lets
        # the scheduler interleave chunks and blows HBM).  BatchNorm stays
        # LIVE under chunking: batch_stats are carried through the scan, so
        # each chunk normalises with its own batch statistics and folds them
        # into the running stats sequentially — the exact analogue of the
        # reference's nn.DataParallel training, where each replica's BN sees
        # only its sub-batch and replica 0's running stats persist
        # (train_net.py:77-78, torch _BatchNorm train mode).
        chunk = self._auto_chunk(B * T, H, W)
        num_chunks = (B * T) // chunk
        step_kwargs = dict(backbone_name=self.backbone,
                           dtype=self.compute_dtype,
                           remat=self.remat_backbone and self.train_backbone,
                           remat_policy=self.remat_policy,
                           folded_stem=self.folded_stem,
                           name="frames_scan")
        if num_chunks == 1:
            step_mod = _BackboneStep(bn_train=bn_train, **step_kwargs)
            _, outputs = step_mod(
                None, self._shard_frames(images.reshape(B * T, H, W * 3)))
        else:
            if self.is_initializing():
                # collections can't be *created* as a scan carry; at init the
                # stats are broadcast (created once), at apply they're
                # carried (bn_train is always False during init_model)
                coll = dict(variable_broadcast=("params", "batch_stats"))
            else:
                coll = dict(variable_broadcast="params",
                            variable_carry="batch_stats")
            scanned = nn.scan(
                _BackboneStep,
                split_rngs={"params": False},
                in_axes=0, out_axes=0, **coll,
            )(bn_train=bn_train and not self.is_initializing(),
              **step_kwargs)
            E = self._pack_extent(B * T, chunk, bn_train)
            if self._frame_mesh_ready():
                # two-step reshape: merge [B,T]->[B*T] first (axes sharded
                # over ('data','model') merge natively) so the SPMD
                # partitioner only has to reshard the split, not recover
                # the whole chain from [B,T,...] — avoids its involuntary
                # full-rematerialisation fallback on the image tensor
                flat = self._shard_frames(images.reshape(B * T, H, W * 3))
                if E > 1:
                    packed = self._pack_shard_local(flat, num_chunks, E)
                else:
                    packed = self._shard_frames(
                        flat.reshape(num_chunks, chunk, H, W * 3), axis=1)
            else:
                packed = images.reshape(num_chunks, chunk, H, W * 3)
            _, outs = scanned(None, packed)
            outputs = [self._unpack_shard_local(o, B * T, E) for o in outs]

        if not self.train_backbone:
            outputs = [jax.lax.stop_gradient(o) for o in outputs]

        flat_boxes = self._shard_frames(boxes.reshape(B * T, N, 4))
        needs_resize = any(o.shape[1:3] != (OH, OW) for o in outputs)
        if self.fuse_multiscale_roi and needs_resize:
            # compose the align-corners resize into the RoIAlign
            # interpolation rows — never materializes the resized maps
            # (ops/roi_align.py roi_align_multiscale); the multiscale
            # return slot is None (no model consumes it)
            multiscale = None
            roi = roi_align_multiscale(outputs, flat_boxes,
                                       self.crop_size, (OH, OW),
                                       impl=self.roi_align_impl)
        else:
            feats = [resize_bilinear_align_corners(o, (OH, OW))
                     for o in outputs]
            multiscale = feats[0] if len(feats) == 1 \
                else jnp.concatenate(feats, -1)
            roi = roi_align(multiscale, flat_boxes,
                            self.crop_size, impl=self.roi_align_impl)
        KH, KW = self.crop_size
        roi = roi.reshape(B, T, N, KH, KW, roi.shape[-1])
        if self._frame_mesh_ready():
            # gather the per-clip frames back to batch-over-'data' for the
            # reasoning head (which mixes across T)
            from jax.sharding import PartitionSpec as P
            mesh = jax.sharding.get_abstract_mesh()
            if B % mesh.shape[self.frame_axes[0]] == 0:
                roi = jax.lax.with_sharding_constraint(
                    roi, P(self.frame_axes[0]))
        return roi, multiscale, outputs


def trunk_from_cfg(cfg, name: str = "trunk") -> "Trunk":
    """The one place cfg knobs map to Trunk fields (every model builds its
    trunk here — keep new knobs wired in this single spot)."""
    from din_tpu.parallel import mesh as mesh_lib

    return Trunk(backbone=cfg.backbone, out_size=tuple(cfg.out_size),
                 crop_size=tuple(cfg.crop_size),
                 train_backbone=cfg.train_backbone,
                 compute_dtype=jnp.dtype(cfg.compute_dtype),
                 roi_align_impl=cfg.roi_align_impl,
                 frame_chunk=cfg.frame_chunk,
                 remat_policy=getattr(cfg, "remat_policy", "full"),
                 remat_backbone=getattr(cfg, "remat_backbone", True),
                 folded_stem=getattr(cfg, "folded_stem", True),
                 fuse_multiscale_roi=getattr(cfg, "fuse_multiscale_roi",
                                             True),
                 frame_axes=mesh_lib.frame_axes(cfg),
                 shard_local_chunks=getattr(cfg, "shard_local_chunks",
                                            "auto"),
                 name=name)


class EmbedActors(nn.Module):
    """fc_emb_1 Linear(K*K*D -> NFB) [+ LayerNorm] + ReLU [+ dropout]
    (stage-2: infer_model.py:50-51,184-186; stage-1: base_model.py:33-34,
    119-121 uses dropout instead of LayerNorm)."""

    nfb: int
    use_layernorm: bool = True
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, roi: jnp.ndarray, deterministic: bool = True):
        B, T, N = roi.shape[:3]
        x = roi.reshape(B, T, N, -1).astype(jnp.float32)
        x = nn.Dense(self.nfb, kernel_init=kaiming_normal_init,
                     precision="highest", dtype=self.dtype,
                     name="fc_emb_1")(x)
        if self.use_layernorm:
            x = nn.LayerNorm(epsilon=1e-5, name="nl_emb_1")(x)
        x = nn.relu(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout, deterministic=deterministic,
                           name="dropout_emb")(x)
        return x
